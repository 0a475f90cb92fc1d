package graft.kernels

import scala.annotation.tailrec

/** Pairwise sequence aligner (SURVEY.md K17; capability of the
  * reference's k-mer "micro-assembler", Aligner.scala:42-371): align an
  * alternate sequence against a reference without dynamic programming by
  * chaining shared unique k-mers, recursing between anchors, and
  * squashing unanchorable gaps into =/X/I/D runs. Pure Scala, used
  * inside the realignment map kernel.
  */
object Aligner {

  /** Longest common prefix length of two strings. */
  def commonPrefix(a: String, b: String): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    i
  }

  /** Longest common suffix length, bounded so prefix+suffix <= min len. */
  def commonSuffix(a: String, b: String, maxLen: Int): Int = {
    var i = 0
    val n = math.min(math.min(a.length, b.length), maxLen)
    while (i < n && a.charAt(a.length - 1 - i) == b.charAt(b.length - 1 - i)) i += 1
    i
  }

  /** Positions of k-mers that occur exactly once in s. */
  private def uniqueKmers(s: String, k: Int): Map[String, Int] = {
    if (s.length < k) Map.empty
    else (0 to s.length - k)
      .groupBy(i => s.substring(i, i + k))
      .collect { case (kmer, idxs) if idxs.size == 1 => kmer -> idxs.head }
  }

  /** Squash an unanchorable (ref, alt) gap into ops: extend exact
    * matches from both ends (bases that literally agree must not render
    * as MD mismatches carrying the read's own base), then a mismatch run
    * over the shared middle and insertion/deletion for the length
    * difference (complex indels split X-then-indel, alt-relative).
    */
  private def squash(ref: String, alt: String): List[AlnOp] = {
    if (ref.isEmpty && alt.isEmpty) Nil
    else if (ref.isEmpty) List(AlnIns(alt.length))
    else if (alt.isEmpty) List(AlnDel(ref))
    else {
      val p = commonPrefix(ref, alt)
      val s = commonSuffix(ref, alt, math.min(ref.length, alt.length) - p)
      val midRef = ref.substring(p, ref.length - s)
      val midAlt = alt.substring(p, alt.length - s)
      val mid: List[AlnOp] =
        if (midRef.isEmpty && midAlt.isEmpty) Nil
        else if (midRef.isEmpty) List(AlnIns(midAlt.length))
        else if (midAlt.isEmpty) List(AlnDel(midRef))
        else {
          val shared = math.min(midRef.length, midAlt.length)
          val x = AlnMatch(shared, Some(midRef.substring(0, shared)))
          if (midAlt.length > shared) List(x, AlnIns(midAlt.length - shared))
          else if (midRef.length > shared) List(x, AlnDel(midRef.substring(shared)))
          else List(x)
        }
      (if (p > 0) List(AlnMatch(p)) else Nil) ::: mid :::
        (if (s > 0) List(AlnMatch(s)) else Nil)
    }
  }

  /** Align `alt` (read/haplotype) against `ref`, emitting alt-relative
    * operators whose read length == alt.length and reference length ==
    * ref.length. Strategy: trim common prefix/suffix; inside, chain
    * shared unique k-mers (strictly increasing in both sequences) and
    * recurse between anchors; gaps with no concordant anchors squash.
    */
  def align(ref: String, alt: String, k: Int = 16): Seq[AlnOp] = {
    require(k >= 2, s"k=$k")
    val p = commonPrefix(ref, alt)
    val s = commonSuffix(ref, alt, math.min(ref.length, alt.length) - p)
    val midRef = ref.substring(p, ref.length - s)
    val midAlt = alt.substring(p, alt.length - s)
    val mid = alignMiddle(midRef, midAlt, k)
    AlignmentOps.collapse(
      (if (p > 0) List(AlnMatch(p)) else Nil) ++
        mid ++
        (if (s > 0) List(AlnMatch(s)) else Nil))
  }

  private def alignMiddle(ref: String, alt: String, k: Int): List[AlnOp] = {
    if (ref.isEmpty || alt.isEmpty || ref.length < k || alt.length < k)
      return squash(ref, alt)
    val refK = uniqueKmers(ref, k)
    val altK = uniqueKmers(alt, k)
    val shared = (refK.keySet & altK.keySet).toSeq
      .map(km => (refK(km), altK(km)))
      .sortBy(_._1)
    // keep a concordant chain: strictly increasing alt positions with
    // matching offsets progressing monotonically
    val chain = shared.foldLeft(List.empty[(Int, Int)]) { case (acc, (r, a)) =>
      acc match {
        case (pr, pa) :: _ if r <= pr || a <= pa => acc
        case _                                   => (r, a) :: acc
      }
    }.reverse
    if (chain.isEmpty) return squash(ref, alt)

    @tailrec
    def walk(prevR: Int, prevA: Int, rest: List[(Int, Int)], acc: List[AlnOp]): List[AlnOp] =
      rest match {
        case Nil =>
          acc ::: squash(ref.substring(prevR), alt.substring(prevA))
        case (r, a) :: tl =>
          val gap = squash(ref.substring(prevR, r), alt.substring(prevA, a))
          // the anchor k-mer itself is an exact match
          walk(r + k, a + k, tl.dropWhile { case (r2, a2) => r2 < r + k || a2 < a + k },
            acc ::: gap ::: List(AlnMatch(k)))
      }
    walk(0, 0, chain, Nil)
  }
}
