package graft.genomics

import graft.kernels._
import graft.model.Read
import org.apache.spark.sql.Dataset

import scala.util.Try

/** Block-segmented read realignment (SURVEY.md K18/K19; reference
  * Realigner.scala:46-158 + RealignmentBlock.scala:34-386): re-derive a
  * read's alignment by segmenting it into blocks — clips and long clean
  * match runs pass through verbatim (Clipped/Canonical), while regions
  * around indels and mismatch clusters, extended by k exact-match flank
  * bases on each side (the reference's backtrackBlocks), are re-aligned
  * in isolation against their own extracted reference (Realignable).
  * Realigning only the hot windows preserves long clean anchors exactly
  * and keeps the k-mer chain small. A pure narrow `Dataset.map` — zero
  * shuffles; at cluster scale throughput is kernel speed × cores,
  * nothing else.
  *
  * Candidate gating: only reads whose alignment contains an indel or a
  * mismatch cluster are realigned (clean matches pass through untouched).
  * Per-read failures (e.g. repeat-heavy reads the k-mer chain cannot
  * anchor) return the original read — the reference's failure isolation.
  */
object Realigner {

  /** One segment of a read's alignment: `realign` marks hot windows. */
  private[genomics] case class Seg(ops: List[AlnOp], realign: Boolean)

  /** Segment ops into Clipped/Canonical/Realignable blocks. A hot op
    * (indel or mismatch) opens a realignable block that steals up to k
    * trailing exact-match bases from the preceding run as its left
    * flank; an exact run of >= k bases after a hot op closes the block
    * with a k-base right flank (shorter runs are absorbed, chaining
    * nearby hot ops into one block) — the reference's RealignmentBlock
    * flank semantics (RealignmentBlock.scala:54-119).
    */
  private[genomics] def segment(ops: Seq[AlnOp], k: Int): Seq[Seg] = {
    val out = scala.collection.mutable.ListBuffer.empty[Seg]
    var canon = List.empty[AlnOp] // reversed pending canonical ops
    var hot = List.empty[AlnOp] // reversed open realignable block
    def isHot(op: AlnOp): Boolean = op match {
      case AlnMatch(_, Some(_)) | AlnIns(_) | AlnDel(_) => true
      case _                                            => false
    }
    def flushCanon(): Unit =
      if (canon.nonEmpty) { out += Seg(canon.reverse, realign = false); canon = Nil }
    def flushHot(): Unit =
      if (hot.nonEmpty) { out += Seg(hot.reverse, realign = true); hot = Nil }
    ops.foreach {
      case c: AlnClip =>
        flushHot(); canon ::= c; flushCanon()
      case m @ AlnMatch(n, None) =>
        if (hot.nonEmpty) {
          if (n >= k) {
            hot ::= AlnMatch(k, None)
            flushHot()
            if (n - k > 0) canon ::= AlnMatch(n - k, None)
          } else hot ::= m // short run: absorb, chain to the next hot op
        } else canon ::= m
      case op if isHot(op) =>
        if (hot.isEmpty) canon match {
          // steal the left flank from the preceding exact run
          case AlnMatch(n, None) :: rest if n > k =>
            canon = AlnMatch(n - k, None) :: rest
            flushCanon()
            hot = List(AlnMatch(k, None))
          case AlnMatch(n, None) :: rest =>
            canon = rest
            flushCanon()
            hot = List(AlnMatch(n, None))
          case _ =>
            flushCanon()
        }
        hot ::= op
      case other =>
        flushHot(); canon ::= other
    }
    flushHot(); flushCanon()
    out.toSeq
  }

  /** A read is a realignment candidate if its ops contain an indel, or
    * >= 2 mismatched bases (a cluster that might hide an indel — note
    * collapse merges adjacent mismatches into one run, so count bases,
    * not runs).
    */
  def isCandidate(ops: Seq[AlnOp]): Boolean = {
    var indels = 0
    var mismatchBases = 0
    ops.foreach {
      case _: AlnIns            => indels += 1
      case _: AlnDel            => indels += 1
      case AlnMatch(n, Some(_)) => mismatchBases += n
      case _                    => ()
    }
    indels > 0 || mismatchBases >= 2
  }

  /** Realign one read; returns the read with rewritten cigar/mdTag (and
    * unchanged coordinates — each realigned block consumes the same
    * reference span) or the original on failure/non-candidacy. Only the
    * realignable blocks are re-derived; clips and canonical match runs
    * pass through bit-identically.
    */
  def realignRead(read: Read, k: Int = 8): Read =
    Try(realignReadStrict(read, k)).getOrElse(read)

  /** The non-isolating flavor: realignment failures (e.g. the k-mer
    * chain's repeat assertion) propagate — how the reference's suite
    * counts which reads of a pileup are realignable.
    */
  private[genomics] def realignReadStrict(read: Read, k: Int): Read = {
    val ops = AlignmentOps.parse(read.cigar, read.mdTag)
    if (!isCandidate(ops)) read
    else {
      val segs = segment(ops, k)
      var readIdx = 0
      val newOps = segs.flatMap { seg =>
        val segReadLen = AlignmentOps.readLength(seg.ops).toInt
        val segSeq = read.sequence.substring(readIdx, readIdx + segReadLen)
        readIdx += segReadLen
        if (!seg.realign) seg.ops
        else {
          val ref = AlignmentOps.extractReference(segSeq, seg.ops)
          val realigned = Aligner.align(ref, segSeq, k)
          require(AlignmentOps.readLength(realigned) == segSeq.length,
            "realigned block loses read bases")
          require(AlignmentOps.referenceLength(realigned) == ref.length,
            "realigned block loses reference span")
          require(AlignmentOps.extractReference(segSeq, realigned) == ref,
            "realigned block changes the implied reference")
          realigned
        }
      }
      val (cigar, md) = AlignmentOps.render(newOps)
      read.copy(cigar = cigar, mdTag = md)
    }
  }

  /** Dataset-level realignment: embarrassingly parallel narrow map. */
  def realign(reads: Dataset[Read], k: Int = 8): Dataset[Read] = {
    import reads.sparkSession.implicits._
    reads.map(realignRead(_, k))
  }
}
