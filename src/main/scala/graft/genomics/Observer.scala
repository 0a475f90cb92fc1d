package graft.genomics

import graft.kernels.{AlignmentOps, AlnClip, AlnDel, AlnIns, AlnMatch}
import graft.model.{DiscoveredVariant, Read}

import scala.util.Try

/** One read's evidence at one candidate variant site (the flattened,
  * discrete observation key that joins the score table; the shape of the
  * reference's SummarizedObservation, SummarizedObservation.scala:37-43).
  * support: 2 = read shows the alt allele, 1 = read shows the reference,
  * 0 = read shows some other allele.
  */
case class SiteObservation(
    contigName: String,
    start: Long,
    referenceAllele: String,
    alternateAllele: String,
    sampleId: String,
    support: Int,
    forwardStrand: Boolean,
    qual: Int,
    mapq: Int)

/** Per-read allele observation kernel (SURVEY.md K6; reference
  * Observer.scala:48-140): classify what a read shows at each overlapping
  * candidate site. SNVs are classified from the aligned base at the site;
  * indels by whether the read's own extracted variants contain the
  * candidate, with reference support requiring an intact match across the
  * deleted/anchor span.
  */
object Observer {

  final val SupportOther = 0
  final val SupportRef = 1
  final val SupportAlt = 2

  /** The reference's nullOut class (SummarizedObservation.scala:89-94):
    * the read covers the site but cannot attest any allele — it scores
    * only the symbolic non-ref dimension (nonReferenceLikelihoods),
    * contributing zero to the alt/ref genotype blend.
    */
  final val SupportNonRef = 3

  /** Aligned per-reference-position view of a read: base, phred, and
    * whether the position is a pure match (no indel adjacency needed for
    * SNV calls).
    */
  private case class SitePileup(
      base: Map[Long, (Char, Int)],
      refBase: Map[Long, Char], // aligned reference base per position (from MD)
      variants: Map[(Long, String, String), Int], // (start, ref, alt) -> qual
      indelAnchors: Set[Long], // reference positions adjacent to an indel
      clipBoundaries: Set[Long]) // aligned positions where a soft clip abuts

  private def walk(read: Read): SitePileup = {
    val ops = AlignmentOps.parse(read.cigar, read.mdTag)
    val bases = Map.newBuilder[Long, (Char, Int)]
    val refs = Map.newBuilder[Long, Char]
    val vars = Map.newBuilder[(Long, String, String), Int]
    val anchors = Set.newBuilder[Long]
    val clips = Set.newBuilder[Long]
    var pos = read.start
    var idx = 0
    def phred(i: Int): Int = read.qual.charAt(i) - 33
    ops.foreach {
      case AlnMatch(n, None) =>
        var i = 0
        while (i < n) {
          bases += (pos + i) -> ((read.sequence.charAt(idx + i), phred(idx + i)))
          refs += (pos + i) -> read.sequence.charAt(idx + i)
          i += 1
        }
        pos += n; idx += n
      case AlnMatch(n, Some(refBases)) =>
        var i = 0
        while (i < n) {
          bases += (pos + i) -> ((read.sequence.charAt(idx + i), phred(idx + i)))
          refs += (pos + i) -> refBases.charAt(i)
          vars += ((pos + i, refBases.substring(i, i + 1),
            read.sequence.substring(idx + i, idx + i + 1))) -> phred(idx + i)
          i += 1
        }
        pos += n; idx += n
      case AlnIns(n) =>
        if (idx > 0) {
          val meanQ = (idx until (idx + n)).map(phred).sum / n
          vars += ((pos - 1, read.sequence.substring(idx - 1, idx),
            read.sequence.substring(idx - 1, idx + n))) -> meanQ
        }
        anchors += (pos - 1)
        idx += n
      case AlnDel(del) =>
        // deleted bases carry no read quality: score on mapQ alone
        // (reference Observer.scala:120-137 emits optQuality = None)
        if (idx > 0) {
          vars += ((pos - 1, read.sequence.substring(idx - 1, idx) + del,
            read.sequence.substring(idx - 1, idx))) -> graft.kernels.Likelihood.NoQual
        }
        anchors += (pos - 1)
        pos += del.length
      case AlnClip(n, true) =>
        // boundary position where the clip meets the aligned core
        clips += (if (idx == 0) pos else pos - 1)
        idx += n
      case AlnClip(_, false) => ()
    }
    SitePileup(bases.result(), refs.result(), vars.result(), anchors.result(), clips.result())
  }

  /** One aligned base of one read: the exploded pileup row for the
    * declarative SNV path (support classification happens as codegen'd
    * column expressions after an equi-join on position, not in this
    * kernel).
    */
  case class BaseObs(
      contigName: String,
      pos: Long,
      base: String,
      refBase: String, // aligned reference base (from MD; = base on match)
      qual: Int,
      forwardStrand: Boolean,
      mapq: Int,
      sampleId: String)

  /** [[BaseObs]] plus the compressed multiplicity. */
  case class WeightedBaseObs(
      contigName: String,
      pos: Long,
      base: String,
      refBase: String,
      qual: Int,
      forwardStrand: Boolean,
      mapq: Int,
      sampleId: String,
      w: Long)

  /** Weighted pileup WITHOUT a per-base shuffle: reads are re-keyed to
    * (contig, position-bin) — border reads replicated, base emission
    * clamped to the owning bin so nothing double-counts — and each
    * partition compresses its pileup in one hash pass. The shuffle
    * carries one row per READ (readLength× fewer rows than shuffling the
    * exploded pileup into a hash agg, the shape this replaces: measured
    * 7.0 s -> see bench for the win at sf0.1). Per-partition state is
    * the distinct observation keys of its bins — the same cardinality
    * the old partial agg held. Equivalent to
    * flatMap(basePileup).groupBy(key).count, by construction.
    */
  def compressedPileup(
      reads: org.apache.spark.sql.Dataset[Read],
      binSize: Long = 1000L): org.apache.spark.sql.DataFrame = {
    val spark = reads.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    reads
      .flatMap { r =>
        // span from the CIGAR itself (what basePileup actually emits),
        // not the record's end field — an inconsistent end would clamp
        // bases out of every bin and silently lose depth
        val refLen = Try(AlignmentOps.referenceLength(
          AlignmentOps.parse(r.cigar, r.mdTag)).toLong).getOrElse(0L)
        val last = math.max(r.start, math.max(r.end - 1, r.start + refLen - 1))
        val b0 = r.start / binSize
        val b1 = last / binSize
        (b0 to b1).map(b => (r.contigName, b, r))
      }
      .repartition(col("_1"), col("_2"))
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[BaseObs, Long]
        it.foreach { case (_, bin, r) =>
          val lo = bin * binSize
          val hi = lo + binSize
          basePileup(r).foreach { p =>
            if (p.pos >= lo && p.pos < hi) m.update(p, m.getOrElse(p, 0L) + 1L)
          }
        }
        m.iterator.map { case (p, w) =>
          WeightedBaseObs(p.contigName, p.pos, p.base, p.refBase, p.qual,
            p.forwardStrand, p.mapq, p.sampleId, w)
        }
      }
      .toDF()
  }

  /** Explode a read into per-aligned-base pileup rows — runs ONCE per
    * read regardless of how many variants overlap it. Malformed reads
    * emit nothing.
    */
  def basePileup(read: Read): Seq[BaseObs] = {
    Try {
      val ops = AlignmentOps.parse(read.cigar, read.mdTag)
      val out = new scala.collection.mutable.ArrayBuffer[BaseObs](read.sequence.length)
      var pos = read.start
      var idx = 0
      def phred(i: Int): Int = read.qual.charAt(i) - 33
      def emit(n: Int, refBases: Option[String]): Unit = {
        var i = 0
        while (i < n) {
          val rb = refBases.fold(read.sequence.substring(idx + i, idx + i + 1))(
            r => r.substring(i, i + 1))
          out += BaseObs(read.contigName, pos + i,
            read.sequence.substring(idx + i, idx + i + 1), rb, phred(idx + i),
            !read.readNegativeStrand, read.mapq, read.sampleId)
          i += 1
        }
        pos += n; idx += n
      }
      ops.foreach {
        case AlnMatch(n, r)    => emit(n, r)
        case AlnIns(n)         => idx += n
        case AlnDel(b)         => pos += b.length
        case AlnClip(n, true)  => idx += n
        case AlnClip(_, false) => ()
      }
      out.toSeq
    }.getOrElse(Nil)
  }

  /** Observations of one read at the given candidate variants. Malformed
    * reads observe nothing (per-row failure isolation).
    */
  def observe(read: Read, variants: Seq[DiscoveredVariant]): Seq[SiteObservation] = {
    Try {
      val p = walk(read)
      variants.flatMap { v =>
        val alt = v.alternateAllele.getOrElse("")
        def obs(support: Int, q: Int) = Some(SiteObservation(
          v.contigName, v.start, v.referenceAllele, alt, read.sampleId,
          support, !read.readNegativeStrand, q, read.mapq))
        val isSnv = v.referenceAllele.length == 1 && alt.length == 1
        if (isSnv) {
          p.base.get(v.start) match {
            case Some((b, q)) if b.toString == alt              => obs(SupportAlt, q)
            case Some((b, q)) if b.toString == v.referenceAllele => obs(SupportRef, q)
            case Some((_, q))                                    => obs(SupportOther, q)
            case None                                            => None
          }
        } else {
          val key = (v.start, v.referenceAllele, alt)
          p.variants.get(key) match {
            case Some(q) => obs(SupportAlt, q)
            case None =>
              val span = v.start until v.end
              // a read whose OWN extracted variant sits at this same
              // start attests a DIFFERENT allele of this site: that is
              // other-alt evidence (reference otherAlt reclassification,
              // BiallelicGenotyper.scala:337-346), and it must win over
              // the ambiguity null-out below — at a multiallelic indel
              // site the competing carrier reads ARE the evidence that
              // this allele is absent (e.g. the T->TAAA carriers at the
              // T->CAAA candidate, reference suite 1/4120185).
              val competing = p.variants.keys.exists(_._1 == v.start)
              // ambiguity window: a nearby indel anchor or a soft-clip
              // boundary means this read's alignment cannot attest
              // presence/absence of the indel (fragmented insertions,
              // clipped-out inserts) -> observe nothing (the reference's
              // nullOut reclassification, BiallelicGenotyper.scala:287-373)
              val w = math.max(v.referenceAllele.length, alt.length) + 8L
              val ambiguous =
                p.indelAnchors.exists(a => a >= v.start - w && a <= v.end + w) ||
                  p.clipBoundaries.exists(c => c >= v.start - w && c <= v.end + w)
              val covered = span.forall(p.base.contains)
              // Insertion tail-matching (reference BiallelicGenotyper
              // .scala:306-330): in a repeat tract, a read whose aligned
              // tail past the anchor is consistent with BOTH haplotypes
              // (its bases equal the alt haplotype insBases ++ refTail for
              // as far as it reaches) cannot attest absence of the
              // insertion — observe nothing rather than reference support.
              def insertionTailAmbiguous: Boolean = {
                val isIns = v.referenceAllele.length == 1 && alt.length > 1
                if (!isIns) false
                else {
                  val tailPos = Iterator.from(1).map(v.start + _)
                    .takeWhile(p.base.contains).toSeq
                  val readTail = tailPos.map(p.base(_)._1).mkString
                  val refTail = tailPos.map(p.refBase(_)).mkString
                  val altHap = (alt.drop(1) + refTail).take(readTail.length)
                  readTail.isEmpty || readTail == altHap
                }
              }
              // nulled (nonref) observations keep the read in the depth
              // and nonReferenceLikelihoods accounting without touching
              // the alt/ref blend — reference nullOut semantics
              if (competing) {
                if (p.base.contains(v.start)) obs(SupportOther, p.base(v.start)._2)
                else None
              } else if (ambiguous) {
                if (p.base.contains(v.start)) obs(SupportNonRef, p.base(v.start)._2)
                else None
              } else if (covered) {
                if (insertionTailAmbiguous) obs(SupportNonRef, p.base(v.start)._2)
                else {
                  val quals = span.map(p.base(_)._2)
                  obs(SupportRef, quals.sum / quals.length)
                }
              } else None
          }
        }
      }
    }.getOrElse(Nil)
  }
}
