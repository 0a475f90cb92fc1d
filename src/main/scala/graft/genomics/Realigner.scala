package graft.genomics

import graft.kernels._
import graft.model.Read
import org.apache.spark.sql.Dataset

import scala.util.Try

/** Whole-read realignment (SURVEY.md K18/K19; reference
  * Realigner.scala:46-158 + RealignmentBlock.scala:34-386): re-derive a
  * read's alignment by extracting the reference it was aligned to and
  * re-aligning its sequence with the k-mer aligner. A pure narrow
  * `Dataset.map` — zero shuffles; at cluster scale throughput is kernel
  * speed × cores, nothing else.
  *
  * Candidate gating: only reads whose alignment contains an indel or a
  * mismatch cluster are realigned (clean matches pass through untouched).
  * Per-read failures (e.g. repeat-heavy reads the k-mer chain cannot
  * anchor) return the original read — the reference's failure isolation.
  */
object Realigner {

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
    * unchanged coordinates — the realigned alignment consumes the same
    * reference span) or the original on failure/non-candidacy.
    */
  def realignRead(read: Read, k: Int = 8): Read = {
    Try {
      val ops = AlignmentOps.parse(read.cigar, read.mdTag)
      if (!isCandidate(ops)) read
      else {
        // clips are preserved verbatim; the aligned core is re-derived
        val leading = ops.takeWhile(_.isInstanceOf[AlnClip])
        val trailing = ops.reverse.takeWhile(_.isInstanceOf[AlnClip]).reverse
        val core = ops.slice(leading.size, ops.size - trailing.size)
        val clipHead = leading.collect { case AlnClip(n, true) => n }.sum
        val clipTail = trailing.collect { case AlnClip(n, true) => n }.sum
        val coreSeq = read.sequence.substring(clipHead, read.sequence.length - clipTail)
        val ref = AlignmentOps.extractReference(coreSeq, core)
        val realigned = Aligner.align(ref, coreSeq, k)
        require(AlignmentOps.readLength(realigned) == coreSeq.length,
          "realigned ops lose read bases")
        require(AlignmentOps.referenceLength(realigned) == ref.length,
          "realigned ops lose reference span")
        require(AlignmentOps.extractReference(coreSeq, realigned) == ref,
          "realigned ops change the implied reference")
        val (cigar, md) = AlignmentOps.render(leading ++ realigned ++ trailing)
        read.copy(cigar = cigar, mdTag = md)
      }
    }.getOrElse(read)
  }

  /** Dataset-level realignment: embarrassingly parallel narrow map. */
  def realign(reads: Dataset[Read], k: Int = 8): Dataset[Read] = {
    import reads.sparkSession.implicits._
    reads.map(realignRead(_, k))
  }
}
