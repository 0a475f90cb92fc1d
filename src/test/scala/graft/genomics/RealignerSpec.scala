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

  test("dataset-level realign preserves counts and read content") {
    import spark.implicits._
    val reads = Seq(
      mk("a", "ACGTACGTAC", "I" * 10, "10M", "10"),
      mk("b", "ACGTTACGTACGTACGTACG", "I" * 20, "4M1I15M", "19")).toDS()
    val out = Realigner.realign(reads, k = 4).collect()
    assert(out.length === 2)
    assert(out.map(_.sequence).toSet === reads.collect().map(_.sequence).toSet)
  }
}
