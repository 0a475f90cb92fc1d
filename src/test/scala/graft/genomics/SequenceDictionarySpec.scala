package graft.genomics

import graft.SparkSpec
import graft.model.{DiscoveredVariant, Read}
import graft.sources.Sam

/** P4: sequence-dictionary model + the pre-join metadata gate. */
class SequenceDictionarySpec extends SparkSpec {

  private val res = "/root/reference/avocado-core/src/test/resources"

  test("parse @SQ header lines") {
    val d = SequenceDictionary.fromSamHeader(Seq(
      "@HD\tVN:1.6",
      "@SQ\tSN:1\tLN:249250621",
      "@SQ\tSN:2\tLN:243199373\tM5:abc"))
    assert(d.records === Seq(
      SequenceRecord("1", 249250621L), SequenceRecord("2", 243199373L)))
    assert(d("1") === Some(249250621L))
    assert(!d.contains("3"))
  }

  test("compatibility: shared contigs must agree; disjoint always ok") {
    val a = SequenceDictionary(Seq(SequenceRecord("1", 100), SequenceRecord("2", 200)))
    val b = SequenceDictionary(Seq(SequenceRecord("2", 200), SequenceRecord("3", 300)))
    val c = SequenceDictionary(Seq(SequenceRecord("2", 999)))
    assert(a.isCompatibleWith(b) && b.isCompatibleWith(a))
    assert(!a.isCompatibleWith(c))
    assert((a ++ b).records.map(_.name) === Seq("1", "2", "3"))
  }

  test("real SAM header dictionary and read-derived bounds") {
    val d = Sam.dictionary(spark, s"$res/NA12878.chr1.875159.sam")
    assert(d.contains("1"))
    val reads = Sam.read(spark, s"$res/NA12878.chr1.875159.sam", "NA12878")
    val derived = SequenceDictionary.fromReads(reads)
    assert(derived.boundedBy(d), "reads must fit inside their own header dictionary")
  }

  test("validated call gates incompatible variants and multi-sample input") {
    import spark.implicits._
    def mk(sample: String, contig: String = "chr1") =
      Read("r", contig, 100, 110, "A" * 10, "I" * 10, "10M", "10", 60,
        readMapped = true, readNegativeStrand = false, duplicateRead = false,
        primaryAlignment = true, sampleId = sample)
    val reads = Seq(mk("s1"), mk("s1")).toDS()
    val ok = Seq(DiscoveredVariant("chr1", 105, "A", Some("C"))).toDS()
    val offContig = Seq(DiscoveredVariant("chrZ", 105, "A", Some("C"))).toDS()
    // compatible path runs
    assert(BiallelicGenotyper.callValidated(reads, ok, binSize = 100.0).count() >= 0)
    // variant on a contig the reads never touch -> rejected
    intercept[IllegalArgumentException] {
      BiallelicGenotyper.callValidated(reads, offContig, binSize = 100.0)
    }
    // two samples -> rejected (reference supports exactly one)
    val multi = Seq(mk("s1"), mk("s2")).toDS()
    intercept[IllegalArgumentException] {
      BiallelicGenotyper.callValidated(multi, ok, binSize = 100.0)
    }
  }
}
