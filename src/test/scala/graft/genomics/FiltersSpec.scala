package graft.genomics

import graft.SparkSpec
import graft.model.Read
import org.apache.spark.sql.functions._

class FiltersSpec extends SparkSpec {

  private def mkRead(name: String, contig: String, mapq: Int = 60,
      mapped: Boolean = true, primary: Boolean = true, dup: Boolean = false,
      mateContig: Option[String] = None): Read =
    Read(name, contig, 100, 110, "A" * 10, "I" * 10, "10M", "10", mapq,
      readMapped = mapped, readNegativeStrand = false, duplicateRead = dup,
      primaryAlignment = primary, sampleId = "s1",
      mateContigName = mateContig, mateStart = mateContig.map(_ => 200L),
      mateMapped = mateContig.isDefined)

  test("prefilter drops unmapped/secondary/low-mapq/dup/odd-contig reads") {
    import spark.implicits._
    val reads = Seq(
      mkRead("keep", "chr1"),
      mkRead("unmapped", "chr1", mapped = false),
      mkRead("secondary", "chr1", primary = false),
      mkRead("lowq", "chr1", mapq = 3),
      mkRead("dup", "chr1", dup = true),
      mkRead("decoy", "chr1_random"),
      mkRead("keepX", "chrX"),
      mkRead("keepMT", "MT")).toDS()
    val kept = PrefilterReads(reads, minMapQ = 10).collect().map(_.readName).toSet
    assert(kept === Set("keep", "keepX", "keepMT"))
  }

  test("prefilter nulls mate fields for filtered mate contigs") {
    import spark.implicits._
    val reads = Seq(
      mkRead("a", "chr1", mateContig = Some("chr2")),
      mkRead("b", "chr1", mateContig = Some("chrUn_decoy"))).toDS()
    val out = PrefilterReads(reads).collect().map(r => r.readName -> r).toMap
    assert(out("a").mateContigName === Some("chr2"))
    assert(out("a").mateMapped)
    assert(out("b").mateContigName === None)
    assert(out("b").mateStart === None)
    assert(!out("b").mateMapped)
  }

  private def gtRow(q: Double, depth: Int, alt: Int, state: Int = 1,
      sb: Double = 0.0, rms: Double = 60.0, ref: String = "A", altA: String = "C") =
    (q, depth, alt, state, sb, rms, ref, altA)

  private def gtDf(rows: Seq[(Double, Int, Int, Int, Double, Double, String, String)]) = {
    import spark.implicits._
    rows.toDF("genotypeQuality", "readDepth", "alternateReadDepth",
        "genotypeState", "strandBiasPhred", "rmsMapQ", "referenceAllele", "alternateAllele")
      .withColumn("alleles",
        when(col("genotypeState") > 0, array(lit("REF"), lit("ALT")))
          .otherwise(array(lit("REF"), lit("REF"))))
  }

  test("hard filters annotate failures without dropping rows") {
    val df = gtDf(Seq(
      gtRow(99.0, 40, 25),            // clean (QD 2.475)
      gtRow(5.0, 50, 25),             // fails SNPMinQuality (+QD) but kept by... emission drops it
      gtRow(99.0, 5, 3),              // fails SNPMinDepth
      gtRow(99.0, 40, 25, sb = 80.0)  // fails SNPStrandBias (QD ok)
    ))
    val out = HardFilterGenotypes.annotate(df)
    assert(out.count() === 4) // annotate never drops
    val failed = out.select("filtersFailed").collect().map(_.getSeq[String](0).toSet)
    assert(failed(0) === Set.empty)
    assert(failed(1).contains("SNPMinQuality"))
    assert(failed(2).contains("SNPMinDepth"))
    assert(failed(3) === Set("SNPStrandBias"))
  }

  test("emission gate drops hom-ref and low-quality calls") {
    val df = gtDf(Seq(
      gtRow(99.0, 50, 25),            // kept
      gtRow(5.0, 50, 25),             // quality below emit threshold
      gtRow(99.0, 50, 0, state = 0)   // hom-ref, no ALT allele
    ))
    assert(HardFilterGenotypes.emissionFilter(df, 10.0).count() === 1)
  }

  test("indel rows are dispatched to indel thresholds") {
    val df = gtDf(Seq(gtRow(40.0, 50, 25, ref = "ACC", altA = "A")))
    val out = HardFilterGenotypes.annotate(df)
    // indel minQuality is 50 -> 40 fails INDELMinQuality, not SNPMinQuality
    val failed = out.select("filtersFailed").head.getSeq[String](0).toSet
    assert(failed.contains("INDELMinQuality"))
    assert(!failed.exists(_.startsWith("SNP")))
  }

  test("rewrite hets flips high-AF het to hom-alt and voids quality") {
    val df = gtDf(Seq(
      gtRow(80.0, 50, 45),  // AF 0.9 -> rewritten
      gtRow(80.0, 50, 25))) // AF 0.5 -> untouched
    val out = RewriteHets(df, maxHetFraction = 0.8).collect()
    assert(out(0).getAs[Int]("genotypeState") === 2)
    assert(out(0).getSeq[String](out(0).fieldIndex("alleles")).toList === Seq("ALT", "ALT"))
    assert(out(0).isNullAt(out(0).fieldIndex("genotypeQuality")))
    assert(out(1).getAs[Int]("genotypeState") === 1)
    assert(out(1).getAs[Double]("genotypeQuality") === 80.0)
  }
}
