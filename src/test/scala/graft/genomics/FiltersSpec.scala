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
      .withColumn("copyNumber", lit(2))
      .withColumn("alleles",
        when(col("genotypeState") > 0, array(lit("REF"), lit("ALT")))
          .otherwise(array(lit("REF"), lit("REF"))))
  }

  private def failedSets(df: org.apache.spark.sql.DataFrame) =
    HardFilterGenotypes.annotate(df).select("filtersFailed")
      .collect().map(_.getSeq[String](0).toSet)

  // port of the reference HardFilterGenotypesSuite's predicate cases
  // (:125-228, :377-428), via the Column-expression matrix

  test("filter genotypes with a low quality per depth, split by zygosity") {
    // het threshold 2.0: QD 39/20=1.95 fails, 41/20=2.05 passes
    // hom threshold 1.0: QD 19/20=0.95 fails, 39/20 passes
    val failed = failedSets(gtDf(Seq(
      gtRow(39.0, 20, 10, state = 1),
      gtRow(41.0, 20, 10, state = 1),
      gtRow(19.0, 20, 18, state = 2),
      gtRow(39.0, 20, 18, state = 2))))
    assert(failed(0).contains("HETSNPQD"))
    assert(!failed(1).exists(_.endsWith("QD")))
    assert(failed(2).contains("HOMSNPQD"))
    assert(!failed(3).exists(_.endsWith("QD")))
  }

  test("filter genotypes with out-of-range depth") {
    val failed = failedSets(gtDf(Seq(
      gtRow(99.0, 5, 3),    // below min 10
      gtRow(99.0, 10, 5),   // at min: passes (strict <)
      gtRow(99.0, 201, 90), // above max 200
      gtRow(99.0, 200, 90)))) // at max: passes (strict >)
    assert(failed(0).contains("SNPMINDP"))
    assert(!failed(1).contains("SNPMINDP"))
    assert(failed(2).contains("SNPMAXDP"))
    assert(!failed(3).contains("SNPMAXDP"))
  }

  test("filter genotypes with a low RMS mapping quality (SNP only by default)") {
    val failed = failedSets(gtDf(Seq(
      gtRow(99.0, 50, 25, rms = 29.0),
      gtRow(99.0, 50, 25, rms = 31.0),
      // INDEL class disables the MQ floor (reference CLI default -1)
      gtRow(99.0, 50, 25, rms = 5.0, ref = "ACC", altA = "A"))))
    assert(failed(0).contains("SNPMQ"))
    assert(!failed(1).contains("SNPMQ"))
    assert(!failed(2).exists(_.endsWith("MQ")))
  }

  test("strand-bias filter is disabled by default and enabled by threshold") {
    val df = gtDf(Seq(gtRow(99.0, 50, 25, sb = 80.0)))
    assert(failedSets(df)(0).forall(!_.endsWith("FS")))
    val enabled = HardFilterGenotypes.annotate(df,
      snp = HardFilterGenotypes.snpDefaults.copy(maxPhredStrandBias = 60.0))
      .select("filtersFailed").head.getSeq[String](0).toSet
    assert(enabled.contains("SNPFS"))
  }

  test("filter genotypes by allelic fraction, inclusive-low exclusive-high") {
    val failed = failedSets(gtDf(Seq(
      gtRow(99.0, 48, 16, state = 1),  // af = 0.333.. > 0.333: passes
      gtRow(99.0, 48, 15, state = 1),  // af 0.3125 <= 0.333: HETSNPMINAF
      gtRow(99.0, 48, 33, state = 1),  // af 0.6875 > 0.666: HETSNPMAXAF
      gtRow(99.0, 48, 31, state = 1),  // af 0.6458: passes
      gtRow(99.0, 48, 31, state = 2),  // hom af 0.6458 <= 0.666: HOMSNPMINAF
      gtRow(99.0, 48, 33, state = 2)))) // hom af 0.6875: passes
    assert(!failed(0).exists(_.contains("AF")))
    assert(failed(1).contains("HETSNPMINAF"))
    assert(failed(2).contains("HETSNPMAXAF"))
    assert(!failed(3).exists(_.contains("AF")))
    assert(failed(4).contains("HOMSNPMINAF"))
    assert(!failed(5).exists(_.contains("AF")))
  }

  test("hard filters annotate failures without dropping rows") {
    val df = gtDf(Seq(
      gtRow(99.0, 40, 25),
      gtRow(99.0, 5, 3),
      gtRow(1.0, 40, 25)))
    val out = HardFilterGenotypes.annotate(df)
    assert(out.count() === 3) // annotate never drops
  }

  test("emission gate drops hom-ref and low-quality calls") {
    val df = gtDf(Seq(
      gtRow(99.0, 50, 25),            // kept
      gtRow(5.0, 50, 25),             // quality below emit threshold
      gtRow(99.0, 50, 0, state = 0)   // hom-ref, no ALT allele
    ))
    assert(HardFilterGenotypes.emissionFilter(df, 10.0).count() === 1)
    // emission quality is strictly greater-than (reference filterQuality)
    assert(HardFilterGenotypes.emissionFilter(gtDf(Seq(gtRow(10.0, 50, 25))), 10.0)
      .count() === 0)
    // filterRefGenotypes=false keeps hom-ref rows
    assert(HardFilterGenotypes.emissionFilter(df, 10.0, filterRefGenotypes = false)
      .count() === 2)
  }

  test("indel rows are dispatched to indel thresholds") {
    val df = gtDf(Seq(gtRow(10.0, 20, 10, ref = "ACC", altA = "A")))
    // QD 0.5 fails het threshold in the INDEL class
    val failed = failedSets(df)
    assert(failed(0).contains("HETINDELQD"))
    assert(!failed(0).exists(_.startsWith("SNP")) && !failed(0).exists(_.startsWith("HETSNP")))
  }

  test("generated FILTER header lines track enabled thresholds") {
    val lines = HardFilterGenotypes.filterHeaderLines()
    // default: FS disabled both classes, MQ disabled for INDEL
    assert(lines.exists(_.contains("ID=HETSNPQD")))
    assert(lines.exists(_.contains("ID=SNPMQ")))
    assert(!lines.exists(_.contains("ID=SNPFS")))
    assert(!lines.exists(_.contains("ID=INDELMQ")))
    assert(lines.exists(_.contains("ID=HOMINDELMINAF")))
    assert(lines.forall(_.startsWith("##FILTER=<ID=")))
    val withFs = HardFilterGenotypes.filterHeaderLines(
      snp = HardFilterGenotypes.snpDefaults.copy(maxPhredStrandBias = 60.0))
    assert(withFs.exists(l => l.contains("ID=SNPFS") && l.contains("above 60.000000")))
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
