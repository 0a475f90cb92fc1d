package graft.genomics

import graft.SparkSpec
import graft.model.{DiscoveredVariant, Read}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass cohort calling (discoverPerSample + callPerSample) must be
  * row-identical to the reference-shaped per-sample driver loop
  * (filter reads → discover → call, per sample, union) — the loop is the
  * semantic oracle, the single pass is the scale path (constant scans of
  * the cohort instead of 2x per sample).
  */
class CohortCallSpec extends SparkSpec {

  /** 10bp read on the all-A reference; optional C/G SNV at `snvOff`. */
  private def read(name: String, sample: String, contig: String = "chr1",
      start: Long = 100, snvOff: Int = -1, alt: String = "C",
      q: Int = 30, mapq: Int = 60): Read = {
    val seq = if (snvOff < 0) "A" * 10
      else "A" * snvOff + alt + "A" * (9 - snvOff)
    val md = if (snvOff < 0) "10" else s"${snvOff}A${9 - snvOff}"
    Read(name, contig, start, start + 10, seq, (33 + q).toChar.toString * 10,
      "10M", md, mapq, readMapped = true, readNegativeStrand = false,
      duplicateRead = false, primaryAlignment = true, sampleId = sample)
  }

  /** 3-sample cohort with asymmetric variant sets: s1 has an SNV at 105
    * only, s2 at 105 (different coverage) and 213, s3 is all-ref (its
    * gVCF should be pure non-ref blocks). Overlapping read starts give
    * per-position depth variation.
    */
  private def cohort: Seq[Read] =
    (0 until 6).map(i => read(s"a$i", "s1", snvOff = 5)) ++
      (0 until 4).map(i => read(s"b$i", "s1")) ++
      (0 until 3).map(i => read(s"c$i", "s2", snvOff = 5)) ++
      (0 until 5).map(i => read(s"d$i", "s2", start = 210, snvOff = 3, alt = "G")) ++
      (0 until 4).map(i => read(s"e$i", "s3")) ++
      (0 until 2).map(i => read(s"f$i", "s3", start = 210))

  private def sortKey(df: DataFrame): Seq[String] =
    df.orderBy("sampleId", "contigName", "start", "referenceAllele", "alternateAllele")
      .collect().map(_.mkString("|")).toSeq

  test("callPerSample == per-sample loop (scoreAllSites gVCF mode)") {
    import spark.implicits._
    val rds = cohort.toDS()
    val cols = Seq("contigName", "start", "referenceAllele", "alternateAllele",
      "sampleId", "genotypeState", "genotypeQuality", "readDepth",
      "gl_0", "gl_1", "gl_2")

    val single = BiallelicGenotyper.callPerSample(
      rds,
      DiscoverVariants.discoverPerSample(rds, minPhred = 20, minObservations = 2)
        .select("sampleId", "contigName", "start", "referenceAllele", "alternateAllele"),
      ploidy = 2, binSize = 100.0, scoreAllSites = true)
      .select(cols.map(col): _*)

    val loop = Seq("s1", "s2", "s3").map { s =>
      val rs = rds.filter(col("sampleId") === s)
      val vs = DiscoverVariants.discover(rs, minPhred = 20, minObservations = 2)
        .select("contigName", "start", "referenceAllele", "alternateAllele")
        .as[DiscoveredVariant]
      BiallelicGenotyper.call(rs, vs, ploidy = 2, binSize = 100.0, scoreAllSites = true)
        .select(cols.map(col): _*)
    }.reduce(_.unionByName(_))

    assert(sortKey(single) === sortKey(loop))
  }

  test("per-sample min-observation threshold: 1-read variant stays private noise") {
    import spark.implicits._
    // s2 sees the 105C variant once — BELOW minObservations within s2 —
    // while s1 sees it 3x; a cohort-wide threshold would wrongly promote
    // s2's singleton. Per-sample discovery must emit it for s1 only.
    val rds = ((0 until 3).map(i => read(s"a$i", "s1", snvOff = 5)) :+
      read("b0", "s2", snvOff = 5)).toDS()
    val vs = DiscoverVariants.discoverPerSample(rds, minPhred = 20, minObservations = 2)
    val got = vs.select("sampleId", "start").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("s1", 105L)))
  }

  test("discoverPerSample == discover on each sample's own reads") {
    import spark.implicits._
    val rds = cohort.toDS()
    val single = DiscoverVariants.discoverPerSample(rds, 20, 2)
      .select("sampleId", "contigName", "start", "referenceAllele", "alternateAllele", "n_obs")
    val loop = Seq("s1", "s2", "s3").map { s =>
      DiscoverVariants.discover(rds.filter(col("sampleId") === s), 20, 2)
        .select(lit(s).as("sampleId"), col("contigName"), col("start"),
          col("referenceAllele"), col("alternateAllele"), col("n_obs"))
    }.reduce(_.unionByName(_))
    assert(sortKey(single) === sortKey(loop))
  }
}
