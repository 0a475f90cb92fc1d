package graft.genomics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** gVCF reference-block compression (SURVEY.md §2 gVCF model; the
  * banding GATK's GVCFBlock headers describe, which the reference's
  * square-off consumes — SquareOffReferenceModel.scala:87-245 reads
  * blocks spanning [start, end)): merge runs of adjacent hom-ref
  * per-position rows from `scoreAllSites` calling into blocks, banded by
  * genotype quality so a block never hides a confidence cliff.
  *
  * Plan: one window sort per (sample, contig) ordered by start — the
  * run-id is a running sum of "break" flags (new band, gap, or non-ref
  * row boundary) — then a groupBy(run) aggregation. Two shuffles on the
  * same key; both partition by sample+contig, so at 100 TB the sort and
  * the agg co-locate and the block table is ~1/banding-factor the pileup
  * row count.
  *
  * Variant rows (alternateAllele != null) and non-hom-ref positions pass
  * through untouched; the block envelope is conservative: min quality,
  * min depth, per-state min likelihood.
  */
object ReferenceBlocks {

  def merge(gvcf: DataFrame, gqBandWidth: Int = 10, maxPloidy: Int = 2): DataFrame = {
    val glCols = (0 to maxPloidy).map(g => s"gl_$g").filter(gvcf.columns.contains)
    val keep = gvcf.where(col("alternateAllele").isNotNull || col("genotypeState") =!= 0)
    val refRows = gvcf.where(col("alternateAllele").isNull && col("genotypeState") === 0)

    val w = Window.partitionBy("sampleId", "contigName").orderBy("start")
    val band = floor(coalesce(col("genotypeQuality"), lit(0.0)) / gqBandWidth)
    val break = (col("start") =!= lag(col("end"), 1).over(w)) ||
      (band =!= lag(band, 1).over(w))
    val runs = refRows
      .withColumn("__brk", when(coalesce(break, lit(true)), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__brk")).over(w))

    val aggs =
      Seq(
        min(col("start")).as("start"),
        max(col("end")).as("end"),
        min_by(col("referenceAllele"), col("start")).as("referenceAllele"),
        min(col("genotypeQuality")).as("genotypeQuality"),
        min(col("readDepth")).cast("int").as("readDepth")) ++
        glCols.map(c => min(col(c)).as(c))
    val blockCols = Seq("contigName", "start", "end", "referenceAllele",
      "alternateAllele", "sampleId", "genotypeState", "genotypeQuality",
      "readDepth") ++ glCols
    val blocks = runs
      .groupBy(col("sampleId"), col("contigName"), col("__run"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("alternateAllele", lit(null).cast("string"))
      .withColumn("genotypeState", lit(0))
      .select(blockCols.map(col): _*)

    keep.select(blockCols.map(col): _*).unionByName(blocks)
  }
}
