package graft.genomics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hard-filter annotation (SURVEY.md P5/P6; reference
  * HardFilterGenotypes.scala:176-660): genotypes failing a filter are
  * *annotated*, not dropped — each parameterized predicate records its
  * name into filtersFailed; filtersPassed is their absence. Only the
  * emission gate (quality/alt-presence) actually removes rows.
  * SNP vs INDEL rows get their own thresholds, dispatched on allele
  * lengths. All predicates are Column exprs (codegen'd, pushdown-able).
  */
object HardFilterGenotypes {

  case class Thresholds(
      minQuality: Double = 30.0,
      minQualityByDepth: Double = 2.0,
      maxStrandBiasPhred: Double = 60.0,
      minRmsMapQ: Double = 30.0,
      minDepth: Int = 10,
      maxDepth: Int = 200)

  /** The emission gate (P5): keep rows that called an alt with adequate
    * genotype quality.
    */
  def emissionFilter(df: DataFrame, minQuality: Double = 10.0): DataFrame =
    df.where(array_contains(col("alleles"), "ALT") && col("genotypeQuality") > minQuality)

  private def filters(t: Thresholds, tag: String): Seq[(String, Column)] = Seq(
    s"${tag}MinQuality" -> (col("genotypeQuality") < t.minQuality),
    s"${tag}QualityByDepth" -> (col("genotypeQuality") / col("readDepth") < t.minQualityByDepth),
    s"${tag}StrandBias" -> (col("strandBiasPhred") > t.maxStrandBiasPhred),
    s"${tag}RmsMapQ" -> (col("rmsMapQ") < t.minRmsMapQ),
    s"${tag}MinDepth" -> (col("readDepth") < t.minDepth),
    s"${tag}MaxDepth" -> (col("readDepth") > t.maxDepth))

  /** Annotate (never drop): filtersFailed lists every failed filter for
    * the row's variant class; filtersPassed = none failed.
    */
  def annotate(
      df: DataFrame,
      snp: Thresholds = Thresholds(),
      indel: Thresholds = Thresholds(minQuality = 50.0, minRmsMapQ = 20.0)): DataFrame = {
    val isSnp = length(col("referenceAllele")) === 1 && length(col("alternateAllele")) === 1
    val snpFails = filters(snp, "SNP").map { case (n, p) => when(isSnp && p, n) }
    val indelFails = filters(indel, "INDEL").map { case (n, p) => when(!isSnp && p, n) }
    df.withColumn("filtersFailed",
      array_compact(array(snpFails ++ indelFails: _*)))
      .withColumn("filtersPassed", size(col("filtersFailed")) === 0)
  }

  /** Full pipeline: emission gate then annotation. */
  def apply(df: DataFrame, minEmitQuality: Double = 10.0,
      snp: Thresholds = Thresholds(),
      indel: Thresholds = Thresholds(minQuality = 50.0, minRmsMapQ = 20.0)): DataFrame =
    annotate(emissionFilter(df, minEmitQuality), snp, indel)
}
