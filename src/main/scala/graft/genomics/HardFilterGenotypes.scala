package graft.genomics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hard-filter annotation (SURVEY.md P5/P6; reference
  * HardFilterGenotypes.scala:176-660): genotypes failing a filter are
  * *annotated*, not dropped — each parameterized predicate records its
  * name into filtersFailed; filtersPassed is their absence. Only the
  * emission gate (quality/alt-presence) actually removes rows.
  *
  * Full reference matrix — 9 parameterized predicates per variant
  * class (SNP / INDEL), dispatched on allele lengths, with quality-by-
  * depth and allelic-fraction thresholds split by het/hom zygosity
  * (reference buildSnpHardFilters/buildIndelHardFilters,
  * HardFilterGenotypes.scala:259-343):
  *
  *   HET{c}QD      gq/dp  <  minHetQualityByDepth   (het rows)
  *   HOM{c}QD      gq/dp  <  minHomQualityByDepth   (hom-alt rows)
  *   {c}FS         fisher >  maxPhredStrandBias
  *   {c}MQ         rmsMapQ < minRMSMappingQuality
  *   {c}MINDP      dp < minDepth ; {c}MAXDP  dp > maxDepth
  *   HET{c}MINAF   af <= minHetAltAllelicFraction   (het rows)
  *   HET{c}MAXAF   af >  maxHetAltAllelicFraction   (het rows)
  *   HOM{c}MINAF   af <= minHomAltAllelicFraction   (hom-alt rows)
  *
  * A negative/zero threshold disables its predicate (reference
  * Option(...).filter(_ > 0)); a null annotation column skips the row
  * (reference's Option flatMap). All predicates are Column exprs
  * (codegen'd); the VCF FILTER header lines are generated from the same
  * thresholds (reference :186-241).
  */
object HardFilterGenotypes {

  /** One variant class's thresholds (defaults = the reference CLI's). */
  case class Thresholds(
      minHetQualityByDepth: Double = 2.0,
      minHomQualityByDepth: Double = 1.0,
      maxPhredStrandBias: Double = -1.0,
      minRmsMapQ: Double = 30.0,
      minDepth: Int = 10,
      maxDepth: Int = 200,
      minHetAltAllelicFraction: Double = 0.333,
      maxHetAltAllelicFraction: Double = 0.666,
      minHomAltAllelicFraction: Double = 0.666)

  /** The reference's per-class defaults: INDELs disable the RMS-mapQ
    * floor (CLI BiallelicGenotyper.scala:133-137).
    */
  val snpDefaults: Thresholds = Thresholds()
  val indelDefaults: Thresholds = Thresholds(minRmsMapQ = -1.0)

  /** The emission gate (P5): drop very-low-quality calls, and (opt.)
    * rows that called no alt — those are just sites we happened to
    * observe (reference emitGenotypeFilter, :375-384; quality strictly
    * greater-than).
    */
  def emissionFilter(
      df: DataFrame,
      minQuality: Double = 10.0,
      filterRefGenotypes: Boolean = true): DataFrame = {
    val qualOk = col("genotypeQuality").isNull || col("genotypeQuality") > minQuality
    if (filterRefGenotypes)
      df.where(array_contains(col("alleles"), "ALT") && qualOk)
    else df.where(qualOk)
  }

  /** The 9 named predicates for one class; (name, fails) pairs in
    * header order.
    */
  private def filters(t: Thresholds, c: String): Seq[(String, Column)] = {
    val dp = col("readDepth")
    val gq = col("genotypeQuality")
    val hom = col("genotypeState") > 0 &&
      col("genotypeState") === coalesce(col("copyNumber"), lit(2))
    val qd = gq / dp
    val af = col("alternateReadDepth").cast("double") / dp
    def enabled(th: Double, p: Column): Column = if (th > 0) p else lit(false)
    Seq(
      s"HET${c}QD" -> enabled(t.minHetQualityByDepth,
        !hom && dp.isNotNull && gq.isNotNull && qd < t.minHetQualityByDepth),
      s"HOM${c}QD" -> enabled(t.minHomQualityByDepth,
        hom && dp.isNotNull && gq.isNotNull && qd < t.minHomQualityByDepth),
      s"${c}FS" -> enabled(t.maxPhredStrandBias,
        col("strandBiasPhred").isNotNull &&
          col("strandBiasPhred") > t.maxPhredStrandBias),
      s"${c}MQ" -> enabled(t.minRmsMapQ,
        col("rmsMapQ").isNotNull && col("rmsMapQ") < t.minRmsMapQ),
      s"${c}MINDP" -> enabled(t.minDepth.toDouble, dp.isNotNull && dp < t.minDepth),
      s"${c}MAXDP" -> enabled(t.maxDepth.toDouble, dp.isNotNull && dp > t.maxDepth),
      s"HET${c}MINAF" -> enabled(t.minHetAltAllelicFraction,
        !hom && dp.isNotNull && col("alternateReadDepth").isNotNull &&
          af <= t.minHetAltAllelicFraction),
      s"HET${c}MAXAF" -> enabled(t.maxHetAltAllelicFraction,
        !hom && dp.isNotNull && col("alternateReadDepth").isNotNull &&
          af > t.maxHetAltAllelicFraction),
      s"HOM${c}MINAF" -> enabled(t.minHomAltAllelicFraction,
        hom && dp.isNotNull && col("alternateReadDepth").isNotNull &&
          af <= t.minHomAltAllelicFraction))
  }

  /** Annotate (never drop): filtersFailed lists every failed filter for
    * the row's variant class, in declaration order; filtersPassed = none
    * failed.
    */
  def annotate(
      df: DataFrame,
      snp: Thresholds = snpDefaults,
      indel: Thresholds = indelDefaults): DataFrame = {
    val isSnp = length(col("referenceAllele")) === 1 &&
      length(col("alternateAllele")) === 1
    // concat of per-predicate 0/1-element arrays, NOT
    // array_compact(array(when(p, n), ...)): array_compact plans as the
    // higher-order filter(array, lambda) which is CodegenFallback, so
    // the whole 18-predicate matrix was evaluated INTERPRETED — the
    // plan showed a bare non-codegen Project between two codegen spans
    // and p6b spent ~3 s on a 600 k-row scan. The concat form is
    // value-identical (non-null names in declaration order) and keeps
    // every predicate inside one whole-stage-codegen span.
    val none = typedLit(Seq.empty[String])
    val snpFails = filters(snp, "SNP")
      .map { case (n, p) => when(isSnp && p, array(lit(n))).otherwise(none) }
    val indelFails = filters(indel, "INDEL")
      .map { case (n, p) => when(!isSnp && p, array(lit(n))).otherwise(none) }
    df.withColumn("filtersFailed", concat(snpFails ++ indelFails: _*))
      .withColumn("filtersPassed", size(col("filtersFailed")) === 0)
  }

  /** Generated VCF FILTER header lines for the active thresholds
    * (reference :186-241 — one ##FILTER line per enabled predicate,
    * message text matching).
    */
  def filterHeaderLines(
      snp: Thresholds = snpDefaults,
      indel: Thresholds = indelDefaults): Seq[String] = {
    def line(id: String, desc: String) =
      s"""##FILTER=<ID=$id,Description="$desc">"""
    def f(v: Double) = "%f".format(v)
    def cls(t: Thresholds, c: String, word: String): Seq[Option[String]] = Seq(
      Option.when(t.minHetQualityByDepth > 0)(line(s"HET${c}QD",
        s"Quality by depth was below ${f(t.minHetQualityByDepth)} for a heterozygous $word.")),
      Option.when(t.minHomQualityByDepth > 0)(line(s"HOM${c}QD",
        s"Quality by depth was below ${f(t.minHomQualityByDepth)} for a homozygous $word.")),
      Option.when(t.maxPhredStrandBias > 0)(line(s"${c}FS",
        s"Phred Fisher scored strand bias was above ${f(t.maxPhredStrandBias)} for a $word.")),
      Option.when(t.minRmsMapQ > 0)(line(s"${c}MQ",
        s"RMS mapping quality was below ${f(t.minRmsMapQ)} for a $word.")),
      Option.when(t.minDepth > 0)(line(s"${c}MINDP",
        s"Read depth was below ${t.minDepth} for a $word.")),
      Option.when(t.maxDepth > 0)(line(s"${c}MAXDP",
        s"Read depth was above ${t.maxDepth} for a $word.")),
      Option.when(t.minHetAltAllelicFraction > 0)(line(s"HET${c}MINAF",
        s"Allelic fraction was below ${f(t.minHetAltAllelicFraction)} for a het $word.")),
      Option.when(t.maxHetAltAllelicFraction > 0)(line(s"HET${c}MAXAF",
        s"Allelic fraction was above ${f(t.maxHetAltAllelicFraction)} for a het $word.")),
      Option.when(t.minHomAltAllelicFraction > 0)(line(s"HOM${c}MINAF",
        s"Allelic fraction was below ${f(t.minHomAltAllelicFraction)} for a hom $word.")))
    (cls(snp, "SNP", "SNP") ++ cls(indel, "INDEL", "INDEL")).flatten
  }

  /** Full pipeline: emission gate then annotation. */
  def apply(df: DataFrame, minEmitQuality: Double = 10.0,
      snp: Thresholds = snpDefaults,
      indel: Thresholds = indelDefaults,
      filterRefGenotypes: Boolean = true): DataFrame =
    annotate(emissionFilter(df, minEmitQuality, filterRefGenotypes), snp, indel)
}
