package graft.genomics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trio (mother/father/child) Mendelian phasing (SURVEY.md J6/K14;
  * reference TrioCaller.scala:90-221): align the three samples per site
  * with a pivot, then phase the child's call against parental alt
  * counts:
  *  - child call requiring more alt (or ref) alleles than the parents
  *    can donate -> Mendelian violation -> NO_CALL
  *  - phasable het -> ordered maternal|paternal allele pair, phased=true
  *  - homozygous calls phase trivially.
  *
  * The 3-way per-site alignment is groupBy(site).pivot(role) — one
  * shuffle; the phasing logic is a codegen'd when-cascade.
  */
object TrioCaller {

  /** Input: genotype rows (site cols + sampleId + genotypeState 0..2,
    * -1/absent rows treated as NO_CALL) and the role mapping. Output:
    * one row per site with motherState/fatherState/childState, the
    * phased child alleles, and a mendelError flag.
    */
  def apply(
      gts: DataFrame,
      motherId: String,
      fatherId: String,
      childId: String): DataFrame = {

    val site = Seq("contigName", "start", "end", "referenceAllele", "alternateAllele")
    // max(), not first(): first() is pick-any under Spark's execution
    // model, so a duplicated (site, sample) row would make the pivot
    // nondeterministic across runs
    val piv = gts
      .where(col("sampleId").isin(motherId, fatherId, childId))
      .groupBy(site.map(col): _*)
      .pivot("sampleId", Seq(motherId, fatherId, childId))
      .agg(max(col("genotypeState")))
      .withColumnRenamed(motherId, "motherState")
      .withColumnRenamed(fatherId, "fatherState")
      .withColumnRenamed(childId, "childState")

    // absent row (null) = implicit hom-ref from the squared-off cohort;
    // state -1 (VCF './.') = NO_CALL — for a parent that means *unknown*,
    // i.e. either donation is possible, NOT hom-ref
    val m = coalesce(col("motherState"), lit(0))
    val f = coalesce(col("fatherState"), lit(0))
    val c = col("childState")
    val mUnknown = m < 0 || m > 2
    val fUnknown = f < 0 || f > 2
    val cNoCall = c < 0 || c > 2

    // each parent donates exactly one allele: child alt count must be
    // achievable as (maternal donation 0/1) + (paternal donation 0/1),
    // where a parent can donate alt iff state>0 and ref iff state<2
    val maternalAltPossible = mUnknown || m > 0
    val maternalRefPossible = mUnknown || m < 2
    val paternalAltPossible = fUnknown || f > 0
    val paternalRefPossible = fUnknown || f < 2
    val violation = !cNoCall && (
      (c === 2 && !(maternalAltPossible && paternalAltPossible)) ||
        (c === 0 && !(maternalRefPossible && paternalRefPossible)) ||
        (c === 1 && !((maternalAltPossible && paternalRefPossible) ||
          (maternalRefPossible && paternalAltPossible))))

    // phasing a het: unambiguous only if exactly one parent can donate alt
    val maternalAltOnly = (maternalAltPossible && paternalAltPossible) === lit(false) && maternalAltPossible
    val paternalAltOnly = (maternalAltPossible && paternalAltPossible) === lit(false) && paternalAltPossible

    piv
      .where(c.isNotNull)
      .withColumn("mendelError", violation)
      .withColumn("phased",
        !cNoCall && !violation && (c =!= 1 || maternalAltOnly || paternalAltOnly))
      .withColumn("childAlleles",
        when(cNoCall || violation, array(lit("NO_CALL"), lit("NO_CALL")))
          .when(c === 0, array(lit("REF"), lit("REF")))
          .when(c === 2, array(lit("ALT"), lit("ALT")))
          .when(maternalAltOnly, array(lit("ALT"), lit("REF"))) // maternal|paternal
          .when(paternalAltOnly, array(lit("REF"), lit("ALT")))
          .otherwise(array(lit("REF"), lit("ALT"))) // het, unphased order
      )
  }
}
