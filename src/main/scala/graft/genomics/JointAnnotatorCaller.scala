package graft.genomics

import graft.kernels.LogMath
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Joint annotation + binomial-prior recall (SURVEY.md A5-A7/K13/P7;
  * reference JointAnnotatorCaller.scala:62-281): across the squared
  * (variant × sample) matrix, compute cohort allele frequency, drop
  * monomorphic sites, re-call each genotype with a Binomial(ploidy, MAF)
  * prior over the stored likelihoods, and roll per-site annotations up.
  *
  * All cohort statistics are window aggregates over the site key —
  * one shuffle on the site, no driver-side grouping.
  */
object JointAnnotatorCaller {

  /** Input: squareOff output (gl_0..2 per row). Output adds maf,
    * recalled state/quality/posteriors, and per-site depth annotations;
    * monomorphic sites (MAF <= 0) are dropped.
    */
  def apply(squared: DataFrame, ploidy: Int = 2): DataFrame = {
    val site = Seq("contigName", "start", "end", "referenceAllele", "alternateAllele")
    val w = Window.partitionBy(site.map(col): _*)

    // A6: cohort minor-allele frequency from called states
    val withMaf = squared
      .withColumn("__siteAlleles", count(lit(1)).over(w) * ploidy)
      .withColumn("__siteAlt", sum(col("genotypeState")).over(w))
      .withColumn("maf", col("__siteAlt").cast("double") / col("__siteAlleles"))
      // A5-shaped site summary + A7 site depth annotation
      .withColumn("siteDepth", sum(col("readDepth")).over(w))
      .withColumn("siteSamples", count(lit(1)).over(w))
      .where(col("maf") > 0.0) // P7: drop sites with no alt anywhere

    // K13: posterior_g = log Binom(ploidy, maf).pmf(g) + GL_g, renormalized.
    // Boundary (reference JointAnnotatorCaller.scala:162-166): at a
    // degenerate MAF (>= 1.0 here; <= 0.0 is already dropped by P7) the
    // binomial prior is undefined and the reference recalls with NO prior
    // — pure likelihood argmax. The closed form would otherwise produce
    // 0 * log(0) = NaN for g = ploidy, poisoning the argmax (a
    // single-sample hom-alt site is the everyday case that hits this).
    val lc = (0 to ploidy).map(g => LogMath.logChoose(ploidy, g))
    val posts = (0 to ploidy).map { g =>
      (when(col("maf") < 1.0,
        lit(lc(g)) + lit(g.toDouble) * log(col("maf")) +
          lit((ploidy - g).toDouble) * log(lit(1.0) - col("maf")))
        .otherwise(lit(0.0)) +
        col(s"gl_$g")).as(s"__post_$g")
    }
    val withPost = withMaf.select(col("*") +: posts: _*)
    val postArr = array((0 to ploidy).map(g => col(s"__post_$g")): _*)
    val sorted = reverse(array_sort(postArr))

    withPost
      .withColumn("posteriors", postArr)
      .withColumn("recalledState",
        (array_position(col("posteriors"), element_at(sorted, 1)) - 1).cast("int"))
      .withColumn("recalledQuality",
        round(lit(10.0 / math.log(10.0)) * (element_at(sorted, 1) - element_at(sorted, 2)), 3))
      .drop((0 to ploidy).map(g => s"__post_$g") ++ Seq("__siteAlleles", "__siteAlt"): _*)
  }
}
