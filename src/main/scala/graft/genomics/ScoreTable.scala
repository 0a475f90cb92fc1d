package graft.genomics

import graft.kernels.Likelihood
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generated likelihood dimension table (SURVEY.md S9; reference
  * ScoredObservation.createScores, ScoredObservation.scala:101-165).
  *
  * The likelihood function's domain is tiny and discrete —
  * (baseQuality 0..maxQual) × (mapQ 0..maxMapQ) × genotype state — so
  * instead of evaluating log/exp per observation row (billions at WGS
  * scale), we materialize the function once (~8.8k rows), broadcast it,
  * and turn per-row math into a broadcast hash join. Per-state arrays
  * are flattened to scalar columns (a_ll_0.., o_ll_0..) so the downstream
  * sum aggregation stays in Tungsten codegen.
  */
object ScoreTable {

  def build(spark: SparkSession, ploidy: Int = 2, maxQual: Int = 93, maxMapQ: Int = 93): DataFrame = {
    import spark.implicits._
    val rows = for {
      q <- 0 to maxQual
      mq <- 0 to maxMapQ
    } yield (q, mq,
      Likelihood.alleleLogLikelihoods(q, mq, ploidy).toSeq,
      Likelihood.otherLogLikelihoods(q, mq, ploidy).toSeq)
    val nested = rows.toDF("qual", "mapq", "a_ll", "o_ll")
    val states = 0 to ploidy
    nested.select(
      col("qual") +: col("mapq") +:
        (states.map(g => col("a_ll").getItem(g).as(s"a_ll_$g")) ++
          states.map(g => col("o_ll").getItem(g).as(s"o_ll_$g"))): _*)
  }
}
