package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TDigestSpec extends SparkSpec {
  import spark.implicits._

  // deterministic "random" doubles: md5-derived 60-bit uniforms, squared
  // to skew mass toward 0 (tests the tail bands, not just the middle)
  private def skewed(n: Long) = spark.range(n)
    .select((col("id") % 4).cast("string").as("grp"),
      pow(conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
        .cast("double") / 1.152921504606847e18, 2).as("v"))

  private val agg = udaf(new TDigestAgg(200))

  /** Achieved-rank error (in rank units, 0..1) of each q's estimate. */
  private def rankErrs(df: org.apache.spark.sql.DataFrame,
      qs: Seq[Int]): Seq[(String, Int, Double)] = {
    val dig = df.groupBy("grp").agg(agg(col("v")).as("td"), count(lit(1)).as("n"))
    val quant = udf((m: Seq[Double], w: Seq[Long], q: Int) =>
      TDigest.quantile(m, w, q / 100.0))
    val est = dig.crossJoin(qs.toDF("q"))
      .select(col("grp"), col("n"), col("q"),
        quant(col("td.means"), col("td.weights"), col("q")).as("est"))
    df.join(broadcast(est), "grp")
      .groupBy("grp", "q", "n", "est")
      .agg(sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("rlo"),
        sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("rhi"))
      .select(col("grp"), col("q"),
        // distance from the target rank to the est's [rlo, rhi] interval
        greatest(
          col("q") / 100.0 - col("rhi").cast("double") / col("n"),
          col("rlo").cast("double") / col("n") - col("q") / 100.0,
          lit(0.0)).as("err"))
      .as[(String, Int, Double)].collect().toSeq
  }

  test("rank error under 1% at every probed q on a skewed 100k stream") {
    val errs = rankErrs(skewed(100000), Seq(1, 10, 25, 50, 75, 90, 99))
    val bad = errs.filter(_._3 > 0.01)
    assert(bad.isEmpty, s"rank errors over 1%: $bad")
  }

  test("merge path (64 partitions) keeps the same contract") {
    val errs = rankErrs(skewed(100000).repartition(64), Seq(1, 25, 50, 75, 99))
    val bad = errs.filter(_._3 > 0.01)
    assert(bad.isEmpty, s"rank errors over 1% after partial merges: $bad")
  }

  test("state is bounded and conserves weight") {
    val out = skewed(50000).groupBy("grp")
      .agg(agg(col("v")).as("td"), count(lit(1)).as("n"))
      .select(size(col("td.means")).as("nc"),
        aggregate(col("td.weights"), lit(0L), (a, x) => a + x).as("w"),
        col("n"))
      .as[(Int, Long, Long)].collect()
    out.foreach { case (nc, w, n) =>
      assert(nc <= 2 * 200 + 10, s"centroid count $nc exceeds ~2*delta")
      assert(w === n, s"centroid weights $w must sum to the input count $n")
    }
  }

  test("quantile extraction is monotone in q and clamps to the data range") {
    val dig = skewed(20000).groupBy("grp").agg(agg(col("v")).as("td"))
      .select(col("td.means").as("m"), col("td.weights").as("w"))
      .as[(Seq[Double], Seq[Long])].head()
    val qs = (0 to 100).map(q => TDigest.quantile(dig._1, dig._2, q / 100.0))
    qs.sliding(2).foreach { case Seq(a, b) => assert(a <= b, s"$a > $b") }
    assert(qs.head >= 0.0 && qs.last <= 1.0)
  }

  test("t27 gate row: every within_100bp is true at sf0.001") {
    val rows = graft.queries.Queries.t27_tdigest_quantiles(spark, sf("0.001"))
    assert(rows.where(!col("within_100bp")).count() === 0)
    assert(rows.count() > 0)
  }
}
