package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def flags(rows: Seq[(String, Long, Long)]) =
    Anomaly.zscoreFlags(rows.toDF("k", "d", "v"), "k", "d", "v")
      .select("k", "d", "v", "n_ref", "is_anomaly")
      .as[(String, Long, Long, Long, Boolean)]
      .collect().map(r => (r._2, r._4, r._5)).sortBy(_._1)

  test("a spike against a steady trailing window flags; the window rows do not") {
    // 7 steady days at 100, then a day at 200: window mean 100, sd 0 -> flag
    val out = flags((0L to 6L).map(d => ("a", d, 100L)) :+ (("a", 7L, 200L)))
    assert(out.count(_._3) == 1)
    assert(out.find(_._1 == 7L).exists(_._3), "the spike day must flag")
  }

  test("rows with fewer than minRef trailing observations never flag") {
    val out = flags(Seq(("a", 0L, 1L), ("a", 1L, 1000L), ("a", 2L, 1L)))
    assert(out.forall(!_._3))
    assert(out.map(_._2).toSeq == Seq(0L, 1L, 2L), "n_ref counts trailing rows")
  }

  test("the flag is strict: exactly z=2 sample deviations does not flag") {
    // window {9, 10, 11, 10}: n=4, mean=10, sample var=2/3.
    // z² = (x-10)²/(2/3); z²>4 ⟺ (x-10)² > 8/3 ⟺ |x-10| >= 2 (integers).
    // x=11 (z²=1.5) must not flag; x=12 (z²=6) must.
    val base = Seq(("a", 0L, 9L), ("a", 1L, 10L), ("a", 2L, 11L), ("a", 3L, 10L))
    assert(!flags(base :+ (("a", 4L, 11L))).find(_._1 == 4L).get._3)
    assert(flags(base :+ (("a", 4L, 12L))).find(_._1 == 4L).get._3)
  }

  test("keys are independent: one key's spike never flags another") {
    val a = (0L to 7L).map(d => ("a", d, 100L))
    val b = (0L to 6L).map(d => ("b", d, 5L)) :+ (("b", 7L, 500L))
    val out = Anomaly.zscoreFlags((a ++ b).toDF("k", "d", "v"), "k", "d", "v")
      .where(col("is_anomaly")).select("k").as[String].collect()
    assert(out.toSeq == Seq("b"))
  }

  test("lookback window excludes self (a level shift flags once, not forever)") {
    // 7 days at 100 then 8 days at 200: day 7 flags; by day 15 the
    // window is all-200 again and the series is calm
    val out = flags((0L to 6L).map(d => ("a", d, 100L)) ++
      (7L to 15L).map(d => ("a", d, 200L)))
    assert(out.find(_._1 == 7L).exists(_._3))
    assert(out.find(_._1 == 15L).exists(!_._3))
  }
}
