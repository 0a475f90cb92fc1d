package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic values spanning negatives and bucket edges
  private def lhs = spark.range(300).select(col("id").as("lid"),
    (col("id") * 37 % 500 - 250).as("lv"))
  private def rhs = spark.range(200).select(col("id").as("rid"),
    (col("id") * 53 % 480 - 240).as("rv"))

  test("band join equals the naive inequality join, negatives included") {
    val got = BandJoin.bandJoin(lhs, rhs, "lv", "rv", eps = 25L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = lhs.crossJoin(rhs)
      .where(abs(col("lv") - col("rv")) <= 25)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("pairs exactly eps apart are kept; eps+1 apart are not") {
    val l = Seq((1L, 100L), (2L, -100L)).toDF("lid", "lv")
    val r = Seq((10L, 110L), (11L, 111L), (12L, -110L), (13L, -111L))
      .toDF("rid", "rv")
    val got = BandJoin.bandJoin(l, r, "lv", "rv", eps = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 12L)))
  }

  test("expandLeft=false mirrors the result") {
    val a = BandJoin.bandJoin(lhs, rhs, "lv", "rv", eps = 7L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val b = BandJoin.bandJoin(lhs, rhs, "lv", "rv", eps = 7L,
      expandLeft = false).select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("plans an equi-join on the bucket, not a nested loop") {
    val plan = BandJoin.bandJoin(lhs, rhs, "lv", "rv", eps = 25L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"band join must rewrite to an equi-join:\n$plan")
  }
}
