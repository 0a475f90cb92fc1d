package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HardLimiterSpec extends SparkSpec {

  /** Greedy admission oracle over (key, start, tie)-sorted intervals. */
  private def oracle(rows: Seq[(String, Long, Long, Long)], cap: Int): Set[Long] = {
    val admitted = scala.collection.mutable.Set.empty[Long]
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val active = scala.collection.mutable.ArrayBuffer.empty[Long] // ends
      rs.sortBy(r => (r._2, r._4)).foreach { case (_, s, e, id) =>
        active.filterInPlace(_ > s)
        if (active.size < cap) { active += e; admitted += id }
      }
    }
    admitted.toSet
  }

  test("exact mode matches greedy oracle and caps concurrent coverage") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 400).map { i =>
      val key = s"k${rnd.nextInt(3)}"
      val s = rnd.nextInt(200).toLong
      (key, s, s + 1 + rnd.nextInt(30), i.toLong)
    }
    import spark.implicits._
    val df = rows.toDF("key", "s", "e", "id")
    val got = HardLimiter
      .capCoverage(df, "key", "s", "e", maxCoverage = 4, exact = true, tieCols = Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(got === oracle(rows, 4))

    // invariant: at every admitted start, < 4 admitted intervals overlap
    val kept = rows.filter(r => got(r._4))
    kept.foreach { case (k, s, _, id) =>
      val overlapping = kept.count { case (k2, s2, e2, id2) =>
        k2 == k && id2 != id && s2 <= s && e2 > s
      }
      assert(overlapping < 4, s"row $id has $overlapping concurrent admitted")
    }
  }

  test("exact mode flags hot partitions; range mode never does") {
    import spark.implicits._
    // one hot key: every row hashes to the same task under exact=true
    val df = (0 until 500).map(i => ("hot", i.toLong, i.toLong + 5, i.toLong))
      .toDF("key", "s", "e", "id")
    val kept = HardLimiter.capCoverage(df, "key", "s", "e", maxCoverage = 1000,
      exact = true, tieCols = Seq("id"), warnPartitionRows = 100).count()
    assert(kept === 500)
    assert(HardLimiter.lastExactHotPartitions.exists(_.value === 1L),
      "the single hot hash partition should be flagged once")

    // range partitioning spreads the same key: no task crosses the bar
    HardLimiter.lastExactHotPartitions = None
    val keptRange = HardLimiter.capCoverage(df, "key", "s", "e", maxCoverage = 1000,
      exact = false, tieCols = Seq("id"), numPartitions = 16,
      warnPartitionRows = 100).count()
    assert(keptRange === 500)
    assert(HardLimiter.lastExactHotPartitions.isEmpty,
      "range flavor installs no hot-partition accumulator")
  }

  test("uncapped input passes through untouched") {
    import spark.implicits._
    val df = (0 until 50).map(i => ("k", i.toLong * 100, i.toLong * 100 + 10, i.toLong))
      .toDF("key", "s", "e", "id")
    val n = HardLimiter.capCoverage(df, "key", "s", "e", 2, exact = true, tieCols = Seq("id")).count()
    assert(n === 50)
  }
}
