package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** j8 last-decade breakdown (dev tool, r14-verdict item #3): j8 sat at
  * 11.0x over the sf10 -> sf100 decade with an untested "bloom-build
  * constants stopped amortizing" explanation. This probe times the
  * bloom-pruned join's phases separately on a leg —
  *
  *   count    — the sizing pass over the build side
  *   build    — DataFrameStatFunctions.bloomFilter aggregation (each
  *              task builds a full-width bitmap; the driver ORs them)
  *   probe    — the bloom-filtered probe-side scan alone (count)
  *   join     — the full j8 plan including the join + aggregate
  *
  * and reports the build side's key count against the bloom's sizing
  * (expectedNumItems = exact NDV here, bitSize that falls out of fpp
  * 0.01) so under/over-sizing is visible, plus the probe-side pass
  * rate (bloom selectivity including false positives).
  *
  * Usage: `sbt "runMain graft.tools.BloomProbe /tmp/sf10"`
  */
object BloomProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bloomprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sec[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val urgent = spark.read.parquet(s"$dir/orders.parquet")
      .where(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")

    // warm the scans so phase times measure compute, not first-touch IO
    urgent.count(); lineitem.count()

    val (nKeys, tCount) = sec(urgent.count())
    // the j8 build path itself (optimal sizing, clamp raised) — see
    // BloomJoin.buildBloom's scaladoc for the 2^26-clamp finding
    val (bf, tBuild) = sec(
      graft.operators.BloomJoin.buildBloom(urgent, "o_orderkey", nKeys, 0.01))
    val bcast = spark.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bcast.value.mightContainLong(k))
    val (probeRows, tProbe) = sec(
      lineitem.where(col("l_orderkey").isNotNull && might(col("l_orderkey"))).count())
    val totalRows = lineitem.count()
    val (_, tJoin) = sec(
      graft.queries.Queries.j8_bloom_pruned_join(spark, dir)
        .write.format("noop").mode("overwrite").save())

    val json =
      s"""{"metric":"bloom_probe","sf":"$dir","build_keys":$nKeys,""" +
        s""""bloom_bit_size":${bf.bitSize()},""" +
        s""""count_sec":${f"$tCount%.3f"},"build_sec":${f"$tBuild%.3f"},""" +
        s""""probe_sec":${f"$tProbe%.3f"},"full_j8_sec":${f"$tJoin%.3f"},""" +
        s""""probe_rows_passed":$probeRows,"probe_rows_total":$totalRows,""" +
        s""""pass_rate":${f"${probeRows.toDouble / totalRows}%.4f"}}"""
    println(json)
    spark.stop()
  }
}
