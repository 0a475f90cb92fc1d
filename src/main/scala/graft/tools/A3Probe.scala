package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** a3_wide_agg mechanism probe (dev tool): the catalog row stepped
  * 20.8x across the sf10->sf100 decade (5.0 s -> 104.0 s) while its
  * plan — scan + filter + 4-group partial/final hash agg — should be
  * the most linear shape in the catalog. Prime suspect: the exact
  * decimal money sums. Spark widens sum(decimal(p,s)) buffers by 10
  * digits (decimal(20,6) products sum into decimal(30,6)), and any
  * decimal wider than 18 digits stops being a mutable fixed-width
  * field in the unsafe agg buffer — every per-row update then
  * serializes/deserializes a JVM BigDecimal instead of adding into a
  * long, and the hash agg abandons its vectorized fast map.
  *
  * Variants timed (same scan, same filter, same groups):
  *  - decimal: the catalog a3 (exact decimal sums)
  *  - double: identical shape, plain double sums (the fast path the
  *    agg would codegen for primitive types)
  *  - cents: exact integer math — price in cents, discount/tax in
  *    integer percent, sums are plain longs (overflow headroom: the
  *    charge term is ~4.4e9 per row scaled by 1e6, 2.6e18 at 600M rows
  *    vs Long.Max 9.2e18; a further decade needs a two-level sum).
  *
  * Usage: runMain graft.tools.A3Probe /tmp/sf10 /tmp/sf100
  *   (SPARK_GRAFT_EXTRA_CONF A/Bs confs, e.g. shuffle partitions)
  */
object A3Probe {

  private def base(spark: SparkSession, leg: String): DataFrame =
    spark.read.parquet(s"$leg/lineitem.parquet")
      .where(col("l_shipdate") <= lit("2000-09-02"))

  def doubleVariant(spark: SparkSession, leg: String): DataFrame = {
    val price = col("l_extendedprice")
    val discF = lit(1.0) - col("l_discount")
    val taxF = lit(1.0) + col("l_tax")
    base(spark, leg)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(price).as("sum_base"),
        sum(price * discF).as("sum_disc_price"),
        sum(price * discF * taxF).as("sum_charge"),
        sum(col("l_discount")).as("sum_disc"),
        count(lit(1)).as("count_order"))
  }

  def centsVariant(spark: SparkSession, leg: String): DataFrame = {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val d = round(col("l_discount") * 100).cast("long")
    val tx = round(col("l_tax") * 100).cast("long")
    base(spark, leg)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents).as("sum_base_c"),
        sum(cents * (lit(100L) - d)).as("sum_disc_price_c4"),
        sum(cents * (lit(100L) - d) * (lit(100L) + tx)).as("sum_charge_c6"),
        sum(d).as("sum_disc_pct"),
        count(lit(1)).as("count_order"))
  }

  /** The pre-r17 catalog formulation: exact decimal sums (widened
    * buffers, BigDecimal per-row updates). Kept as the probe's
    * reference so the cents rewrite's bit-equality stays checkable.
    */
  def decimalVariant(spark: SparkSession, leg: String): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val discF = lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")
    val taxF = lit(1).cast("decimal(3,2)") + col("l_tax").cast("decimal(3,2)")
    base(spark, leg)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("__sq"),
        sum(price).as("__sb"),
        sum(price * discF).as("__sdp"),
        sum(price * discF * taxF).as("__sch"),
        sum(col("l_discount").cast("decimal(3,2)")).as("__sd"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        round(col("__sq"), 2).as("sum_qty"),
        round(col("__sb"), 2).cast("double").as("sum_base"),
        round(col("__sdp"), 2).cast("double").as("sum_disc_price"),
        round(col("__sch"), 2).cast("double").as("sum_charge"),
        round(col("__sq") / col("count_order"), 4).as("avg_qty"),
        round(col("__sb").cast("double") / col("count_order"), 4).as("avg_price"),
        round(col("__sd").cast("double") / col("count_order"), 6).as("avg_disc"),
        col("count_order"))
  }

  def main(args: Array[String]): Unit = {
    val legs = args.toSeq
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-a3-probe")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "catalog" -> ((s, l) => graft.queries.Queries.a3_wide_agg(s, l)),
      "decimal" -> (decimalVariant _),
      "double" -> (doubleVariant _),
      "cents" -> (centsVariant _))
    for (leg <- legs) {
      // the catalog (cents) rewrite must be BIT-identical to the
      // decimal formulation it replaced — on every leg probed
      val got = graft.queries.Queries.a3_wide_agg(spark, leg)
        .orderBy("l_returnflag", "l_linestatus").collect().toSeq
      val want = decimalVariant(spark, leg)
        .orderBy("l_returnflag", "l_linestatus").collect().toSeq
      require(got == want,
        s"[a3-probe] $leg catalog != decimal reference:\n got=$got\nwant=$want")
      println(s"[a3-probe] $leg catalog == decimal reference (bit-identical)")
    }
    for (leg <- legs; (vname, fn) <- variants) {
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, leg).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = run()
      val warm = run()
      println(f"[a3-probe] $leg $vname%-8s cold $cold%8.2f s  warm $warm%8.2f s")
    }
    spark.stop()
  }
}
