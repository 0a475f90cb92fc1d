package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: stage-level timing for g3 — synthetic sloppy-read
  * construction vs the realignment kernel itself.
  */
object G3Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[g3prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // warmup: classloading + codegen
    time("warmup (full g3)")(graft.queries.Queries.g3_realign(spark, dir).count())
    val sloppy = graft.queries.Queries.sloppyReadsForProfile(spark, dir)
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(
        concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("readName"),
        concat(lit("chr"), col("l_returnflag")).as("contigName"),
        ((col("l_partkey") % 1000) * 40).as("start"),
        translate(substring(md5(concat_ws("_", col("l_orderkey"), col("l_linenumber"))), 1, 30),
          "0123456789abcdef", "ACGTACGTACGTACGT").as("ref"))
    time("project (md5+translate) only")(base.count())
    // the PRE-r7 filter form, kept for comparison: SQL higher-order
    // functions (transform + array_distinct) don't codegen and re-eval
    // the inlined md5 projection per lambda call — 22 s vs the typed
    // stage's ~2 s for identical semantics
    val filtered = base.where(
      expr("substring(ref, 13, 1) != substring(ref, 15, 1)") &&
        expr("substring(ref, 28, 1) != substring(ref, 30, 1)") &&
        expr("size(array_distinct(transform(sequence(1, 25), i -> substring(ref, i, 6)))) = 25"))
    time("old SQL HOF filter (comparison)")(filtered.count())
    time("sloppy construction only")(sloppy.count())
    time("sloppy + realign k=6")(graft.genomics.Realigner.realign(sloppy, k = 6).count())
    val pinned = sloppy.localCheckpoint()
    time("realign only (pinned input)")(graft.genomics.Realigner.realign(pinned, k = 6).count())
    spark.stop()
  }
}
