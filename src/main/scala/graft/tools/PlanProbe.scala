package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print plan statistics (file scans, exchanges, reuse) and
  * wall time for one named catalog query. Usage:
  *   sbt "runMain graft.tools.PlanProbe <queryName> [sfDir]"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("g6_gvcf_squareoff")
    val dir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = graft.SparkEntry.queries(name)(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    def n(p: String) = p.r.findAllIn(plan).size
    println(s"[probe] $name scans=${n("FileScan")} exchanges=${n("Exchange")} " +
      s"reusedExchanges=${n("ReusedExchange")} sortMergeJoins=${n("SortMergeJoin")} " +
      s"broadcastJoins=${n("BroadcastHashJoin")} windows=${n("Window")}")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[probe] $name wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
