package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose the fixed overhead of one streaming catalog row.
  * Times each phase of the canonical memory-sink streaming shape
  * (source construct, start/analysis, processAllAvailable, stop,
  * post-read) and prints the micro-batch progress log — the evidence
  * for where a ~1-2 s/row floor actually goes.
  *
  * Usage: runMain graft.tools.StreamProbe [sfDir] [reps]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    spark.sparkContext.setLogLevel("ERROR")

    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000L

    // the streaming file source wants a directory of ONLY this table's
    // files — stage symlinks the way the catalog queries do
    def staged(table: String): String = {
      val d = java.nio.file.Files.createTempDirectory("sp_" + table)
      java.nio.file.Files.createSymbolicLink(
        d.resolve(table),
        java.nio.file.Paths.get(dir, table).toAbsolutePath)
      d.toString
    }

    for (rep <- 1 to reps) {
      // stateless shape (ev14): quality gate, append, memory sink
      locally {
        var t0 = System.nanoTime()
        val ev = graft.streaming.StreamingOps.readDocuments(
          spark, staged("documents.parquet"))
        val gated = graft.streaming.StreamingOps.qualityGateStream(ev)
        val tCons = ms(t0)
        val name = "sp14_" + rep + "_" + java.lang.Long.toHexString(System.nanoTime())
        t0 = System.nanoTime()
        val q = gated.writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        val tStart = ms(t0)
        t0 = System.nanoTime()
        q.processAllAvailable()
        val tProc = ms(t0)
        t0 = System.nanoTime()
        q.stop()
        val tStop = ms(t0)
        t0 = System.nanoTime()
        spark.table(name).write.format("noop").mode("overwrite").save()
        val tRead = ms(t0)
        val batches = q.recentProgress.map(p =>
          s"${p.batchId}:${p.numInputRows}r/${p.durationMs.getOrDefault("triggerExecution", -1L)}ms").mkString(" ")
        println(s"[stream-probe] rep$rep STATELESS cons=${tCons}ms start=${tStart}ms " +
          s"proc=${tProc}ms stop=${tStop}ms read=${tRead}ms batches=[$batches]")
      }
      // stateful shape (ev3): watermark + windowed agg, complete mode
      locally {
        var t0 = System.nanoTime()
        val counts = graft.streaming.StreamingOps.windowedCounts(
          graft.streaming.StreamingOps.readEvents(spark, staged("events.parquet")))
        val tCons = ms(t0)
        val name = "sp3_" + rep + "_" + java.lang.Long.toHexString(System.nanoTime())
        t0 = System.nanoTime()
        val q = counts.writeStream.outputMode("complete")
          .format("memory").queryName(name).start()
        val tStart = ms(t0)
        t0 = System.nanoTime()
        q.processAllAvailable()
        val tProc = ms(t0)
        t0 = System.nanoTime()
        q.stop()
        val tStop = ms(t0)
        t0 = System.nanoTime()
        spark.table(name).write.format("noop").mode("overwrite").save()
        val tRead = ms(t0)
        val batches = q.recentProgress.map { p =>
          val d = p.durationMs
          s"${p.batchId}:${p.numInputRows}r/trig=${d.getOrDefault("triggerExecution", -1L)}" +
            s"(addBatch=${d.getOrDefault("addBatch", -1L)},getBatch=${d.getOrDefault("getBatch", -1L)}," +
            s"latestOffset=${d.getOrDefault("latestOffset", -1L)},queryPlanning=${d.getOrDefault("queryPlanning", -1L)}," +
            s"commit=${d.getOrDefault("commitOffsets", -1L)}+${d.getOrDefault("walCommit", -1L)})"
        }.mkString(" ")
        println(s"[stream-probe] rep$rep STATEFUL  cons=${tCons}ms start=${tStart}ms " +
          s"proc=${tProc}ms stop=${tStop}ms read=${tRead}ms batches=[$batches]")
      }
    }
    spark.stop()
  }
}
