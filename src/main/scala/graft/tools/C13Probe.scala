package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch cold-cost bisection for c13 (dev tool). */
object C13Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[c13-probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val changes = graft.queries.Queries.docChanges(docs)
    time("changes only")(changes.write.format("noop").mode("overwrite").save())
    val won = graft.operators.Merge.winners(
      changes, "doc_id", docs.columns.toSeq)
    time("winners only")(won.write.format("noop").mode("overwrite").save())
    val base = docs.where(col("doc_id") % 4 =!= 3)
    val anti = base.join(won.select("doc_id"), Seq("doc_id"), "left_anti")
    time("anti join only")(anti.write.format("noop").mode("overwrite").save())
    val full = graft.operators.Merge.upsert(base, changes, "doc_id")
    time("full upsert cold")(full.write.format("noop").mode("overwrite").save())
    time("full upsert warm")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
