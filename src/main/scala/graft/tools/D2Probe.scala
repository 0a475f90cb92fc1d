package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose d2 (prefix-filtered Jaccard pairs) — how many
  * times does the shingle pass run, and what does each leg cost?
  * A/B: SPARK_GRAFT_D2_CKPT=1 enables the materialized-sets flavor.
  */
object D2Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[d2probe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // the raw shingle pass, forced through noop (count would prune the UDF)
    val mk = udf((toks: Seq[String]) =>
      if (toks.length < 3) Seq.empty[String]
      else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct)
    def sets = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), mk(col("toks")).as("shingles"))
    // warmup
    sets.write.format("noop").mode("overwrite").save()
    time("one shingle pass (noop)") {
      sets.write.format("noop").mode("overwrite").save()
    }
    time("explode+hash pass (noop)") {
      sets.select(col("doc_id"), explode(col("shingles")).as("gs"))
        .select(col("doc_id"), xxhash64(col("gs")).as("g"))
        .write.format("noop").mode("overwrite").save()
    }
    for (r <- 1 to 3) {
      time(s"d2 catalog query (rep $r)") {
        graft.operators.Dedup
          .ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"d15 catalog query (rep $r)") {
        graft.operators.Dedup
          .ngramContainmentPairs(docs, "doc_id", "text", 3, 0.8)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
