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
    // candidate-set size (r18 positional-filter evidence): replicate the
    // operator's candidate generation up to the distinct, with and
    // without the ppjoin positional bound
    locally {
      val sets0 = sets.localCheckpoint()
      val ex = sets0.select(col("doc_id"), explode(col("shingles")).as("gs"))
        .select(col("doc_id"), xxhash64(col("gs")).as("g"))
      val freq = ex.groupBy("g").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df"), col("g"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      val threshold = 0.5
      val prefix = ex.join(freq, "g")
        .withColumn("rank", row_number().over(w))
        .withColumn("n_sh", count(lit(1)).over(wAll))
        .where(col("rank") <= col("n_sh") - ceil(col("n_sh") * threshold - 1e-7) + 1)
        .select(col("doc_id"), col("g"), col("n_sh"), col("rank"))
      val base = col("pa.g") === col("pb.g") && col("pa.doc_id") < col("pb.doc_id") &&
        least(col("pa.n_sh"), col("pb.n_sh")) >=
          lit(threshold) * greatest(col("pa.n_sh"), col("pb.n_sh")) - 1e-7
      val pos = lit(1) + least(col("pa.n_sh") - col("pa.rank"),
        col("pb.n_sh") - col("pb.rank")) >=
        ceil((col("pa.n_sh") + col("pb.n_sh")) * lit(threshold / (1.0 + threshold)) - 1e-7)
      def candCount(c: org.apache.spark.sql.Column): (Long, Long) = {
        val j = prefix.alias("pa").join(prefix.alias("pb"), c)
          .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
        (j.count(), j.distinct().count())
      }
      val (cBase, cBaseD) = candCount(base)
      val (cPos, cPosD) = candCount(base && pos)
      println(s"[d2probe] candidates: collisions $cBase -> $cPos (positional), " +
        s"distinct pairs $cBaseD -> $cPosD")
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
