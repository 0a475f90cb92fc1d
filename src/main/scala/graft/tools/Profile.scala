package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for slow queries (dev tool, not part of the driver
  * contract).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.cache().count()

    // materialized-token shingles (the library's shape)
    val withToks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val toks = col("toks")
    val shingles = array_distinct(
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
    val sets = withToks.select(col("doc_id"), shingles.as("s"))

    time("sets materialize")(sets.count())
    val ex = sets.select(col("doc_id"), size(col("s")).as("n_sh"), explode(col("s")).as("g")).cache()
    time("explode+cache")(ex.count())
    val a = ex.alias("a"); val b = ex.alias("b")
    time("join only (cached ex)")(
      a.join(b, col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id")).count())
    time("join+groupBy (cached ex)")(
      a.join(b, col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1))).count())
    ex.unpersist()
    time("full naive")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    time("full prefix")(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5).count())
    time("full prefix 2nd")(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5).count())
    spark.stop()
  }
}
