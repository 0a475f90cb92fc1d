package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diagnostic: candidate-pair volume of the FuzzyJoin prefix filter per
  * gram width q, on an arbitrary (table, id, str) input — the sizing
  * probe behind the q-selection guidance in [[graft.operators.FuzzyJoin]].
  * Usage: runMain graft.tools.FuzzyProbe <parquet> <idCol> <strCol> <k>
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val Array(path, idCol, strCol, kStr) = args.take(4)
    val k = kStr.toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = spark.read.parquet(path).select(col(idCol).as("id"), col(strCol).as("s"))
    // deletion-neighborhood blocking (what FuzzyJoin ships)
    locally {
      val variants = udf { (s: String) =>
        if (s == null) Array.empty[String]
        else graft.operators.FuzzyJoin.deletionVariants(s, k)
      }
      val vf = c.select(col("id"), explode(variants(col("s"))).as("v"))
      val cand = vf.alias("a")
        .join(vf.alias("b"), col("a.v") === col("b.v") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"))
      val t0 = System.nanoTime
      val n = cand.count()
      val nd = cand.distinct().count()
      println(s"PROBE deletion k=$k candRows=$n candDistinct=$nd sec=${(System.nanoTime - t0) / 1e9}")
    }
    for (q <- Seq(2, 3, 4, 5)) {
      val prefixLen = k * q + 1
      val gt = udf { (s: String) =>
        val grams = if (s.length <= q) Array(s)
          else Array.tabulate(s.length - q + 1)(i => s.substring(i, i + q))
        val seen = new java.util.HashMap[String, Integer]()
        grams.map { g => val n = seen.merge(g, 1, (a, b) => a + b); g + "" + n }
      }
      val toks = c.select(col("id"), explode(gt(col("s"))).as("tok"))
      val freq = toks.groupBy("tok").agg(count(lit(1)).as("f"))
      val prefix = toks.join(freq, "tok")
        .withColumn("rn", row_number().over(
          Window.partitionBy("id").orderBy(col("f"), col("tok"))))
        .where(col("rn") <= prefixLen).select("id", "tok")
      val cand = prefix.as("a")
        .join(prefix.as("b"), col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"))
      val t0 = System.nanoTime
      val n = cand.count()
      val nd = cand.distinct().count()
      println(s"PROBE q=$q prefixLen=$prefixLen candRows=$n candDistinct=$nd sec=${(System.nanoTime - t0) / 1e9}")
    }
    spark.stop()
  }
}
