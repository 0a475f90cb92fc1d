package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-step generator (dev tool, not part of the driver contract):
  * writes an N×-scaled copy of the tables the heavy bench family reads
  * (`lineitem`, `documents`) so wall-time scaling vs a 10× data step can
  * be measured before a real cluster finds a super-linear surprise.
  *
  * Scaling preserves the semantics each consumer depends on:
  *
  *  - `lineitem`: each copy offsets `l_orderkey` by copy×stride (stride a
  *    multiple of 3, so the orderkey%3 alt-base distribution is
  *    untouched) and keeps every other column verbatim. Read names stay
  *    unique (orderkey is part of the name); contigs/sites are bounded by
  *    the generator's closed form (partkey%1000), so a 10× step scales
  *    COVERAGE DEPTH 10× at fixed site count — the WGS-like regime the
  *    genotyper family must survive.
  *  - `documents`: each copy offsets `doc_id` by copy×stride and
  *    vowel-rotates the text per copy (`translate` through a per-copy
  *    vowel permutation). Length, token structure, and the WITHIN-copy
  *    duplicate/near-dup structure are preserved exactly; across copies
  *    most shingles differ, so the near-dup pair count scales ~N× (as a
  *    real 10× corpus would), not N²× (as verbatim duplication would —
  *    that would benchmark the generator's pathology, not the engine).
  *
  * Usage: `sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10"`
  */
object ScaleUp {

  private val vowels = "aeiou"

  def scaleLineitem(df: DataFrame, copies: Int): DataFrame = {
    val stride = {
      val m = df.agg(max("l_orderkey")).head.getLong(0) + 1
      m + (3 - m % 3) % 3 // next multiple of 3: preserves orderkey%3 mix
    }
    explodeCopies(df, copies)
      .withColumn("l_orderkey", col("l_orderkey") + col("__copy") * stride)
      .drop("__copy")
  }

  def scaleDocuments(df: DataFrame, copies: Int): DataFrame = {
    val stride = df.agg(max("doc_id")).head.getLong(0) + 1
    val rotated = (0 until copies).foldLeft(lit(null).cast("string")) {
      case (acc, i) =>
        val to = (0 until 5).map(j => vowels((j + i) % 5)).mkString
        when(col("__copy") === i, translate(col("text"), vowels, to)).otherwise(acc)
    }
    explodeCopies(df, copies)
      .withColumn("doc_id", col("doc_id") + col("__copy") * stride)
      .withColumn("text", rotated)
      .drop("__copy")
  }

  /** One row per (row, copy) — a generate, not a union of N scans, so
    * the input is read once however large it is.
    */
  private def explodeCopies(df: DataFrame, copies: Int): DataFrame =
    df.withColumn("__copy", explode(sequence(lit(0L), lit(copies - 1L))))

  def main(args: Array[String]): Unit = {
    val in = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scaleLineitem(spark.read.parquet(s"$in/lineitem.parquet"), copies)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    scaleDocuments(spark.read.parquet(s"$in/documents.parquet"), copies)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[scaleup] wrote $out at ${copies}x of $in")
    spark.stop()
  }
}
