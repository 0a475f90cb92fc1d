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

  /** embeddings: copy 0 is verbatim (fixed query/seed vectors — vec 0,
    * seeds 1..16 — stay bit-identical), later copies cyclically SHIFT
    * the component order by the copy index. A uniform permutation
    * preserves every within-copy dot product/distance exactly (the
    * dup/neighbor structure the ANN family measures), while cross-copy
    * similarity decorrelates — neighbor counts scale ~N×, not N²×,
    * mirroring the documents vowel-rotation rationale.
    */
  def scaleEmbeddings(df: DataFrame, copies: Int): DataFrame = {
    val stride = df.agg(max("vec_id")).head.getLong(0) + 1
    val dim = df.select(size(col("embedding"))).head.getInt(0)
    val rotated = (0 until copies).foldLeft(lit(null).cast("array<float>")) {
      case (acc, i) =>
        val s = i % dim
        val e =
          if (s == 0) col("embedding")
          else concat(slice(col("embedding"), s + 1, dim - s),
            slice(col("embedding"), 1, s))
        when(col("__copy") === i, e).otherwise(acc)
    }
    explodeCopies(df, copies)
      .withColumn("vec_id", col("vec_id") + col("__copy") * stride)
      .withColumn("embedding", rotated)
      .drop("__copy")
  }

  /** One row per (row, copy) — a generate, not a union of N scans, so
    * the input is read once however large it is.
    */
  private def explodeCopies(df: DataFrame, copies: Int): DataFrame =
    df.withColumn("__copy", explode(sequence(lit(0L), lit(copies - 1L))))

  private def writeSingleFile(df: DataFrame, dest: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("scaleup").resolve("out")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).get
    val target = java.nio.file.Paths.get(dest)
    // a stale directory-layout table at the destination blocks the move
    val old = target.toFile
    if (old.isDirectory) { old.listFiles().foreach(_.delete()); old.delete() }
    else java.nio.file.Files.deleteIfExists(target)
    java.nio.file.Files.move(part.toPath, target)
  }

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
    // documents/embeddings ship as SINGLE FILES like the driver's
    // testdata (the streaming queries stage `<dir>/<table>.parquet` as a
    // file-source path — a nested directory wouldn't be listed)
    writeSingleFile(scaleDocuments(
      spark.read.parquet(s"$in/documents.parquet"), copies), s"$out/documents.parquet")
    writeSingleFile(scaleEmbeddings(
      spark.read.parquet(s"$in/embeddings.parquet"), copies), s"$out/embeddings.parquet")
    println(s"[scaleup] wrote $out at ${copies}x of $in")
    spark.stop()
  }
}
