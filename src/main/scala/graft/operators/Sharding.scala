package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic output sharding + integrity manifest for training-data
  * exports. A training job writes a corpus as N shards and later
  * validates each shard against a manifest (doc count, token count, an
  * order-independent content checksum); the shard id must be a pure
  * function of the document id so re-runs, backfills and multi-engine
  * pipelines agree on placement.
  *
  * Everything here is Column expressions over one partial+final
  * aggregation keyed by the shard id — the md5-ticket assignment is
  * uniform by construction, so shards (and therefore the agg's reduce
  * keys) cannot skew no matter how skewed the corpus is. Content
  * checksums use bit_xor, which is commutative/associative, so the
  * manifest is independent of row order and partitioning — the property
  * that lets a 1000-executor writer and a single-node verifier agree.
  */
object Sharding {

  /** Deterministic shard id in [0, numShards): the same 60-bit md5-prefix
    * ticket the sampling/LSH families use (DuckDB:
    * ('0x' || substring(md5(id), 1, 15))::BIGINT % numShards).
    */
  def shardId(id: Column, numShards: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(numShards.toLong))

  /** 60-bit md5 content fingerprint of one document (non-negative long,
    * both-engine reproducible).
    */
  def contentFp(text: Column): Column =
    conv(substring(md5(text), 1, 15), 16, 10).cast("long")

  /** Corpus with a `shard` column appended. */
  def assignShards(df: DataFrame, idCol: String, numShards: Int): DataFrame =
    df.withColumn("shard", shardId(col(idCol), numShards))

  /** Deterministic train/val/test split: the id's md5 ticket lands in
    * [0, 100) and each named split owns a contiguous percent range
    * (weights must sum to 100). A pure narrow projection — no shuffle,
    * no state, no sampling RNG: the same document lands in the same
    * split on every run, at any partitioning, and under incremental
    * ingest (new docs never move old ones) — the property train/eval
    * separation has to keep, since a doc that migrates across a re-run
    * IS leakage (the kind d6/d14 then have to catch downstream).
    * Hash-bucket splits are stratified in expectation per stratum; the
    * exact-count variant would need a per-stratum rank (a window over a
    * hot key this engine avoids) for a ±0.1% ratio gain nobody needs at
    * corpus scale.
    */
  def splitAssign(df: DataFrame, idCol: String, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split weights must sum to 100 percent, got $splits")
    require(splits.forall(_._2 > 0), s"zero-weight split: $splits")
    val bucket = shardId(col(idCol), 100)
    val bounds = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val assign = splits.init.zip(bounds.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), hi)) =>
        val cond = bucket < hi
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
      }
      .fold(lit(splits.last._1))(_.otherwise(splits.last._1))
    df.withColumn("split", assign)
  }

  /** Per-shard manifest: document count, token/char totals, and the
    * order-independent xor-of-fingerprints checksum. One hash-agg pass;
    * no window, no sort, no driver collection.
    */
  def shardManifest(df: DataFrame, idCol: String, textCol: String, numShards: Int): DataFrame =
    assignShards(df, idCol, numShards)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        bit_xor(contentFp(col(textCol))).as("content_fp"))

  /** Deterministic global training order: each document's contiguous
    * 0-based position in the md5-ticket shuffle order (ties broken by
    * id) — the "epoch shuffle" a training job consumes — WITHOUT the
    * single-reducer trap. The naive `row_number() OVER (ORDER BY tk)`
    * puts the entire corpus through ONE window partition; at 100 TB that
    * is one task. Instead:
    *
    *   1. range-repartition by (ticket, id) into `numBuckets` — Spark's
    *      sampled RangePartitioner, the same machinery behind a global
    *      sort, so bucket b holds a contiguous key range and all of
    *      bucket b's keys precede bucket b+1's;
    *   2. rank WITHIN each bucket (window partitioned by the bucket id —
    *      bounded by ~N/numBuckets rows, never by N);
    *   3. one numBuckets-row count aggregate to the driver computes each
    *      bucket's global offset (metadata, not data — same class as a
    *      parquet footer read), broadcast-joined back.
    *
    * position = within-bucket rank + bucket offset. Total order is
    * (ticket, id), so the result is independent of numBuckets and of
    * where the sampled range boundaries land.
    */
  def trainingOrder(df: DataFrame, idCol: String, numBuckets: Int = 64): DataFrame = {
    val tk = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long"),
      lit(10000L))
    val parted = df.select(col(idCol), tk.as("tk"))
      .repartitionByRange(numBuckets, col("tk"), col(idCol))
      .withColumn("pid", spark_partition_id())
      // referenced twice (offset counts + rank): evaluate the range
      // shuffle once
      .transform(graft.util.Barriers.corpusScale)
    val counts = parted.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (p, c) => val o = (p, acc); acc += c; o }.toSeq
    val spark = df.sparkSession
    val offDf = spark.createDataFrame(offsets).toDF("pid", "off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy("tk", idCol)
    parted
      .withColumn("rn", row_number().over(w).cast("long") - 1L)
      .join(broadcast(offDf), "pid")
      .select(col(idCol), (col("rn") + col("off")).as("position"))
  }
}
