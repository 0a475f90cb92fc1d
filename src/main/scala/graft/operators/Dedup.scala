package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines. Exact dedup is a
  * hash-groupBy; near-dup detection builds shingle sets and self-joins on
  * shared shingles (the inverted-index pattern) so the shuffle is keyed on
  * shingle, never a cartesian pairwise compare — the property that keeps
  * it viable at 100 TB.
  */
object Dedup {

  /** Exact duplicate groups by content fingerprint: one row per distinct
    * fingerprint with its multiplicity and the id to keep (min id —
    * deterministic, unlike dropDuplicates).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** Word n-gram (shingle) sets per document: distinct n-token shingles
    * from single-space tokenization. Documents with fewer than n tokens
    * are dropped.
    */
  private def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    val shingles = array_distinct(
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))
    df.where(size(toks) >= n)
      .select(col(idCol).as("doc_id"), shingles.as("shingles"))
  }

  /** Near-duplicate pairs by n-gram Jaccard similarity >= threshold.
    * Plan shape: explode shingles -> shuffle-join on shingle (inverted
    * index) -> count common shingles per pair -> Jaccard from set sizes.
    * Only pairs sharing >= 1 shingle are ever materialized.
    * Output: doc_a < doc_b, jaccard rounded to 4 places.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val ex = shingleSets(df, idCol, textCol, n)
      .select(col("doc_id"), size(col("shingles")).as("n_sh"), explode(col("shingles")).as("g"))
    val a = ex.alias("a")
    val b = ex.alias("b")
    a.join(b, col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard_raw", col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .where(col("jaccard_raw") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard_raw"), 4).as("jaccard"))
  }

  /** MinHash signatures: k hash functions h_i(x) = (a_i*x + b_i) mod p
    * over shingle hashes (xxhash64). Deterministic seeds.
    * Returns (doc_id, sig: array<long> of length k).
    */
  def minHashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 32): DataFrame = {
    val p = 2147483647L // 2^31-1, Mersenne prime
    val rnd = new scala.util.Random(42)
    val coeffs = Seq.fill(k)((1 + rnd.nextInt(Int.MaxValue - 1)).toLong -> rnd.nextInt(Int.MaxValue).toLong)
    val base = shingleSets(df, idCol, textCol, n)
      .select(col("doc_id"), transform(col("shingles"), s => pmod(xxhash64(s), lit(p))).as("hs"))
    val sigCols = coeffs.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("hs"), h => pmod(h * a + b, lit(p)))).as(s"h$i")
    }
    base.select(col("doc_id"), array(sigCols: _*).as("sig"))
  }

  /** MinHash + LSH candidate pairs: band the signature (bands × rowsPerBand
    * = k), bucket-join on (band, band-hash), then verify candidates with
    * exact signature agreement >= minAgree fraction. Never compares all
    * pairs — candidates come only from shared LSH buckets.
    */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 32,
      bands: Int = 8,
      minAgree: Double = 0.5): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands
    val sigs = minHashSignatures(df, idCol, textCol, n, k)
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          bnd => struct(bnd.as("band"), xxhash64(concat_ws("_", bnd, slice(col("sig"), bnd * rows + 1, lit(rows)))).as("bh"))
        )).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band"), col("b.bh"))
    val l = banded.alias("l")
    val r = banded.alias("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bh") === col("r.bh") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"), col("l.sig").as("sa"), col("r.sig").as("sb"))
      .distinct()
      .withColumn(
        "agree",
        size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), b => b)).cast("double") / k)
      .where(col("agree") >= minAgree)
      .select(col("doc_a"), col("doc_b"), round(col("agree"), 4).as("sig_agreement"))
  }

  /** 64-bit SimHash per document from token hashes: bit j of the simhash
    * is the sign of the sum over tokens of (+1/-1 for bit j of
    * xxhash64(token)). Near-dups then differ in few bits (Hamming).
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = array_distinct(split(col(textCol), " "))
    val hashes = transform(toks, t => xxhash64(t))
    val bitCols = (0 until 64).map { j =>
      // sum of ±1 per token for bit j; sign -> bit j of simhash
      val vote = aggregate(
        hashes,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }
    df.select(col(idCol).as("doc_id"), bitCols.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup pairs within maxHamming bits, LSH-bucketed by
    * 16-bit chunks (a pair within Hamming distance <= 3 of a 64-bit hash
    * must agree on at least one of 4 16-bit chunks — pigeonhole), so the
    * join is an equi-join on chunk value, not a cross join.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "chunking scheme assumes <= 3 for 4 chunks")
    val sh = simHash(df, idCol, textCol)
    val chunkStructs = array((0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL)).as("cv"))
    }: _*)
    val chunked = sh
      .select(col("doc_id"), col("simhash"), explode(chunkStructs).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.chunk"), col("c.cv"))
    val l = chunked.alias("l")
    val r = chunked.alias("r")
    l.join(r, col("l.chunk") === col("r.chunk") && col("l.cv") === col("r.cv") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.simhash").as("ha"), col("r.simhash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
