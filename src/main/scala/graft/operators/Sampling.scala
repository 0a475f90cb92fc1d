package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix operators: deterministic stratified sampling (compose a
  * corpus from per-class fractions) and sequence packing (assign
  * documents to fixed token-budget bins for context-window training).
  * Both are pure Column plans — no UDFs, no randomness: sampling
  * decisions and bin assignments derive from md5 arithmetic and window
  * sums, so any engine reproduces them bit-for-bit and a re-run over
  * grown data keeps prior decisions stable (the property that matters
  * when a 100 TB corpus is sampled incrementally).
  */
object Sampling {

  /** 0..9999 deterministic ticket from the md5 of the id — the same
    * 60-bit md5-prefix trick the LSH family uses, as a pure Column
    * (DuckDB: ('0x' || substring(md5(id), 1, 15))::BIGINT % 10000).
    */
  private def ticket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(10000L))

  /** Keep each row iff its id-ticket falls under its class's fraction.
    * Unlisted classes default to `defaultFraction`. Per-class keep rates
    * concentrate tightly around the fractions (the ticket is uniform),
    * and membership is stable across runs and engines.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      classCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    val cut = fractions.foldLeft(lit(defaultFraction)) { case (els, (cls, f)) =>
      when(col(classCol) === cls, lit(f)).otherwise(els)
    }
    df.where(ticket(col(idCol)) < cut * 10000.0)
  }

  /** Temperature-based source re-weighting — the multi-source pretraining
    * mix rule (target share q_i ∝ p_i^alpha: alpha < 1 upweights rare
    * sources, alpha = 1 keeps natural proportions): keep each document
    * deterministically with probability a_i = min(1, K·q_i/n_i), where
    * n_i is the source's document count and K = targetFraction·N the
    * output budget. Two tiny aggregations (per-source counts, then the
    * normalizer over the handful of sources) joined back onto the
    * corpus — no randomness, no driver action; the same md5 ticket as
    * [[stratifiedSample]] makes membership stable across runs, engines,
    * and incremental corpus growth.
    *
    * Cross-engine exactness: per-source weights are INTEGER-scaled
    * (floor(n^alpha · 2^20)) and every remaining operation is IEEE
    * correctly-rounded (sqrt — used for alpha = 0.5 — add, multiply,
    * divide of exact integers), so the acceptance cutoffs are
    * bit-identical in any engine and summation order cannot flip a
    * boundary ticket. General alpha goes through pow(), which is NOT
    * correctly rounded — fine in one engine, but pin alpha = 0.5 when an
    * external system must reproduce the sample bit-for-bit.
    */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      alpha: Double = 0.5,
      targetFraction: Double = 0.5): DataFrame = {
    val counts = df.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w",
        floor((if (alpha == 0.5) sqrt(col("__n")) else pow(col("__n"), alpha)) *
          lit(1048576.0)).cast("long"))
    val norm = counts.agg(
      sum(col("__n")).as("__nn"), sum(col("__w")).as("__z"))
    val acc = counts.crossJoin(broadcast(norm))
      .select(col("__src"),
        least(lit(1.0),
          (floor(lit(targetFraction) * col("__nn")) * col("__w")).cast("double") /
            (col("__z") * col("__n")).cast("double")).as("__acc"))
    df.join(acc, df(sourceCol) === acc("__src"))
      .where(ticket(col(idCol)) < col("__acc") * 10000.0)
      .drop("__src", "__acc")
  }

  /** Per-key document cap — "at most K docs per domain", the crawl
    * policy that stops one hot site from dominating a corpus. Keeps the
    * K rows with the smallest (md5 ticket, id) per key, so membership is
    * deterministic, engine-reproducible, and ticket-random rather than
    * id-ordered.
    *
    * SKEW: per-key top-K via [[BoundedTopKAgg]] — a bounded-buffer typed
    * Aggregator that runs partial+final with map-side combine, so a
    * 10^9-doc domain costs K per partition, never a window that lands
    * the whole domain on one reducer. The kept-id set (<= K per key) is
    * exploded and semi-joined back; Catalyst/AQE broadcast it when
    * small.
    */
  /** Fractional-epoch upsampling — the mixture-weights rule multi-source
    * pretraining uses (e.g. 2.3 epochs of wiki, 0.5 of web): each row is
    * replicated floor(e) times plus one more iff its ticket falls under
    * the fractional part, so a class with e = 2.3 contributes each doc 2
    * or 3 times and EXACTLY the expected 2.3x in aggregate expectation;
    * e < 1 degrades to deterministic downsampling. Epochs are given in
    * integer CENTI-epochs (230 = 2.30) so the fraction compare is pure
    * integer math, exact in any engine.
    *
    * The ticket is salted (md5 of "id:epoch") so the extra-copy choice is
    * independent of [[stratifiedSample]]/split membership — an unsalted
    * ticket would hand the extra epoch systematically to the same docs a
    * 90% split keeps. A `copy_idx` column (1..n) distinguishes replicas
    * so downstream shuffles/packing don't collapse them.
    *
    * Scale: pure narrow plan — a CASE over the class column, one salted
    * md5, explode of a <=ceil(max e)-element sequence. No shuffle, no
    * state; replication factor is bounded by the weights, never by data.
    */
  def epochUpsample(
      df: DataFrame,
      idCol: String,
      classCol: String,
      centiEpochs: Map[String, Int],
      defaultCentiEpochs: Int = 100): DataFrame = {
    require((centiEpochs.values ++ Seq(defaultCentiEpochs)).forall(_ >= 0),
      s"negative epochs: $centiEpochs / $defaultCentiEpochs")
    val ec = centiEpochs.foldLeft(lit(defaultCentiEpochs)) { case (els, (cls, e)) =>
      when(col(classCol) === cls, lit(e)).otherwise(els)
    }
    val saltedTicket = pmod(
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":epoch"))), 1, 15),
        16, 10).cast("long"),
      lit(100L))
    // NB Spark's `/` is double division; floor() recovers the integer
    // quotient exactly (centi-epoch magnitudes are far below 2^53)
    val n = floor(ec.cast("long") / lit(100L)).cast("long") +
      when(saltedTicket < pmod(ec.cast("long"), lit(100L)), lit(1L)).otherwise(lit(0L))
    // sequence(1, 0) would DESCEND in Spark, so zero-copy rows must take
    // the empty-array branch (explode then emits nothing for them)
    df.withColumn("copy_idx",
      explode(when(n >= 1L, sequence(lit(1L), n))
        .otherwise(array().cast("array<bigint>"))))
  }

  def capPerKey(df: DataFrame, idCol: String, keyCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val agg = new BoundedTopKAgg(k)
        val kept = df
          .select(col(keyCol).cast("string").as("__key"),
            ticket(col(idCol)).as("__tk"), col(idCol).cast("long").as("__id"))
          .as[(String, Long, Long)]
          .groupByKey(_._1)
          .mapValues(t => (t._2, t._3))
          .agg(agg.toColumn.name("top"))
          .flatMap { case (_, top) => top.map(_._2) }
          .toDF("__kept_id")
        df.join(kept, col(idCol).cast("long") === col("__kept_id"), "left_semi")
      case _ =>
        // string ids (UUIDs — common in crawl corpora): same bounded
        // top-K, (ticket, id-string) ordering as the deterministic
        // tie-break. Was a silent long-cast collapse before r7.
        val agg = new BoundedTopKStringAgg(k)
        val kept = df
          .select(col(keyCol).cast("string").as("__key"),
            ticket(col(idCol)).as("__tk"), col(idCol).cast("string").as("__id"))
          .as[(String, Long, String)]
          .groupByKey(_._1)
          .mapValues(t => (t._2, t._3))
          .agg(agg.toColumn.name("top"))
          .flatMap { case (_, top) => top.map(_._2) }
          .toDF("__kept_id")
        df.join(kept, col(idCol).cast("string") === col("__kept_id"), "left_semi")
    }
  }

  /** Pack documents into fixed token-budget bins, sharded for
    * parallelism: each document lands in the shard `md5(id) % shards`,
    * and within a shard (processed in id order) its bin is
    * floor(start_offset / budget) of the running token cumsum — the
    * deterministic streaming-pack rule (a document may straddle a
    * boundary; the trainer truncates or rolls it, but the ASSIGNMENT is
    * reproducible). Each shard packs independently — the whole plan is
    * one window over (shard, id), which scales as shards × window sort,
    * no global ordering anywhere.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budgetTokens: Long,
      shards: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
    df.select(
      col(idCol).as("doc_id"),
      pmod(conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long"),
        lit(shards.toLong)).as("shard"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tokens")) / budgetTokens))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("bin"))
  }

  /** Sliding-window document chunking: split each document into
    * `window`-token chunks every `stride` tokens (overlapping when
    * stride < window, the standard context-window prep for training).
    * Chunk starts run 0, stride, 2·stride… while < n_tokens; the final
    * chunk may be short. Kernel UDF builds the chunk list once per
    * document (the explode-input re-evaluation pathology documented at
    * Dedup.shingleSets applies identically here); the whole op is
    * narrow — no shuffle, embarrassingly scan-parallel.
    */
  /** MEMORY: the chunk list materializes per ROW before the explode, so
    * a document costs O(n_tokens × window / stride) heap at once —
    * overlap (stride < window) multiplies the text by window/stride. At
    * sane strides that's a small constant; a stride-1 config over a
    * mega-document is a per-row OOM. Rows whose estimated expansion
    * crosses `warnChunkTokens` bump the `chunkDocuments.megaDocs`
    * accumulator ([[lastMegaDocs]]) and log once per task — the same
    * observability pattern HardLimiter uses for hot partitions.
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int,
      warnChunkTokens: Long = 32L << 20): DataFrame = {
    require(window >= 1 && stride >= 1)
    val megaAcc = df.sparkSession.sparkContext.longAccumulator("chunkDocuments.megaDocs")
    lastMegaDocs = Some(megaAcc)
    // deserialized per task closure -> at most one WARN per task; the
    // accumulator still counts every offending document
    val warned = new java.util.concurrent.atomic.AtomicBoolean(false)
    val mk = udf((toks: Seq[String]) =>
      if (toks == null) Seq.empty[String]
      else {
        val est = (toks.length.toLong / stride + 1) * math.min(window.toLong, toks.length.toLong)
        if (est > warnChunkTokens) {
          megaAcc.add(1)
          if (warned.compareAndSet(false, true))
            org.slf4j.LoggerFactory.getLogger("graft.operators.Sampling").warn(
              s"chunkDocuments: ~$est chunk tokens materialize for ONE document " +
                s"(n_tokens=${toks.length}, window=$window, stride=$stride); " +
                "raise the stride or pre-split mega-documents")
        }
        (0 until toks.length by stride)
          .map(s => toks.slice(s, s + window).mkString(" "))
      })
    df.select(col(idCol).as("doc_id"), mk(split(col(textCol), " ")).as("chunks"))
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(split(col("chunk_text"), " ")).cast("long").as("n_tokens"),
        col("chunk_text"))
  }

  /** Accumulator from the most recent chunkDocuments plan (test hook /
    * post-run observability): documents whose chunk expansion crossed
    * the warn threshold.
    */
  @volatile private[graft] var lastMegaDocs:
      Option[org.apache.spark.util.LongAccumulator] = None

  /** Weighted sampling WITHOUT replacement, n per stratum — the
    * Efraimidis–Spirakis exponential-key rule: each row ranks by
    * ln(u) / w for a uniform ticket u (higher weight → key closer to
    * 0 → likelier into the sample), and the top-n keys per stratum ARE
    * a weighted sample without replacement. u comes from the md5 of
    * the id, not an RNG, so membership is deterministic, engine-
    * replayable, and stable as the corpus grows — and selection runs
    * as a bounded-buffer typed aggregation (partial+final, n-row state
    * per stratum), not a window over the stratum: a 100 TB stratum
    * never sorts.
    *
    * Non-positive (and null) weights are filtered out: the Efraimidis-
    * Spirakis key is only defined for w > 0, and "weight 0" means zero
    * probability mass — without the filter, ln(u)/0 = -Inf (or NaN when
    * the ticket maxes out at u = 1) and NaN ranks FIRST in the top-k
    * buffer, so a zero-weight row would deterministically steal a
    * sample slot from every positive-weight row.
    */
  /** Per-stratum token-budget head-fill (C17): keep the highest-priority
    * documents of each stratum until their token mass covers `budget` —
    * "take the best docs until 10B tokens per domain", the data-recipe
    * materialization step. The document that CROSSES the budget is kept
    * (minimal head covering the budget), so selection is a deterministic
    * set: priority desc, then id asc inside a priority tie.
    *
    * The naive plan sorts every stratum end-to-end (a per-source global
    * sort of the corpus). This one never does: priorities are discrete,
    * so a (stratum, priority) HISTOGRAM — tiny: |strata| × |distinct
    * priorities| — locates each stratum's cutoff bucket with one window
    * over the histogram. Buckets strictly inside the budget pass whole
    * (no ordering needed), buckets past it drop whole, and only the ONE
    * boundary bucket per stratum — budget-bucket-sized, not
    * corpus-sized — resolves row-by-row with an id-ordered cumsum.
    * Equivalence to the full-sort contract is spec-pinned.
    *
    * Output: `stratum, doc_id, prio, n_tokens` — the kept set.
    */
  def tokenBudgetFill(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      priorityCol: String,
      tokens: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    import org.apache.spark.sql.expressions.Window
    val d = df.select(col(stratumCol).as("stratum"), col(idCol).as("doc_id"),
      col(priorityCol).cast("long").as("prio"), tokens.cast("long").as("n_tokens"))
    val hw = Window.partitionBy("stratum").orderBy(col("prio").desc)
    val cut = d.groupBy("stratum", "prio").agg(sum("n_tokens").as("btoks"))
      .withColumn("cum", sum(col("btoks")).over(hw))
      .withColumn("cum_before", col("cum") - col("btoks"))
      .where(col("cum_before") < budget)
      .select(col("stratum"), col("prio"), col("cum_before"),
        (col("cum") <= budget).as("full"))
    val joined = d.join(broadcast(cut), Seq("stratum", "prio"))
    val fullRows = joined.where(col("full"))
      .select("stratum", "doc_id", "prio", "n_tokens")
    // boundary buckets only: one bucket per stratum, id-ordered cumsum
    val pw = Window.partitionBy("stratum").orderBy("doc_id")
    val partRows = joined.where(!col("full"))
      .withColumn("start",
        col("cum_before") + sum(col("n_tokens")).over(pw) - col("n_tokens"))
      .where(col("start") < budget)
      .select("stratum", "doc_id", "prio", "n_tokens")
    fullRows.unionByName(partRows)
  }

  /** DSIR-style importance resampling (C18) — select raw-corpus
    * documents whose hashed-n-gram distribution best matches a TARGET
    * domain (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): fit bag-of-hashed-unigram multinomials
    * for the target slice and the raw corpus (Laplace +1 smoothing over
    * `buckets` hash buckets), score every document by its summed
    * per-occurrence log importance ratio, keep the top `k`.
    *
    * Determinism across engines (the t15/t19 discipline): the per-BUCKET
    * log-ratio is quantized once to an integer micro-nat value
    * (`floor(lr·1e6 + 0.5)` — `buckets` float ops total, not one per
    * occurrence), and each document's score is then an exact integer
    * sum, order-independent. Selection ties break on doc id.
    *
    * Scale shape: one gram explode + one (bucket) aggregation over the
    * corpus; the bucket table (|buckets| rows) broadcasts back; top-k is
    * `TakeOrderedAndProject` (per-partition heads, no global sort). The
    * bucket-total "collect" is a broadcast crossJoin of a 1-row
    * aggregate — no driver state at all.
    */
  def dsirResample(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 256,
      k: Int = 200): DataFrame = {
    val ts = filter(
      split(regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +"),
      t => t =!= "")
    // the hashed-unigram table is referenced by THREE subtrees (the
    // bucket stats feed both the totals and the log-ratio frame, and
    // the per-doc scoring join reads it again) — without a barrier the
    // regex-tokenize + per-token md5 pass over the corpus runs 3x.
    // Materialize once: (id, flag, 8-byte bucket) rows are far cheaper
    // to store than to recompute (same fingerprint-once trade as d2).
    val g = df
      .select(col(idCol), isTarget.as("is_tgt"), explode(ts).as("gm"))
      .select(col(idCol), col("is_tgt"),
        pmod(conv(substring(md5(col("gm")), 1, 15), 16, 10).cast("long"),
          lit(buckets.toLong)).as("b"))
      .transform(graft.util.Barriers.corpusScale)
    val stats = g.groupBy("b").agg(
      count(lit(1)).as("raw_n"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tgt_n"))
    val tot = stats.agg(sum("raw_n").as("rtot"), sum("tgt_n").as("ttot"))
    val lr = stats.crossJoin(broadcast(tot)).select(col("b"),
      floor((log(col("tgt_n") + 1) - log(col("ttot") + buckets)
        - log(col("raw_n") + 1) + log(col("rtot") + buckets)) * 1e6
        + 0.5).cast("long").as("lr"))
    g.join(broadcast(lr), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("lr")).as("dsir_score"))
      .orderBy(col("dsir_score").desc, col(idCol))
      .limit(k)
  }

  def weightedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      weightCol: String,
      n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // u = (h60 + 1) / 2^60 in (0, 1]; es = ln(u) / w in (-inf, 0]
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val keyed = df.where(col(weightCol).cast("double") > 0)
      .select(col(stratumCol).cast("string").as("stratum"),
      col(idCol).cast("long").as("id"),
      (log((h + lit(1L)).cast("double") / lit(1152921504606846976.0)) /
        col(weightCol).cast("double")).as("es"))
    val agg = new BoundedTopKByScoreAgg(n)
    keyed.as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._3, t._2))
      .agg(agg.toColumn.name("top"))
      .flatMap { case (s, top) => top.map { case (k, id) => (s, id, k) } }
      .toDF("stratum", "doc_id", "es_key")
      .withColumn("es_key", round(col("es_key"), 6))
  }
}
