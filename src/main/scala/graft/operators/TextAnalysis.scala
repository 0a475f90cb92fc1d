package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All are
  * pure Column expressions (codegen'd by Catalyst — no UDFs), so they
  * stay inside WholeStageCodegen and push no data to the driver.
  */
object TextAnalysis {

  /** Whitespace token count: number of maximal non-space runs. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** Tokens split on single spaces (matches DuckDB string_split). */
  def tokens(text: Column): Column = split(text, " ")

  /** Count of tokens equal to `word`. */
  def wordCount(text: Column, word: String): Column =
    size(filter(tokens(text), t => t === word))

  /** Non-whitespace character count. */
  def alphaChars(text: Column): Column =
    length(regexp_replace(text, "\\s+", ""))

  /** Mean token length, rounded. */
  def avgTokenLen(text: Column, scale: Int = 4): Column =
    round(alphaChars(text).cast("double") / tokenCount(text), scale)

  /** Ratio of stopword tokens, rounded. */
  def stopwordRatio(text: Column, stopwords: Seq[String], scale: Int = 4): Column =
    round(
      size(filter(tokens(text), t => t.isInCollection(stopwords))).cast("double") /
        tokenCount(text),
      scale)

  /** Marker words per language, in priority order (ties resolve to the
    * earlier language). N-gram-free heuristic language ID: argmax of
    * marker-token counts.
    */
  val langMarkers: Seq[(String, String)] =
    Seq("en" -> "the", "de" -> "der", "es" -> "el", "fr" -> "le", "zh" -> "的")

  /** Heuristic language ID: the language whose marker token occurs most
    * (ties go to the earlier entry in `langMarkers`).
    */
  def langId(text: Column): Column = {
    val counts = langMarkers.map { case (lang, w) => lang -> wordCount(text, w) }
    // nested when-chain: lang_i wins iff its count >= all later counts
    val initial: Column = lit(counts.last._1)
    counts.dropRight(1).reverse.foldLeft(initial) { case (els, (lang, c)) =>
      val laterCounts = counts.dropWhile(_._1 != lang).tail.map(_._2)
      when(laterCounts.map(c >= _).reduce(_ && _), lang).otherwise(els)
    }
  }

  /** Deterministic document fingerprint: md5 of whitespace-normalized,
    * lowercased text. Identical to DuckDB's md5 over the same transform,
    * so exact-dedup results are oracle-checkable.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Per-document top-k terms by TF-IDF (tf * ln(N/df)): the corpus
    * keyword extractor a training-data pipeline uses for topical
    * filtering and index features.
    *
    * Plan shape: explode -> (doc, term) count (one shuffle, partial+
    * final) -> term document frequencies (aggregated FROM the tf table,
    * so the second shuffle carries one row per distinct (doc, term), not
    * per token) -> broadcast the scalar N -> window top-k per doc.
    * Ranking uses the ROUNDED score (+ term as tie-break) so the rank is
    * reproducible bit-for-bit by any SQL engine — ties in raw doubles
    * are exact ties here (same tf, df), but rounding first removes any
    * cross-engine last-ulp sensitivity of ln().
    */
  /** Repetition / boilerplate signals — the Gopher-style quality rules a
    * pretraining pipeline cuts on: fraction of repeated token
    * occurrences, weight of the single most frequent token, and the same
    * two signals over bigrams (machine-generated and boilerplate text
    * scores high on all four; docs with no bigram emit null bigram
    * ratios).
    *
    * Plan shape: one partial+final count per (doc, gram), then one
    * partial+final per-doc rollup — two bounded shuffles per gram order,
    * no windows, no driver state; a mega-document's grams still combine
    * map-side.
    */
  def repetitionSignals(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      scale: Int = 4): org.apache.spark.sql.DataFrame = {
    // Every signal is a PER-DOCUMENT statistic of the doc's own token
    // multiset, so nothing here needs a shuffle: total = array size,
    // distinct = size(array_distinct), and the top gram count = the
    // longest equal-run of the SORTED array (exact mode count). The
    // former plan shuffled the exploded corpus through two
    // (doc_id, gram) aggregations plus a join — two corpus-token-volume
    // exchanges (guide §2.4: remove shuffles outright) for values each
    // row can compute alone in O(n log n). Counts are integer-exact
    // either way, so the rounded ratios are bit-identical.
    val base = df.select(col(idCol).as("doc_id"),
      filter(tokens(col(textCol)), t => t =!= "").as("toks"))
      .where(size(col("toks")) >= 1)
    // longest equal-run of a sorted array = exact max multiplicity;
    // single fold over indices 2..n carrying (current run, best run)
    def maxRun(sorted: Column): Column =
      when(size(sorted) <= 1, size(sorted).cast("long")).otherwise(
        aggregate(
          sequence(lit(2), size(sorted)),
          struct(lit(1L).as("cur"), lit(1L).as("best")),
          (acc, i) => {
            val cur = when(element_at(sorted, i) === element_at(sorted, i - 1),
              acc.getField("cur") + 1L).otherwise(lit(1L))
            struct(cur.as("cur"),
              greatest(acc.getField("best"), cur).as("best"))
          },
          acc => acc.getField("best")))
    def ratios(arr: Column, sorted: Column, pfx: String): Seq[Column] = {
      val total = size(arr).cast("double")
      val dup = round(lit(1.0) - size(array_distinct(arr)) / total, scale)
      val top = round(maxRun(sorted) / total, scale)
      // empty array (e.g. single-token docs have no bigrams) -> nulls,
      // matching the former plan's left-join-miss semantics
      Seq(when(size(arr) >= 1, dup).as(s"dup_${pfx}_ratio"),
        when(size(arr) >= 1, top).as(s"top_${pfx}_ratio"))
    }
    val bis = zip_with(
      slice(col("toks"), lit(1), size(col("toks")) - 1),
      slice(col("toks"), lit(2), size(col("toks")) - 1),
      (a, b) => concat_ws(" ", a, b))
    // the sorted arrays MUST be materialized attributes before maxRun:
    // the fold's lambda dereferences them per element, and an inlined
    // array_sort expression re-sorts the array once per element_at
    // (O(n² log n)/doc — measured 23 s vs 1.4 s at sf0.1; same trap as
    // the shingleIndex PERF NOTE). Multiple references below keep
    // CollapseProject from re-inlining them.
    base
      .withColumn("bis", bis)
      .withColumn("toks_s", array_sort(col("toks")))
      .withColumn("bis_s", array_sort(col("bis")))
      .select(col("doc_id") +: (ratios(col("toks"), col("toks_s"), "token") ++
        ratios(col("bis"), col("bis_s"), "bigram")): _*)
  }

  def tfIdfTopTerms(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      scale: Int = 4): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
      .where(col("term") =!= "")
    // (doc, term) table read by the df table, the corpus-size scalar and
    // the scoring join — one corpus tokenize+agg instead of three;
    // distinct-terms-per-doc bounded (Heaps-sublinear)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .transform(graft.util.Barriers.corpusScale)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = tf.agg(countDistinct(col("doc_id")).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), scale))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rk"))
  }

  /** BM25 keyword retrieval: top-k documents for a bag-of-terms query —
    * the sparse-retrieval complement to the dense ANN family (e1/e2):
    * same serving job, inverted-frequency scoring instead of vector
    * distance. k1 = 1.2, b = 0.75 (the standard Robertson constants).
    *
    * Scale shape: the token explode prunes to the query terms BEFORE
    * the tf aggregation (a |query|-literal isin filter at the scan), so
    * the per-doc state is bounded by |query|; doc lengths aggregate
    * once; df and the corpus stats are broadcast scalars; top-k is
    * TakeOrderedAndProject on the total (score, doc) order.
    *
    * Engine-exactness: per-term contributions are computed in an
    * explicitly-ordered double expression (every int operand cast
    * before the float op, matching the DuckDB oracle token for token),
    * then fixed to integer 1e-4 units per TERM — summing longs is
    * associative, so the per-doc score is independent of aggregation
    * order, where a double sum would not be.
    */
  def bm25TopK(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k: Int): org.apache.spark.sql.DataFrame =
    bm25Contribs(df, idCol, textCol, query)
      .groupBy("doc_id")
      .agg(sum(col("c10k")).as("score_x10k"), count(lit(1)).as("n_hit"))
      .orderBy(col("score_x10k").desc, col("doc_id"))
      .limit(k)

  /** Per-(doc, term) integer contributions for the union of query
    * terms — the shared kernel of the single-query and batched rankers.
    */
  private def bm25Contribs(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
      .where(col("term") =!= "")
    // doc-bounded length table, read by the corpus stats AND the scoring
    // join — one corpus tokenize for it instead of two
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .transform(graft.util.Barriers.corpusScale)
    // 1-row corpus stats: N docs and summed length (avgdl = sl/nd)
    val stats = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sl"))
    val tf = toks.where(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(((col("nd") - col("df")).cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))
      .withColumn("tfp",
        (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) *
              (col("dl").cast("double") /
                (col("sl").cast("double") / col("nd").cast("double"))))))
      .withColumn("c10k", round(col("idf") * col("tfp") * 10000, 0).cast("long"))
      .select("doc_id", "term", "c10k")
  }

  /** Batched BM25 serving — the sparse twin of the batched dense ANN
    * (e9): N queries answered in ONE corpus pass. The tf aggregation
    * runs once over the UNION of all query terms (df stays per-term, so
    * scores are identical to the one-query ranker); the tiny (qid,
    * term) table broadcasts onto the contributions; per-query top-k via
    * the bounded typed agg, never a window over docs.
    */
  def bm25BatchTopK(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Long, Seq[String])],
      k: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val qdf = queries.flatMap { case (qid, ts) => ts.distinct.map(qid -> _) }
      .toDF("qid", "term")
    // hit-bounded score table, read by the typed top-k AND the join that
    // attaches scores to the winners — one contribution chain, not two
    val scored = bm25Contribs(df, idCol, textCol, allTerms)
      .join(broadcast(qdf), "term")
      .groupBy("qid", "doc_id")
      .agg(sum(col("c10k")).as("score_x10k"), count(lit(1)).as("n_hit"))
      .transform(graft.util.Barriers.corpusScale)
    val agg = new BoundedTopKByScoreAgg(k)
    val top = scored.select(col("qid"), col("doc_id"), col("score_x10k"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._3.toDouble, t._2))
      .agg(agg.toColumn.name("top"))
      .flatMap { case (qid, tops) => tops.map { case (_, d) => (qid, d) } }
      .toDF("qid", "doc_id")
    top.join(scored, Seq("qid", "doc_id"))
      .select(col("qid"), col("doc_id"), col("score_x10k"), col("n_hit"))
  }

  // ---- PII detection / redaction ---------------------------------------
  // The scrub step every shareable training corpus needs. Patterns stay
  // in the regex subset Java and RE2 evaluate identically (no
  // backreferences/lookaround), so the DuckDB oracle reproduces them.

  /** RFC-ish email addresses. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 addresses. */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Long bare digit runs (phone/account-number shaped); 7..15 digits,
    * so IPv4 octets (1-3 digits) never double-match.
    */
  val DigitRunPattern = "\\b\\d{7,15}\\b"

  /** Occurrences of one PII pattern (codegen'd; no UDF). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  // ---- URL analysis ----------------------------------------------------
  // Web-corpus provenance ops (host/domain blocking, per-domain caps).
  // Regex-only (no engine-specific parse_url), Java/RE2-identical.

  /** Host (authority minus port/userinfo) of an absolute URL. */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1)

  /** Registrable-domain approximation: the host's last two labels
    * (public-suffix lists are a lookup table upgrade, not a shape
    * change).
    */
  def urlDomain(url: Column): Column =
    regexp_extract(urlHost(url), "([^.]+\\.[^.]+)$", 1)

  /** Redact emails -> <EMAIL>, IPv4 -> <IP>, digit runs -> <NUM>, in
    * that order (emails first so their local-part digits don't surface
    * as digit runs).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      DigitRunPattern, "<NUM>")

  // ---- Composite quality gate -------------------------------------------

  /** Gopher/C4-style composite quality gate WITH provenance: each rule is
    * a named boolean column, `fail_mask` packs them (bit i set = rule i
    * failed), and `keep` is mask==0 — so a cleaning pipeline can report
    * WHY each document was dropped, not just that it was (per-rule drop
    * rates are the monitoring signal a production filter ships).
    *
    * All rules are integer arithmetic over single-space tokenization
    * (`sum_wordlen*10 < n*25` instead of `mean < 2.5`), so the decisions
    * are exactly reproducible in any SQL engine — no float rounding at
    * rule boundaries. Pure Column expressions; the higher-order
    * filter/exists lambdas evaluate once per document (no explode
    * fan-out), and the whole gate is a single projection: zero shuffles,
    * trivially scan-parallel at any corpus size.
    *
    * Rule bits: 0 too-short, 1 too-long, 2 mean-word-length out of
    * [2.5, 10], 3 stopword ratio < 2%, 4 distinct-token ratio < 30%
    * (boilerplate/repetition), 5 any token longer than 25 chars
    * (markup/binary junk).
    */
  def qualityRules(
      text: Column,
      minTokens: Int = 50,
      maxTokens: Int = 50000,
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")): Seq[(String, Column)] = {
    val toks = split(text, " ")
    // null text -> 0 tokens, so it fails r_too_short instead of sailing
    // through the gate with every rule three-valued away to false
    val n = coalesce(size(toks).cast("long"), lit(0L))
    // tokens are single-space-joined, so total word chars = len - (n-1)
    val sumLen = (coalesce(length(text), lit(0)) - (n - lit(1L))).cast("long")
    val stopN = coalesce(
      size(filter(toks, t => t.isin(stopwords: _*))).cast("long"), lit(0L))
    val uniqN = coalesce(size(array_distinct(toks)).cast("long"), lit(0L))
    Seq(
      "r_too_short" -> (n < minTokens),
      "r_too_long" -> (n > maxTokens),
      "r_word_len" -> (sumLen * 10 < n * 25 || sumLen > n * 10),
      "r_low_stopword" -> (stopN * 100 < n * 2),
      "r_repetitive" -> (uniqN * 100 < n * 30),
      "r_mega_word" -> exists(toks, t => length(t) > 25))
  }

  /** `fail_mask` for [[qualityRules]]: bit i set = rule i failed. */
  def qualityFailMask(rules: Seq[(String, Column)]): Column =
    rules.zipWithIndex
      .map { case ((_, r), i) => when(r, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ + _)

  /** CCNet-style language-model quality score: bits-per-token of each
    * document under the corpus's own unigram LM (cross-entropy
    * `avg(-log2 p(w))`, `p(w) = count(w)/total`). Documents full of
    * common words score low; rare-word/junk documents score high — the
    * classic perplexity filter, here with the LM estimated from the
    * corpus in the same pass (a pretrained table plugs in as a
    * replacement for `counts`).
    *
    * Fully declarative, three aggs: token counts (partial+final over the
    * Zipf-shaped vocab — hot words like "the" collapse map-side), a
    * 1-row total cross-joined back (broadcast by construction), and the
    * per-doc score agg keyed by doc_id (unique, unskewable). The
    * token→count join's build side is the VOCABULARY, not the corpus —
    * vocabularies grow sublinearly (Heaps' law), so Catalyst/AQE
    * broadcast it at any realistic corpus size.
    */
  def unigramLogPpl(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("w"))
    // vocab-bounded LM table, read by the total AND the scoring join —
    // one corpus aggregation instead of three (each reference re-derived
    // the whole explode+agg chain)
    val counts = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .transform(graft.util.Barriers.corpusScale)
    val total = counts.agg(sum(col("c")).cast("double").as("t"))
    toks.join(counts, "w")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(
          sum((log(col("t")) - log(col("c").cast("double"))) / log(lit(2.0)))
            / count(lit(1)),
          4).as("bits_per_token"))
  }

  /** Interpolated bigram LM perplexity (T19) — the next modeling step
    * up from [[unigramLogPpl]], the CCNet/KenLM filtering shape with
    * context: p(w|prev) = 0.75·p_bigram + 0.25·p_unigram (Jelinek-
    * Mercer interpolation), document-initial tokens score under the
    * unigram alone. Self-scoring the corpus means every observed bigram
    * has a count, so the bigram leg is an equi-join, not a backoff
    * search.
    *
    * Scale: the corpus pays the pair explosion (narrow) and the final
    * doc-keyed agg; every count table is a (sub)vocabulary — unigrams
    * (Heaps-sublinear), observed bigram types, and contexts — so the
    * three count joins build on vocabulary-sized sides, with the 1-row
    * total explicitly broadcast. The pair kernel is a UDF on purpose
    * (the documented explode-over-inline-array pathology).
    */
  def bigramLogPpl(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val mkPairs = udf((ts: Seq[String]) =>
      if (ts == null) Seq.empty[(String, String)]
      else ts.zipWithIndex.map { case (w, i) => (if (i > 0) ts(i - 1) else null, w) })
    val pairs = df.select(col(idCol).as("doc_id"),
        explode(mkPairs(split(col(textCol), " "))).as("p"))
      .select(col("doc_id"), col("p._1").as("prev"), col("p._2").as("w"))
    // ONE (prev, w) aggregation — null prev = doc-initial — feeds every
    // count table: uni(w) = Σ_prev, ctx(prev) = Σ_w over real bigrams,
    // total = Σ (all integer-exact regroupings). Materialized because
    // four subtrees read it; before this the corpus-wide pair kernel
    // (UDF + explode) re-ran FIVE times per query (uni, bi, and their
    // rollups each re-derived it). Bigram-TYPE-bounded (sub-vocab²),
    // not corpus-bounded.
    val pg = pairs.groupBy("prev", "w").agg(count(lit(1)).as("cpw"))
      .transform(graft.util.Barriers.corpusScale)
    val uni = pg.groupBy("w").agg(sum(col("cpw")).as("c"))
    val total = uni.agg(sum(col("c")).cast("double").as("t"))
    val bi = pg.where(col("prev").isNotNull)
      .select(col("prev"), col("w"), col("cpw").as("cb"))
    val ctx = bi.groupBy("prev").agg(sum(col("cb")).as("cc"))
    val pUni = col("c").cast("double") / col("t")
    val p = when(col("prev").isNull, pUni)
      .otherwise(lit(0.75) * (col("cb").cast("double") / col("cc").cast("double")) +
        lit(0.25) * pUni)
    // per-token -log2(p) fixed to integer 1e-4 bit units BEFORE the
    // per-doc sum (the bm25Contribs pattern): double addition is not
    // associative, so a partition-order-dependent double sum could
    // differ from the oracle's ordered sum at the rounding boundary —
    // long sums are exact and order-free. The final per-token average
    // stays INTEGER too: sum_q/n lands on exact x.5 ten-thousandths
    // constantly (integer over integer), and a float round(...,4) there
    // splits across engines (Spark rounds the shortest-decimal
    // rendering, DuckDB the binary value — measured: 3 docs at sf0.1).
    // (2s+n) div (2n) is round-half-up of s/n in exact arithmetic, and
    // k/10000.0 is a correctly-rounded division of exact integers, so
    // both engines produce the identical double.
    // The per-token quantization itself is floor(x + 0.5), NOT round():
    // round() on a double is engine-defined at .5 boundaries (Spark
    // HALF_UPs the shortest-decimal RENDERING, DuckDB the binary value),
    // while floor(x + 0.5) is pure IEEE arithmetic — identical doubles
    // in, identical long out, in every engine. Half-up semantics are
    // preserved for the x >= 0 values -log2(p) produces.
    val bq = floor(-log(p) / log(lit(2.0)) * 10000 + lit(0.5)).cast("long")
    pairs.join(uni, "w")
      .join(bi, Seq("prev", "w"), "left")
      .join(ctx, Seq("prev"), "left")
      .crossJoin(broadcast(total))
      .withColumn("__bq", bq)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        (expr("(2 * sum(__bq) + count(1)) div (2 * count(1))").cast("double") /
          lit(10000.0)).as("bits_per_token"))
  }

  /** First-iteration BPE statistics: corpus-wide counts of adjacent
    * character pairs within words, weighted by word frequency — the
    * argmax is the first merge a BPE vocabulary build would apply
    * (Sennrich et al. 2016; iterate by re-tokenizing with the merged
    * symbol and calling this again).
    *
    * Scale: two partial+final aggs. Word counts shuffle the VOCABULARY
    * (sublinear in corpus, Heaps' law); pair explosion then runs over
    * the distinct vocab — not the corpus — so its cost tracks |vocab| ×
    * avg word length, and corpus size enters only through the first
    * agg's map-side-combined counts. The pair kernel is a UDF on
    * purpose: an inline transform/sequence expression under the explode
    * re-evaluates per output row (the documented shingle pathology).
    */
  def bpePairCounts(df: org.apache.spark.sql.DataFrame, textCol: String, topK: Int)
      : org.apache.spark.sql.DataFrame = {
    val words = df.select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val pairs = udf((w: String) =>
      if (w == null) Seq.empty[String]
      else (0 until w.length - 1).map(i => w.substring(i, i + 2)))
    words.select(explode(pairs(col("w"))).as("pair"), col("wc"))
      .groupBy("pair").agg(sum(col("wc")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
  }

  /** Iterative BPE merge TRAINING (T25): learn the first `merges`
    * byte-pair-encoding merges from the corpus — the vocabulary-build
    * loop itself, where [[bpePairCounts]] is only its first iteration's
    * statistics and `subwordTokenize` (T16) is inference against an
    * already-built vocab.
    *
    * Distributed shape (how real BPE trainers scale, and the same
    * bounded-driver-state pattern as k-means e5/e10):
    *
    *   - the corpus collapses ONCE to a (distinct word, count) table —
    *     Heaps-sublinear in corpus size — `localCheckpoint`ed so the
    *     `merges` iterations never re-scan documents;
    *   - each word is held as a parenthesized token sequence
    *     `(t)(h)(e)`: token boundaries share no characters, so applying
    *     a merge is one `replace(seq, '(a)(b)', '(ab)')` — left-to-right
    *     non-overlapping, exactly BPE's simultaneous-application rule
    *     (`(a)(a)(a)(a)` → `(aa)(aa)`, not the overlap bug a
    *     space-joined encoding has);
    *   - per iteration: adjacent pairs via one `transform` lambda
    *     (codegen'd, no UDF), a partial+final weighted count, and an
    *     argmax `limit(1).collect()` — the only driver state is one
    *     (left, right) pair per iteration, K rows total.
    *
    * Ties break deterministically: highest count, then (left, right)
    * lexicographic. Words are restricted to `[a-z]{2,}` so the
    * parenthesis encoding is injective. Output: one row per learned
    * merge — `merge_rank, left, right, n` (n = weighted pair count at
    * the time of the merge).
    */
  def bpeTrain(df: org.apache.spark.sql.DataFrame, textCol: String,
      merges: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var words = df.select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) >= 2 && col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(regexp_replace(col("w"), "(.)", "($1)").as("seq"), col("wc"))
      .transform(graft.util.Barriers.corpusScale)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var k = 1
    var done = false
    while (k <= merges && !done) {
      val best = words
        .withColumn("toks",
          split(regexp_replace(col("seq"), "^\\(|\\)$", ""), "\\)\\("))
        .select(explode(expr(
          "transform(slice(toks, 1, size(toks) - 1)," +
            " (x, i) -> named_struct('l', x, 'r', toks[i + 1]))")).as("p"),
          col("wc"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((k, l, r, n))
        words = words
          .withColumn("seq",
            expr(s"replace(seq, '($l)($r)', '($l$r)')"))
          .localCheckpoint()
        k += 1
      }
    }
    learned.toSeq.toDF("merge_rank", "left", "right", "n")
      .select(col("merge_rank").cast("int").as("merge_rank"),
        col("left"), col("right"), col("n").cast("long").as("n"))
  }

  /** BPE tokenization with TRAINED merges (T26): apply the first
    * `merges` learned by [[bpeTrain]] and report per-document word and
    * BPE-token totals — the train→apply loop a tokenizer pipeline
    * actually runs (t16's MaxMatch is inference against a piece vocab;
    * this is inference against a learned MERGE LIST).
    *
    * Scale shape: merges apply per DISTINCT word (Heaps-sublinear — the
    * corpus contributes one (doc, word) count aggregation), the K-row
    * merge list is driver state from [[bpeTrain]]'s bounded collects,
    * and the word→token-count lookup joins back broadcast-sized.
    */
  def bpeTokenize(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, merges: Int): org.apache.spark.sql.DataFrame = {
    val learned = bpeTrain(df, textCol, merges).collect()
    val dw = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) >= 2 && col("w").rlike("^[a-z]+$"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("cnt"))
    val words = dw.select("w").distinct()
      .withColumn("seq", regexp_replace(col("w"), "(.)", "($1)"))
    val applied = learned.foldLeft(words) { (acc, row) =>
      val (l, r) = (row.getString(1), row.getString(2))
      acc.withColumn("seq", expr(s"replace(seq, '($l)($r)', '($l$r)')"))
    }
    val tok = applied.select(col("w"),
      size(split(regexp_replace(col("seq"), "^\\(|\\)$", ""), "\\)\\("))
        .cast("long").as("n_toks"))
    dw.join(broadcast(tok), Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_toks")).as("n_bpe_tokens"))
  }

  /** fastText/CCNet-style quality classifier inference (T15): a linear
    * model over hashed word uni+bigram features, the standard LLM-corpus
    * quality-filter shape (score each document with a cheap text
    * classifier, keep above threshold). Weights here are a deterministic
    * closed form of the bucket index — the structure (tokenize → n-gram →
    * hash-bucket → Σw → sigmoid → threshold) is exactly what a trained
    * model plugs into; swap `weight` for a broadcast lookup of learned
    * coefficients and nothing else changes.
    *
    * Determinism across engines: the feature sum is INTEGER-scaled
    * (md5-60bit bucket → integer weight in [-1000, 1000], exact long
    * sum), so the one floating-point op (the sigmoid) computes on a
    * bit-identical operand in Spark and the DuckDB oracle. Pure Column
    * expressions, no UDF, no shuffle — embarrassingly parallel per row.
    */
  def fasttextQualityScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024, scale: Double = 4000.0,
      bias: Double = -0.1): org.apache.spark.sql.DataFrame = {
    val ts = filter(
      split(regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +"),
      t => t =!= "")
    val withTs = df.select(col(idCol), ts.as("__ts"))
    val bigrams = when(size(col("__ts")) >= 2,
      transform(sequence(lit(1), size(col("__ts")) - 1),
        i => concat(element_at(col("__ts"), i), lit("_"), element_at(col("__ts"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val withGrams = withTs.select(col(idCol), concat(col("__ts"), bigrams).as("__gs"))
    def bucket(g: Column): Column =
      pmod(conv(substring(md5(g), 1, 15), 16, 10).cast("long"), lit(buckets.toLong))
    def weight(b: Column): Column = b * lit(2654435761L) % lit(2001L) - lit(1000L)
    val z = aggregate(col("__gs"), lit(0L), (acc, g) => acc + weight(bucket(g)))
    withGrams
      .select(col(idCol), size(col("__gs")).cast("long").as("n_features"), z.as("__z"))
      .select(col(idCol), col("n_features"),
        round(lit(1.0) / (lit(1.0) + exp(-(col("__z") / lit(scale) + lit(bias)))), 6).as("score"),
        (col("__z") >= lit((-bias * scale).toLong)).as("keep"))
  }

  /** Subword tokenization (T16): greedy longest-match (MaxMatch — the
    * WordPiece inference algorithm) against a corpus-derived vocabulary
    * of the `vocabSize` most frequent character pieces of length
    * 2..`maxPiece` (count = occurrences across all word positions,
    * total order (n desc, piece asc)); a position no piece covers falls
    * back to one character. Reports per document the word count and the
    * subword count a tokenizer with that vocab would emit — the real
    * "how many tokens is this corpus" measurement, where t13 only
    * estimates by regex.
    *
    * Scale shape, the part that matters at 100 TB: the corpus
    * contributes ONE (doc_id, word) pair aggregation (t6's cost
    * class); everything downstream — piece counting, vocab ranking,
    * and the greedy scan itself — runs over the DISTINCT vocabulary,
    * which grows ~sublinearly (Heaps' law). The greedy scan is a
    * per-row loop over a broadcast `vocabSize`-entry set, so it lives
    * in a udf by design (same precedent as [[bpePairCounts]]'s pair
    * explosion): its input is vocabulary-sized, never corpus-sized.
    * The vocab collect is a query-parameter fetch (vocabSize strings).
    */
  def subwordTokenize(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocabSize: Int = 200, maxPiece: Int = 4)
      : org.apache.spark.sql.DataFrame = {
    val ws = filter(
      split(regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +"),
      t => t =!= "")
    // corpus-sized work ends here: one partial+final agg to (doc, word).
    // Materialized because three subtrees read it (the word-frequency
    // table feeds the vocab build AND the ntok side, and the final
    // per-doc rollup joins it again) — without the barrier the corpus
    // tokenize + agg runs 3x per query. (doc, word, cnt) is the
    // distinct-words-per-doc table — Heaps-sublinear in the corpus.
    val docWords = df
      .select(col(idCol), explode(ws).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .transform(graft.util.Barriers.corpusScale)
    val wc = docWords.groupBy("w").agg(sum(col("cnt")).as("wc"))

    // piece counts over the distinct vocabulary, weighted by word
    // frequency: every start position of every length 2..maxPiece
    // (sequence(1, 0) DESCENDS in Spark — the when-guard keeps short
    // words from generating phantom positions)
    val pieceArr = flatten(transform(
      sequence(lit(2), lit(maxPiece)),
      l => when(length(col("w")) >= l,
        transform(sequence(lit(1), length(col("w")) - l + 1),
          i => col("w").substr(i, l)))
        .otherwise(array().cast("array<string>"))))
    val vocab = wc
      .select(explode(pieceArr).as("piece"), col("wc"))
      .where(length(col("piece")) >= 2)
      .groupBy("piece").agg(sum(col("wc")).as("n"))
      .orderBy(col("n").desc, col("piece"))
      .limit(vocabSize)
      .select("piece").collect().map(_.getString(0)).toSet

    val bc = df.sparkSession.sparkContext.broadcast(vocab)
    val maxP = maxPiece
    val nTok = udf { (w: String) =>
      val v = bc.value
      var pos = 0; var n = 0
      while (pos < w.length) {
        var l = math.min(maxP, w.length - pos)
        while (l >= 2 && !v.contains(w.substring(pos, pos + l))) l -= 1
        pos += math.max(l, 1); n += 1
      }
      n.toLong
    }
    docWords
      .join(wc.select(col("w"), nTok(col("w")).as("ntok")), Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("ntok")).as("n_subwords"))
  }
}
