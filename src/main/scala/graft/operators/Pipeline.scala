package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed training-data pipelines: the cleaning flow every large
  * corpus goes through before pretraining, built entirely from the
  * engine's own operators so the whole thing stays one declarative plan.
  */
object Pipeline {

  /** End-to-end corpus cleaning:
    *   1. exact dedup — keep the lowest doc id per content fingerprint
    *      via one groupBy(md5(text)) + min_by (partial+final HashAggregate:
    *      a mega-duplicated document collapses map-side; the window form
    *      would land the whole hot fingerprint on one reducer, and AQE
    *      cannot split a skewed window partition);
    *   2. contamination cut — drop docs repeating a cross-document
    *      n-gram they don't own ([[Dedup.contaminatedDocs]]; the cut set
    *      is tiny, so the anti-join broadcasts under AQE);
    *   3. quality gate — token count, mean token length, stopword ratio
    *      (narrow codegen'd expressions, [[TextAnalysis]]);
    *   4. language gate — heuristic lang-id == keepLang (narrow).
    *
    * Shuffle budget: two partial+final aggregations (fingerprint groupBy
    * + contamination gram groupBy) — no window over a content key
    * anywhere; everything else is narrow or broadcast. Survivors emit
    * (doc_id, n_tokens, pred_lang).
    */
  def cleanCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String] = Seq("the", "a", "of"),
      minTokens: Int = 10,
      minAvgTokLen: Double = 2.0,
      maxStopRatio: Double = 0.15,
      keepLang: String = "en",
      n: Int = 13): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val keepExact = base
      .groupBy(md5(col("text")).as("fp"))
      .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("keeper"))
      .select(col("keeper.doc_id").as("doc_id"), col("keeper.text").as("text"))
    val txt = col("text")
    // The contamination scan reads the RAW corpus, not keepExact: the
    // victim set among survivors is provably identical either way (a
    // gram's min-id keeper always survives exact dedup — its exact twin
    // with a smaller id carries the same grams), and feeding keepExact
    // would evaluate the fingerprint aggregation TWICE (Spark plans the
    // shared subtree without exchange reuse here), which costs more than
    // shingling the duplicate mass unless the corpus is mostly copies.
    keepExact
      .join(Dedup.contaminatedDocs(df, idCol, textCol, n), Seq("doc_id"), "left_anti")
      .select(
        col("doc_id"),
        TextAnalysis.tokenCount(txt).as("n_tokens"),
        TextAnalysis.avgTokenLen(txt).as("avg_tok_len"),
        TextAnalysis.stopwordRatio(txt, stopwords).as("stop_ratio"),
        TextAnalysis.langId(txt).as("pred_lang"))
      .where(col("n_tokens") >= minTokens && col("avg_tok_len") >= minAvgTokLen &&
        col("stop_ratio") <= maxStopRatio && col("pred_lang") === keepLang)
      .select("doc_id", "n_tokens", "pred_lang")
  }

  /** The export end of a training-data pipeline in ONE declarative
    * plan: composite quality gate ([[TextAnalysis.qualityRules]],
    * narrow) -> LM perplexity cut ([[TextAnalysis.unigramLogPpl]], LM
    * estimated over the full corpus — the stand-in for a pretrained
    * model table) -> deterministic shard manifest
    * ([[Sharding.shardManifest]]). Shuffle budget: the three LM/manifest
    * aggregations plus the survivors' doc_id join; the quality gate
    * contributes none. Output is the artifact a training job validates
    * against: per-shard doc/token/char totals + content checksum over
    * exactly the documents that survived both gates.
    */
  def prepareShards(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxBitsPerToken: Double = 4.95,
      numShards: Int = 16): DataFrame = {
    val mask = TextAnalysis.qualityFailMask(TextAnalysis.qualityRules(col(textCol)))
    val quality = df.where(mask === 0L)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val lowPpl = TextAnalysis.unigramLogPpl(df, idCol, textCol)
      .where(col("bits_per_token") <= maxBitsPerToken)
      .select(col("doc_id"))
    Sharding.shardManifest(
      quality.join(lowPpl, "doc_id"), "doc_id", "text", numShards)
  }
}
