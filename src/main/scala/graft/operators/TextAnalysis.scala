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
}
