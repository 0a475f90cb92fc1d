package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window z-score anomaly flagging over per-key time series —
  * the monitoring leg of a training-data ingest pipeline (reference
  * ships its drift checks as batch report stages over the event log;
  * see avocado's hard-filter annotate matrix for the flag-don't-drop
  * contract, e.g. reference hardFilterGenotypes semantics).
  *
  * The score is computed ENTIRELY in integer space so the flag is
  * bit-identical cross-engine: with x the current value and (n, s, ss)
  * the trailing window's count/sum/sum-of-squares,
  *
  *   z² > z₀²  ⟺  (n·x − s)² · (n−1) > z₀² · n · (n·ss − s²)
  *
  * (sample variance, cross-multiplied — no division, no sqrt, no float
  * rounding anywhere). Longs hold it comfortably: counts up to ~1e8
  * keep (n·x−s)²·(n−1) under 2⁶³.
  *
  * Scale shape: one partial+final hash aggregate to the per-key daily
  * series (map-side combine absorbs the raw event volume), then a
  * window over series rows only — |keys| × |days| cells, shuffled once
  * by key. No self-join, no collect.
  */
object Anomaly {

  /** Flag rows whose `valCol` deviates more than `z` sample standard
    * deviations from the trailing `lookback` rows (exclusive of self),
    * per `keyCol` ordered by `ordCol`. Rows with fewer than `minRef`
    * trailing observations are emitted unflagged with `n_ref` showing
    * why. Output: key, ord, value, n_ref, is_anomaly.
    */
  def zscoreFlags(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String, lookback: Int = 7, minRef: Int = 3,
      z: Int = 2): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(ordCol)
      .rowsBetween(-lookback, -1)
    val x = col(valCol)
    val n = count(x).over(w)
    val s = sum(x).over(w)
    val ss = sum(x * x).over(w)
    series
      .withColumn("n_ref", n)
      .withColumn("__s", s)
      .withColumn("__ss", ss)
      .withColumn("is_anomaly",
        col("n_ref") >= minRef &&
          (col("n_ref") * x - col("__s")) * (col("n_ref") * x - col("__s")) *
            (col("n_ref") - 1) >
          lit(z.toLong * z) * col("n_ref") *
            (col("n_ref") * col("__ss") - col("__s") * col("__s")))
      .drop("__s", "__ss")
  }
}
