package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** t-digest buffer: current centroid list (sorted by mean) plus a
  * fixed-capacity intake buffer of raw values. Arrays are mutated in
  * place between compressions — Spark's object aggregation keeps typed
  * Aggregator buffers as JVM objects and only serializes on
  * spill/exchange, so the intake append is O(1), not a copy per row.
  */
case class TDigestBuf(var means: Array[Double], var weights: Array[Long],
                      var buf: Array[Double], var nBuf: Int)

/** Finished digest: centroids sorted by mean. */
case class TDigestResult(means: Array[Double], weights: Array[Long])

/** Distributed t-digest (Dunning's merging digest, k1 scale function) —
  * the quantile member of the sketch family that the log-histogram
  * (t22) bounds in VALUE error; the t-digest bounds RANK error, tighter
  * at the tails (centroid capacity k1(q) = δ/2π·asin(2q−1) shrinks to
  * singletons at q→0,1). Per-group state is ≤ ~2δ centroids however
  * large the input, built partial+final with map-side combine: each
  * partition digests locally, partials merge by centroid-list concat +
  * recompress — the same algebra a 1000-executor cluster needs to
  * answer corpus quantiles in one pass with no global sort (t10's exact
  * percentile sorts every group value onto one reducer).
  *
  * Centroid placement depends on merge order, so the digest itself is
  * NOT cross-engine replayable (unlike the integer histBins sketch);
  * what is invariant is the k1 rank-error CONTRACT — ≤ ~1/δ achieved
  * rank error at any q — which is what the oracle gate checks
  * (t27: tie-robust rank interval vs a ±100 bp band at δ=200).
  */
class TDigestAgg(compression: Int)
    extends Aggregator[Double, TDigestBuf, TDigestResult] {
  private val maxBuf = 5 * compression

  // empty intake: the first reduce per group allocates a fresh array, so
  // even if the runtime hands the same zero instance to several groups
  // no mutable state is ever shared between them
  override def zero: TDigestBuf =
    TDigestBuf(Array.empty, Array.empty, Array.empty, 0)

  override def reduce(b0: TDigestBuf, x: Double): TDigestBuf = {
    // zero and deserialized partials carry a short intake array; build a
    // NEW buffer object around a full-size one (never mutate b0 here —
    // it may be the shared zero instance)
    val b = if (b0.buf.length < maxBuf) {
      val nb = new Array[Double](maxBuf)
      System.arraycopy(b0.buf, 0, nb, 0, b0.nBuf)
      TDigestBuf(b0.means, b0.weights, nb, b0.nBuf)
    } else b0
    if (b.nBuf == maxBuf) compress(b)
    b.buf(b.nBuf) = x
    b.nBuf += 1
    b
  }

  override def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = {
    val m = new Array[Double](a.means.length + b.means.length)
    val w = new Array[Long](m.length)
    System.arraycopy(a.means, 0, m, 0, a.means.length)
    System.arraycopy(b.means, 0, m, a.means.length, b.means.length)
    System.arraycopy(a.weights, 0, w, 0, a.weights.length)
    System.arraycopy(b.weights, 0, w, a.weights.length, b.weights.length)
    // fold both intake buffers into the merged one (they are disjoint
    // value sets; order within an intake buffer is irrelevant)
    val buf = new Array[Double](math.max(maxBuf, a.nBuf + b.nBuf))
    System.arraycopy(a.buf, 0, buf, 0, a.nBuf)
    System.arraycopy(b.buf, 0, buf, a.nBuf, b.nBuf)
    val out = TDigestBuf(m, w, buf, a.nBuf + b.nBuf)
    // concat breaks mean-sortedness: always run the full merge pass
    compress(out, force = true)
    out
  }

  override def finish(b: TDigestBuf): TDigestResult = {
    compress(b, force = true)
    TDigestResult(b.means, b.weights)
  }

  override def bufferEncoder: Encoder[TDigestBuf] = Encoders.product[TDigestBuf]
  override def outputEncoder: Encoder[TDigestResult] = Encoders.product[TDigestResult]

  /** Fold the intake buffer into the centroid list: sort all (mean,
    * weight) points, then one greedy pass merging neighbours while the
    * merged centroid's cumulative-q span stays within one k1 unit.
    */
  private def compress(b: TDigestBuf, force: Boolean = false): Unit = {
    val n = b.means.length + b.nBuf
    if (n == 0 || (!force && b.nBuf == 0 && b.means.length <= compression)) { b.nBuf = 0; return }
    val idx = new Array[Integer](n)
    val ms = new Array[Double](n)
    val ws = new Array[Long](n)
    var i = 0
    while (i < b.means.length) { ms(i) = b.means(i); ws(i) = b.weights(i); i += 1 }
    var j = 0
    while (j < b.nBuf) { ms(i) = b.buf(j); ws(i) = 1L; i += 1; j += 1 }
    i = 0; while (i < n) { idx(i) = i; i += 1 }
    java.util.Arrays.sort(idx, (x: Integer, y: Integer) =>
      java.lang.Double.compare(ms(x), ms(y)))
    var total = 0L
    i = 0; while (i < n) { total += ws(i); i += 1 }

    val norm = compression / (2.0 * math.Pi)
    def qOf(k: Double): Double = (math.sin(k / norm) + 1.0) / 2.0
    def kOf(q: Double): Double = norm * math.asin(2.0 * q - 1.0)

    val outM = new scala.collection.mutable.ArrayBuilder.ofDouble
    val outW = new scala.collection.mutable.ArrayBuilder.ofLong
    var wSoFar = 0L
    var qLimit = qOf(kOf(0.0) + 1.0)
    var curW = ws(idx(0))
    var curSum = ms(idx(0)) * ws(idx(0))
    i = 1
    while (i < n) {
      val k = idx(i)
      if ((wSoFar + curW + ws(k)).toDouble <= qLimit * total) {
        curW += ws(k); curSum += ms(k) * ws(k)
      } else {
        outM += curSum / curW; outW += curW
        wSoFar += curW
        qLimit = qOf(kOf(wSoFar.toDouble / total) + 1.0)
        curW = ws(k); curSum = ms(k) * ws(k)
      }
      i += 1
    }
    outM += curSum / curW; outW += curW
    b.means = outM.result()
    b.weights = outW.result()
    b.nBuf = 0
  }
}

object TDigest {

  /** Merge finished digests (e.g. per-micro-batch partials from a
    * stream log) into one digest with the same k1 recompression the
    * aggregator's merge path uses. Digests are mergeable state — so a
    * log of per-batch digests resolves at read time to a valid digest
    * over the union stream, the same merge-on-read algebra the
    * integer-exact logs (histogram bins, daily counts) use, with the
    * k1 rank-error CONTRACT as the invariant instead of bit-equality.
    */
  def mergeDigests(parts: Seq[(Seq[Double], Seq[Long])],
      compression: Int): TDigestResult = {
    val agg = new TDigestAgg(compression)
    val folded = parts.foldLeft(agg.zero) { case (acc, (m, w)) =>
      agg.merge(acc, TDigestBuf(m.toArray, w.toArray, Array.empty, 0))
    }
    agg.finish(folded)
  }

  /** The t27 gate-row shape from an EXTERNAL digest table: per (source,
    * q) the exact interpolated quantile (replayable cross-engine) and
    * the tie-robust achieved-rank check of the digest's estimate against
    * a ±100 bp band — the invariant that holds for ANY merge order, so
    * a streamed digest produces the identical report to a batch one.
    * `docs` = (source, v); `digests` = (source, means, weights).
    */
  def quantileReport(docs: org.apache.spark.sql.DataFrame,
      digests: org.apache.spark.sql.DataFrame,
      qs: Seq[Int] = Seq(25, 50, 75, 95, 99)): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = docs.sparkSession
    import spark.implicits._
    val exact = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      expr(s"percentile(v, array(${qs.map(_ / 100.0).mkString("D,")}D))").as("ex"))
    val quant = udf((m: Seq[Double], w: Seq[Long], q: Int) =>
      TDigest.quantile(m, w, q / 100.0))
    val est = digests.join(exact, "source")
      .crossJoin(broadcast(qs.zipWithIndex.toDF("q_pct", "qi")))
      .select(col("source"), col("n_docs"), col("q_pct"),
        round(element_at(col("ex"), col("qi") + 1), 4).as("exact_value"),
        quant(col("means"), col("weights"), col("q_pct")).as("est"))
    docs.join(broadcast(est), "source")
      .groupBy("source", "q_pct", "n_docs", "exact_value", "est")
      .agg(sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("r_lo"),
        sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("r_hi"))
      .select(col("source"), col("q_pct"), col("n_docs"), col("exact_value"),
        (col("r_lo") * 100 <= (col("q_pct") + 1) * col("n_docs") &&
          col("r_hi") * 100 >= (col("q_pct") - 1) * col("n_docs"))
          .as("within_100bp"))
  }

  /** Quantile estimate from a finished digest: the classic half-weight
    * interpolation — centroid i "occupies" the rank band centred at
    * (W_before + w_i/2); the target rank interpolates linearly between
    * neighbouring centroid means, clamping to the end centroids' means
    * at the extremes.
    */
  def quantile(means: Seq[Double], weights: Seq[Long], q: Double): Double = {
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    var total = 0L
    var i = 0
    while (i < n) { total += weights(i); i += 1 }
    val target = q * total
    var cum = 0L
    i = 0
    var prevC = -1.0
    var prevM = means(0)
    while (i < n) {
      val c = cum + weights(i) / 2.0
      if (target < c) {
        return if (prevC < 0) means(0)
          else prevM + (means(i) - prevM) * (target - prevC) / (c - prevC)
      }
      prevC = c; prevM = means(i)
      cum += weights(i)
      i += 1
    }
    means(n - 1)
  }
}
