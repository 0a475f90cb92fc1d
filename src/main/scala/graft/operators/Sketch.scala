package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality sketches — the primitive a 100 TB corpus runs instead of
  * `count(distinct ...)`: per-group state is a fixed register table
  * (here 256 longs) regardless of input size, aggregated partial+final,
  * where the exact form shuffles every distinct value.
  *
  * Engine-exact determinism (the repo's oracle contract): the entire
  * register pipeline is integer arithmetic on the shared md5-60-bit
  * hash — register index by modulus, leading-zero rank via the
  * length of the binary string (`bin`, identical in Spark and DuckDB),
  * register sum as exact long `1 << (53 - M)` terms — so the ONE
  * floating-point op (the final alpha·m²·2⁵³ / denom division, or the
  * linear-counting `m·ln(m/zeros)`) computes on bit-identical operands
  * in both engines. The alpha numerator is computed once on the driver
  * and interpolated into the oracle SQL as its shortest round-trip
  * decimal, so both engines parse the same double.
  */
object Sketch {

  /** Register count m = 2^8. 256 registers give ~6.5% standard error —
    * the coarse-but-tiny configuration; the fixture corpus exercises
    * BOTH estimator branches with it (HLL raw estimate above 2.5m,
    * linear counting below).
    */
  val HllM = 256
  /** Bits left of the register index in the 60-bit hash: 60 - 8 = 52,
    * so rho ranges 1..53 and the largest register term 2^(53-1) fits a
    * long with 256-fold headroom.
    */
  private val HllBits = 52

  /** alpha_256 * m^2 * 2^53 — the HLL bias-corrected numerator, one
    * driver-side double so both engines divide the identical value.
    */
  val hllAlphaNum: Double =
    0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM * 9007199254740992.0

  /** The 60-bit md5 hash shared with the DuckDB oracles. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 60-bit hash in the requested family: "md5" replays in DuckDB (the
    * oracle-gate flavor); "xx64" is Spark's codegen'd xxhash64 masked to
    * 60 bits — same value as [[Dedup.xxHash60]] (seed 42), ~10x cheaper
    * per value, the production flavor (the d3 md5/xx64 convention).
    * Estimator quality is hash-family-independent.
    */
  private def h60Fam(c: Column, family: String): Column = family match {
    case "md5"  => h60(c)
    case "xx64" => xxhash64(c).bitwiseAND(lit(0x0fffffffffffffffL))
    case other  => throw new IllegalArgumentException(s"unknown hash family '$other'")
  }

  /** HyperLogLog register table: one row per (group, register) with the
    * max leading-zero rank. Input: one row per (group, value) — values
    * need not be pre-deduplicated (the register max IS the dedup).
    * Output is at most |groups| * 256 rows however large the input —
    * this is the only shuffle the sketch pays, and it is partial+final
    * (map-side combine collapses each partition to <= 256 rows per
    * group before the exchange).
    */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
      hashFamily: String = "md5"): DataFrame =
    hllRegistersFromHashes(
      df.select(col(groupCol), h60Fam(col(valueCol), hashFamily).as("__h")),
      groupCol, "__h")

  /** Register table from PRE-HASHED values (60-bit longs) — the fused
    * production path: pair with [[docShingleHashes]] so the corpus pass
    * never materializes value strings into rows. Register results are
    * identical to the string path by construction (registers only ever
    * see the hash).
    */
  def hllRegistersFromHashes(df: DataFrame, groupCol: String,
      hashCol: String): DataFrame =
    df.select(col(groupCol), col(hashCol).as("__h"))
      .select(col(groupCol),
        (col("__h") % HllM).as("__idx"),
        expr(s"__h div $HllM").as("__w"))
      .select(col(groupCol), col("__idx"),
        when(col("__w") === 0, lit(HllBits + 1))
          .otherwise(lit(HllBits + 1) - length(bin(col("__w")))).as("__rho"))
      .groupBy(col(groupCol), col("__idx"))
      .agg(max(col("__rho")).as("m_j"))

  /** Register table FROM A DISTINCT (group, value) INPUT, carrying the
    * per-register distinct-value count — the one-pass accuracy-artifact
    * shape: because the input is distinct per (group, value), summing
    * `__cnt` per group IS the exact distinct count, so the sketch and
    * its ground truth come out of a single explode + distinct + one
    * register aggregation (no re-scan, no checkpoint). The caller owns
    * the distinctness contract.
    */
  def hllRegistersWithCounts(distinctDf: DataFrame, groupCol: String,
      valueCol: String, hashFamily: String = "md5"): DataFrame =
    hllRegistersFromHashesWithCounts(
      distinctDf.select(col(groupCol),
        h60Fam(col(valueCol), hashFamily).as("__h")),
      groupCol, "__h")

  /** [[hllRegistersWithCounts]] from PRE-HASHED DISTINCT (group, hash)
    * input — the t23/t24 floor shape: the corpus pass emits 8-byte
    * hash longs (fused shingle+hash kernel), the distinct shuffle
    * carries (group, long) instead of (group, shingle string), and the
    * per-register `__cnt` sums to the exact distinct-HASH count. At a
    * 60-bit hash space the expected collision count is ~n²/2⁶¹ (≪ 1 at
    * any tested scale), and the oracle replays the same distinct-hash
    * count, so the artifact stays bit-identical cross-engine. The
    * caller owns the distinctness contract.
    */
  def hllRegistersFromHashesWithCounts(distinctDf: DataFrame,
      groupCol: String, hashCol: String): DataFrame =
    distinctDf
      .select(col(groupCol), col(hashCol).as("__h"))
      .select(col(groupCol),
        (col("__h") % HllM).as("__idx"),
        expr(s"__h div $HllM").as("__w"))
      .select(col(groupCol), col("__idx"),
        when(col("__w") === 0, lit(HllBits + 1))
          .otherwise(lit(HllBits + 1) - length(bin(col("__w")))).as("__rho"))
      .groupBy(col(groupCol), col("__idx"))
      .agg(max(col("__rho")).as("m_j"), count(lit(1)).as("__cnt"))

  /** [[hllEstimate]] over a [[hllRegistersWithCounts]] table, emitting
    * the exact distinct count alongside the estimate — the t23-shaped
    * accuracy row in one aggregation chain.
    */
  def hllEstimateWithExact(registers: DataFrame, groupCol: String): DataFrame = {
    val grouped = registers.groupBy(col(groupCol)).agg(
      count(lit(1)).as("occupied"),
      sum(expr(s"shiftleft(1L, ${HllBits + 1} - m_j)")).as("__s"),
      sum(col("__cnt")).as("exact_distinct"))
    grouped.select(col(groupCol), col("occupied"),
      round(estCol(col("occupied"), col("__s")), 4).as("est_distinct"),
      col("exact_distinct"))
  }

  /** The bias-corrected estimate from (occupied, register sum) — shared
    * by [[hllEstimate]] and [[hllEstimateWithExact]].
    */
  private def estCol(occupied: Column, s: Column): Column = {
    val twoP53 = 9007199254740992L // 2^53
    val zeros = lit(HllM.toLong) - occupied
    val denom = (s + zeros * lit(twoP53)).cast("double")
    val eRaw = lit(hllAlphaNum) / denom
    when(eRaw <= lit(2.5 * HllM) && zeros > 0,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) / zeros.cast("double")))
      .otherwise(eRaw)
  }

  /** Collapse a register table to the per-group estimate. The register
    * sum is exact long arithmetic (`1 << (53 - M)`); empty registers
    * contribute 2^53 each via the occupancy count. Applies the standard
    * small-range linear-counting correction (E <= 2.5m with empty
    * registers); the large-range correction is unnecessary against a
    * 60-bit hash space. Estimate rounded to 4 decimals — the repo-wide
    * cross-engine float contract.
    */
  def hllEstimate(registers: DataFrame, groupCol: String): DataFrame = {
    val grouped = registers.groupBy(col(groupCol)).agg(
      count(lit(1)).as("occupied"),
      sum(expr(s"shiftleft(1L, ${HllBits + 1} - m_j)")).as("__s"))
    grouped.select(col(groupCol), col("occupied"),
      round(estCol(col("occupied"), col("__s")), 4).as("est_distinct"))
  }

  /** Merge register tables ACROSS groups into one labeled sketch — the
    * algebraic property that makes HLL the 100 TB tool: registers built
    * per partition / per day / per source combine by elementwise max
    * into exactly the sketch of the union (spec-asserted equality), so
    * a union cardinality never re-reads the inputs. Inclusion-exclusion
    * on merged estimates then bounds overlaps between corpora.
    */
  def hllMerge(registers: DataFrame, groupCol: String, label: String): DataFrame =
    registers.groupBy(col("__idx")).agg(max(col("m_j")).as("m_j"))
      .select(lit(label).as(groupCol), col("__idx"), col("m_j"))

  // ---- Count-Min sketch ----------------------------------------------

  /** Count-Min depth (independent hash rows). */
  val CmsD = 4
  /** Count-Min width (counters per row). 4x512 = 2048 counters total —
    * the frequency twin of the HLL register table: per-corpus state is
    * a fixed 2048-long matrix however large the input, built
    * partial+final, and point estimates only ever overestimate (min
    * over rows caps the collision noise).
    */
  val CmsW = 512

  /** Row-r hash index for a value: the shared 60-bit hash of "r value"
    * mod the width — md5 flavor replayable in the DuckDB oracle, xx64
    * the production flavor; no seeded RNG to ship across engines.
    */
  private def cmsIdx(r: Column, v: Column, hashFamily: String = "md5"): Column =
    h60Fam(concat(r.cast("string"), lit(" "), v), hashFamily) % CmsW

  /** The d x w counter matrix from a weighted value stream: one row per
    * (row, idx) with the collided weight sum. The input here is already
    * (value, weight) — a raw stream aggregates to that first, so the
    * sketch build costs one fan-out of d rows per DISTINCT value and a
    * <= d*w-row shuffle (partial+final sum collapses each partition to
    * <= 2048 rows before the exchange).
    */
  def cmsCounters(weighted: DataFrame, valueCol: String, weightCol: String,
      hashFamily: String = "md5"): DataFrame =
    weighted.select(col(valueCol).as("__v"), col(weightCol).as("__c"),
        explode(sequence(lit(0), lit(CmsD - 1))).as("r"))
      .select(col("r"), cmsIdx(col("r"), col("__v"), hashFamily).as("idx"), col("__c"))
      .groupBy("r", "idx").agg(sum(col("__c")).as("c"))

  /** Point estimates for a set of values: each value probes its d
    * counters (the counter matrix rides a broadcast — it is at most
    * 2048 rows by construction) and takes the min. Carries every other
    * column of `values` through the groupBy so callers keep their
    * exact-count column for error reporting.
    *
    * The probe is a LEFT join with absent cells as 0: a value that was
    * never inserted leaves some (or all) of its d cells unoccupied, and
    * the true CMS answer for it is min(..., 0) = 0 — an inner join
    * would silently drop it or report only its colliding cells'
    * inflated min.
    */
  def cmsEstimate(values: DataFrame, valueCol: String, counters: DataFrame,
      hashFamily: String = "md5"): DataFrame = {
    val carry = values.columns.map(col)
    values.select(carry :+ explode(sequence(lit(0), lit(CmsD - 1))).as("r"): _*)
      .withColumn("idx", cmsIdx(col("r"), col(valueCol), hashFamily))
      .join(broadcast(counters), Seq("r", "idx"), "left")
      .groupBy(values.columns.head, values.columns.tail: _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est_cnt"))
  }

  /** Scoped counter matrices: one d x w matrix PER scope value (hour
    * window, day, source...) — counters are additive, so per-batch
    * matrices appended to a log resolve to exactly the batch matrix by
    * a (scope, r, idx) sum, the same merge-on-read algebra as the HLL
    * register log.
    */
  def cmsCountersBy(weighted: DataFrame, scopeCol: String, valueCol: String,
      weightCol: String): DataFrame =
    weighted.select(col(scopeCol).as("scope"), col(valueCol).as("__v"),
        col(weightCol).as("__c"),
        explode(sequence(lit(0), lit(CmsD - 1))).as("r"))
      .select(col("scope"), col("r"), cmsIdx(col("r"), col("__v")).as("idx"),
        col("__c"))
      .groupBy("scope", "r", "idx").agg(sum(col("__c")).as("c"))

  /** Scoped point estimates: like [[cmsEstimate]] but probing the
    * matching scope's counters. The counter table is bounded by
    * |scopes| * d * w rows and broadcasts. Left join + 0 for absent
    * cells, same rationale as [[cmsEstimate]].
    */
  def cmsEstimateBy(values: DataFrame, scopeCol: String, valueCol: String,
      counters: DataFrame): DataFrame = {
    val carry = values.columns.map(col)
    values.select(carry :+ explode(sequence(lit(0), lit(CmsD - 1))).as("r"): _*)
      .withColumn("idx", cmsIdx(col("r"), col(valueCol)))
      .withColumn("scope", col(scopeCol))
      .join(broadcast(counters), Seq("scope", "r", "idx"), "left")
      .groupBy(values.columns.head, values.columns.tail: _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est_cnt"))
  }

  /** Heavy hitters: top-k whitespace tokens of a text corpus by
    * Count-Min estimate, with the exact count and overestimate error in
    * basis points alongside — the e6-style accuracy artifact for the
    * frequency sketch. The exact side exists only to measure the
    * sketch; the sketch side's state is 2048 longs however large the
    * corpus, and top-k selection is a TakeOrderedAndProject on the
    * total (est desc, token) order, not a global sort.
    */
  def cmsHeavyHitters(df: DataFrame, textCol: String, k: Int,
      hashFamily: String = "md5"): DataFrame = {
    // the exact token table feeds the counter build AND the estimate
    // probe (which itself carries exact_cnt through) — three references
    // that would each re-run the corpus-wide token aggregation.
    // Vocabulary-bounded (Heaps-sublinear in the corpus), so one
    // materialization is the production shape too.
    val exact = df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("exact_cnt"))
      .transform(graft.util.Barriers.corpusScale)
    val counters = cmsCounters(exact, "token", "exact_cnt", hashFamily)
    cmsEstimate(exact, "token", counters, hashFamily)
      .orderBy(col("est_cnt").desc, col("token"))
      .limit(k)
      .select(col("token"), col("est_cnt"), col("exact_cnt"),
        expr("(est_cnt - exact_cnt) * 10000 div exact_cnt").as("err_bp"))
  }

  // ---- Log-histogram quantile sketch ---------------------------------

  /** Quantile sketch as an HDR-style log-histogram — the fourth
    * canonical sketch next to HLL (cardinality), Count-Min (frequency)
    * and MinHash (similarity): per-scope state is one bounded bin table
    * (octave × 8 sub-bins — ≤ 8·64 bins for any long), mergeable by
    * plain count addition, with ≤ 2^-3 relative value error per bin.
    * The exact alternative (t10's sort-based percentile) is a global
    * sort; the sketch replaces it with one bounded groupBy.
    *
    * Binning is ALL-INTEGER (octave = length of the binary string, the
    * HLL-rho trick; mantissa = 3 bits below the leading one), so unlike
    * an ln-based bin there is no libm discretization to disagree
    * across engines.
    */
  def histBins(df: DataFrame, scopeCol: String, valueCol: String): DataFrame =
    df.select(col(scopeCol).as("scope"),
        (col(valueCol).cast("long") + 1L).as("__v"))
      .select(col("scope"), col("__v"),
        (length(bin(col("__v"))) - 1).cast("long").as("__e"))
      .select(col("scope"),
        greatest(col("__e") - 3L, lit(0L)).as("__shift"),
        col("__e"), col("__v"))
      .select(col("scope"), col("__e"), col("__shift"),
        expr("shiftright(__v, cast(__shift as int))").as("__m"))
      .select(col("scope"),
        (col("__e") * 8L + (col("__m") % 8L)).as("bin"),
        // inclusive upper edge, back in value space (v = value + 1)
        (expr("shiftleft(__m + 1, cast(__shift as int))") - 2L).as("edge"))
      .groupBy("scope", "bin", "edge").agg(count(lit(1)).as("cnt"))

  /** Merge per-scope histograms into one labeled scope — bin counts add
    * (the mergeability that lets per-day / per-source histograms answer
    * corpus-wide quantiles without re-reading data).
    */
  def histMerge(hist: DataFrame, label: String): DataFrame =
    hist.groupBy("bin", "edge").agg(sum(col("cnt")).as("cnt"))
      .select(lit(label).as("scope"), col("bin"), col("edge"), col("cnt"))

  /** Quantile estimates from a histogram: for each q (integer percent),
    * the smallest bin whose cumulative count covers q% of the scope,
    * reported as the bin's inclusive upper edge with the ACHIEVED rank
    * and the overshoot vs the target — the rank-error accuracy artifact,
    * in integer basis points. The cumulative window runs over SKETCH
    * state (≤ a few hundred bins per scope), never over data.
    */
  def histQuantiles(hist: DataFrame, qs: Seq[Int]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("scope").orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("scope")))
    val qdf = qs.map(_.toLong).toDF("q_pct")
    val hit = cum.crossJoin(broadcast(qdf))
      .where(col("cum") * 100 >= col("q_pct") * col("n"))
      .groupBy("scope", "q_pct").agg(min(col("bin")).as("bin"))
    hit.join(cum, Seq("scope", "bin"))
      .select(col("scope"), col("q_pct"), col("edge").as("est_value"),
        expr("cum * 10000 div n").as("rank_bp"),
        expr("cum * 10000 div n - q_pct * 100").as("err_bp"))
  }

  // ---- PSI distribution drift -----------------------------------------

  /** Population Stability Index drift of each scope's value
    * distribution against a pooled reference — the monitoring primitive
    * a training pipeline runs per ingest window to catch a source whose
    * value profile shifted. Both sides are [[histBins]] log-histograms,
    * so the whole comparison runs on SKETCH state: |scopes| x |ref
    * bins| cells, never data rows, and per-window histograms appended
    * to a log resolve to exactly the batch answer by bin-count addition
    * (the merge-on-read algebra the streaming flavor relies on).
    *
    * Laplace +1 smoothing on BOTH sides over the reference bin
    * universe: p_i = (c_win,i + 1) / (n_win + B), q_i = (c_ref,i + 1) /
    * (n_ref + B) with B = |reference bins|, so empty cells contribute a
    * finite term. The reference must cover every window's value domain
    * (it does by construction when it is the merge of the windows —
    * callers passing an external baseline own that contract; bins
    * absent from it are not scored).
    *
    * Cross-engine determinism: each PSI term (p-q)·ln(p/q) computes on
    * bit-identical doubles in both engines (integer-count ratios, one
    * ln), and the per-scope SUM is fixed to integer 1e-8 units per term
    * (the t21 associativity trick) — a double sum's value would depend
    * on Spark's partial/final add order.
    */
  def psiDrift(winBins: DataFrame, refBins: DataFrame): DataFrame = {
    val ref = refBins.groupBy("bin").agg(sum(col("cnt")).as("ref_cnt"))
    val refTot = ref.agg(sum(col("ref_cnt")).as("n_ref"),
      count(lit(1)).as("n_bins"))
    val winTot = winBins.groupBy("scope").agg(sum(col("cnt")).as("n_win"))
    val grid = winTot
      .crossJoin(broadcast(ref.crossJoin(refTot)))
      .join(winBins.select(col("scope"), col("bin"), col("cnt").as("w_cnt")),
        Seq("scope", "bin"), "left")
    val p = (coalesce(col("w_cnt"), lit(0L)) + 1L).cast("double") /
      (col("n_win") + col("n_bins")).cast("double")
    val q = (col("ref_cnt") + 1L).cast("double") /
      (col("n_ref") + col("n_bins")).cast("double")
    // terms are >= 0 ((p-q) and ln(p/q) share sign), so floor is a
    // pure truncation toward the same side everywhere
    val term = (p - q) * log(p / q)
    grid.select(col("scope"), col("n_win"),
        floor(term * lit(1.0e8)).cast("long").as("t8"))
      .groupBy("scope", "n_win").agg(sum(col("t8")).as("psi_e8"))
      .select(col("scope"), col("n_win").as("n_events"),
        (col("psi_e8").cast("double") / 1.0e8).as("psi"))
  }

  /** Distinct 3-token shingles per document (d3's shingle definition),
    * exploded — the value stream both the sketch and the exact side
    * consume.
    */
  def docShingles(textCol: String = "text"): Column = {
    val t = split(col(textCol), " ")
    array_distinct(
      when(size(t) >= 3,
        transform(sequence(lit(1), size(t) - 2), i =>
          concat_ws(" ",
            element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
        .otherwise(array().cast("array<string>")))
  }

  /** Distinct 3-token shingle HASHES per document (60-bit longs) — the
    * fused kernel for the production sketch path. One walk builds each
    * shingle string once, hashes it immediately, and dedups by hash, so
    * the plan (a) never explodes an INLINE-computed array (a Generate
    * re-evaluates its inline input per OUTPUT row — [[docShingles]]
    * under explode pays O(len²) per doc, the engine pathology
    * documented in Dedup) and (b) never ships shingle STRINGS through
    * tungsten rows — the explode emits 8-byte longs. Register results
    * are identical to the string path (registers only see the hash;
    * hash-dedup == string-dedup as far as a max over ranks can tell).
    */
  def docShingleHashes(textCol: String = "text",
      hashFamily: String = "xx64"): Column = {
    val hf = Dedup.hashFn(hashFamily)
    val mk = udf((toks: Seq[String]) => {
      if (toks == null || toks.length < 3) Array.empty[Long]
      else {
        val seen = new java.util.HashSet[java.lang.Long]()
        val out = new scala.collection.mutable.ArrayBuilder.ofLong
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i + 2 < toks.length) {
          sb.setLength(0)
          sb.append(toks(i)).append(' ').append(toks(i + 1))
            .append(' ').append(toks(i + 2))
          val h = hf(sb.toString)
          if (seen.add(h)) out += h
          i += 1
        }
        out.result()
      }
    })
    mk(split(col(textCol), " "))
  }
}
