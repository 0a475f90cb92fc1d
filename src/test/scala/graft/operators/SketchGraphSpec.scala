package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchGraphSpec extends SparkSpec {
  import spark.implicits._

  // ---- HLL -------------------------------------------------------------

  test("HLL estimate within 3 standard errors on a 50k-cardinality stream") {
    // 50k distinct values, each appearing twice — the register max must
    // dedup repeats for free
    val vals = spark.range(100000)
      .select(lit("g").as("grp"), concat(lit("v"), (col("id") % 50000)).as("v"))
    val est = Sketch.hllEstimate(Sketch.hllRegisters(vals, "grp", "v"), "grp")
      .select("est_distinct").as[Double].head()
    // m=256 -> standard error 1.04/16 = 6.5%; 3 sigma = 19.5%
    assert(math.abs(est - 50000.0) / 50000.0 < 0.195,
      s"estimate $est too far from 50000")
  }

  test("HLL small-range branch: linear counting near-exact under 100 distinct") {
    val vals = spark.range(60).select(lit("g").as("grp"), concat(lit("x"), col("id")).as("v"))
    val out = Sketch.hllEstimate(Sketch.hllRegisters(vals, "grp", "v"), "grp")
      .select("occupied", "est_distinct").as[(Long, Double)].head()
    assert(out._1 < 256, "must have empty registers to take the LC branch")
    // linear counting at 60/256 occupancy is typically within a few %
    assert(math.abs(out._2 - 60.0) / 60.0 < 0.15, s"LC estimate ${out._2} off 60")
  }

  test("HLL register table is bounded by groups * 256 and dedup-invariant") {
    val a = spark.range(20000).select((col("id") % 3).cast("string").as("grp"),
      concat(lit("s"), col("id")).as("v"))
    val regs = Sketch.hllRegisters(a, "grp", "v")
    assert(regs.count() <= 3 * 256)
    // feeding every value 7 more times changes nothing
    val dup = a.union(a).union(a).union(a).union(a).union(a).union(a).union(a)
    val e1 = Sketch.hllEstimate(regs, "grp").collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val e2 = Sketch.hllEstimate(Sketch.hllRegisters(dup, "grp", "v"), "grp")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(e1 === e2, "HLL must be insensitive to duplication")
  }

  test("HLL register aggregation plans a partial (map-side) aggregate") {
    val vals = spark.range(1000).select(lit("g").as("grp"), col("id").cast("string").as("v"))
    val plan = Sketch.hllRegisters(vals, "grp", "v").queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"),
      s"expected map-side combine in:\n$plan")
  }

  test("HLL merge across groups equals the sketch of the union, exactly") {
    val a = spark.range(5000).select(lit("a").as("grp"), concat(lit("v"), col("id")).as("v"))
    val b = spark.range(3000, 9000).select(lit("b").as("grp"), concat(lit("v"), col("id")).as("v"))
    val both = a.union(b)
    val merged = Sketch.hllMerge(Sketch.hllRegisters(both, "grp", "v"), "grp", "u")
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    val direct = Sketch.hllRegisters(
      both.select(lit("u").as("grp"), col("v")), "grp", "v")
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(merged === direct,
      "per-group registers max-merged must BE the union's registers")
  }

  // ---- Count-Min -------------------------------------------------------

  test("CMS estimates never underestimate and hit exactly on light load") {
    // 2000 distinct tokens with zipf-ish weights — under 4x512 counters
    // collisions exist but the min-over-rows estimate stays >= exact
    val weighted = spark.range(2000)
      .select(concat(lit("tok"), col("id")).as("v"),
        (lit(2000) - col("id")).as("w"))
    val counters = Sketch.cmsCounters(weighted, "v", "w")
    val est = Sketch.cmsEstimate(weighted, "v", counters)
      .select(col("v"), col("w"), col("est_cnt"))
      .as[(String, Long, Long)].collect()
    assert(est.length === 2000)
    assert(est.forall { case (_, w, e) => e >= w },
      "Count-Min must only ever overestimate")
    // a 10-value stream under 2048 counters is collision-free: exact
    val tiny = spark.range(10)
      .select(concat(lit("t"), col("id")).as("v"), (col("id") + 1).as("w"))
    val tinyEst = Sketch.cmsEstimate(tiny, "v", Sketch.cmsCounters(tiny, "v", "w"))
      .select(col("w"), col("est_cnt")).as[(Long, Long)].collect()
    assert(tinyEst.forall { case (w, e) => e === w })
  }

  test("xx64 sketch flavor: column hash == kernel hash, estimator stays accurate") {
    import org.apache.spark.sql.functions.xxhash64
    // the production flavor's Column-side hash must equal the kernel the
    // dedup family uses (same seed-42 xxhash64, same 60-bit mask), so
    // sketch keys and LSH keys are one hash family end-to-end
    val vals = Seq("alpha", "beta gamma", "x", "the quick brown fox", "")
    val gotCols = vals.toDF("v")
      .select(xxhash64(col("v")).bitwiseAND(lit(0x0fffffffffffffffL)))
      .as[Long].collect()
    vals.zip(gotCols).foreach { case (s, h) =>
      assert(h === Dedup.xxHash60(s), s)
    }
    // estimator quality is hash-family-independent: 2000 distinct values
    // under 256 registers estimates within the ~3x standard-error band
    val df = spark.range(2000).select(lit("g").as("g"),
      concat(lit("v"), col("id")).as("v"))
    val est = Sketch.hllEstimate(Sketch.hllRegisters(df, "g", "v", "xx64"), "g")
      .select("est_distinct").as[Double].head()
    assert(math.abs(est - 2000.0) / 2000.0 < 0.20, s"xx64 estimate $est")
  }

  test("fused shingle-hash kernel == string shingle pipeline, both families") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "the quick brown fox jumps over the lazy dog"),
      (2L, "a", "the quick brown fox jumps over the lazy dog"),
      (3L, "b", "pack my box with five dozen liquor jugs today"),
      (4L, "b", "too short"),
      (5L, "b", "")
    ).toDF("doc_id", "grp", "text")
    for (fam <- Seq("md5", "xx64")) {
      // hash-set equality per row: the fused kernel must produce exactly
      // the hashes of the distinct string shingles
      val viaStrings = docs.select(col("doc_id"),
          explode(Sketch.docShingles("text")).as("sh"))
        .as[(Long, String)].collect()
        .groupBy(_._1).view
        .mapValues(_.map(p => Dedup.hashFn(fam)(p._2)).toSet).toMap
      val fused = docs.select(col("doc_id"),
          explode(Sketch.docShingleHashes("text", fam)).as("h"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(fused === viaStrings, fam)
      // and the register tables are identical
      val valsS = docs.select(col("grp"), explode(Sketch.docShingles()).as("sh"))
      val valsH = docs.select(col("grp"),
        explode(Sketch.docShingleHashes("text", fam)).as("h"))
      val regS = Sketch.hllRegisters(valsS, "grp", "sh", fam)
        .as[(String, Long, Int)].collect().toSet
      val regH = Sketch.hllRegistersFromHashes(valsH, "grp", "h")
        .as[(String, Long, Int)].collect().toSet
      assert(regH === regS, fam)
    }
  }

  test("CMS probe of a never-inserted value estimates 0, not dropped/inflated") {
    // counters built from 10 values; probe 5 of them plus 5 absent ones
    // — an absent value leaves (some of) its d cells unoccupied, and the
    // true CMS answer is min(..., 0) = 0; the old inner-join probe
    // either dropped the row or min'd only its colliding cells
    val tiny = spark.range(10)
      .select(concat(lit("t"), col("id")).as("v"), (col("id") + 1).as("w"))
    val counters = Sketch.cmsCounters(tiny, "v", "w")
    val probes = spark.range(10)
      .select(concat(lit("t"), col("id") + 5).as("v"))
    val est = Sketch.cmsEstimate(probes, "v", counters)
      .select(col("v"), col("est_cnt")).as[(String, Long)].collect().toMap
    assert(est.size === 10, "every probed value must report")
    (5 until 10).foreach(i => assert(est(s"t$i") === i + 1L, "inserted: exact"))
    (10 until 15).foreach(i => assert(est(s"t$i") === 0L, "absent: 0"))
  }

  test("CMS counter matrix is bounded by d*w and mass-preserving per row") {
    val weighted = spark.range(50000)
      .select(concat(lit("v"), col("id")).as("v"), lit(1L).as("w"))
    val counters = Sketch.cmsCounters(weighted, "v", "w").cache()
    assert(counters.count() <= Sketch.CmsD.toLong * Sketch.CmsW)
    // every row of the sketch holds the full stream mass
    val perRow = counters.groupBy("r").agg(sum("c").as("s"))
      .select("s").as[Long].collect()
    assert(perRow.length === Sketch.CmsD && perRow.forall(_ === 50000L))
    counters.unpersist()
  }

  test("CMS heavy hitters ranks the true top token first on a skewed corpus") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("the quick fox jumps over dog" + " the" * 3),
        lit(" w"), col("id")).as("text"))
    val top = Sketch.cmsHeavyHitters(docs, "text", 5).collect()
    assert(top.head.getString(0) === "the")
    assert(top.head.getLong(1) >= 400L) // est >= exact = 4*100
    assert(top.forall(r => r.getLong(3) >= 0L), "err_bp is an overestimate gap")
  }

  // ---- Log-histogram quantile sketch ------------------------------------

  test("hist bins: bounded state, edges cover their values within 12.5%") {
    val n = 100000L
    val vals = spark.range(1, n).select(lit("g").as("grp"), col("id").as("x"))
    val bins = Sketch.histBins(vals, "grp", "x").cache()
    // one bin per (octave, mantissa): 8 sub-bins per octave, 17 octaves
    assert(bins.count() <= 8 * 17 + 8)
    // mass is preserved and each bin's edge bounds its members: the
    // per-bin max member recomputed directly must be <= edge, and the
    // edge within 12.5% + 2 of the bin's max member (tight coverage)
    assert(bins.agg(sum("cnt")).as[Long].head() === n - 1)
    val withBin = Sketch.histBins(vals, "grp", "x")
      .select(col("bin"), col("edge"))
    val maxPerBin = vals.select(col("x"),
        (col("x") + 1L).as("__v"))
      .select(col("x"), (length(bin(col("__v"))) - 1).cast("long").as("__e"),
        col("__v"))
      .select(col("x"), col("__e"), greatest(col("__e") - 3L, lit(0L)).as("__s"),
        col("__v"))
      .select(col("x"),
        (col("__e") * 8L + (expr("shiftright(__v, cast(__s as int))") % 8L)).as("bin"))
      .groupBy("bin").agg(max(col("x")).as("mx"))
    val chk = maxPerBin.join(withBin, "bin")
      .select((col("edge") >= col("mx") &&
        (col("edge") - col("mx")) * 8 <= col("mx") + 16).as("ok"))
      .as[Boolean].collect()
    assert(chk.nonEmpty && chk.forall(identity))
    bins.unpersist()
  }

  test("hist merge: per-scope bin counts add to exactly the direct build") {
    val vals = spark.range(5000).select(
      (col("id") % 3).cast("string").as("grp"), (col("id") % 777).as("x"))
    val per = Sketch.histBins(vals, "grp", "x")
    val merged = Sketch.histMerge(per, "u")
      .select("bin", "edge", "cnt").as[(Long, Long, Long)].collect().toSet
    val direct = Sketch.histBins(vals.select(lit("u").as("grp"), col("x")), "grp", "x")
      .select("bin", "edge", "cnt").as[(Long, Long, Long)].collect().toSet
    assert(merged === direct,
      "summed per-scope histograms must BE the union's histogram")
  }

  test("hist quantiles: rank coverage, minimality, and monotone estimates") {
    val vals = spark.range(1, 10001)
      .select(lit("g").as("grp"), col("id").as("x"))
    val hist = Sketch.histBins(vals, "grp", "x")
    val qs = Seq(10, 50, 90, 99)
    val got = Sketch.histQuantiles(hist, qs)
      .select("q_pct", "est_value", "rank_bp", "err_bp")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1) === qs.map(_.toLong).toArray)
    // achieved rank covers the target; overshoot is the declared err
    assert(got.forall { case (q, _, rank, err) =>
      rank >= q * 100 && err === rank - q * 100 })
    // estimates are monotone in q and within a bin (12.5%) of the truth
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq)
    val truth = Map(10L -> 1000L, 50L -> 5000L, 90L -> 9000L, 99L -> 9900L)
    got.foreach { case (q, est, _, _) =>
      assert(est >= truth(q) && est <= truth(q) + truth(q) / 7 + 2,
        s"q=$q est=$est truth=${truth(q)}")
    }
  }

  // ---- PageRank --------------------------------------------------------

  test("pageRank: star hub outranks leaves, path center outranks ends") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val r = Graph.pageRankFixed(star, "a", "b", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L), s"hub must outrank leaf: $r")
    assert(Set(1L, 2L, 3L, 4L).map(r).size === 1, "leaves are symmetric")

    val path = Seq((10L, 11L), (11L, 12L)).toDF("a", "b")
    val p = Graph.pageRankFixed(path, "a", "b", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(p(11L) > p(10L) && p(11L) > p(12L), s"path center must outrank ends: $p")
    assert(p(10L) === p(12L), "path ends are symmetric")
  }

  test("pageRank: rank mass stays bounded by the initial scale") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("a", "b")
    val total = Graph.pageRankFixed(edges, "a", "b", iters = 3)
      .agg(sum("rank_ppm")).head().getLong(0)
    // floors only lose mass; damping replaces what it removes
    assert(total > 0 && total <= 1000000L, s"mass $total out of bounds")
  }

  test("pageRank: result is partitioning-invariant (pure integer algebra)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L), (2L, 5L))
      .toDF("a", "b")
    val r1 = Graph.pageRankFixed(edges, "a", "b", iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val r2 = Graph.pageRankFixed(edges.repartition(7), "a", "b", iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r1 === r2)
  }

  // ---- PSI drift -------------------------------------------------------

  /** (scope, value) rows: scope "a" uniform 0..999; scope "b" the same
    * shape (no drift); scope "c" shifted up by 700 (real drift).
    */
  private def driftData = spark.range(3000).select(
    element_at(array(lit("a"), lit("b"), lit("c")), (col("id") % 3 + 1).cast("int"))
      .as("scope"),
    when(col("id") % 3 === 2, (col("id") / 3) % 1000 + 700)
      .otherwise((col("id") / 3) % 1000).as("v"))

  test("PSI: windows matching the baseline score near zero, a shifted one high") {
    // external-baseline path: the reference is the pooled CLEAN scopes
    // (a+b); c, 70% disjointly shifted, is scored against it. (A pooled
    // ref INCLUDING c flags every window — mass c holds exclusively is
    // mass the others 'lost' — which is correct PSI behavior but a
    // different fixture.)
    val bins = Sketch.histBins(driftData, "scope", "v")
    val ref = Sketch.histMerge(
      Sketch.histBins(driftData.where(col("scope") =!= "c"), "scope", "v"),
      "__ref")
    val psi = Sketch.psiDrift(bins, ref)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(psi("a") < 0.05 && psi("b") < 0.05, s"no-drift windows too high: $psi")
    assert(psi("c") > 0.25, s"shifted window must flag: $psi")
    assert(psi("a") === psi("b"), "identical windows must score identically")
  }

  test("PSI log is merge-on-read exact: split bin logs fold to the batch answer") {
    val d = driftData
    val whole = Sketch.histBins(d, "scope", "v")
    // two "micro-batches" by row parity, bins appended then folded by sum
    val part = Sketch.histBins(d.where(col("v") % 2 === 0), "scope", "v")
      .unionByName(Sketch.histBins(d.where(col("v") % 2 =!= 0), "scope", "v"))
      .groupBy("scope", "bin", "edge").agg(sum("cnt").as("cnt"))
    val a = Sketch.psiDrift(whole, Sketch.histMerge(whole, "__ref"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Sketch.psiDrift(part, Sketch.histMerge(part, "__ref"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a === b, "bin-count addition must reproduce the batch PSI bit-exactly")
  }

  test("PSI runs on sketch state: cells bounded by scopes x reference bins") {
    val bins = Sketch.histBins(driftData, "scope", "v")
    val nBins = Sketch.histMerge(bins, "__ref").count()
    val out = Sketch.psiDrift(bins, Sketch.histMerge(bins, "__ref"))
    assert(out.count() === 3)
    assert(nBins < 200, s"log-histogram must stay bounded, got $nBins bins")
  }
}
