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
}
