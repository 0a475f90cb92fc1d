package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CubeFilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  test("a9 cube emits the full grouping lattice with correct flags") {
    val out = graft.queries.Queries.a9_cube(spark, sf("0.001"))
      .select("g_lang", "g_src", "n_docs").as[(Long, Long, Long)].collect()
    val byLevel = out.groupBy(t => (t._1, t._2))
    assert(byLevel.keySet == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)),
      "all four lattice levels present")
    // every level conserves the total row count
    val total = byLevel((1L, 1L)).map(_._3).sum
    byLevel.values.foreach(rows => assert(rows.map(_._3).sum == total))
    assert(byLevel((1L, 1L)).size == 1, "grand total is one row")
  }

  test("e18 plan: the corpus predicate reaches the parquet scan (pre-filter, not post)") {
    val plan = graft.queries.Queries.e18_filtered_ann(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    // the label filter must sit on the scan side: either pushed into the
    // reader (PushedFilters) or as a Filter directly over the scan —
    // never evaluated after the bucket join
    assert(plan.contains("PushedFilters: [IsNotNull(label)]"),
      s"label null-check must reach the reader:\n$plan")
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    val pmodFilterIdx = plan.indexOf("Filter (isnotnull(label")
    assert(joinIdx >= 0, s"bucket probe must be a hash join:\n$plan")
    assert(pmodFilterIdx > joinIdx,
      s"predicate must sit below the join, on the scan side:\n$plan")
    // and no nested-loop anywhere in the probe
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("filteredProbes: np = ceil(np0/f), capped at 2^nBits, total for empty match") {
    val df = (0L until 120L).toDF("id")
    // f = 1: an always-true predicate leaves np0 untouched
    assert(SimilaritySearch.filteredProbes(df, lit(true), np0 = 4, nBits = 4) == 4)
    // f = 1/3: ceil(4 / (1/3)) = 12
    assert(SimilaritySearch.filteredProbes(df, col("id") % 3 === 1, np0 = 4, nBits = 4) == 12)
    // f = 1/6: ceil(24) = 24 > 2^4 → capped at the bucket count
    assert(SimilaritySearch.filteredProbes(df, col("id") % 6 === 1, np0 = 4, nBits = 4) == 16)
    // uneven split: 120 total, 7 matching → ceil(480/7) = 69, cap 2^8 = 256 not hit
    assert(SimilaritySearch.filteredProbes(df, col("id") < 7, np0 = 4, nBits = 8) == 69)
    // predicate matching NOTHING: no division by zero — probe everything
    assert(SimilaritySearch.filteredProbes(df, lit(false), np0 = 4, nBits = 4) == 16)
  }

  test("filteredAnnTopK: widened probes restore recall at f ~= 1/3") {
    val emb = spark.read.parquet(s"${sf("0.001")}/embeddings.parquet")
    val query = emb.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val pred = pmod(col("label"), lit(3)) === 1
    val exact = SimilaritySearch.topK(emb.where(pred), "vec_id", "embedding",
      query, k = 20)
    val widened = SimilaritySearch.filteredAnnTopK(emb, "vec_id", "embedding",
      dim = query.length, query = query, k = 20, pred = pred, nBits = 4, np0 = 4)
    val rWide = SimilaritySearch.recallAt(exact, widened, "vec_id", k = 20)
      .head().getDouble(0)
    // the un-widened call the API now protects against
    val narrow = SimilaritySearch.annTopK(emb.where(pred), "vec_id", "embedding",
      dim = query.length, query = query, k = 20, nBits = 4, nProbes = 4)
    val rNarrow = SimilaritySearch.recallAt(exact, narrow, "vec_id", k = 20)
      .head().getDouble(0)
    assert(rWide >= 0.85, s"widened recall $rWide")
    assert(rWide >= rNarrow,
      s"widening must not lose recall (wide $rWide vs narrow $rNarrow)")
  }

  test("e18 filtered ANN: every hit satisfies the predicate; ranking is exact on survivors") {
    val emb = spark.read.parquet(s"${sf("0.001")}/embeddings.parquet")
    val out = graft.queries.Queries.e18_filtered_ann(spark, sf("0.001"))
      .as[(Long, Long, Double)].collect()
    val okLabels = emb.where(pmod(col("label"), lit(3)) === 1)
      .select("vec_id").as[Long].collect().toSet
    assert(out.nonEmpty)
    out.foreach { case (_, vid, _) =>
      assert(okLabels.contains(vid), s"hit $vid violates the corpus predicate")
    }
    // per query: <= 10 hits, scores non-increasing on the (cos desc, id) order
    out.groupBy(_._1).foreach { case (qid, hits) =>
      assert(hits.length <= 10, s"query $qid over k")
      val sorted = hits.sortBy(h => (-h._3, h._2))
      assert(sorted.map(_._2).toSeq == hits.sortBy(h => (-h._3, h._2)).map(_._2).toSeq)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      }, s"query $qid scores must be non-increasing")
    }
  }
}
