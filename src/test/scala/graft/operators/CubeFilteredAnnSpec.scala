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
