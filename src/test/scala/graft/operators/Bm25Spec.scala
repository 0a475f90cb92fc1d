package graft.operators

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("rare terms outscore common ones; non-matching docs never rank") {
    val corpus = docs(
      (1L, "alpha beta gamma delta"),   // hits rare 'gamma'
      (2L, "alpha beta beta epsilon"),  // hits only ubiquitous 'alpha'
      (3L, "alpha zeta eta theta"),
      (4L, "alpha iota kappa lambda"),
      (5L, "mu nu xi omicron"))         // no query term at all
    val got = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      Seq("alpha", "gamma"), 10)
      .select("doc_id", "score_x10k", "n_hit")
      .as[(Long, Long, Long)].collect()
    val ids = got.map(_._1).toSet
    assert(!ids.contains(5L), "doc without any query term must not appear")
    assert(got.head._1 === 1L, "the doc hitting the rare term must rank first")
    assert(got.find(_._1 == 1L).get._3 === 2L)
    assert(got.forall(_._2 > 0L))
  }

  test("higher tf ranks higher at equal df and doc length") {
    val corpus = docs(
      (1L, "spark spark spark pad"),
      (2L, "spark pad pad pad"),
      (3L, "pad pad pad pad"))
    val got = TextAnalysis.bm25TopK(corpus, "doc_id", "text", Seq("spark"), 10)
      .select("doc_id").as[Long].collect()
    assert(got === Array(1L, 2L))
  }

  test("longer documents are penalized at equal tf") {
    val corpus = docs(
      (1L, "spark a b c"),
      (2L, "spark " + ("x " * 40).trim),
      (3L, "unrelated filler text"))
    val got = TextAnalysis.bm25TopK(corpus, "doc_id", "text", Seq("spark"), 10)
      .select("doc_id", "score_x10k").as[(Long, Long)].collect()
    assert(got.map(_._1) === Array(1L, 2L))
    assert(got(0)._2 > got(1)._2)
  }

  test("batched serving equals the one-query ranker, per query") {
    val corpus = docs(
      (1L, "alpha beta gamma"), (2L, "alpha beta beta"), (3L, "gamma delta x"),
      (4L, "delta delta beta"), (5L, "epsilon zeta x"))
    val queries = Seq(0L -> Seq("alpha", "gamma"), 1L -> Seq("delta"), 2L -> Seq("beta"))
    val batch = TextAnalysis.bm25BatchTopK(corpus, "doc_id", "text", queries, 3)
      .select("qid", "doc_id", "score_x10k", "n_hit")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(r => (r._2, r._3, r._4)).toSet }
    queries.foreach { case (qid, terms) =>
      val single = TextAnalysis.bm25TopK(corpus, "doc_id", "text", terms, 3)
        .select("doc_id", "score_x10k", "n_hit")
        .as[(Long, Long, Long)].collect().toSet
      assert(batch(qid) === single, s"query $qid must score identically in batch")
    }
  }

  test("k bounds the result and the order is (score desc, doc_id)") {
    val corpus = docs((1L to 30L).map(i => i -> "term pad").toSeq: _*)
    val got = TextAnalysis.bm25TopK(corpus, "doc_id", "text", Seq("term"), 7)
      .select("doc_id").as[Long].collect()
    // identical scores everywhere: doc_id ascending breaks the tie
    assert(got === (1L to 7L).toArray)
  }
}
