package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input robustness for the training-pipeline operators: a
  * 100 TB job composes these over arbitrary slices, and an empty or
  * single-row slice (a new source, a filtered-out day, a cold-start
  * history) must flow through, not crash the plan.
  */
class EdgeCasesSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }
  private val empty = docs(Nil)
  private val one = docs(Seq((7L, "a single document of text")))

  test("trainingOrder: empty corpus and single row") {
    import spark.implicits._
    assert(Sharding.trainingOrder(empty, "doc_id").count() === 0)
    val o = Sharding.trainingOrder(one, "doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(o === Seq((7L, 0L)))
  }

  test("shardManifest: empty corpus yields an empty manifest") {
    assert(Sharding.shardManifest(empty, "doc_id", "text", 16).count() === 0)
  }

  test("bloomDecontaminate: empty benchmark drops nothing") {
    import spark.implicits._
    val out = Dedup.bloomDecontaminate(one, empty, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(out === Seq(7L))
  }

  test("incrementalExact: cold-start (empty history) keeps all batch keepers") {
    import spark.implicits._
    val batch = docs(Seq((1L, "x y"), (2L, "x y"), (3L, "z w")))
    val out = Dedup.incrementalExact(batch,
      Dedup.exactFingerprintIndex(empty, "text"), "doc_id", "text")
      .as[Long].collect().toSet
    assert(out === Set(1L, 3L))
  }

  test("unigramLogPpl: empty corpus is empty, single doc scores its own LM") {
    import spark.implicits._
    assert(TextAnalysis.unigramLogPpl(empty, "doc_id", "text").count() === 0)
    // one doc of 4 distinct tokens: p(w)=1/4 each -> exactly 2 bits/token
    val s = TextAnalysis.unigramLogPpl(docs(Seq((1L, "a b c d"))), "doc_id", "text")
      .select("bits_per_token").as[Double].head()
    assert(math.abs(s - 2.0) < 1e-9)
  }

  test("chunkDocuments: stride > window samples disjoint slices") {
    import spark.implicits._
    val got = Sampling.chunkDocuments(
      docs(Seq((1L, (1 to 10).map("t" + _).mkString(" ")))),
      "doc_id", "text", window = 2, stride = 5)
      .select("chunk_text").as[String].collect().toSeq
    assert(got === Seq("t1 t2", "t6 t7"))
  }

  test("connectedComponents: empty edge set converges to an empty labeling") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(pairs, "doc_a", "doc_b").count() === 0)
  }

  test("asOf: empty right side yields null payloads, not dropped rows") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("event_id", "k", "ts")
    val right = Seq.empty[(Long, Long, Double)].toDF("rk", "rts", "payload")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "ts", "rts", Seq("payload"))
    val rows = out.collect()
    assert(rows.length === 1)
    assert(rows.head.isNullAt(out.columns.indexOf("payload")))
  }

  test("hammingTopK: k larger than the corpus returns every row once") {
    import spark.implicits._
    val corpus = (0 until 5).map(i => (i.toLong, Seq.fill(8)(i.toDouble - 2)))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch.hammingTopK(corpus, "vec_id", "embedding",
      Array.fill(8)(1.0), k = 50)
    assert(out.count() === 5)
    assert(out.select("vec_id").distinct().count() === 5)
  }

  test("hammingTopK: null embedding rows drop instead of NPE or ranking first") {
    import spark.implicits._
    val corpus = (0 until 3).map(i => (i.toLong, Seq.fill(8)(i.toDouble - 1)))
      .toDF("vec_id", "embedding")
      .unionByName(Seq((99L, null.asInstanceOf[Seq[Double]])).toDF("vec_id", "embedding"))
    val out = SimilaritySearch.hammingTopK(corpus, "vec_id", "embedding",
      Array.fill(8)(1.0), k = 10)
    val ids = out.select("vec_id").as[Long].collect().toSet
    assert(ids === Set(0L, 1L, 2L), "the null-embedding row is excluded")
  }

  test("bloomDecontaminateWithRelease: release frees the pinned gram blocks") {
    import spark.implicits._
    val corpus = docs(Seq((1L, "a b c d e"), (2L, "x y z w v")))
    val bench = docs(Seq((9L, "a b c d e")))
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val (out, release) = Dedup.bloomDecontaminateWithRelease(
      corpus, bench, "doc_id", "text", n = 3, fpp = 0.1)
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L), "contaminated doc dropped")
    assert((spark.sparkContext.getPersistentRDDs.keySet.toSet -- before).nonEmpty,
      "the call pins the benchmark gram blocks")
    release()
    assert((spark.sparkContext.getPersistentRDDs.keySet.toSet -- before).isEmpty,
      "release() unpins everything the call created")
  }
}
