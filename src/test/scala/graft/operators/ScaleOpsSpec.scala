package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = ((0 until 900).map(i => (1L, i)) ++ (0 until 100).map(i => (i.toLong + 2, i)))
      .toDF("k", "lv")
    val right = (1 to 20).map(i => (i.toLong, s"r$i")).toDF("rk", "rv")
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "lv", "rv").as[(Long, Int, String)].collect().toSet
    val salted = SkewJoin.saltedEquiJoin(left, right, "k", "rk", factor = 8)
      .select("k", "lv", "rv").as[(Long, Int, String)].collect().toSet
    assert(salted === plain)
    assert(plain.count(_._1 == 1L) === 900)
  }

  test("embedding cosine pairs: exact flavor finds all threshold pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(i => (i.toLong, vec()))
    // planted near-dups: slightly perturbed copies
    val dups = base.take(5).map { case (id, v) =>
      (id + 100, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosinePairs(df, "vec_id", "embedding", 16, 0.95, exact = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 5).foreach(i => assert(pairs.contains((i.toLong, i.toLong + 100)), s"missing dup $i"))
    // LSH flavor finds a subset (recall < 1), never false positives below threshold
    val lsh = Dedup.embeddingCosinePairs(df, "vec_id", "embedding", 16, 0.95, exact = false, nBits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(pairs))
  }

  test("bucketed ANN table: partition-pruned probe equals in-memory probe") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(7)
    val rows = (0L until 200L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ann").toString + "/buckets"
    SimilaritySearch.writeBucketed(df, "vec_id", "embedding", dim, dir, nBits = 4)
    val query = rows.head._2.map(_.toDouble)

    val fromDisk = SimilaritySearch
      .annTopKBucketed(spark, dir, "vec_id", "embedding", dim, query, k = 5, nBits = 4)
    val inMem = SimilaritySearch
      .annTopK(df, "vec_id", "embedding", dim, query, k = 5, nBits = 4)
      .as[(Long, Double)].collect().toSeq
    assert(fromDisk.as[(Long, Double)].collect().toSeq === inMem)

    // the probe must prune partitions at the scan, not filter post-scan
    val plan = fromDisk.queryExecution.executedPlan.toString
    val qb = SimilaritySearch.queryBucket(query, dim, nBits = 4)
    assert(plan.contains("PartitionFilters") && plan.contains(s"bucket"),
      s"expected partition pruning on bucket=$qb in:\n$plan")
  }

  test("batched multimodal decode: deterministic, partition-amortized") {
    import spark.implicits._
    val docs = Seq((1L, "hello media bytes"), (2L, "other payload")).toDF("doc_id", "text")
    val decoded = Multimodal.decodeBatch(
      Multimodal.attachBinary(docs, "text"), "doc_id").collect()
      .map(d => d.doc_id -> d).toMap
    assert(decoded(1L).n_bytes === 17)
    assert(decoded(1L).feature.length === 8)
    assert(decoded(1L).feature.forall(f => f >= 0f && f <= 1f))
    // deterministic across runs
    val again = Multimodal.decodeBatch(
      Multimodal.attachBinary(docs, "text"), "doc_id").collect()
      .map(d => d.doc_id -> d.checksum).toMap
    assert(again(1L) === decoded(1L).checksum)
  }
}
