package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-pruned join result equals the plain join exactly") {
    val big = spark.range(100000)
      .select((col("id") % 10000).as("k"), col("id").as("payload"))
    val small = spark.range(300).select((col("id") * 7).as("sk"), lit("dim").as("d"))
    val pruned = BloomJoin.bloomPrunedJoin(big, small, "k", "sk")
      .select("k", "payload", "d").as[(Long, Long, String)].collect().toSet
    val plain = big.join(small, big("k") === small("sk"))
      .select("k", "payload", "d").as[(Long, Long, String)].collect().toSet
    assert(pruned === plain)
    assert(pruned.nonEmpty)
  }

  test("the sketch actually prunes: selective build side filters most probe rows") {
    val big = spark.range(200000).select((col("id") % 100000).as("k"))
    val small = spark.range(50).select(col("id").as("sk"))
    val bf = small.stat.bloomFilter("sk", 50, 0.01)
    val bcast = spark.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bcast.value.mightContainLong(k))
    val passed = big.where(might(col("k"))).count()
    // 50 true keys x 2 copies = 100 true rows; 1% fpp on the rest
    assert(passed >= 100L && passed < 100L + 4000L,
      s"expected ~100 true + <=2% fp of 200k, got $passed")
  }

  test("empty build side yields the empty join, no sketch NPE") {
    val big = spark.range(100).select(col("id").as("k"))
    val small = spark.range(0).select(col("id").as("sk"))
    assert(BloomJoin.bloomPrunedJoin(big, small, "k", "sk").count() === 0L)
  }
}
