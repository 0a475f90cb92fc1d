package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated Bloom false-positive-rate experiment (dev tool, r15 j8
  * investigation): builds `stat.bloomFilter` sketches at increasing
  * key counts with the maxNumBits clamp lifted, probes each with a
  * disjoint key range, and prints the MEASURED fp rate against the
  * requested fpp — separating "the sketch is mis-sized" from "the
  * sketch is broken at size".
  *
  * Usage: sbt "runMain graft.tools.BloomIso"
  */
object BloomIso {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq(3000000L, 30000000L)) {
      val keys = spark.range(n).select(col("id").as("k"))
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 10000000000L)
      val bf = keys.stat.bloomFilter("k", n, 0.01)
      val bc = spark.sparkContext.broadcast(bf)
      val might = udf((k: Long) => bc.value.mightContainLong(k))
      val fp = spark.range(n, 2L * n).select(col("id").as("k"))
        .where(might(col("k"))).count()
      println(s"n=$n bits=${bf.bitSize()} bits/key=${bf.bitSize().toDouble / n} " +
        s"fpRate=${fp.toDouble / n}")
    }
    spark.stop()
  }
}
