package graft.tools

import org.apache.spark.sql.SparkSession

/** Step-up probe for operator VARIANTS that are deliberately not catalog
  * queries (dev tool, not part of the driver contract): the catalog pins
  * LSH bits so the DuckDB oracle can inline the hyperplanes, but the
  * production recommendation is occupancy-driven sizing
  * ([[graft.operators.SimilaritySearch.autoBits]]) — this main measures
  * that path on the same ScaleUp legs the PROFILE step-up tables use, so
  * "auto-bits keeps the LSH near-dup sub-quadratic" is a reproducible
  * number, not prose.
  *
  * Usage: `sbt "runMain graft.tools.StepUpProbe /root/testdata/sf0.1 /tmp/sf1"`
  * — prints one line per leg: pairs found, wall seconds (second run of
  * two, so JIT/plan warmup is excluded), bits chosen.
  */
object StepUpProbe {
  def main(args: Array[String]): Unit = {
    val legs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-stepup-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- legs) {
      val df = spark.read.parquet(s"$dir/embeddings.parquet")
      def run(): Long = graft.operators.Dedup
        .embeddingCosinePairs(df, "vec_id", "embedding", 64, 0.35,
          exact = false, targetOccupancy = 125L)
        .count()
      run() // warm: JIT + plan cache
      val t0 = System.nanoTime()
      val pairs = run()
      val wall = (System.nanoTime() - t0) / 1e9
      val bits = graft.operators.SimilaritySearch.autoBits(df.count(), 125L)
      println(f"[stepup-probe] $dir auto-lsh pairs=$pairs wall=$wall%.2fs bits=$bits")
    }
    spark.stop()
  }
}
