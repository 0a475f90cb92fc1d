package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are forced through the noop sink (not
  * `.count()`) so Catalyst cannot prune the measured work away.
  */
object Bench {

  // NOTE on g2 vs g4: g4 re-runs a full genotyping pass, but over a
  // DIFFERENT cohort than g2 (3 samples derived from l_linestatus vs
  // g2's single sample), so their called tables cannot be shared without
  // changing query semantics; g4's cost is its honest two-stage cost.
  val headline: Seq[String] = Seq(
    "a3_wide_agg",
    "j3_bcast_equijoin",
    "j2_interval_overlap_shuffle",
    "j1_interval_point_bcast",
    "w2_running_sum",
    "w4_top2_margin",
    "d2_ngram_jaccard_pairs",
    "d3_minhash_lsh_pairs",
    "d4_simhash_pairs",
    "d5_dup_ngrams",
    "c1_clean_corpus",
    "e1_cosine_score",
    "e4_ivf_topk",
    "e5_kmeans_step",
    "m2_frame_sample",
    "t2_quality_score",
    "t6_tfidf_topterms",
    "ev1_time_window_agg",
    "ev4_stream_sessions",
    "ev7_asof_enrich",
    "d6_decontaminate",
    "d7_dup_clusters",
    "e7_quantized_topk",
    "g1_discover_variants",
    "g2_genotype_calls",
    "g4_joint_recall",
    "g6_gvcf_squareoff")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup on the smallest SF so headline timings measure
    // steady-state query execution, not first-query class loading.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // Production-path overrides: same operator and plan as the catalog
    // query, but on the production hash family (xx64) instead of the
    // DuckDB-reproducible md5 the oracle gate needs.
    val overrides: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map(
        "d3_minhash_lsh_pairs" -> (queries.Queries.d3_minhash_lsh_pairs_prod _),
        "d7_dup_clusters" -> (queries.Queries.d7_dup_clusters_prod _))

    val results = headline.flatMap { name =>
      overrides.get(name).orElse(SparkEntry.queries.get(name)).map { fn =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // overrides are recorded in the output so a reader knows which rows
    // ran a non-oracle configuration (d3 times the xx64 production hash
    // family; the oracle gate verifies the md5 flavor of the same plan)
    val ov = overrides.keys.toSeq.sorted
      .map(k => "\"" + k + "\":\"xx64\"").mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"hash_family_overrides":$ov,"sf":"$sfDir"}"""
    // stdout (unprefixed via fork + StdoutOutput) AND a file artifact,
    // so the driver's parse can't be defeated by log interleaving
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json + "\n")
    spark.stop()
  }
}
