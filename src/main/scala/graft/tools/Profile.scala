package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for slow queries (dev tool, not part of the driver
  * contract).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.cache().count()

    // materialized-token shingles (the library's shape)
    val withToks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val toks = col("toks")
    val shingles = array_distinct(
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
    val sets = withToks.select(col("doc_id"), shingles.as("s"))

    time("sets materialize")(sets.count())

    time("full naive")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    time("full prefix")(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5).count())
    time("full prefix 2nd")(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5).count())

    // ---- g2 stage timings ----
    import graft.genomics._
    import graft.model.DiscoveredVariant
    import graft.queries.Queries
    val spark2 = spark
    import spark2.implicits._
    val rds = Queries.profileReads(spark, dir)
    time("g2 reads materialize")(rds.count())
    val pileup = rds.flatMap(Observer.basePileup).toDF()
    time("g2 raw pileup")(pileup.count())
    val compressed = pileup
      .groupBy("contigName", "pos", "base", "refBase", "qual", "forwardStrand", "mapq", "sampleId")
      .agg(count(lit(1)).as("w"))
    time("g2 compress via groupBy")(compressed.count())
    time("g2 compress via bins")(Observer.compressedPileup(rds).count())
    val variants = DiscoverVariants
      .discover(rds, minPhred = 20, minObservations = 2)
      .select("contigName", "start", "referenceAllele", "alternateAllele")
      .as[DiscoveredVariant]
    time("g2 discovery")(variants.count())
    time("g2 full call")(BiallelicGenotyper.call(rds, variants, ploidy = 2, binSize = 20.0).count())
    time("g2 full query 2nd")(Queries.g2_genotype_calls(spark, dir).count())
    spark.stop()
  }
}
