package graft.cli

import graft.genomics._
import graft.model.{DiscoveredVariant, Read}
import graft.sources.{Bam, Sam, Vcf}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** CLI entry points mirroring the reference's six commands
  * (reference AvocadoMain.scala:32-38: biallelicGenotyper, discover,
  * jointer, mergeDiscovered, reassemble, trioGenotyper), so a user of
  * the reference can run the same workflows:
  *
  *   graft.cli.Main discover <reads> <out> [minPhred] [minObs]
  *   graft.cli.Main biallelicGenotyper <reads> <out> [minPhred] [minObs]
  *   graft.cli.Main jointer <genotypes-parquet|vcf> <out-vcf> [-from_gvcf]
  *   graft.cli.Main mergeDiscovered <variants-glob> <out>
  *   graft.cli.Main reassemble <reads> <out>
  *   graft.cli.Main trioGenotyper <reads> <out> <mother> <father> <child>
  *
  * Reads: .sam files or parquet directories of the Read schema.
  * Outputs: parquet (calls/variants/reads) or VCF text (jointer).
  */
object Main {

  def session(): SparkSession = SparkSession.builder()
    .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
    .appName("graft")
    .config("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def loadReads(spark: SparkSession, path: String): Dataset[Read] = {
    import spark.implicits._
    if (path.endsWith(".sam")) Sam.read(spark, path)
    else if (path.endsWith(".bam")) Bam.read(spark, path)
    else spark.read.parquet(path).as[Read]
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: <command> <in> <out> [...]")
    val cmd = args(0)
    // reuse an already-running session (tests, notebooks); own and stop
    // only a session we created
    val existing = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = existing.getOrElse(session())
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    cmd match {
      case "discover" =>
        val minPhred = if (args.length > 3) args(3).toInt else 20
        val minObs = if (args.length > 4) args(4).toLong else 2L
        DiscoverVariants.discover(PrefilterReads(loadReads(spark, args(1))), minPhred, minObs)
          .write.mode("overwrite").parquet(args(2))

      case "biallelicGenotyper" =>
        val minPhred = if (args.length > 3) args(3).toInt else 20
        val minObs = if (args.length > 4) args(4).toLong else 2L
        val reads = PrefilterReads(loadReads(spark, args(1)))
        val variants = DiscoverVariants.discover(reads, minPhred, minObs)
          .select("contigName", "start", "referenceAllele", "alternateAllele")
          .as[DiscoveredVariant]
        val called = RewriteHets(
          HardFilterGenotypes(BiallelicGenotyper.call(reads, variants)))
        called.write.mode("overwrite").parquet(args(2))

      case "jointer" =>
        // -from_gvcf (reference CLI Jointer.scala:74-146): square the
        // per-sample gVCFs (exact calls win, reference blocks fill) before
        // the joint layer; otherwise genotypes are already squared
        val fromGvcf = args.contains("-from_gvcf")
        val in0 = {
          val p = args(1)
          if (p.endsWith(".vcf") || p.endsWith(".g.vcf")) Vcf.read(spark, p)
          else spark.read.parquet(p)
        }
        val in = if (in0.columns.contains("end")) in0
          else in0.withColumn("end", col("start") + 1)
        val gts = if (fromGvcf) SquareOff.squareOff(in) else in
        val joint = JointAnnotatorCaller(gts)
        Vcf.write(joint.withColumn("genotypeState", col("recalledState"))
          .withColumn("genotypeQuality", col("recalledQuality")), args(2))

      case "mergeDiscovered" =>
        spark.read.parquet(args(1))
          .dropDuplicates("contigName", "start", "referenceAllele", "alternateAllele")
          .write.mode("overwrite").parquet(args(2))

      case "reassemble" =>
        Realigner.realign(loadReads(spark, args(1)))
          .write.mode("overwrite").parquet(args(2))

      case "trioGenotyper" =>
        require(args.length >= 6, "trioGenotyper <reads> <out> <mother> <father> <child>")
        val reads = PrefilterReads(loadReads(spark, args(1)))
        val variants = DiscoverVariants.discover(reads, 20, 2)
          .select("contigName", "start", "referenceAllele", "alternateAllele")
          .as[DiscoveredVariant]
        val called = BiallelicGenotyper.call(reads, variants)
          .withColumn("end", col("start") + greatest(length(col("referenceAllele")), lit(1)))
        TrioCaller(called, args(3), args(4), args(5))
          .write.mode("overwrite").parquet(args(2))

      case other => sys.error(s"unknown command '$other'")
    }
    if (existing.isEmpty) spark.stop()
  }
}
