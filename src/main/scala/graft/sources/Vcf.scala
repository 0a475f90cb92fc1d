package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** VCF text source/sink (SURVEY.md S3/S7): genotype calls to/from VCF
  * lines. Rendering is a narrow projection to one string column; the
  * single-file option is a coalesce(1) — the distributed write is the
  * default, a directory of part files, exactly how a 100 TB callset
  * must be written.
  */
object Vcf {

  def header(sampleIds: Seq[String]): String =
    Seq(
      "##fileformat=VCFv4.2",
      "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"Genotype\">",
      "##FORMAT=<ID=GQ,Number=1,Type=Integer,Description=\"Genotype Quality\">",
      "##FORMAT=<ID=DP,Number=1,Type=Integer,Description=\"Read Depth\">",
      ("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT" +: sampleIds).mkString("\t")
    ).mkString("\n")

  /** Render called-genotype rows (genotyper output schema) to VCF data
    * lines. POS is 1-based per spec (engine coordinates are 0-based
    * half-open).
    */
  def renderLines(gts: DataFrame): Dataset[String] = {
    val spark = gts.sparkSession
    import spark.implicits._
    val gt = when(col("genotypeState") === 0, "0/0")
      .when(col("genotypeState") === 1, "0/1")
      .when(col("genotypeState") === 2, "1/1")
      .otherwise("./.")
    gts.select(concat_ws("\t",
      col("contigName"),
      (col("start") + 1).cast("string"),
      lit("."),
      col("referenceAllele"),
      coalesce(col("alternateAllele"), lit(".")),
      coalesce(round(col("genotypeQuality"), 0).cast("int").cast("string"), lit(".")),
      lit("PASS"),
      lit("."),
      lit("GT:GQ:DP"),
      concat_ws(":",
        gt,
        coalesce(round(col("genotypeQuality"), 0).cast("int").cast("string"), lit(".")),
        col("readDepth").cast("string"))).as("line")).as[String]
  }

  /** Write VCF; singleFile concatenates through one task (small outputs
    * only — a cohort VCF at scale stays distributed).
    */
  def write(gts: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val lines = renderLines(gts.orderBy(col("contigName"), col("start")))
    val out = if (singleFile) lines.coalesce(1) else lines
    out.write.mode("overwrite").text(path)
  }

  /** Parse VCF data lines back to the genotype schema, one row per
    * (site, sample). Sample ids come from the #CHROM header line
    * (headerless dumps — e.g. this sink's own output — get a single
    * "sample"); per-sample read depth is located via the FORMAT column.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
    val samples: Seq[String] = raw
      .where(col("value").startsWith("#CHROM"))
      .collect().headOption
      .map(_.getString(0).split("\t").drop(9).toSeq)
      .filter(_.nonEmpty)
      .getOrElse(Seq("sample"))
    val sampleArr = typedlit(samples)
    raw.where(!col("value").startsWith("#"))
      .withColumn("f", split(col("value"), "\t"))
      .withColumn("idx", explode(sequence(lit(0), lit(samples.length - 1))))
      .withColumn("sampleId", element_at(sampleArr, col("idx") + 1))
      .withColumn("smp", split(element_at(col("f"), col("idx") + 10), ":"))
      .withColumn("gt", col("smp").getItem(0))
      .withColumn("dpIdx",
        array_position(split(element_at(col("f"), 9), ":"), "DP").cast("int"))
      .select(
        col("f").getItem(0).as("contigName"),
        (col("f").getItem(1).cast("long") - 1).as("start"),
        col("f").getItem(3).as("referenceAllele"),
        when(col("f").getItem(4) === ".", lit(null).cast("string"))
          .otherwise(col("f").getItem(4)).as("alternateAllele"),
        col("sampleId"),
        when(col("gt").contains("."), -1)
          .otherwise(size(filter(split(col("gt"), "[/|]"), a => a === "1")))
          .as("genotypeState"),
        when(col("dpIdx") > 0, element_at(col("smp"), col("dpIdx")))
          .cast("int").as("readDepth"))
  }
}
