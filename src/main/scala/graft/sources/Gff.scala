package graft.sources

import graft.model.Feature
import org.apache.spark.sql.{Dataset, SparkSession}

import scala.util.Try

/** GFF3 feature text source (SURVEY.md S5; the reference feeds CNV
  * features through ADAM's loadFeatures,
  * avocado-cli/.../BiallelicGenotyper.scala:245-251 — this is the
  * engine-native equivalent for the one feature flavor the reference
  * consumes: DUP/DEL copy-number calls).
  *
  * GFF3 is 9 tab-separated columns: seqid, source, type, start, end,
  * score, strand, phase, attributes — coordinates 1-based INCLUSIVE,
  * converted here to the engine's 0-based half-open [start, end).
  * Comment/pragma lines (#...) and malformed rows are skipped, the same
  * per-row failure isolation as [[Sam]]. The scan is a distributed
  * line-split flatMap — splittable text, no driver parsing.
  */
object Gff {

  /** Parse one GFF3 data line (None for comments/pragmas/malformed). */
  def parseLine(line: String): Option[Feature] = {
    if (line.isEmpty || line.startsWith("#")) return None
    Try {
      val f = line.split("\t")
      require(f.length >= 8)
      Feature(
        contigName = f(0),
        start = f(3).toLong - 1, // 1-based inclusive -> 0-based half-open
        end = f(4).toLong,
        featureType = f(2),
        source = f(1),
        score = f(5).toDoubleOption,
        strand = f(6) match { case "+" | "-" | "?" => Some(f(6)); case _ => None },
        attributes = if (f.length > 8) f(8) else "")
    }.toOption
  }

  /** Distributed GFF3 scan. */
  def read(spark: SparkSession, path: String): Dataset[Feature] = {
    import spark.implicits._
    spark.read.textFile(path).flatMap(parseLine _)
  }
}
