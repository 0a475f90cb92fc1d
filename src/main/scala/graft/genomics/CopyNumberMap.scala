package graft.genomics

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-number map (SURVEY.md A8/J5; reference CopyNumberMap.scala:45-112):
  * CNV calls (DUP/DEL features) adjust the local ploidy around the base.
  * The call set is small (thousands of intervals), so — exactly as the
  * reference does — it is collected to the driver, sorted per contig,
  * and broadcast; per-row probes are a binary search inside a codegen'd
  * UDF (the in-memory interval probe J5). This is the one deliberate
  * driver-side collect in the engine, and it is bounded by the CNV call
  * set size, never the data size.
  */
object CopyNumberMap {

  /** contig -> intervals (start, end, copyNumber) sorted by start. */
  type CnMap = Map[String, Array[(Long, Long, Int)]]

  case class Built(bc: Broadcast[CnMap], minPloidy: Int, maxPloidy: Int, basePloidy: Int) {

    /** Copy number at a point (first overlapping interval wins, as with
      * the reference's sorted-scan probe).
      */
    def at(contig: String, pos: Long): Int = {
      val ivs = bc.value.getOrElse(contig, Array.empty)
      // binary search for the last interval with start <= pos
      var lo = 0; var hi = ivs.length - 1; var found = basePloidy
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (ivs(mid)._1 <= pos) {
          if (pos < ivs(mid)._2) { found = ivs(mid)._3; hi = -1 /* break */ }
          else lo = mid + 1
        } else hi = mid - 1
      }
      found
    }

    /** Column-level probe for use in declarative pipelines. */
    def copyNumberAt(contig: Column, pos: Column): Column = {
      val probe = udf((c: String, p: Long) => at(c, p))
      probe(contig, pos)
    }
  }

  /** Build from whole-contig ploidy overrides (the CLI's -contig_ploidy,
    * e.g. chrX=1,chrY=1 for a male sample): each override covers its
    * entire contig; everything else stays at basePloidy.
    */
  def fromContigPloidies(
      spark: SparkSession,
      overrides: Map[String, Int],
      basePloidy: Int = 2): Built = {
    val byContig: CnMap = overrides.map { case (c, p) =>
      c -> Array((0L, Long.MaxValue, p))
    }
    val cns = overrides.values
    Built(
      spark.sparkContext.broadcast(byContig),
      if (cns.isEmpty) basePloidy else math.min(basePloidy, cns.min),
      if (cns.isEmpty) basePloidy else math.max(basePloidy, cns.max),
      basePloidy)
  }

  /** Build from a feature table with columns (contigName, start, end,
    * featureType 'DUP'|'DEL'): DUP -> base+1, DEL -> base-1, relative to
    * the contig's base ploidy. `contigBases` composes whole-contig
    * overrides (sex chromosomes) with interval CNV calls: inside an
    * overridden contig the override fills the gaps BETWEEN features
    * (intervals win inside their span), so e.g. a DUP on chrX=1 calls
    * diploid while the rest of chrX stays haploid. Assumes CNV calls
    * within a contig do not overlap each other (callers emit disjoint
    * segments).
    */
  def fromFeatures(
      features: DataFrame,
      basePloidy: Int = 2,
      contigBases: Map[String, Int] = Map.empty): Built = {
    val spark = features.sparkSession
    val rows = features
      .select(col("contigName"), col("start"), col("end"), col("featureType"))
      .collect() // deliberately small: the CNV call set
      .map { r =>
        val c = r.getString(0)
        val base = contigBases.getOrElse(c, basePloidy)
        val cn = r.getString(3) match {
          case "DUP" => base + 1
          case "DEL" => base - 1
          case _     => base
        }
        (c, r.getLong(1), r.getLong(2), cn)
      }
    val featured = rows.groupBy(_._1).map { case (c, rs) =>
      val ivs = rs.map(t => (t._2, t._3, t._4)).sortBy(_._1)
      contigBases.get(c) match {
        case None => c -> ivs
        case Some(base) =>
          // fill inter-feature gaps with the contig override so the
          // probe's sorted non-overlapping invariant holds
          val out = Array.newBuilder[(Long, Long, Int)]
          var cursor = 0L
          ivs.foreach { case (s, e, cn) =>
            if (s > cursor) out += ((cursor, s, base))
            out += ((s, e, cn))
            cursor = math.max(cursor, e)
          }
          out += ((cursor, Long.MaxValue, base))
          c -> out.result()
      }
    }
    // override-only contigs (no features) keep their whole-contig row
    val byContig: CnMap = featured ++
      contigBases.view.filterKeys(c => !featured.contains(c))
        .map { case (c, p) => c -> Array((0L, Long.MaxValue, p)) }.toMap
    val cns = rows.map(_._4).toSeq ++ contigBases.values
    Built(
      spark.sparkContext.broadcast(byContig),
      if (cns.isEmpty) basePloidy else math.min(basePloidy, cns.min),
      if (cns.isEmpty) basePloidy else math.max(basePloidy, cns.max),
      basePloidy)
  }
}
