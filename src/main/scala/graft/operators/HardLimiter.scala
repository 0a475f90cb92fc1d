package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Running coverage cap (SURVEY.md W3): admit a row's interval only while
  * fewer than `maxCoverage` admitted intervals currently overlap its
  * start. The reference shipped this dead (HardLimiter.scala:40-137,
  * threaded but never invoked); here it's live.
  *
  * Not expressible as a SQL window (the admitted set is itself
  * state-dependent), so: range-repartition by (key, start), sort within
  * partitions, and run a stateful per-partition scan — the same shape the
  * reference uses, but with Spark planning the distribution. Caps apply
  * per partition; range partitioning keeps genomic neighborhoods
  * together so boundary effects are limited to partition edges.
  */
object HardLimiter {

  /** Cap coverage over intervals [startCol, endCol) grouped by keyCol.
    * Input columns are preserved; rows beyond the cap are dropped.
    *
    * `exact = true` hash-partitions by key so every key's scan sees all
    * its rows (deterministic, exact; right when keys are many and
    * moderate-sized, like mktsegments or samples). `exact = false`
    * range-partitions by (key, start) so one huge key (a whole contig)
    * spreads across partitions; the cap then applies per partition with
    * edge effects at range boundaries — the reference's semantics.
    * `tieCols` break sort ties deterministically.
    *
    * SCALE GUARD: the exact flavor puts each key's rows on ONE task, so a
    * hot key (a whole-contig WGS pileup) is a silent wall. A task whose
    * partition exceeds `warnPartitionRows` logs a warning and bumps the
    * `hardLimiter.exact.hotPartitions` accumulator pointing at
    * `exact = false` — the documented at-scale flavor.
    */
  def capCoverage(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String,
      maxCoverage: Int,
      numPartitions: Int = 0,
      exact: Boolean = false,
      tieCols: Seq[String] = Nil,
      warnPartitionRows: Long = 10000000L): DataFrame = {

    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sortCols = (Seq(keyCol, startCol) ++ tieCols).map(col)
    val parted =
      if (exact) df.repartition(parts, col(keyCol))
      else df.repartitionByRange(parts, col(keyCol), col(startCol))
    val sorted = parted.sortWithinPartitions(sortCols: _*)
    val ki = sorted.schema.fieldIndex(keyCol)
    val si = sorted.schema.fieldIndex(startCol)
    val ei = sorted.schema.fieldIndex(endCol)

    implicit val enc: Encoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(sorted.schema))
    val hotAcc =
      if (exact) {
        val a = df.sparkSession.sparkContext.longAccumulator("hardLimiter.exact.hotPartitions")
        lastExactHotPartitions = Some(a)
        Some(a)
      } else None
    sorted.mapPartitions { rows =>
      // active = end positions of admitted, still-open intervals (per key)
      var curKey: Any = null
      var seen = 0L
      val active = mutable.PriorityQueue.empty[Long](Ordering[Long].reverse)
      rows.filter { r =>
        seen += 1
        if (seen == warnPartitionRows) hotAcc.foreach { a =>
          a.add(1)
          org.slf4j.LoggerFactory.getLogger("graft.operators.HardLimiter").warn(
            s"capCoverage(exact=true) partition exceeded $warnPartitionRows rows: " +
              "a hot key lands entire on one task; use exact=false " +
              "(range partitioning) at scale")
        }
        val k = r.get(ki)
        if (k != curKey) { curKey = k; active.clear() }
        val s = r.getLong(si)
        while (active.nonEmpty && active.head <= s) active.dequeue()
        if (active.size < maxCoverage) { active.enqueue(r.getLong(ei)); true }
        else false
      }
    }
  }

  /** Accumulator from the most recent exact-flavor plan (test hook /
    * post-run observability): number of tasks whose partition crossed
    * `warnPartitionRows`.
    */
  @volatile private[graft] var lastExactHotPartitions:
      Option[org.apache.spark.util.LongAccumulator] = None
}
