package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketed interval (overlap) join.
  *
  * Spark has no native interval join: a raw overlap predicate
  * (`l.start < r.end && r.start < l.end`) plans as a nested-loop /
  * cartesian join — O(n·m), hopeless at scale. The reference solves this
  * with a driver-collected broadcast interval tree
  * (avocado-core/.../util/TreeRegionJoin.scala:175-203), which requires the
  * build side to fit on the driver.
  *
  * We instead rewrite the overlap join into an EQUI-join Catalyst can
  * shuffle or broadcast: replicate each interval to every fixed-width bin
  * it touches, equi-join on (keys…, bin), then apply the exact overlap
  * predicate as a residual filter. A pair overlapping k shared bins would
  * be emitted k times, so we keep only the bin containing
  * max(left.start, right.start) — both intervals provably cover that bin,
  * so each matching pair survives exactly once and no post-join distinct
  * (extra shuffle) is needed.
  *
  * Scale properties: shuffle is hash-partitioned on (keys, bin) — both
  * sides co-partitioned; no driver collect; skew handled by AQE skew-join
  * splitting; a small side can still be broadcast (`broadcastRight`).
  * Bin width trades replication factor (long intervals hit more bins)
  * against bin selectivity; choose ≈ the median interval length.
  */
object IntervalJoin {

  private def bin(c: Column, binSize: Double): Column =
    floor(c / lit(binSize)).cast("long")

  /** Interval × interval overlap join on half-open intervals
    * [start, end). `keys` are equality-join columns present on both
    * sides (e.g. contig); left/right must not share other column names.
    */
  def overlap(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      binSize: Double,
      keys: Seq[(String, String)] = Nil,
      broadcastRight: Boolean = false): DataFrame = {

    val lb = left.withColumn(
      "__lbin",
      explode(sequence(bin(col(lStart), binSize), bin(col(lEnd), binSize))))
    val rb0 = right.withColumn(
      "__rbin",
      explode(sequence(bin(col(rStart), binSize), bin(col(rEnd), binSize))))
    val rb = if (broadcastRight) broadcast(rb0) else rb0

    val cond = keys
      .map { case (lk, rk) => lb(lk) === rb(rk) }
      .foldLeft(
        lb("__lbin") === rb("__rbin") &&
          lb(lStart) < rb(rEnd) && rb(rStart) < lb(lEnd) &&
          lb("__lbin") === greatest(bin(lb(lStart), binSize), bin(rb(rStart), binSize))
      )(_ && _)

    lb.join(rb, cond).drop("__lbin", "__rbin")
  }

  /** Interval × point join: right rows are points; a point occupies
    * exactly one bin, so no dedup residual is needed. Semantics:
    * rStart ∈ [lStart, lEnd).
    */
  def pointInInterval(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rPoint: String,
      binSize: Double,
      keys: Seq[(String, String)] = Nil,
      broadcastLeft: Boolean = false): DataFrame = {

    val lb0 = left.withColumn(
      "__lbin",
      explode(sequence(bin(col(lStart), binSize), bin(col(lEnd), binSize))))
    val lb = if (broadcastLeft) broadcast(lb0) else lb0
    val rb = right.withColumn("__rbin", bin(col(rPoint), binSize))

    val cond = keys
      .map { case (lk, rk) => lb(lk) === rb(rk) }
      .foldLeft(
        lb("__lbin") === rb("__rbin") &&
          rb(rPoint) >= lb(lStart) && rb(rPoint) < lb(lEnd)
      )(_ && _)

    lb.join(rb, cond).drop("__lbin", "__rbin")
  }
}
