package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric band join: pairs with |l.value − r.value| ≤ eps — the
  * numeric sibling of the genomic interval join (J1/J2), and the shape
  * Catalyst alone plans as a nested-loop (an inequality-only condition
  * has no equi-key). The classic range-bucket rewrite makes it an
  * equi-join: bucket each value at width eps, expand ONE side to its
  * bucket and both neighbours (a band of width eps can only reach
  * values in those three buckets), hash-join on the bucket id, then
  * verify the exact predicate. Candidate volume is bounded by 3× the
  * per-bucket occupancy product instead of |L|·|R|; the verify keeps
  * the semantics exact.
  *
  * Values are integer "units" (cents, micro-nats...) — the repo-wide
  * convention that keeps band membership exact in both engines.
  * Bucketing uses FLOOR division (pmod-adjusted), not Scala/SQL
  * truncating div, so negative values land in the right bucket.
  */
object BandJoin {

  // integral division keeps the bucket id exact past 2^53 (matching
  // BandJoinRewrite's IntegralDivide); pmod first → floor semantics
  private def fdiv(c: Column, d: Long): Column =
    call_function("div", c - pmod(c, lit(d)), lit(d))

  /** All (left, right) pairs with |leftVal − rightVal| ≤ eps. Column
    * names must be disjoint across sides (project before calling).
    * `expandLeft` picks which side triples — expand the smaller one.
    */
  def bandJoin(left: DataFrame, right: DataFrame,
      leftVal: String, rightVal: String, eps: Long,
      expandLeft: Boolean = true): DataFrame = {
    require(eps > 0, "eps must be positive")
    val lb = fdiv(col(leftVal), eps).cast("long")
    val rb = fdiv(col(rightVal), eps).cast("long")
    val (l, r) =
      if (expandLeft)
        (left.withColumn("__b", explode(array(lb - 1, lb, lb + 1))),
          right.withColumn("__b", rb))
      else
        (left.withColumn("__b", lb),
          right.withColumn("__b", explode(array(rb - 1, rb, rb + 1))))
    l.join(r, "__b")
      .where(abs(col(leftVal) - col(rightVal)) <= eps)
      .drop("__b")
  }
}
