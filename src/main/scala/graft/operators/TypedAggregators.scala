package graft.operators

import graft.model.Order
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Commutative merge-monoid summary, the shape of the reference's
  * VariantSummary reduce-aggregate (avocado-core/.../genotyping/
  * VariantSummary.scala:93-117): a typed Aggregator whose buffer merges
  * associatively so Spark runs it partial+final with map-side combine.
  */
case class StatsBuf(n: Long, sum: Double, mn: Double, mx: Double) {
  def add(x: Double): StatsBuf = StatsBuf(n + 1, sum + x, math.min(mn, x), math.max(mx, x))
  def merge(o: StatsBuf): StatsBuf =
    StatsBuf(n + o.n, sum + o.sum, math.min(mn, o.mn), math.max(mx, o.mx))
}

object StatsBuf {
  val zero: StatsBuf = StatsBuf(0L, 0.0, Double.MaxValue, Double.MinValue)
}

/** Total-price summary per group over the typed orders Dataset. */
object OrderStatsAgg extends Aggregator[Order, StatsBuf, StatsBuf] {
  override def zero: StatsBuf = StatsBuf.zero
  override def reduce(b: StatsBuf, o: Order): StatsBuf = b.add(o.o_totalprice)
  override def merge(a: StatsBuf, b: StatsBuf): StatsBuf = a.merge(b)
  override def finish(b: StatsBuf): StatsBuf = b
  override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
  override def outputEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
}
