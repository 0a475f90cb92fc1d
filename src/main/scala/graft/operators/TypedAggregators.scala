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

/** Bounded per-group top-K (smallest (rank, id) pairs): the buffer never
  * exceeds K elements, so the aggregation runs partial+final with
  * map-side combine and a HOT GROUP COSTS K, NOT ITS CARDINALITY — the
  * skew-safe alternative to a row_number window for per-key caps (a
  * window ships every row of the hot key to one reducer; this ships at
  * most K per partition). Pairs are (rank, id) longs ordered
  * lexicographically; id uniqueness makes the cap deterministic.
  */
class BoundedTopKAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  private val ord = Ordering.Tuple2[Long, Long]
  override def zero: Seq[(Long, Long)] = Vector.empty
  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    if (b.size < k) insert(b, a)
    else if (ord.lt(a, b.last)) insert(b.init, a)
    else b
  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sorted(ord).take(k)
  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  // keep the buffer sorted: binary-search insert, O(K) copy
  private def insert(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] = {
    var lo = 0; var hi = b.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.lt(b(mid), a)) lo = mid + 1 else hi = mid
    }
    (b.take(lo) :+ a) ++ b.drop(lo)
  }
}

/** Bounded per-group top-K by SCORE (highest score first, id as the
  * deterministic tie-break) — the ranking flavor of [[BoundedTopKAgg]]
  * for ANN serving: per-query candidate ranking ships at most K rows
  * per partition per query instead of windowing all candidates of a
  * query onto one reducer.
  */
class BoundedTopKByScoreAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  // descending score via Double.compare so NaN ranks FIRST — matching
  // Spark's orderBy(desc) and DuckDB's ORDER BY DESC (both treat NaN as
  // the largest double); an Ordering.by(-s) would rank NaN last and make
  // the batched path disagree with per-query annTopK on zero-norm rows
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }
  override def zero: Seq[(Double, Long)] = Vector.empty
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    if (b.size < k) insert(b, a)
    else if (ord.lt(a, b.last)) insert(b.init, a)
    else b
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  private def insert(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
    var lo = 0; var hi = b.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.lt(b(mid), a)) lo = mid + 1 else hi = mid
    }
    (b.take(lo) :+ a) ++ b.drop(lo)
  }
}

/** [[BoundedTopKAgg]] for string document ids (UUIDs — common in crawl
  * corpora): same bounded buffer and skew math, ordering (rank, id)
  * with the string id as the deterministic tie-break. A separate class
  * rather than a generic one so the numeric path's ordering (and the
  * results it has already shipped) stays bit-identical.
  */
class BoundedTopKStringAgg(k: Int)
    extends Aggregator[(Long, String), Seq[(Long, String)], Seq[(Long, String)]] {
  private val ord = Ordering.Tuple2[Long, String]
  override def zero: Seq[(Long, String)] = Vector.empty
  override def reduce(b: Seq[(Long, String)], a: (Long, String)): Seq[(Long, String)] =
    if (b.size < k) insert(b, a)
    else if (ord.lt(a, b.last)) insert(b.init, a)
    else b
  override def merge(a: Seq[(Long, String)], b: Seq[(Long, String)]): Seq[(Long, String)] =
    (a ++ b).sorted(ord).take(k)
  override def finish(r: Seq[(Long, String)]): Seq[(Long, String)] = r
  override def bufferEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  private def insert(b: Seq[(Long, String)], a: (Long, String)): Seq[(Long, String)] = {
    var lo = 0; var hi = b.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.lt(b(mid), a)) lo = mid + 1 else hi = mid
    }
    (b.take(lo) :+ a) ++ b.drop(lo)
  }
}
