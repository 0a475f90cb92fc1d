package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, ByteType, IntegerType, LongType, ShortType}

/** Automatic band-join planning — the numeric sibling of
  * [[IntervalJoinRewrite]]: a raw band join
  *
  *   SELECT ... FROM l JOIN r ON abs(l.v - r.v) <= eps [AND ...]
  *
  * has no equi-condition, so Spark plans BroadcastNestedLoopJoin /
  * CartesianProduct — O(n·m). This rule detects the absolute-difference
  * band over integral columns, buckets each side at width eps (FLOOR
  * division via pmod, so negatives land right — the same math as
  * operators.BandJoin), expands the RIGHT side to its bucket and both
  * neighbours (a band of width eps only reaches those three), equi-joins
  * on the bucket, and keeps the ORIGINAL predicate as the residual. A
  * (l, r) pair matches at most one (bucket_l = expanded bucket_r) pair —
  * the three expanded buckets are distinct — so no dedup predicate is
  * needed, unlike the interval rule's bin fan-out.
  *
  * Idempotent by guard: the rewritten join's condition references the
  * generated `__lband`/`__rband` attributes, which the matcher refuses.
  * Integral value types only — the engine-wide exact-units convention
  * (cents, micro-nats); float bands are left to the user's own bucketing.
  *
  * Register: SparkSession.builder().withExtensions(new GraftExtensions)
  * or spark.sql.extensions=graft.plans.GraftExtensions.
  */
case class BandJoinRewrite() extends Rule[LogicalPlan] with PredicateHelper {

  private val bandNames = Set("__lband", "__rband")

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  private def epsOf(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(a => bandNames.contains(a.name)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // abs(x - y) <= eps (or < eps): the band; strictness rides in the
      // residual, bucket coverage at width eps is sound for both
      def bandOf(e: Expression): Option[(Expression, Expression, Long)] = {
        def fromParts(a: Expression, b: Expression, eps: Long) =
          (sideOf(a, left, right), sideOf(b, left, right)) match {
            case (Some(true), Some(false)) if isIntegral(a) && isIntegral(b) =>
              Some((a, b, eps))
            case (Some(false), Some(true)) if isIntegral(a) && isIntegral(b) =>
              Some((b, a, eps))
            case _ => None
          }
        e match {
          case LessThanOrEqual(Abs(Subtract(a, b, _), _), lim) =>
            epsOf(lim).filter(_ > 0).flatMap(fromParts(a, b, _))
          case LessThan(Abs(Subtract(a, b, _), _), lim) =>
            epsOf(lim).filter(_ > 0).flatMap(fromParts(a, b, _))
          case GreaterThanOrEqual(lim, Abs(Subtract(a, b, _), _)) =>
            epsOf(lim).filter(_ > 0).flatMap(fromParts(a, b, _))
          case _ => None
        }
      }
      val bands = conjuncts.flatMap(e => bandOf(e).map(b => (e, b)))
      bands.headOption match {
        case Some((bandPred, (lv, rv, eps))) =>
          val rest = conjuncts.filterNot(_ eq bandPred)
          val epsLit = Literal(eps, LongType)
          // floor-div bucket: (v - pmod(v, eps)) div eps — exact for
          // negatives (pmod is non-negative), division exact by
          // construction so IntegralDivide's truncation never engages
          def bucket(e: Expression): Expression = {
            val v = Cast(e, LongType)
            IntegralDivide(Subtract(v, Pmod(v, epsLit)), epsLit)
          }
          val lBand = Alias(bucket(lv), "__lband")()
          val lProj = Project(left.output :+ lBand, left)
          val rAttr = AttributeReference("__rband", LongType, nullable = true)()
          val rb = bucket(rv)
          val rGen = Generate(
            Explode(CreateArray(Seq(
              Subtract(rb, Literal(1L)), rb, Add(rb, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(rAttr), child = right)
          val newCond = (Seq(
            EqualTo(lBand.toAttribute, rAttr),
            bandPred) ++ rest).reduce(And)
          Project(j.output, Join(lProj, rGen, Inner, Some(newCond), hint))
        case None => j
      }
  }
}
