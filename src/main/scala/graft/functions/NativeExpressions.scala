package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the hot scalar kernels (SURVEY.md
  * §2.9: "scalar math UDFs ... hot ones promotable to codegen'd
  * Expression"). Unlike a Scala UDF, these generate Java inline in
  * whole-stage codegen — no serialization boundary, no boxing, and the
  * optimizer can see through them (null propagation, constant folding).
  */

/** phred_to_error(q): 10^(-q/10) — phred quality to error probability. */
case class PhredToError(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(q: Any): Any =
    math.pow(10.0, -q.asInstanceOf[Number].doubleValue() / 10.0)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.pow(10.0, -((double) $c) / 10.0)")
  override protected def withNewChildInternal(newChild: Expression): PhredToError =
    copy(child = newChild)
}

/** log_error_to_phred(l): −10·l/ln(10) — log error prob to phred. */
case class LogErrorToPhred(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any): Any =
    -10.0 * l.asInstanceOf[Number].doubleValue() / math.log(10.0)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(-10.0 * ((double) $c) / java.lang.Math.log(10.0))")
  override protected def withNewChildInternal(newChild: Expression): LogErrorToPhred =
    copy(child = newChild)
}

object NativeExpressions {

  def phred_to_error(c: Column): Column =
    ColumnBridge.column(PhredToError(ColumnBridge.expression(c)))

  def log_error_to_phred(c: Column): Column =
    ColumnBridge.column(LogErrorToPhred(ColumnBridge.expression(c)))

  /** Register for SQL use: SELECT phred_to_error(q) ... */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "phred_to_error", exprs => PhredToError(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "log_error_to_phred", exprs => LogErrorToPhred(exprs.head), "built-in")
  }
}
