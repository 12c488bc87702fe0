package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd dot product of two `array<long>` columns.
  *
  * The built-in formulation — `aggregate(zip_with(a, b, _*_), 0L, _+_)` —
  * expresses the same thing but runs as interpreted higher-order functions
  * and allocates an intermediate array per row; on an all-pairs similarity
  * join that evaluates millions of dot products it is the entire runtime.
  * This expression generates a primitive loop inside whole-stage codegen:
  * no allocation, no lambda dispatch — the preferred extension path when
  * built-ins can express the semantics but not the performance
  * (custom `Expression` with `doGenCode` over UDF, per the Spark guide).
  *
  * Arrays shorter than the other side are treated as zero-padded (min
  * length is used); NULL in either input yields NULL like any binary
  * arithmetic. Long math: exact, associative — result is independent of
  * summation order, which keeps it bit-identical to any SQL restatement.
  */
final case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "long_array_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Column-API entry point for [[LongArrayDot]]. */
  def longArrayDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      LongArrayDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
