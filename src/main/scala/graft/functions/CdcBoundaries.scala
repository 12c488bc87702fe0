package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Content-defined-chunking boundary positions of a string — the
  * [[graft.pipeline.TextDedup.cdcChunks]] polynomial rolling hash,
  * computed IN-ROW compiled instead of through interpreted
  * higher-order functions (r19; the r18 form had already unrolled the
  * window sum to inline multiply-adds, but every position still paid a
  * per-char `ascii(substr(...))` lambda, a filter-lambda dispatch and
  * `window` interpreted multiply-add evaluations — q342 read ~9 s at
  * sf0.1 for what is ~1 s compiled).
  *
  * Semantics are BIT-IDENTICAL to the SQL form and locked by the
  * oracle (boundary positions → chunk md5s are hash-compared):
  *
  *   h(i)  = Σ_{j=0}^{w−1} code(c_{i−j}) · 257^j mod M   (M = 2³¹−1)
  *   i is a boundary ⇔ i ≥ w ∧ (h(i) mod M) mod divisor = 0
  *
  * where positions/codes are CODE POINTS (Spark's `ascii(substr)` is
  * `codePointAt(0)` of the char; `sequence(1, size)` positions are
  * 1-based code-point indices — matching `substr`'s downstream use).
  * The powers are reduced mod M exactly as the SQL literal table was;
  * the window sum accumulates raw longs (codes < 2²¹, powers < 2³¹ ⇒
  * products < 2⁵²; ≤ 64 terms < 2⁵⁸ — no overflow) and reduces with
  * ONE `% M` per position, exactly the unrolled expression's order.
  *
  * NULL → NULL; empty string → empty array. Output element type is
  * INT (1-based positions), matching the retired `sequence(1, size)`
  * filter's type so downstream chunk construction is unchanged.
  */
final case class CdcBoundaries(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {
  require(window >= 2 && window <= 64,
    s"window must be in [2, 64], got $window")
  require(divisor >= 2, s"divisor must be >= 2, got $divisor")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "cdc_boundaries"

  override protected def nullSafeEval(input: Any): Any =
    CdcBoundaries.ofString(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = CdcBoundaries.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$helper.ofString($s.toString(), $window, $divisor);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : CdcBoundaries = copy(child = newChild)
}

object CdcBoundaries {
  private val M = 2147483647L

  /** Rolling-window kernel shared by the interpreted and codegen
    * paths. Positions are 1-based code-point indices; a circular
    * buffer holds the last `window` code points so each position sums
    * the identical `window` products the unrolled SQL expression did.
    */
  def ofString(s: String, window: Int, divisor: Int): GenericArrayData = {
    val pows = new Array[Long](window)
    var p = 1L
    var j = 0
    while (j < window) { pows(j) = p; p = (p * 257L) % M; j += 1 }
    val buf = new Array[Long](window) // codes, indexed i % window
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0 // 1-based code-point position of the char just read
    var ci = 0 // UTF-16 index
    val n = s.length
    while (ci < n) {
      val cp = s.codePointAt(ci)
      ci += Character.charCount(cp)
      i += 1
      buf(i % window) = cp.toLong
      if (i >= window) {
        var sum = 0L
        var k = 0
        while (k < window) {
          // code of c_{i-k} sits at (i-k) % window
          sum += buf((i - k) % window) * pows(k)
          k += 1
        }
        if ((sum % M) % divisor == 0) out += i
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point. */
  def cdcBoundaries(s: Column, window: Int, divisor: Int): Column =
    GraftSqlBridge.column(
      CdcBoundaries(GraftSqlBridge.expression(s), window, divisor))
}
