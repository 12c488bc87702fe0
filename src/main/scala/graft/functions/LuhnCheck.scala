package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}

/** Luhn checksum (ISO/IEC 7812 mod-10) over a digit string, IN-ROW —
  * the verifier that turns a "looks like a card number" regex hit into
  * a real PII detection: from the rightmost digit, double every second
  * digit (subtracting 9 when the double exceeds 9) and require the
  * total ≡ 0 (mod 10). Random 16-digit runs pass only 10% of the time,
  * so gating candidates on Luhn cuts the false-positive rate of a
  * card-number scrubber by ~10× at zero distributed cost.
  *
  * A pure projection that stays inside whole-stage codegen next to the
  * regexp candidate extraction — the PII pass stays a zero-shuffle
  * in-row chain at any corpus scale (the design bar of the
  * [[graft.pipeline.TextClean]] family). Integer-only arithmetic: no
  * float surface at all, so cross-engine oracles replay it exactly.
  *
  * Contract: input must be digits-only (strip separators FIRST —
  * [[graft.pipeline.TextClean.creditCardAudit]] does); any non-digit
  * byte or empty string returns false rather than erroring (a candidate
  * that fails shape fails verification). NULL → NULL.
  */
final case class LuhnCheck(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "luhn_check"

  override protected def nullSafeEval(input: Any): Any =
    LuhnCheck.ofBytes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = LuhnCheck.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.ofBytes($s.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): LuhnCheck =
    copy(child = newChild)
}

object LuhnCheck {

  /** Checksum kernel shared by the interpreted and codegen paths (one
    * body ⇒ identical results on both). Right-to-left scan, alternate
    * digits doubled with the −9 fold, integer-only.
    */
  def ofBytes(digits: Array[Byte]): Boolean = {
    val n = digits.length
    if (n == 0) return false
    var sum = 0
    var i = n - 1
    var second = false
    while (i >= 0) {
      val b = digits(i)
      if (b < '0' || b > '9') return false
      var d = b - '0'
      if (second) {
        d *= 2
        if (d > 9) d -= 9
      }
      sum += d
      second = !second
      i -= 1
    }
    sum % 10 == 0
  }

  /** Column-API entry point. */
  def luhnCheck(c: Column): Column =
    GraftSqlBridge.column(LuhnCheck(GraftSqlBridge.expression(c)))
}
