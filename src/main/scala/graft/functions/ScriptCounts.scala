package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Single-pass Unicode-script profile of a string: one codepoint walk
  * produces `[n_chars, n_latin, n_cyrillic, n_greek, n_han, n_digit]`
  * (ARRAY<BIGINT>). The regexp formulation
  * ([[graft.pipeline.TextStats.scriptMix]]) makes FIVE full passes, one
  * compiled automaton each; at corpus scale the text is read five times
  * from memory per row. This expression reads it once and stays inside
  * whole-stage codegen — the q140 semantics at a fifth of the memory
  * traffic.
  *
  * Classification is `Character.UnicodeScript.of` — the SAME Unicode
  * script property Java's `\p{IsLatin}` and RE2's `\p{Latin}` match, so
  * the counts are drop-in equal to the regex pass (the property
  * [[graft.pipeline.TextStats.scriptMixFast]]'s shared oracle checks).
  * Supplementary-plane codepoints count once (codePointAt walk), same
  * as length() and the regex engines. Empty string → all zeros; NULL →
  * NULL.
  */
final case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "script_counts"

  override protected def nullSafeEval(input: Any): Any =
    ScriptCounts.ofString(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = ScriptCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.ofString($s.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)
}

object ScriptCounts {

  /** One-pass kernel shared by the interpreted and codegen paths. */
  def ofString(s: String): GenericArrayData = {
    var i = 0
    var n, latin, cyr, greek, han, digit = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      n += 1
      if (cp >= '0' && cp <= '9') digit += 1
      else {
        import Character.UnicodeScript
        UnicodeScript.of(cp) match {
          case UnicodeScript.LATIN => latin += 1
          case UnicodeScript.CYRILLIC => cyr += 1
          case UnicodeScript.GREEK => greek += 1
          case UnicodeScript.HAN => han += 1
          case _ => ()
        }
      }
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array(n, latin, cyr, greek, han, digit))
  }

  /** Column-API entry point. */
  def scriptCounts(s: Column): Column =
    GraftSqlBridge.column(ScriptCounts(GraftSqlBridge.expression(s)))
}
