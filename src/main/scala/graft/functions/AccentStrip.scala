package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent folding as a codegen'd Catalyst expression: NFD-decompose,
  * drop combining marks (Unicode category Mn), NFC-recompose —
  * `café` → `cafe`, `Ångström` → `Angstrom`. The OPT-IN lossy stage of
  * key canonicalization that [[NfcNormalize]]'s scaladoc points to:
  * accent-insensitive dedup keys, search-term folding, and the
  * user-visible "did you mean" normalization every multilingual corpus
  * pipeline carries. Deliberately NOT part of the default canonical
  * key ([[graft.pipeline.TextClean.canonicalForDedup]]): folding loses
  * information (resume/résumé collide), so it composes explicitly.
  *
  * Only COMBINING marks fold: letters whose diacritic is part of the
  * base codepoint and has no canonical decomposition (ł, ø, đ) pass
  * through unchanged — the documented contract (matching what pure
  * UAX#15 NFD can express; a locale-aware transliterator is a
  * different, heavier operator). Output is always NFC: the slow path
  * recomposes after dropping marks, so mark-free characters with
  * canonical decompositions (precomposed Hangul) round-trip unchanged
  * and folded keys compose with NFC-keyed canonicalization. Fast
  * path: a string normal under BOTH NFD and NFC with no combining
  * mark is a fixed point of the whole pipeline, so ASCII (the
  * overwhelmingly common case) returns the input UTF8String without
  * allocating — one scan, no decode. NULL → NULL. A pure projection —
  * zero shuffles at any scale.
  */
final case class AccentStrip(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "accent_strip"

  override protected def nullSafeEval(input: Any): Any =
    AccentStrip.ofUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = AccentStrip.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.ofUtf8($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): AccentStrip =
    copy(child = newChild)
}

object AccentStrip {
  import java.text.Normalizer

  /** Kernel shared by the interpreted and codegen paths. ASCII (the
    * overwhelmingly common case) takes the allocation-free fast path:
    * an NFD-normalized string with no combining mark is its own fold.
    */
  def ofUtf8(s: UTF8String): UTF8String = {
    val str = s.toString
    // NFD-normal + NFC-normal + mark-free ⇒ fixed point of
    // NFC(stripMn(NFD(x))): NFD leaves it, the strip finds nothing,
    // NFC leaves it. (NFD-normal alone is NOT enough — decomposed
    // jamo are NFD-normal and mark-free but NFC-compose.)
    if (Normalizer.isNormalized(str, Normalizer.Form.NFD) &&
        Normalizer.isNormalized(str, Normalizer.Form.NFC) && !hasMark(str)) s
    else {
      val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val cp = nfd.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      // recompose: the fold of a mark-free precomposed character is
      // itself, and downstream NFC-keyed joins see NFC keys
      UTF8String.fromString(
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
    }
  }

  private def hasMark(str: String): Boolean = {
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (Character.getType(cp) == Character.NON_SPACING_MARK) return true
      i += Character.charCount(cp)
    }
    false
  }

  /** Column-API entry point. */
  def accentStrip(c: Column): Column =
    GraftSqlBridge.column(AccentStrip(GraftSqlBridge.expression(c)))
}
