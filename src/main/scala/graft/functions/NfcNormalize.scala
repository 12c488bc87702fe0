package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * canonical-composition pass every dedup/fingerprint key needs before
  * hashing: `é` typed as U+0065 U+0301 (decomposed) and `é` as U+00E9
  * (precomposed) are DIFFERENT byte strings that render identically, so
  * without normalization a crawler that re-fetches a page through a
  * different encoder defeats exact dedup, and shingle/minhash keys
  * split on the same invisible boundary. (The reference delegates all
  * string handling to Python's NFC-normalized str; an engine operating
  * on raw UTF-8 bytes has to take this pass explicitly.)
  *
  * Spark has no built-in normalizer, and the usual fallback — a Scala
  * UDF around `java.text.Normalizer` — breaks whole-stage codegen and
  * serializes a closure per task. This expression stays IN the codegen
  * pipeline (a pure projection, zero shuffles at any scale) and fast-
  * paths the common case: `Normalizer.isNormalized` is a scan-only
  * check, so ASCII and already-composed text never allocates a new
  * string (the fixture corpus is ASCII; real corpora are mostly NFC
  * already).
  *
  * NFC is chosen over NFD/NFKC deliberately: it is the W3C/HTML5
  * canonical form (what well-behaved crawls are already in), and
  * unlike the K forms it is lossless — compatibility folding (ﬁ → fi)
  * belongs in a separate, opt-in cleaning stage, not in the default
  * key-normalization path. NULL → NULL; the empty string is trivially
  * normalized.
  *
  * Cross-engine: DuckDB's `nfc_normalize()` implements the same UAX#15
  * form, which is what makes the q124 oracle an exact string compare.
  */
final case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.ofUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.ofUtf8($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Kernel shared by the interpreted and codegen paths. The
    * `isNormalized` fast path returns the INPUT UTF8String untouched —
    * no decode, no allocation — which is the overwhelmingly common case
    * on real corpora.
    */
  def ofUtf8(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def nfcNormalize(c: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(c)))
}
