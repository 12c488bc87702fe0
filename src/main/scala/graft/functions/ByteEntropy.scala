package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** Shannon entropy (bits per symbol) of a string's UTF-8 BYTES, computed
  * IN-ROW: H = −Σ_b (c_b/n)·log2(c_b/n) over the 256-bucket byte
  * histogram. For ASCII text, byte entropy equals character entropy; a
  * classic training-data quality signal (random/binary junk scores near
  * 8, natural language 3.5–4.5, degenerate repetition near 0) that
  * complements the deflate compression-ratio signal — entropy sees the
  * symbol DISTRIBUTION, compression also sees sequence structure.
  *
  * The built-in formulation — explode characters, count per (doc, char),
  * entropy per doc — shuffles one row per character; this expression is
  * a pure projection (zero shuffles at any corpus scale) and stays
  * inside whole-stage codegen.
  *
  * Deterministic accumulation: buckets are summed in fixed 0..255 order
  * with log2 via ln/ln2, so every engine run produces bit-identical
  * doubles; cross-engine oracles should still round (an independent
  * implementation sums in its own order). Empty string → 0.0 (zero
  * symbols carry zero information; keeps the expression total), NULL →
  * NULL.
  */
final case class ByteEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "byte_entropy"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .getBytes
    ByteEntropy.ofBytes(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = ByteEntropy.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.ofBytes($s.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): ByteEntropy =
    copy(child = newChild)
}

object ByteEntropy {
  private val LN2 = math.log(2.0)

  /** Histogram + entropy kernel shared by the interpreted and codegen
    * paths (one body ⇒ bit-identical results on both).
    */
  def ofBytes(bytes: Array[Byte]): Double = {
    val n = bytes.length
    if (n == 0) return 0.0
    val counts = new Array[Int](256)
    var i = 0
    while (i < n) { counts(bytes(i) & 0xff) += 1; i += 1 }
    var h = 0.0
    var b = 0
    while (b < 256) {
      val c = counts(b)
      if (c > 0) {
        val p = c.toDouble / n
        h -= p * (math.log(p) / LN2)
      }
      b += 1
    }
    h
  }

  /** Column-API entry point. */
  def byteEntropy(s: Column): Column =
    GraftSqlBridge.column(ByteEntropy(GraftSqlBridge.expression(s)))
}
