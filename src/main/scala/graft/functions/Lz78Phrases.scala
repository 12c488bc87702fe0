package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** LZ78 incremental-parse phrase count (Ziv & Lempel 1978) of a string,
  * computed IN-ROW over code points: scan once, growing the current
  * phrase while it is already in the dictionary, emitting and resetting
  * when it is new; a trailing in-dictionary suffix counts as a final
  * phrase (the standard convention [[graft.pipeline.TextStats
  * .lz78Complexity]] documents).
  *
  * Replaces the r14–r18 higher-order-function fold
  * (`aggregate(split(t,''), struct(ph, cur), ...)`) on the hot path:
  * HOFs evaluate interpreted — per character the fold paid a lambda
  * dispatch, a string concat, an `array_contains` linear scan of the
  * grown dictionary and an `array_append` copy of it (O(L·phrases)
  * string traffic; the r18 bench read ~6.6 µs/char on q379). This
  * expression is the textbook LZ78 TRIE walk — the dictionary is the
  * trie's node set, each character is ONE hash probe on a packed
  * (node, codePoint) long key, no string is ever materialized — O(1)
  * amortized per character, whole-stage-codegen-friendly (guide step 2:
  * per-task work; "eliminate non-codegen expressions in the hot path").
  *
  * Exactness: the fold's dictionary is prefix-closed by construction
  * (every entry is an in-dictionary phrase plus one character), so the
  * set-of-strings membership test and the trie-path walk accept exactly
  * the same phrases — counts are identical, pinned by the hand-parsed
  * cases in CorpusOpsSpec and a surrogate-pair case. Code-point
  * iteration matches the old `split(t, '')`/`substr` character
  * semantics (UTF8String counts code points, not UTF-16 units).
  *
  * NULL → NULL; empty string → 0.
  */
final case class Lz78Phrases(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "lz78_phrases"

  override protected def nullSafeEval(input: Any): Any =
    Lz78Phrases.ofString(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = Lz78Phrases.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.ofString($s.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): Lz78Phrases =
    copy(child = newChild)
}

object Lz78Phrases {

  /** Trie-walk kernel shared by the interpreted and codegen paths.
    * Node ids are dense ints (root = 0); a child edge is one entry in a
    * LongMap keyed `nodeId << 21 | codePoint` (code points need 21
    * bits; node ids ≤ string length, bounded far below 2^42 by the
    * operator's maxChars contract).
    */
  def ofString(s: String): Long = {
    val n = s.length
    if (n == 0) return 0L
    val edges = new scala.collection.mutable.LongMap[Int]()
    var nextId = 1
    var node = 0
    var phrases = 0L
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      val key = (node.toLong << 21) | cp.toLong
      val child = edges.getOrElse(key, -1)
      if (child >= 0) {
        node = child
      } else {
        edges.put(key, nextId)
        nextId += 1
        phrases += 1L
        node = 0
      }
    }
    // trailing in-dictionary suffix (walk ended mid-phrase)
    if (node != 0) phrases += 1L
    phrases
  }

  /** Column-API entry point. */
  def lz78Phrases(s: Column): Column =
    GraftSqlBridge.column(Lz78Phrases(GraftSqlBridge.expression(s)))
}
