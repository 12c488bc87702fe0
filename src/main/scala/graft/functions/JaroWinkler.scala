package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** Jaro-Winkler similarity, codegen'd, matching the classic Winkler
  * variant that DuckDB's `jaro_winkler_similarity` implements (so the
  * entity-resolution oracle can replay the score bit-for-bit up to the
  * d6 contract point):
  *
  *   - match window = max(|a|,|b|)/2 − 1 (floor, min 0), greedy
  *     left-to-right matching, each b-char consumed at most once;
  *   - transpositions t = ⌊(#aligned matched pairs that differ)/2⌋
  *     (INTEGER floor — probed: jaro("abcdxx","bcadxx") = 17/18, a
  *     3-cycle's 3 mismatches count as t=1, not 1.5);
  *   - jaro = (m/|a| + m/|b| + (m−t)/m)/3; m = 0 ⇒ 0.0 (hence
  *     jaro("","") = 0.0, also probed);
  *   - winkler boost only when jaro > 0.7: jw = jaro + 0.1·ℓ·(1−jaro)
  *     with ℓ = common prefix length capped at 4.
  *
  * An entity-resolution candidate scorer: the built-in alternative is
  * `levenshtein` (edit distance weights middles and ends equally; JW
  * up-weights shared prefixes, the signal that matters for names and
  * titles). Pure projection — zero shuffle, stays inside whole-stage
  * codegen; the blocked self-join around it carries the distribution
  * story (see pipeline/EntityResolution.scala).
  *
  * Reference capability anchor: sayn has no string-similarity surface;
  * this extends the §2e dedup/linkage family (ADVICE round-10 program
  * of oracle-checkable similarity operators).
  */
final case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.of(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val helper = JaroWinkler.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.of($a.toString(), $b.toString());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Shared interpreted/codegen kernel (one body ⇒ bit-identical on
    * both paths). Operates on UTF-16 code units — identical to
    * codepoint semantics for the BMP text the fixtures hold.
    */
  def of(a: String, b: String): Double = {
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // aligned mismatches among matched chars, in order
    var mismatch = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val t = mismatch / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val cap = math.min(4, math.min(l1, l2))
    while (prefix < cap && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + 0.1 * prefix * (1.0 - jaro)
  }

  /** Column-API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaroWinkler(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
