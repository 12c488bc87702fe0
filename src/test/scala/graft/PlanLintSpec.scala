package graft

import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Corpus-wide physical-plan lint: every non-mutating driver entry is
  * planned at sf0.001 and screened for the shapes that kill 100 TB
  * runs, institutionalizing the per-round plan audit:
  *
  *   - NO CartesianProductExec. Deliberate 1-row scalar broadcasts
  *     compile to BroadcastNestedLoopJoin (fine); a CartesianProduct
  *     means both sides were too big to broadcast — all-pairs at scale.
  *   - NO global Sort without a limit above it. TakeOrderedAndProject
  *     (top-k) is the accepted form; a bare global sort is a
  *     single-point bottleneck on the full data.
  *   - NO Exchange feeding directly into another Exchange — a
  *     double-shuffle that re-moves every row.
  *
  * Checks run on the pre-AQE physical plan (queryExecution.sparkPlan),
  * including all subquery plans, so future entries are pinned at plan
  * time without executing the batch ones. Streaming/iterative entries
  * execute during construction (their loops ARE construction) — the
  * lint then sees their final frame plus everything the build ran.
  */
class PlanLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Declared exceptions, each with the reason it is sound. */
  private val allowCartesian: Set[String] = Set.empty
  private val allowGlobalSort: Set[String] = Set.empty

  private def allPlans(p: SparkPlan): Seq[SparkPlan] = p +: p.subqueriesAll

  test("no entry plans a cartesian product, bare global sort, or stacked exchange") {
    val names =
      SparkEntry.queries.keys.filterNot(SparkEntry.mutating).toSeq.sorted
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        val plans = allPlans(df.queryExecution.sparkPlan)
        val cartesian = plans.flatMap(_.collect {
          case c: CartesianProductExec => c })
        if (cartesian.nonEmpty && !allowCartesian(n))
          violations += s"$n: CartesianProduct (${cartesian.size})"
        val globalSorts = plans.flatMap(_.collect {
          case s: SortExec if s.global => s })
        if (globalSorts.nonEmpty && !allowGlobalSort(n))
          violations += s"$n: global Sort without limit (${globalSorts.size})"
        val stacked = plans.flatMap(_.collect {
          case e: ShuffleExchangeExec
              if e.child.isInstanceOf[ShuffleExchangeExec] => e })
        if (stacked.nonEmpty)
          violations += s"$n: Exchange directly under Exchange (${stacked.size})"
      } catch {
        case e: Exception => violations += s"$n: failed to plan: ${e.getMessage}"
      }
    }
    assert(violations.isEmpty,
      s"\nplan lint violations:\n  ${violations.mkString("\n  ")}")
  }

  test("the lint detectors actually fire on bad plans") {
    import spark.implicits._
    // a forced non-broadcast cross join IS a CartesianProduct
    val big = spark.range(10).toDF("a")
    val cross = big.hint("shuffle_replicate_nl")
      .crossJoin(spark.range(10).toDF("b"))
    assert(allPlans(cross.queryExecution.sparkPlan)
      .flatMap(_.collect { case c: CartesianProductExec => c }).nonEmpty)
    // an orderBy with no limit is a global sort
    val sorted = spark.range(10).toDF("a").orderBy($"a")
    assert(allPlans(sorted.queryExecution.sparkPlan)
      .flatMap(_.collect { case s: SortExec if s.global => s }).nonEmpty)
    // ...and the corpus-approved top-k form is NOT flagged
    val topk = spark.range(10).toDF("a").orderBy($"a").limit(3)
    assert(allPlans(topk.queryExecution.sparkPlan)
      .flatMap(_.collect { case s: SortExec if s.global => s }).isEmpty)
  }
}
