package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import graft.functions.GraftExtensions
import graft.plans.TopKPerKey

/** Per-key top-k through the custom [[graft.plans.TopKPerKeyExec]]
  * physical operator: the k best rows per key under `orderBy`, with the
  * semantics of `row_number() OVER (PARTITION BY keys ORDER BY ...) <= k`
  * — but planned as one Exchange + a bounded-heap pass instead of the
  * window's Exchange + full Sort + rank + filter. At 100 TB the sort of
  * every partition is the dominant cost the heap never pays; memory is
  * O(keys/partition × k) rows.
  *
  * `orderBy` must be a total order (append id columns) for deterministic
  * output — the same contract a stable window rank needs.
  */
object TopK {

  def perKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[Column],
      k: Int): DataFrame = {
    require(keyCols.nonEmpty, "perKey needs at least one key column")
    require(orderBy.nonEmpty, "perKey needs at least one order column")
    val spark = df.sparkSession
    GraftExtensions.install(spark) // idempotent; registers TopKStrategy
    val keys = keyCols.map(c => GraftSqlBridge.expression(df(c)))
    // route the order through the ANALYZER (a throwaway
    // sortWithinPartitions) rather than converting the Columns directly:
    // the analyzer emits plain catalyst SortOrder trees, where a direct
    // Column conversion can retain Spark 4's non-serializable Column-AST
    // sort nodes inside the task closure
    val sortPlan = df.sortWithinPartitions(orderBy: _*)
      .queryExecution.analyzed
    val sortNode = sortPlan.collectFirst { case s: Sort => s }.getOrElse(
      throw new IllegalStateException("sort plan missing from analysis"))
    GraftSqlBridge.ofRows(spark,
      TopKPerKey(keys, sortNode.order, k, sortNode.child))
  }
}
