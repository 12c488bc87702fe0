package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable partial-aggregate maintenance — the incremental-rollup
  * pattern behind materialized aggregate tables: keep per-(keys, bucket)
  * PARTIAL states (count / decimal sum / min / max), fold new buckets in
  * without rescanning history, and finalize per key on read. The
  * reference's incremental materialisation appends raw rows and
  * re-aggregates; partial states make the re-aggregation cost
  * proportional to the partial-table size (keys × buckets), not the
  * event history.
  *
  * All four partial statistics are associative-commutative monoids
  * (count/sum add, min/max lattice), so partials(A ∪ B) ≡
  * mergePartials(partials(A), partials(B)) for ANY split of the rows —
  * the law IncrementalAggSpec asserts. Sums are decimal: exact addition
  * makes the final double independent of merge order.
  */
object IncrementalAgg {

  private val stateCols = Seq("_g_n", "_g_sum", "_g_min", "_g_max")

  /** Per-(keys, bucket) partial state of `valueCol`. */
  def partials(
      df: DataFrame, keys: Seq[String], bucketCol: String,
      valueCol: String): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    df.groupBy((keys :+ bucketCol).map(col): _*)
      .agg(
        count(lit(1)).as("_g_n"),
        sum(col(valueCol).cast("decimal(28,6)")).as("_g_sum"),
        min(col(valueCol)).as("_g_min"),
        max(col(valueCol)).as("_g_max"))
  }

  /** Fold a delta partial table into an existing one: buckets present in
    * both merge state-wise; buckets in one side pass through. The
    * re-aggregation touches keys × buckets rows — never the raw history.
    */
  def mergePartials(
      old: DataFrame, delta: DataFrame, keys: Seq[String],
      bucketCol: String): DataFrame = {
    require(old.columns.toSeq == delta.columns.toSeq,
      "partial tables must share the partials() schema")
    old.unionByName(delta)
      .groupBy((keys :+ bucketCol).map(col): _*)
      .agg(
        sum(col("_g_n")).as("_g_n"),
        sum(col("_g_sum")).as("_g_sum"),
        min(col("_g_min")).as("_g_min"),
        max(col("_g_max")).as("_g_max"))
  }

  /** Finalize per key across buckets: n / total / avg / min / max.
    * total is the exact decimal sum cast to double; avg = total / n
    * (the [[graft.queries.Relational]] dsum/davg discipline).
    */
  def finalize(partialsDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(stateCols.forall(partialsDf.columns.contains),
      "input is not a partials() table")
    partialsDf.groupBy(keys.map(col): _*)
      .agg(
        sum(col("_g_n")).as("n"),
        sum(col("_g_sum")).cast("double").as("total"),
        (sum(col("_g_sum")).cast("double") / sum(col("_g_n"))).as("avg"),
        min(col("_g_min")).as("min_value"),
        max(col("_g_max")).as("max_value"))
  }
}
