package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column row/null/distinct counts in ONE pass —
  * the data-quality snapshot an ETL framework prints before/after a
  * load (the engine sibling of the introspection + standard-test
  * machinery in graft.db.SparkDatabase).
  */
object Profile {

  /** One row per profiled column: (column_name, n_rows, n_nulls,
    * n_distinct). Exact counts, all integers — engine-portable.
    *
    * Single aggregation pass: the multi-countDistinct plans as one
    * Expand (x ncols data growth) — the exact-answer price. At corpus
    * scale swap the distinct counts for
    * [[graft.pipeline.Sketches.approxDistinctByKey]]-style HLL
    * aggregates, which profile in one narrow pass; exact is the right
    * default for the test-oracle contract. n_distinct ignores nulls
    * (COUNT DISTINCT semantics on both engines).
    */
  def columnProfile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such columns: ${missing.mkString(", ")}")
    val aggs = count(lit(1)).as("_g_rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_g_nn_$c"),
      countDistinct(col(c)).as(s"_g_nd_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col("_g_rows").as("n_rows"),
        col(s"_g_nn_$c").as("n_nulls"),
        col(s"_g_nd_$c").as("n_distinct"))): _*)).as("_g_p"))
      .select(col("_g_p.*"))
  }
}
