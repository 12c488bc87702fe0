package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-sketch aggregates for corpus-scale profiling: cardinality
  * (HyperLogLog++) and quantiles (Greenwald-Khanna) per key. At 100 TB,
  * exact COUNT(DISTINCT) shuffles every distinct value and exact
  * percentiles sort the column; both sketches instead keep a small
  * mergeable summary per partition (map-side combine), so the exchange
  * carries kilobytes per key regardless of row count — the standard
  * sketch trade for profiling/monitoring where a bounded relative error
  * is acceptable.
  *
  * Both are Spark built-ins (codegen'd `approx_count_distinct` /
  * `percentile_approx`), so the engine work here is the contract, not
  * the algorithm: sketch results are ENGINE-SPECIFIC (another engine's
  * HLL gives a different estimate of the same set), so these operators
  * ship as declared rows-only entries — no DuckDB oracle can hash-match
  * them — and their error bounds vs the exact answers are asserted in
  * ScalaTest instead (PipelineSpec), mirroring the LSH/ANN methodology.
  */
object Sketches {

  /** Per-key approximate distinct count of `valueCol`, with the exact
    * relative-error parameter `rsd` (HLL++ standard deviation; default
    * matches Spark's 5%).
    */
  def approxDistinctByKey(
      df: DataFrame, keyCol: String, valueCol: String,
      rsd: Double = 0.05): DataFrame = {
    require(rsd > 0 && rsd < 1, s"rsd in (0,1), got $rsd")
    df.groupBy(col(keyCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("n_distinct_approx"))
  }

  /** Per-key approximate quantiles of `valueCol` at `probs`, one column
    * per requested probability (`p50`, `p95`, ...). `accuracy` is the
    * Greenwald-Khanna parameter: error ≤ 1/accuracy of rank.
    */
  def approxQuantilesByKey(
      df: DataFrame, keyCol: String, valueCol: String,
      probs: Seq[Double] = Seq(0.5, 0.95),
      accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      "probs must be in [0,1]")
    val names = probs.map(p => "p" + math.round(p * 100).toString)
    require(names.distinct.size == names.size,
      s"probs collide on output names: ${names.mkString(", ")}")
    val qs: Column = percentile_approx(
      col(valueCol),
      array(probs.map(lit): _*),
      lit(accuracy))
    val named = names.zipWithIndex.map { case (n, i) =>
      element_at(col("_g_qs"), i + 1).as(n)
    }
    df.groupBy(col(keyCol)).agg(qs.as("_g_qs"))
      .select(col(keyCol) +: named: _*)
  }
}
