package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Membership depends ONLY on the row's id — never on rand(), row order,
  * or partitioning — so splits are stable under reruns, appends and
  * repartitioning: a document assigned to `test` stays in `test` as the
  * corpus grows (the leakage guarantee `df.sample`/`randomSplit` cannot
  * give), and an incremental run reproduces exactly the prior
  * assignments. Pure projections/filters: zero shuffles at any scale.
  */
object Sampling {

  /** Engine-portable uniform hash in [0, 1e6): the first 8 hex chars of
    * md5 over the id rendered as text. md5 is bit-identical across
    * engines and versions — unlike engine-native hashes (xxhash64
    * variants/seeds differ) — which is what makes assignments both
    * oracle-checkable and portable if a split is recomputed outside
    * Spark.
    */
  def portableHash(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 1000000L

  /** Add a `split` column assigning each row to a named fraction by hash
    * threshold, e.g. `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`.
    * Fractions must sum to 1 (±1e-9); thresholds are cumulative, so the
    * boundary rounding error is sub-ppm.
    */
  def hashSplit(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val h = portableHash(col(idCol))
    val bounds = splits.zip(splits.scanLeft(0.0)(_ + _._2).tail)
      .map { case ((n, _), cum) => (n, math.round(cum * 1000000L)) }
    val splitCol = bounds.init.foldRight(lit(bounds.last._1): Column) {
      case ((n, b), acc) => when(h < b, n).otherwise(acc)
    }
    df.withColumn("split", splitCol)
  }

  /** Deterministic downsample: keep rows whose hash falls under `rate`.
    * Nested samples: a 1% sample is a subset of the 10% sample of the
    * same corpus (thresholds nest), which makes scaling experiments
    * comparable.
    */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate in [0,1]")
    df.filter(portableHash(col(idCol)) < math.round(rate * 1000000L))
  }
}
