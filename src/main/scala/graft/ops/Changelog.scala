package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Changelog/CDC compaction: collapse an append-only change stream to
  * current state. The batch half of the merge story — a copy/merge
  * pipeline lands raw change rows, and downstream reads want exactly one
  * row per key: the latest.
  */
object Changelog {

  /** Keep the LATEST row per key: argmax of `orderCol` within `keys`,
    * ties broken deterministically by `tieCols` (highest wins — e.g. a
    * monotonically increasing change id). One row_number window = one
    * shuffle on the key, the minimum for a keyed argmax at any scale; a
    * hot key serializes only its own partition sweep (same bound as any
    * keyed operator; AQE skew handling applies).
    *
    * Requires (keys, orderCol, tieCols…) to be row-unique — otherwise
    * which duplicate survives is undefined. Output columns = input
    * columns, unchanged.
    */
  def latestByKey(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(!df.columns.contains("_g_rn"), "reserved column name in input: _g_rn")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((orderCol +: tieCols).map(c => col(c).desc): _*)
    df.withColumn("_g_rn", row_number().over(w))
      .filter(col("_g_rn") === 1)
      .drop("_g_rn")
  }
}
