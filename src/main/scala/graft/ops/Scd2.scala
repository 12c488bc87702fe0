package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Type-2 slowly-changing dimension (SCD2) from an append-only change
  * stream: one validity interval per consecutive run of identical
  * attribute values per key. The historical half of the merge story —
  * [[Changelog.latestByKey]] keeps only current state; SCD2 keeps every
  * state with `[valid_from, valid_to)` bounds so point-in-time joins
  * ([[Joins.asOf]]) can reconstruct any snapshot.
  *
  * Reference analog: the incremental `merge` materialisation
  * (sayn/tasks/autosql.py) persists history by appending; SCD2 is the
  * standard warehouse shape that history is compacted into.
  */
object Scd2 {

  private val Reserved = Seq("_g_chg", "_g_prev")

  /** Build the SCD2 dimension from a full change history.
    *
    * Rows are ordered per `keys` by (`orderCol`, `tieCols`…); consecutive
    * rows whose `attrs` are unchanged collapse into one interval. Output:
    * `keys ++ attrs ++ (valid_from = orderCol of the run's first row,
    * valid_to = next run's valid_from or NULL, is_current)`.
    *
    * Two windows over the SAME partitioning key → Catalyst reuses one
    * Exchange: a single keyed shuffle at any scale, the minimum for a
    * per-key ordered sweep. NULL attribute values compare null-safely
    * (`<=>` on the attr struct), so NULL→NULL is "unchanged" and
    * NULL→value opens a new interval.
    *
    * Requires (keys, orderCol, tieCols…) row-unique — otherwise run
    * boundaries on ties are undefined (same contract as
    * [[Changelog.latestByKey]]).
    */
  def build(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      attrs: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(attrs.nonEmpty, "at least one attribute column")
    Reserved.foreach(r =>
      require(!df.columns.contains(r), s"reserved column name in input: $r"))
    val ordering = (orderCol +: tieCols).map(col)
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    val attrStruct = struct(attrs.map(col): _*)
    // A run starts where the attr struct differs from the previous row's
    // (null-safe; lag over the first row is NULL, and a struct is never
    // <=> NULL, so the first row always starts a run).
    val starts = df
      .withColumn("_g_chg", !(attrStruct <=> lag(attrStruct, 1).over(wOrd)))
      .filter(col("_g_chg"))
    // valid_to = the NEXT run's start instant; same window key, so the
    // shuffle introduced for wOrd is reused.
    starts
      .withColumn("valid_to", lead(col(orderCol), 1).over(wOrd))
      .select(
        keys.map(col) ++ attrs.map(col) ++ Seq(
          col(orderCol).as("valid_from"),
          col("valid_to"),
          col("valid_to").isNull.as("is_current")): _*)
  }

  /** Incrementally apply a batch of new change rows to an existing SCD2
    * dimension (the output shape of [[build]]). Only the keys present in
    * `updates` are reworked — untouched keys pass through without a
    * shuffle on their history — so the cost is proportional to the
    * touched-key slice, not the dimension size. At 100 TB this is the
    * whole point: a daily batch touching 0.1% of keys reworks 0.1% of
    * the dimension.
    *
    * Contract: `updates` has columns `keys ++ attrs ++ (orderCol,
    * tieCols…)` and every update row lands at-or-after its key's current
    * `valid_from` (late rows that would split an ALREADY-COMPACTED
    * interval cannot be recovered from the dimension alone — replay
    * [[build]] over the full history to repair).
    */
  def merge(
      dim: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      orderCol: String,
      attrs: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val touched = updates.select(keys.map(col): _*).distinct()
    val untouched = dim.join(touched, keys, "left_anti")
    // Reconstruct the touched keys' change stream from the dimension's
    // run starts (valid_from is each run's first instant), interleave the
    // new rows, and rebuild. Collapsing is idempotent on run starts, so
    // in-contract updates yield exactly build(full history ∪ updates).
    val changeCols = keys ++ attrs ++ (orderCol +: tieCols)
    val oldRuns = dim.join(touched, keys, "left_semi")
      .withColumn(orderCol, col("valid_from"))
      .select(keys.map(col) ++ attrs.map(col) :+ col(orderCol): _*)
    val tieDefaults = tieCols.foldLeft(oldRuns)((d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null)))
    val replay = tieDefaults.select(changeCols.map(col): _*)
      .unionByName(updates.select(changeCols.map(col): _*))
    untouched.unionByName(build(replay, keys, orderCol, attrs, tieCols))
  }
}
