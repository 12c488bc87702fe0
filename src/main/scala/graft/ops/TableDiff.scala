package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed reconciliation of two table snapshots — the validation half of
  * a copy/merge pipeline (the reference's copy task moves rows between
  * warehouses; a reconciliation diff is how you PROVE the copy landed).
  * One full outer join on the keys = one co-partitioned shuffle pair;
  * row-level value comparison happens in-row on the joined result, so
  * the operator scales like any keyed join (AQE skew handling applies).
  */
object TableDiff {

  private val Reserved = Seq("_g_in_a", "_g_in_b")

  /** Diff `b` (new) against `a` (old) by `keys`. Both inputs must share
    * the same column set. Output: one row per key present in either
    * side, with
    *   - `status`: 'added' (key only in b) / 'removed' (only in a) /
    *     'changed' (both, some non-key column differs) / 'unchanged';
    *   - `changed_cols`: the differing non-key column names in input
    *     column order (NULL unless status = 'changed').
    * Comparison is null-safe per column (NULL == NULL is unchanged).
    * `includeUnchanged = false` (default) drops unchanged keys — at
    * reconciliation scale the interesting rows are the exceptions.
    */
  def diff(
      a: DataFrame,
      b: DataFrame,
      keys: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(a.columns.toSeq == b.columns.toSeq,
      s"schemas differ: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    Reserved.foreach(r =>
      require(!a.columns.contains(r), s"reserved column name in input: $r"))
    val valueCols = a.columns.filterNot(keys.contains).toSeq

    // prefix-rename each side's value columns BEFORE the join: Dataset
    // column references would be ambiguous when a and b derive from the
    // same base plan (diffing two snapshots of one table is the main use)
    val renamed = valueCols.flatMap(c => Seq(s"_g_a_$c", s"_g_b_$c"))
    val collisions = a.columns.toSet intersect renamed.toSet
    require(collisions.isEmpty,
      s"reserved column names in input: ${collisions.mkString(", ")}")
    val aSide = a.select(keys.map(col) ++
      valueCols.map(c => col(c).as(s"_g_a_$c")) :+ lit(true).as("_g_in_a"): _*)
    val bSide = b.select(keys.map(col) ++
      valueCols.map(c => col(c).as(s"_g_b_$c")) :+ lit(true).as("_g_in_b"): _*)
    val joined = aSide.join(bSide, keys, "full_outer")

    def av(c: String) = col(s"_g_a_$c")
    def bv(c: String) = col(s"_g_b_$c")
    val allSame = valueCols.map(c => av(c) <=> bv(c))
      .foldLeft(lit(true))(_ && _)
    val status = when(col("_g_in_a").isNull, "added")
      .when(col("_g_in_b").isNull, "removed")
      .when(allSame, "unchanged")
      .otherwise("changed")
    // differing column names, input order; array_compact drops the
    // per-column when() nulls
    val changedCols = array_compact(array(valueCols.map(c =>
      when(!(av(c) <=> bv(c)), lit(c))): _*))

    val out = joined.select(
      keys.map(col) ++ Seq(
        status.as("status"),
        when(status === "changed", changedCols).as("changed_cols")): _*)
    if (includeUnchanged) out else out.filter(col("status") =!= "unchanged")
  }
}
