package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join utilities for skewed data. AQE's skew-join handling
  * (spark.sql.adaptive.skewJoin, on in the CLI session) rebalances
  * sort-merge joins at runtime; explicit salting is the deterministic
  * fallback for extreme skew, for broadcast-ineligible hot keys, or for
  * plans that must not depend on runtime re-planning.
  */
object Joins {

  /** Skew-resistant equi-join: the (skewed) left side gets a per-row salt
    * in [0, salts); the right side is replicated once per salt value; the
    * join key becomes (key…, salt). A hot key's rows then spread over
    * `salts` reducers instead of serializing on one. Semantics preserved
    * for inner and left joins (every left row matches exactly one salt
    * replica of each right match); cost = right side × salts, so salt the
    * side that is big AND skewed and keep the replicated side lean.
    *
    * The salt derives from a per-row id, not the key — salting the key's
    * hash would send every copy of the hot key to the same reducer again.
    */
  def salted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      joinType: String = "inner",
      salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salted join preserves inner/left semantics only, got $joinType")
    val l = left.withColumn("_graft_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("_graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "_graft_salt", joinType).drop("_graft_salt")
  }
}
