package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Join utilities for skewed data. AQE's skew-join handling
  * (spark.sql.adaptive.skewJoin, on in the CLI session) rebalances
  * sort-merge joins at runtime; explicit salting is the deterministic
  * fallback for extreme skew, for broadcast-ineligible hot keys, or for
  * plans that must not depend on runtime re-planning.
  */
object Joins {

  /** Numeric view of an ordering column: timestamps become epoch MICROS
    * (a bare cast to long would be epoch SECONDS — silently collapsing
    * sub-second event times into ties); numerics cast to long as-is.
    */
  private def ordLong(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType => unix_micros(col(c))
      case _ => col(c).cast("long")
    }

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

  /** As-of (point-in-time) join: each probe row picks up the build row
    * with the LARGEST `buildTs` ≤ its `probeTs` within the same key —
    * the lookup every event-enrichment pipeline needs (latest snapshot
    * / price / profile as of the event), and one Spark has no built-in
    * operator for. Left semantics: probe rows before the key's first
    * build row keep the build payload columns as null.
    *
    * Spark-first plan instead of a per-key nested loop: UNION the two
    * sides (build payload null on probe rows and vice versa), then one
    * window per key ordered by (ts, side) carrying `last(payload,
    * ignoreNulls)` forward, then keep probe rows. Cost = ONE shuffle on
    * the key (same exchange a sort-merge join would pay) + a linear
    * in-partition sweep; no range explosion, no per-probe-row binary
    * search. At equal timestamps the build row sorts first, so a probe
    * row sees a build row stamped at its own instant (ASOF `>=`
    * semantics). Skew: a single hot key serializes its own sweep —
    * same bound as any per-key ordered operator.
    *
    * Timestamp columns order at epoch µs (a bare long cast would
    * truncate to SECONDS and collapse sub-second events into ties);
    * numeric columns order as longs.
    *
    * Contract: `build` must be unique per (keys, buildTs) — pre-aggregate
    * otherwise (which row of a same-instant tie wins is undefined). The
    * build side's payload = every column not in `keys` and not `buildTs`;
    * payload names must not collide with probe columns. To surface the
    * matched snapshot's timestamp, duplicate it into a payload column
    * before calling (`build.withColumn("snap_ts", col(ts))`).
    */
  def asOf(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTs: String,
      buildTs: String): DataFrame =
    asOf(probe, build, keys, probeTs, buildTs, tolerance = None)

  /** As-of join with a staleness bound: a match older than `tolerance`
    * (probeTs − buildTs, same units as the timestamps) yields null
    * payload, exactly like an absent match — "the latest snapshot,
    * unless it has gone stale". Same single-shuffle plan: the matched
    * build timestamp rides the same carried-forward window, and the
    * tolerance is one projection at the end.
    */
  def asOf(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTs: String,
      buildTs: String,
      tolerance: Option[Long]): DataFrame = {
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    val buildPayload = build.columns.filterNot(c => keys.contains(c) || c == buildTs)
    val probeCarry = probe.columns.filterNot(keys.contains)
    val collisions = buildPayload.toSet intersect probe.columns.toSet
    require(collisions.isEmpty,
      s"build payload collides with probe columns: ${collisions.mkString(", ")}")
    val reserved = Set("_g_ts", "_g_side", "_g_payload")
      .intersect((probe.columns ++ build.columns).toSet)
    require(reserved.isEmpty,
      s"reserved column names in input: ${reserved.mkString(", ")}")
    val buildTypes = build.schema.fields.map(f => f.name -> f.dataType).toMap
    val probeTypes = probe.schema.fields.map(f => f.name -> f.dataType).toMap

    def nul(n: String, t: Map[String, org.apache.spark.sql.types.DataType]): Column =
      lit(null).cast(t(n)).as(n)

    // Row-atomic carry: the WHOLE build payload (plus the matched build
    // timestamp when a tolerance applies) rides as ONE struct, non-null
    // exactly on build rows. Carrying columns independently would let a
    // NULL payload cell in the matched row reach back to an OLDER build
    // row's non-null value — resurrecting stale data and mixing columns
    // from different build rows (DuckDB ASOF returns the matched row's
    // nulls verbatim; so do we).
    val carryTs = if (tolerance.isDefined) Seq("_g_bts") else Nil
    val payloadType = StructType(
      buildPayload.map(c => StructField(c, buildTypes(c))) ++
        carryTs.map(StructField(_, LongType)))
    val pU = probe.select(
      keys.map(col) ++ Seq(ordLong(probe, probeTs).as("_g_ts"), lit(1).as("_g_side")) ++
        probeCarry.map(col) :+ lit(null).cast(payloadType).as("_g_payload"): _*)
    val bU = build.select(
      keys.map(col) ++ Seq(ordLong(build, buildTs).as("_g_ts"), lit(0).as("_g_side")) ++
        probeCarry.map(nul(_, probeTypes)) :+
        struct(buildPayload.map(col) ++
          carryTs.map(c => ordLong(build, buildTs).as(c)): _*).as("_g_payload"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_g_ts"), col("_g_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = bU.unionByName(pU)
      .withColumn("_g_payload", last(col("_g_payload"), ignoreNulls = true).over(w))
    val matched = carried.filter(col("_g_side") === 1)
    val unpacked = tolerance match {
      case None =>
        buildPayload.foldLeft(matched) { (df, c) =>
          df.withColumn(c, col(s"_g_payload.$c"))
        }
      case Some(t) =>
        // same µs/long view of the probe timestamp as the union used
        val fresh = col("_g_payload._g_bts").isNotNull &&
          ordLong(probe, probeTs) - col("_g_payload._g_bts") <= t
        buildPayload.foldLeft(matched) { (df, c) =>
          df.withColumn(c, when(fresh, col(s"_g_payload.$c")))
        }
    }
    unpacked.drop("_g_payload", "_g_ts", "_g_side")
  }

  /** Interval (range) join: pair each point with every interval
    * containing it (`start ≤ point ≤ end`, no equi-key). The naive plan
    * is a cross join with an inequality filter — O(|points|·|intervals|)
    * and a broadcast-nested-loop at any scale. This operator buckets
    * instead: an interval replicates to each `bucketWidth`-wide bin it
    * overlaps (`ceil(len/width)+1` bins), a point lands in exactly ONE
    * bin, and the pairing becomes an equi-join on the bin id + an exact
    * containment filter. Each qualifying pair is produced exactly once
    * (the point's single bin), so no dedup pass is needed.
    *
    * Pick `bucketWidth` ≈ the typical interval length: replication stays
    * ~2× and every comparison is bin-local. Cost = one shuffle on bin id;
    * a hot bin (many co-located points/intervals) is an AQE-skew-join
    * rebalance candidate, same as any hot equi-key.
    *
    * Column names of the two inputs must be disjoint; the three range
    * columns are numeric (bucketed as longs) or timestamps (bucketed at
    * epoch µs — `bucketWidth` is then in µs; a bare long cast would be
    * SECONDS). The containment filter compares the original columns at
    * native precision.
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collisions = points.columns.toSet intersect intervals.columns.toSet
    require(collisions.isEmpty,
      s"points/intervals column collision: ${collisions.mkString(", ")}")
    require(!(points.columns ++ intervals.columns).contains("_g_bucket"),
      "reserved column name in input: _g_bucket")
    val w = lit(bucketWidth)
    val iv = intervals.withColumn("_g_bucket",
      explode(sequence(
        floor(ordLong(intervals, startCol) / w).cast("long"),
        floor(ordLong(intervals, endCol) / w).cast("long"))))
    val pt = points.withColumn("_g_bucket",
      floor(ordLong(points, pointCol) / w).cast("long"))
    pt.join(iv, Seq("_g_bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_g_bucket")
  }
}
