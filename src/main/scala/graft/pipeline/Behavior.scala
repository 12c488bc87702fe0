package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams: sequential funnels, Markov
  * transition counts and cohort retention — the three questions an
  * event-pipeline team asks right after sessionization
  * ([[Sessionize]]), and the natural batch siblings of the streaming
  * entries. Reference scope note: sayn ships these as user-written SQL
  * against a warehouse; here they are first-class DataFrame operators
  * with exact cross-engine oracles.
  *
  * Scale posture (100 TB): every operator is keyed-shuffle-only —
  * funnels fold k−1 equi-joins on the user key (k = number of steps,
  * a constant), transitions are one window pass plus a partial-agg
  * count whose exchange carries ≤ |event types|² rows, retention is
  * two user-keyed aggregates and a join. No windows without PARTITION
  * BY, no driver-side data, no cross joins.
  *
  * Timestamp discipline: operators take a LONG time column (caller
  * projects e.g. µs since epoch); all comparisons are integer.
  */
object Behavior {

  private def requireFree(df: DataFrame, names: String*): Unit =
    names.foreach(n => require(!df.columns.contains(n),
      s"reserved column name in input: $n"))

  /** Sequential funnel: for each user, the FIRST completion time of
    * every step, where step i must occur strictly after step i−1 and
    * every step must land within `maxSpan` of the step-1 time. One
    * output row per user who completed step 1; `step_ts_i` is NULL
    * from the first uncompleted step onward.
    *
    * Greedy-first semantics (the standard funnel contract): each step
    * binds to its EARLIEST eligible occurrence. A user who could
    * complete the funnel only via a later step-2 occurrence does not
    * count — deterministic and cross-engine reproducible, unlike
    * "any-path" matching.
    *
    * Execution: a fold of k−1 left-joins + min-aggregates, all keyed
    * on `userCol` — the same hash partitioning end to end, so AQE
    * reuses the exchange. Step frames shrink monotonically (each step
    * filters to one event type and to users still in the funnel).
    */
  def funnelUsers(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      maxSpan: Long): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    require(maxSpan > 0, s"maxSpan must be positive, got $maxSpan")
    requireFree(events, "_g_ts", "_g_user")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("step_ts_1"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"step_ts_$i"
      val cur = s"step_ts_${i + 1}"
      // candidate side renamed wholesale: the fold re-joins frames that
      // share the events lineage, and distinct names sidestep
      // self-join attribute ambiguity outright
      val cand = events.filter(col(typeCol) === step)
        .select(col(userCol).as("_g_user"), col(tsCol).as("_g_ts"))
      acc.join(cand, col(userCol) === col("_g_user"), "left")
        .groupBy(acc.columns.map(col): _*)
        .agg(min(when(
          col("_g_ts") > col(prev) &&
            col("_g_ts") <= col("step_ts_1") + maxSpan,
          col("_g_ts"))).as(cur))
    }
  }

  /** Funnel completion counts: one row per step with the number of
    * users whose greedy path reached it ([[funnelUsers]] semantics).
    * Output: (step_idx, step_name, n_users), n_users non-increasing.
    */
  def funnelCounts(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      maxSpan: Long): DataFrame = {
    val users = funnelUsers(events, userCol, typeCol, tsCol, steps, maxSpan)
    val aggs = steps.indices.map(i =>
      count(col(s"step_ts_${i + 1}")).as(s"_g_n_${i + 1}"))
    users.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(steps.zipWithIndex.map { case (name, i) => struct(
        lit(i + 1).as("step_idx"),
        lit(name).as("step_name"),
        col(s"_g_n_${i + 1}").as("n_users"))
      }: _*)).as("_g_s"))
      .select(col("_g_s.*"))
  }

  /** Markov transition counts: for each user's event sequence ordered
    * by (`tsCol`, `tieCol`), count every adjacent (from → to) pair.
    * The tiebreaker makes the sequence deterministic when two events
    * share a timestamp — REQUIRED for cross-engine reproducibility
    * (pass a unique event id).
    *
    * One user-keyed window pass; the count's exchange carries at most
    * |event types|² rows per partition after partial aggregation.
    */
  def transitions(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    requireFree(events, "_g_next")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(typeCol),
        lead(col(typeCol), 1).over(w).as("_g_next"))
      .filter(col("_g_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_g_next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Cohort retention: assign each user to the cohort period of their
    * first event (`tsCol div periodLen`), then count the users active
    * in each (cohort_period, period_offset) cell. Offset 0 is the
    * cohort period itself, so its count is the cohort size.
    *
    * One scan: the cohort is a min() window over the SAME distinct
    * (user, period) frame the cells aggregate (a join against a
    * separately-aggregated cohort frame reads the input twice), and
    * because that frame is distinct, each user hits a cell at most
    * once — plain count(), no countDistinct Expand. The retention
    * matrix is (periods × offsets) rows — tiny at any corpus scale.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      periodLen: Long): DataFrame = {
    require(periodLen > 0, s"periodLen must be positive, got $periodLen")
    requireFree(events, "_g_period", "_g_cohort")
    val u = col(userCol)
    // integer `div`, NOT `/`: double division of epoch-µs longs sits
    // within a few ulp of integer bucket boundaries
    events
      .select(u, expr(s"`$tsCol` div ${periodLen}L").as("_g_period"))
      .distinct()
      .withColumn("_g_cohort",
        min(col("_g_period")).over(Window.partitionBy(u)))
      .groupBy(
        col("_g_cohort").as("cohort_period"),
        (col("_g_period") - col("_g_cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Activity streaks (gaps-and-islands): group each user's DISTINCT
    * active periods (`tsCol div periodLen`) into maximal consecutive
    * runs via the classic `period − row_number()` island id, and
    * report per user the streak count, the longest streak and the
    * start of the longest streak (earliest such start on ties —
    * deterministic).
    *
    * One keyed window over the distinct (user, period) set + two
    * keyed aggregates, all on the user key.
    */
  def streaks(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      periodLen: Long): DataFrame = {
    require(periodLen > 0, s"periodLen must be positive, got $periodLen")
    requireFree(events, "_g_period", "_g_isl")
    val u = col(userCol)
    val periods = events
      .select(u, expr(s"`$tsCol` div ${periodLen}L").as("_g_period"))
      .distinct()
    val w = Window.partitionBy(u).orderBy(col("_g_period"))
    periods
      .withColumn("_g_isl", col("_g_period") - row_number().over(w))
      .groupBy(u, col("_g_isl"))
      .agg(count(lit(1)).as("_g_len"), min(col("_g_period")).as("_g_start"))
      .withColumn("_g_max", max(col("_g_len")).over(Window.partitionBy(u)))
      .groupBy(u)
      .agg(
        count(lit(1)).as("n_streaks"),
        max(col("_g_len")).as("max_streak_len"),
        min(when(col("_g_len") === col("_g_max"), col("_g_start")))
          .as("max_streak_start"))
  }
}
