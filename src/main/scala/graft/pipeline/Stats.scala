package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical inference over corpus/product metrics: bootstrap
  * confidence intervals and two-sample significance tests — the
  * numbers a data-curation report or an A/B readout puts NEXT to a
  * point estimate so a downstream decision knows how much to trust it.
  *
  * Reference capability: sayn users hand-write these as SQL task
  * SELECTs over warehouse data (sayn/tasks/sql.py); here they are
  * first-class operators with engine-portable determinism (md5-seeded
  * resampling, exact integer sufficient statistics) so results are
  * reproducible across engines and partitionings.
  */
object Stats {

  /** Poisson(1) draw from the portable md5 hash — the standard
    * distributed-bootstrap reweighting (Poisson bootstrap: resampling
    * n-out-of-n with replacement ≈ independent Poisson(1) weights per
    * row, which needs NO global coordination). The inverse-CDF
    * thresholds are fixed integer literals over the [0, 1e6) hash
    * range, so every engine draws the identical weight for the same
    * (id, replicate); truncation at weight 8 discards ~1e-9 of mass.
    */
  private def poissonWeight(id: Column, rep: Column): Column = {
    val u = conv(substring(md5(
        concat(lit("boot"), rep.cast("string"), lit(":"),
          id.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long") % 1000000L
    // cumulative Poisson(1) × 1e6, floored: P(≤k) for k = 0..7
    val cdf = Seq(367879L, 735758L, 919698L, 981011L, 996340L,
      999405L, 999916L, 999989L)
    // fold REVERSED so the smallest threshold is the OUTERMOST when():
    // cumulative conditions must test k = 0 first
    cdf.zipWithIndex.reverse.foldLeft(lit(8): Column) {
      case (acc, (thr, k)) => when(u < thr, lit(k.toLong)).otherwise(acc)
    }.cast("long")
  }

  /** Percentile-bootstrap confidence interval for the MEAN of an
    * integer-valued per-row metric: `reps` Poisson-bootstrap
    * replicates, each a deterministically reweighted full-corpus mean,
    * and the (α/2, 1−α/2) percentile band over the replicate means.
    * Output is ONE row: (n_rows, n_reps, est_mean, ci_low, ci_high).
    *
    * Integer metrics only (counts, lengths, scores×10⁶): the weighted
    * sums are then EXACT longs, so replicate means are identical
    * across engines and summation orders, and only the final divisions
    * round (d6). A double metric would make every partial sum
    * order-dependent — quantize it first.
    *
    * Scale shape: the corpus is read once; the replicate axis is an
    * in-row explode (corpus × reps rows exist only inside one
    * hash-aggregate with map-side combine, so the exchange carries
    * ≤ reps partial rows per partition — never corpus × reps). The
    * percentile rank runs over the `reps`-row replicate frame (a
    * bounded single-partition window, the 1-row-scalar class). At
    * 100 TB with reps = 40 this is one scan + one 40-row shuffle.
    */
  def bootstrapCI(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      reps: Int = 40,
      alpha: Double = 0.05): DataFrame = {
    require(reps >= 4, s"reps must be >= 4, got $reps")
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    val d6 = (c: Column) => c.cast("decimal(28,6)").cast("double")
    val lo = math.ceil(alpha / 2 * reps).toLong.max(1L)
    val hi = reps + 1L - lo
    val x = col(valueCol).cast("long")
    val perRep = df
      .select(col(idCol), x.as("_x"),
        explode(sequence(lit(0), lit(reps - 1))).as("_rep"))
      .select(col("_rep"), col("_x"),
        poissonWeight(col(idCol), col("_rep")).as("_w"))
      .groupBy(col("_rep"))
      .agg(sum(col("_w") * col("_x")).as("_swx"), sum(col("_w")).as("_sw"))
      .select(col("_rep"),
        d6(col("_swx").cast("double") / col("_sw").cast("double"))
          .as("_m"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_m").asc, col("_rep").asc)
    val ranked = perRep.withColumn("_rk", row_number().over(w))
    val bounds = ranked
      .agg(
        min(when(col("_rk") === lo, col("_m"))).as("ci_low"),
        min(when(col("_rk") === hi, col("_m"))).as("ci_high"))
    val base = df.agg(
      count(lit(1)).as("n_rows"),
      d6(sum(x).cast("double") / count(lit(1))).as("est_mean"))
    base.crossJoin(broadcast(bounds))
      .select(col("n_rows"), lit(reps.toLong).as("n_reps"),
        col("est_mean"), col("ci_low"), col("ci_high"))
  }

  /** Welch's two-sample t-test on an integer-valued per-unit metric —
    * the unequal-variance A/B readout. Input: one row per experimental
    * unit with a 0/1 `armCol` and the metric; output ONE row with per-
    * arm sufficient statistics and the test:
    *
    *   t  = (m₀ − m₁) / √(v₀/n₀ + v₁/n₁)
    *   df = (v₀/n₀ + v₁/n₁)² / ((v₀/n₀)²/(n₀−1) + (v₁/n₁)²/(n₁−1))
    *
    * (Welch–Satterthwaite). `significant` flags |t| ≥ 1.959964 — the
    * NORMAL approximation to the two-sided 5% critical value, the
    * documented simplification: an exact t-quantile needs the
    * incomplete beta function, which is neither in Spark nor portable;
    * at the n ≫ 30 scale this operator targets the two are equal to
    * 3 decimals.
    *
    * Determinism: n, Σx, Σx² accumulate as EXACT longs (integer metric
    * contract, as [[bootstrapCI]]); means/variances/t derive in one
    * fixed expression order and round d6. ONE aggregate over units —
    * conditional sums per arm, no join, no shuffle beyond it.
    *
    * Degenerate arms fail LOUDLY: an arm with < 2 units has no sample
    * variance ((n−1) = 0 → silent NaN/null t_stat), so the plan embeds
    * a conditional raise_error on the arm counts — the lazy-frame
    * analogue of the library's require() discipline (counts are only
    * known at execution, so a driver-side require can't see them).
    */
  def welchTTest(
      df: DataFrame,
      armCol: String,
      valueCol: String): DataFrame = {
    val d6 = (c: Column) => c.cast("decimal(28,6)").cast("double")
    val x = col(valueCol).cast("long")
    val arm = col(armCol).cast("int")
    def side(a: Int, c: Column) = sum(when(arm === a, c).otherwise(lit(0L)))
    val agg = df.agg(
      side(0, lit(1L)).as("_n0"), side(1, lit(1L)).as("_n1"),
      side(0, x).as("_s0"), side(1, x).as("_s1"),
      side(0, x * x).as("_q0"), side(1, x * x).as("_q1"))
    val n0 = col("_n0").cast("double")
    val n1 = col("_n1").cast("double")
    val m0 = col("_s0").cast("double") / n0
    val m1 = col("_s1").cast("double") / n1
    val v0 = (col("_q0").cast("double") - col("_s0").cast("double") * m0) /
      (n0 - 1.0)
    val v1 = (col("_q1").cast("double") - col("_s1").cast("double") * m1) /
      (n1 - 1.0)
    val se0 = v0 / n0
    val se1 = v1 / n1
    val t = (m0 - m1) / sqrt(se0 + se1)
    val dfW = pow(se0 + se1, 2.0) /
      (pow(se0, 2.0) / (n0 - 1.0) + pow(se1, 2.0) / (n1 - 1.0))
    val armGuard = when(col("_n0") >= 2L && col("_n1") >= 2L, col("_n0"))
      .otherwise(raise_error(concat(
        lit("welchTTest: each arm needs >= 2 units for a sample "),
        lit("variance; got n_a="), col("_n0").cast("string"),
        lit(" n_b="), col("_n1").cast("string"))).cast("long"))
    agg.select(
      armGuard.as("n_a"), col("_n1").as("n_b"),
      d6(m0).as("mean_a"), d6(m1).as("mean_b"),
      d6(v0).as("var_a"), d6(v1).as("var_b"),
      d6(t).as("t_stat"), d6(dfW).as("welch_df"),
      (abs(t) >= 1.959964).cast("int").as("significant"))
  }

  /** Population-drift report between a reference and a current slice
    * of the same frame — the dataset-monitoring gate a recurring
    * ingest runs BEFORE shipping a new training mix (has the source /
    * length / score distribution moved since the last accepted
    * snapshot?). Per bucket and dimension: counts, Laplace-smoothed
    * shares, and the PSI contribution; every row also carries its
    * dimension's total PSI (the alarm number — industry folklore:
    * < 0.1 stable, 0.1–0.25 drifting, > 0.25 act).
    *
    * PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) — the symmetrized KL
    * divergence. Add-one (Laplace) smoothing on COUNTS, not share
    * clipping: p = (c_ref+1)/(N_ref+B) keeps every share an exact
    * rational (no ε-clip float compare), totals over the OBSERVED
    * bucket union B, so one-sided buckets contribute finite terms.
    * Documented divergence from clip-at-1e-4 textbook PSI.
    *
    * Float discipline: counts/totals are exact longs; shares divide
    * once to double in fixed order; the per-bucket term is d6-truncated
    * at its contract point, and the dimension PSI is a DECIMAL sum of
    * the truncated terms — so cross-engine ln() ulp drift is absorbed
    * per-bucket and cannot accumulate (q192/q203's discipline).
    *
    * Scale shape: one groupBy exchange per dimension over bucket keys
    * (map-side combined — exchange carries B partials per partition,
    * never rows); the share/PSI arithmetic runs on the B-row aggregate
    * inside unpartitioned windows over that bounded frame (the
    * 1-row-scalar class — B is bucket cardinality, not corpus). The
    * input is scanned once per dimension; pre-cache upstream of a
    * many-dimension report.
    */
  def psiDrift(
      df: DataFrame,
      curCol: String,
      dims: Seq[(String, Column)]): DataFrame = {
    require(dims.nonEmpty, "psiDrift needs at least one dimension")
    val d6 = (c: Column) => c.cast("decimal(28,6)").cast("double")
    val cur = col(curCol).cast("boolean")
    val perDim = dims.map { case (dimName, bucket) =>
      val cnt = df.groupBy(bucket.cast("string").as("bucket"))
        .agg(
          sum(when(cur, lit(0L)).otherwise(lit(1L))).as("n_ref"),
          sum(when(cur, lit(1L)).otherwise(lit(0L))).as("n_cur"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      val tRef = sum(col("n_ref")).over(w)
      val tCur = sum(col("n_cur")).over(w)
      val b = count(lit(1)).over(w)
      val p = (col("n_ref") + lit(1L)).cast("double") /
        (tRef + b).cast("double")
      val q = (col("n_cur") + lit(1L)).cast("double") /
        (tCur + b).cast("double")
      val term = d6((p - q) * log(p / q))
      val withTerm = cnt.select(
        lit(dimName).as("dim"), col("bucket"),
        col("n_ref"), col("n_cur"),
        d6(p).as("p_ref"), d6(q).as("p_cur"), term.as("psi_term"))
      withTerm.withColumn("psi",
        sum(col("psi_term").cast("decimal(28,6)")).over(w)
          .cast("double"))
    }
    perDim.reduce(_ unionByName _)
  }
}
