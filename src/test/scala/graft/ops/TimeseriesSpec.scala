package graft.ops

import graft.SparkSpec

class TimeseriesSpec extends SparkSpec {

  import spark.implicits._

  test("resampleFfill fills gaps with zeros and carries values forward") {
    val events = Seq(
      (1L, 10L, 1.0), (1L, 15L, 2.0), // bucket 0 (step=100)
      (1L, 310L, 5.0), // bucket 3 — buckets 1,2 are gaps
      (2L, 250L, 7.0)) // single-bucket key
      .toDF("k", "ts_us", "v")
    val out = Timeseries.resampleFfill(
      events, Seq("k"), "ts_us", stepUs = 100L, valueCol = "v")
    assert(rows(out) == Set(
      Seq(1L, 0L, 2L, 3.0, 3.0),
      Seq(1L, 100L, 0L, 0.0, 3.0), // gap: zero count, carried total
      Seq(1L, 200L, 0L, 0.0, 3.0),
      Seq(1L, 300L, 1L, 5.0, 5.0),
      Seq(2L, 200L, 1L, 7.0, 7.0)))
  }

  test("resampleFfill validates inputs") {
    val df = Seq((1L, 1L, 1.0)).toDF("k", "ts_us", "v")
    intercept[IllegalArgumentException] {
      Timeseries.resampleFfill(df, Nil, "ts_us", 100L, "v")
    }
    intercept[IllegalArgumentException] {
      Timeseries.resampleFfill(df, Seq("k"), "ts_us", 0L, "v")
    }
  }

  test("timeWeightedAvg weights each value by its holding duration") {
    // k=1: value 10 holds 1..3 (dur 2), 20 holds 3..9 (dur 6):
    // twa = (10*2 + 20*6) / 8 = 17.5 — the arithmetic mean (15) is wrong
    val df = Seq(
      (1L, 1L, 10.0), (1L, 3L, 20.0), (1L, 9L, 99.0), // last value unused
      (2L, 5L, 7.0)) // single observation: no elapsed time → absent
      .toDF("k", "ts", "v")
    val out = Timeseries.timeWeightedAvg(df, Seq("k"), "ts", "v")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(1L -> ((17.5, 2L))))
  }

  test("timeWeightedAvg equals the plain mean on a regular grid") {
    val df = (0L to 10L).map(i => (1L, i, (i % 3).toDouble))
      .toDF("k", "ts", "v")
    val got = Timeseries.timeWeightedAvg(df, Seq("k"), "ts", "v")
      .select("twa").as[Double].head()
    val exp = (0L until 10L).map(i => (i % 3).toDouble).sum / 10
    assert(math.abs(got - exp) < 1e-12)
  }

  test("dateDim spans the bounds with correct calendar attributes") {
    import org.apache.spark.sql.functions.col
    // span covers a leap day, a month boundary and an ISO-week-53 start
    val df = Seq("2020-12-28", "2021-01-03", "2020-02-28")
      .toDF("d0").select(col("d0").cast("date").as("d0"))
    val out = Timeseries.dateDim(df, "d0").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 311) // 2020-02-28 .. 2021-01-03 inclusive
    val leap = out("2020-02-29")
    assert(leap.getLong(4) == 29L && leap.getLong(3) == 2L) // day, month
    assert(leap.getLong(5) == 6L && leap.getInt(7) == 1) // Saturday, weekend
    val nye = out("2021-01-01") // Friday, ISO week 53 of 2020
    assert(nye.getLong(5) == 5L && nye.getLong(6) == 53L)
    assert(nye.getInt(8) == 1 && nye.getInt(7) == 0) // month start, weekday
    val eom = out("2020-03-31")
    assert(eom.getInt(9) == 1 && eom.getInt(8) == 0) // month end
    val monday = out("2020-03-02")
    assert(monday.getLong(5) == 1L) // ISO Monday = 1
  }

  test("rateAnomalies: exact integer flag, zero-variance and warm-up") {
    import org.apache.spark.sql.functions.col
    // key "a": buckets 0..23 hold 2 events each (variance 0), bucket 24
    // holds 10 → frame n=24, s1=48, s2=96, var=0, c≠mean → flagged with
    // z NULL (no finite z on a flat baseline); buckets <12 warm up
    val bucket = 10L
    val rows = ((0L until 24L).flatMap(b =>
      Seq(("a", b * bucket), ("a", b * bucket + 1))) :+ ("a", 24L * bucket))
      .flatMap { case (k, t) => Seq((k, t)) } ++
      (0L until 10L).map(_ => ("a", 24L * bucket + 2))
    val df = rows.toDF("k", "ts")
    val out = Timeseries.rateAnomalies(
        df, Seq("k"), "ts", bucketUs = bucket,
        baselineBuckets = 24, minBaseline = 12, tau = 3)
      .collect()
      .map(r => (r.getLong(1) / bucket) ->
        ((r.getLong(2), r.getLong(3), Option(r.get(4)), Option(r.get(5)),
          r.getInt(6))))
      .toMap
    // warm-up: first buckets have n < 12 → NULL stats, flag 0
    assert(out(0L) == ((2L, 0L, None, None, 0)))
    assert(out(5L) == ((2L, 5L, None, None, 0)))
    // steady state inside the flat region: c == mean → no flag
    assert(out(23L) == ((2L, 23L, Some(2.0), None, 0)))
    // the spike: 11 events vs flat-2 baseline → flag, z NULL (var 0)
    assert(out(24L) == ((11L, 24L, Some(2.0), None, 1)))
  }

  test("rateAnomalies z-score matches the hand formula on a varied frame") {
    import org.apache.spark.sql.functions.col
    // counts 1,2,3,...,12 in buckets 0..11, then 30 in bucket 12:
    // n=12, s1=78, s2=650, mean=6.5, var=(12·650−6084)/(12·11)=13,
    // z=(30−6.5)/sqrt(13)=6.518…, flag: z>3
    val rows = (0L until 12L).flatMap(b =>
      (0L to b).map(i => ("a", b * 100L + i))) ++
      (0L until 30L).map(i => ("a", 1200L + i % 9))
    val df = rows.toDF("k", "ts")
    val out = Timeseries.rateAnomalies(
        df, Seq("k"), "ts", bucketUs = 100L,
        baselineBuckets = 24, minBaseline = 12, tau = 3)
      .collect().map(r => (r.getLong(1) / 100L) -> r).toMap
    val spike = out(12L)
    assert(spike.getLong(2) == 30L && spike.getLong(3) == 12L)
    val expZ = BigDecimal((30.0 - 6.5) / math.sqrt(13.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(spike.getDouble(5) == expZ && spike.getInt(6) == 1)
  }

  // ------------------------------------------------- holtForecast (q312)

  test("holtForecast tracks a perfectly linear series exactly") {
    // y = (1,2,3,4): init l=2,b=1; each step keeps b=1, l=y_t;
    // forecasts are 4+h
    val df = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("a", 2L, 3L),
      ("a", 3L, 4L)).toDF("k", "t", "y")
    val out = Timeseries.holtForecast(df, "k", "t", "y", horizon = 3)
      .orderBy("h").collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Double]("level") == 4.0))
    assert(out.forall(_.getAs[Double]("trend") == 1.0))
    assert(out.map(_.getAs[Double]("forecast")).toSeq == Seq(5.0, 6.0, 7.0))
    assert(out.head.getAs[Long]("n_obs") == 4L)
  }

  test("holtForecast two-point series extrapolates the segment") {
    val df = Seq(("a", 0L, 10L), ("a", 5L, 16L)).toDF("k", "t", "y")
    val out = Timeseries.holtForecast(df, "k", "t", "y", horizon = 2)
      .orderBy("h").collect()
    assert(out.head.getAs[Double]("level") == 16.0)
    assert(out.head.getAs[Double]("trend") == 6.0)
    assert(out.map(_.getAs[Double]("forecast")).toSeq == Seq(22.0, 28.0))
  }

  test("holtForecast matches the unscaled recurrence on a noisy series") {
    // replay the plain double recurrence (exact for these magnitudes)
    val ys = Seq(5L, 9L, 4L, 12L, 8L, 15L, 11L)
    val df = ys.zipWithIndex.map { case (y, i) => ("k", i.toLong, y) }
      .toDF("k", "t", "y")
    var l = ys(1).toDouble
    var b = (ys(1) - ys(0)).toDouble
    ys.drop(2).foreach { y =>
      val nl = (y + l + b) / 2.0
      val nb = ((nl - l) + b) / 2.0
      l = nl; b = nb
    }
    val r = Timeseries.holtForecast(df, "k", "t", "y", horizon = 1)
      .collect().head
    def d6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("level") == d6(l))
    assert(r.getAs[Double]("trend") == d6(b))
    assert(r.getAs[Double]("forecast") == d6(l + b))
  }

  test("holtForecast is per-key and order-insensitive") {
    val df = Seq(("b", 1L, 4L), ("a", 0L, 1L), ("a", 1L, 2L),
      ("b", 0L, 2L), ("a", 2L, 3L)).toDF("k", "t", "y")
    val out = Timeseries.holtForecast(df.repartition(7), "k", "t", "y",
        horizon = 1)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("forecast"))
      .toMap
    assert(out("a") == 4.0) // linear 1,2,3 -> 4
    assert(out("b") == 6.0) // segment 2,4 -> 6
  }

  // -------------------------------------------- seasonalDecompose (q321)

  test("seasonalDecompose splits a pure period-2 oscillation") {
    // x alternates 10, 20: interior trend = (10+2*?,..)/4 = 15,
    // seasonal = ±5 centered, residual = 0
    val df = (1L to 12L).map(i => ("k", i, if (i % 2 == 1) 10L else 20L))
      .toDF("k", "t", "x")
    val out = Timeseries.seasonalDecompose(df, "k", "t", "x", period = 2)
      .orderBy("t").collect()
    val interior = out.filter(!_.isNullAt(4))
    assert(interior.nonEmpty)
    assert(interior.forall(_.getAs[Double]("trend") == 15.0))
    assert(interior.forall(r => math.abs(r.getAs[Double]("seasonal")) == 5.0))
    assert(interior.forall(r => r.getAs[Double]("residual") == 0.0))
    // edges: first and last rows have no full MA window
    assert(out.head.isNullAt(4) && out.last.isNullAt(4))
  }

  test("seasonalDecompose: a clean linear trend has zero seasonal") {
    val df = (1L to 16L).map(i => ("k", i, 2L * i)).toDF("k", "t", "x")
    val out = Timeseries.seasonalDecompose(df, "k", "t", "x", period = 4)
      .collect().filter(!_.isNullAt(4))
    assert(out.forall(r => r.getAs[Double]("seasonal") == 0.0))
    assert(out.forall(r => r.getAs[Double]("residual") == 0.0))
    // interior trend equals the series itself (2t is linear)
    assert(out.forall(r => r.getAs[Double]("trend") ==
      2.0 * r.getAs[Long]("t")))
  }

  test("seasonalDecompose odd period uses the plain centered MA") {
    // repeating 1,2,3 with period 3: trend = 2 everywhere interior,
    // seasonal = (-1, 0, +1) by phase, residual 0
    val df = (1L to 12L).map(i => ("k", i, (((i - 1) % 3) + 1)))
      .toDF("k", "t", "x")
    val out = Timeseries.seasonalDecompose(df, "k", "t", "x", period = 3)
      .collect().filter(!_.isNullAt(4))
    assert(out.forall(_.getAs[Double]("trend") == 2.0))
    val byPhase = out.map(r => r.getAs[Int]("phase") ->
      r.getAs[Double]("seasonal")).toMap
    assert(byPhase == Map(0 -> -1.0, 1 -> 0.0, 2 -> 1.0))
    assert(out.forall(_.getAs[Double]("residual") == 0.0))
  }

  test("seasonalDecompose is per-key and partitioning-invariant") {
    val df = (1L to 40L).flatMap(i => Seq(
      ("a", i, 10L + (i % 4)), ("b", i, 100L + (i % 4) * 10L)))
      .toDF("k", "t", "x")
    val a = Timeseries.seasonalDecompose(df.coalesce(1), "k", "t", "x", 4)
    val b = Timeseries.seasonalDecompose(df.repartition(9), "k", "t", "x", 4)
    assert(rows(a) == rows(b))
    assert(a.count() == 80L)
  }

  test("holtForecast guards: short series, long series, huge values") {
    val one = Seq(("a", 0L, 1L)).toDF("k", "t", "y")
    assert(intercept[Exception] {
      Timeseries.holtForecast(one, "k", "t", "y").collect()
    }.getMessage.contains("2.."))
    val long = (0L until 60L).map(i => ("a", i, i)).toDF("k", "t", "y")
    assert(intercept[Exception] {
      Timeseries.holtForecast(long, "k", "t", "y").collect()
    }.getMessage.contains("2..48"))
    val huge = Seq(("a", 0L, 1L), ("a", 1L, 2000000L)).toDF("k", "t", "y")
    assert(intercept[Exception] {
      Timeseries.holtForecast(huge, "k", "t", "y").collect()
    }.getMessage.contains("1e6"))
  }

  test("acf: alternating series has acf(1) = -5/6, acf(2) = 2/3") {
    // x = 1,2,1,2,1,2: d = 6x−9 = ±3; den = 54, num(1) = −45,
    // num(2) = +36
    val alt = Seq(1L, 2L, 1L, 2L, 1L, 2L).zipWithIndex
      .map { case (x, t) => ("a", t.toLong, x) }.toDF("k", "t", "x")
    val out = Timeseries.acf(alt, "k", "t", "x", maxLag = 2)
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(1) == ((6L, Some(-0.833333))))
    assert(out(2) == ((6L, Some(0.666667))))
  }

  test("acf: constant series yields NULL (zero variance); keys independent") {
    val df = (Seq.tabulate(5)(t => ("flat", t.toLong, 7L)) ++
      Seq(("alt", 0L, 1L), ("alt", 1L, 3L), ("alt", 2L, 1L),
        ("alt", 3L, 3L))).toDF("k", "t", "x")
    val out = Timeseries.acf(df, "k", "t", "x", maxLag = 1)
      .collect().map(r => r.getString(0) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out("flat").isEmpty)
    // alt: d = 4x−8 = −4,4,−4,4; den = 64; num(1) = 3·(−16) = −48
    assert(out("alt") == Some(-0.75))
  }

  test("ljungBox matches the hand-rolled Q on an alternating series") {
    // x alternates 0,2 over n=8: d = ±8, den = 512, ρ₁ = −0.875,
    // ρ₂ = 0.75, ρ₃ = −0.625 → terms ρ²/(n−k) = 0.109375, 0.09375,
    // 0.078125 (each exact at d6) → Q = 8·10·0.28125 = 22.5;
    // df = 3, crit 7.814728 → significant
    val df = (1L to 8L).map(t => ("k", t, if (t % 2 == 1) 0L else 2L))
      .toDF("k", "t", "x")
    val r = Timeseries.ljungBox(df, "k", "t", "x", maxLag = 3)
      .collect().head
    assert(r.getAs[Long]("n_periods") == 8L)
    assert(r.getAs[Long]("n_lags") == 3L)
    assert(r.getAs[Double]("q_stat") == 22.5)
    assert(r.getAs[Int]("significant") == 1)
  }

  test("runsTest: alternating vs sticky series, median drops, hand z") {
    def d6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // alternating 1,9 over n=8: R = 8, n+ = n- = 4 → μ = 5,
    // σ² = 32·24/(64·7); sticky 111999: R = 2 → z negative
    val df = ((1L to 8L).map(t =>
      ("alt", t, if (t % 2 == 1) 1L else 9L)) ++
      (1L to 6L).map(t => ("sticky", t, if (t <= 3) 1L else 9L)))
      .toDF("k", "t", "x")
    val out = Timeseries.runsTest(df, "k", "t", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    val zAlt = d6((8.0 - (2.0 * 4 * 4 / 8 + 1.0)) /
      math.sqrt(2.0 * 4 * 4 * (2.0 * 4 * 4 - 8) / (8.0 * 8 * 7)))
    assert(out("alt").getAs[Long]("n_runs") == 8L)
    assert(out("alt").getAs[Double]("z_stat") == zAlt)
    assert(out("alt").getAs[Int]("significant") == 1)
    assert(out("sticky").getAs[Long]("n_runs") == 2L)
    assert(out("sticky").getAs[Double]("z_stat") < 0.0)
    // values equal to the median drop (the standard convention)
    val med = Seq(("m", 1L, 1L), ("m", 2L, 5L), ("m", 3L, 9L))
      .toDF("k", "t", "x")
    val rm = Timeseries.runsTest(med, "k", "t", "x").collect().head
    assert(rm.getAs[Long]("n_above") == 1L)
    assert(rm.getAs[Long]("n_below") == 1L)
  }

  test("mannKendall: monotone trend detected, all-tied NULL, guard") {
    def d6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = (1L to 8L).map(t => ("up", t, t * 3L))
      .toDF("k", "t", "x")
    val r = Timeseries.mannKendall(df, "k", "t", "x").collect().head
    assert(r.getAs[Long]("s_stat") == 28L) // C(8,2) concordant pairs
    val z = d6(27.0 / math.sqrt((8.0 * 7 * 21 - 0) / 18.0))
    assert(r.getAs[Double]("z_stat") == z)
    assert(r.getAs[Int]("significant") == 1)
    val tied = (1L to 5L).map(t => ("flat", t, 7L)).toDF("k", "t", "x")
    val rt = Timeseries.mannKendall(tied, "k", "t", "x").collect().head
    assert(rt.getAs[Long]("s_stat") == 0L)
    assert(rt.isNullAt(rt.fieldIndex("z_stat")))
    val e = intercept[Exception] {
      Timeseries.mannKendall(df, "k", "t", "x", maxPeriods = 3)
        .collect()
    }
    assert(e.getMessage.contains("maxPeriods"), e.getMessage)
  }

  test("forecastAccuracy: hand MAE/WMAPE/MASE; zero naive error → NULL") {
    // forecast = actual + 2 → MAE 2; Σ|a| = 100 → WMAPE 0.08;
    // season-1 naive diffs are 10 → naive MAE 10 → MASE 0.2
    val df = Seq(("k", 1L, 10L, 12.0), ("k", 2L, 20L, 22.0),
      ("k", 3L, 30L, 32.0), ("k", 4L, 40L, 42.0))
      .toDF("k", "t", "a", "f")
    val r = Timeseries.forecastAccuracy(df, "k", "t", "a", "f",
      season = 1).collect().head
    assert(r.getAs[Long]("n_obs") == 4L)
    assert(r.getAs[Double]("mae") == 2.0)
    assert(r.getAs[Double]("wmape") == 0.08)
    assert(r.getAs[Double]("mase") == 0.2)
    // constant actuals: the naive reference is 0 → MASE is undefined
    val const = Seq(("k", 1L, 5L, 6.0), ("k", 2L, 5L, 6.0),
      ("k", 3L, 5L, 6.0)).toDF("k", "t", "a", "f")
    val rc = Timeseries.forecastAccuracy(const, "k", "t", "a", "f",
      season = 1).collect().head
    assert(rc.getAs[Double]("mae") == 1.0)
    assert(rc.isNullAt(rc.fieldIndex("mase")))
  }

  test("pacf matches the plain-Scala Durbin-Levinson replay on the acf") {
    def d6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = (1L to 12L).map(t => ("k", t, (t * t * 7) % 23))
      .toDF("k", "t", "x")
    val K = 4
    val rho = Timeseries.acf(df, "k", "t", "x", K).collect()
      .map(r => r.getInt(1) -> r.getAs[Double]("acf")).toMap
    // ground-truth recursion on the same d6 rho values
    var arr = Vector(rho(1))
    var kk = Vector(rho(1))
    for (k <- 2 to K) {
      val num = rho(k) -
        (1 until k).map(j => arr(j - 1) * rho(k - j)).sum
      val den = 1.0 - (1 until k).map(j => arr(j - 1) * rho(j)).sum
      val pk = d6(num / den)
      arr = (1 until k).map(j =>
        d6(arr(j - 1) - pk * arr(k - j - 1))).toVector :+ pk
      kk = kk :+ pk
    }
    val out = Timeseries.pacf(df, "k", "t", "x", K).collect()
      .map(r => r.getInt(1) -> r.getAs[Double]("pacf")).toMap
    (1 to K).foreach(k => assert(out(k) == kk(k - 1), s"lag $k"))
    // lag-1 PACF is the lag-1 ACF by definition
    assert(out(1) == rho(1))
  }

  test("pacf: short or flat series answer NULL at every lag") {
    val df = Seq(
      ("short", 1L, 1L), ("short", 2L, 5L), ("short", 3L, 2L),
      ("flat", 1L, 4L), ("flat", 2L, 4L), ("flat", 3L, 4L),
      ("flat", 4L, 4L), ("flat", 5L, 4L), ("flat", 6L, 4L),
      ("flat", 7L, 4L)).toDF("k", "t", "x")
    val out = Timeseries.pacf(df, "k", "t", "x", maxLag = 4)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        Option(r.get(3))).toMap
    assert(out.size == 8) // 4 lags per key, rows present
    assert(out.forall(_._2.isEmpty))
  }

  test("granger: a lagged driver is detected; a perfect fit answers " +
    "NULL; the replay matches the hand OLS") {
    def d6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // y_t = x_{t-1} + small wiggle: x's past carries real signal
    val xs = Seq(3L, 9L, 1L, 8L, 2L, 7L, 4L, 9L, 1L, 6L, 3L, 8L)
    val ys = xs.indices.map(i =>
      if (i == 0) 5L else xs(i - 1) + (i % 3) - 1)
    val df = xs.indices.map(i => ("k", (i + 1).toLong, xs(i), ys(i)))
      .toDF("k", "t", "x", "y")
    val r = Timeseries.granger(df, "k", "t", "x", "y").collect().head
    // hand replay on the aligned rows (t = 2..12)
    val n = 11
    val y = (1 until 12).map(ys(_).toDouble)
    val u = (1 until 12).map(i => ys(i - 1).toDouble)
    val v = (1 until 12).map(i => xs(i - 1).toDouble)
    def c2(a: Seq[Double], b: Seq[Double]): Double =
      n * a.zip(b).map { case (p, q) => p * q }.sum - a.sum * b.sum
    val (cyy, cuy, cvy) = (c2(y, y), c2(u, y), c2(v, y))
    val (cuu, cuv, cvv) = (c2(u, u), c2(u, v), c2(v, v))
    val rssR = d6(cyy - cuy * cuy / cuu)
    val det = cuu * cvv - cuv * cuv
    val rssU = d6(cyy - (cuy * cvv - cvy * cuv) / det * cuy -
      (cvy * cuu - cuy * cuv) / det * cvy)
    val f = d6((rssR - rssU) / (rssU / (n - 3).toDouble))
    assert(r.getAs[Double]("rss_r") == rssR)
    assert(r.getAs[Double]("rss_u") == rssU)
    assert(r.getAs[Double]("f_stat") == f)
    assert(r.getAs[Int]("significant") == 1, s"f = $f")
    // perfect fit: y_t = x_{t-1} exactly → RSS_u = 0 → NULL F
    val perfect = xs.indices.map(i => ("k", (i + 1).toLong, xs(i),
      if (i == 0) 5L else xs(i - 1))).toDF("k", "t", "x", "y")
    val rp = Timeseries.granger(perfect, "k", "t", "x", "y")
      .collect().head
    assert(rp.isNullAt(rp.fieldIndex("f_stat")))
  }

  test("ccf: a one-bucket shift peaks at lag 1 with the hand values") {
    // y is x shifted by one bucket (and inverted in phase at lag 0):
    // x = 0,2,0,2,…, y = 2,0,2,0,… over n = 8 → dx = ∓8, dy = ±8:
    // ρ(0) = −512/512 = −1, ρ(1) = 448/512 = 0.875, ρ(2) = −0.75
    val df = (1L to 8L).map(t => ("k", t,
      if (t % 2 == 1) 0L else 2L, if (t % 2 == 1) 2L else 0L))
      .toDF("k", "t", "x", "y")
    val out = Timeseries.ccf(df, "k", "t", "x", "y", maxLag = 2)
      .collect().map(r => r.getInt(1) -> r.getAs[Double]("ccf")).toMap
    assert(out == Map(0 -> -1.0, 1 -> 0.875, 2 -> -0.75))
  }

  test("ccf: zero variance on either series answers NULL; keys " +
    "stay independent") {
    val df = Seq(
      ("flat", 1L, 5L, 1L), ("flat", 2L, 5L, 9L), ("flat", 3L, 5L, 4L),
      ("live", 1L, 0L, 0L), ("live", 2L, 2L, 2L), ("live", 3L, 0L, 0L),
      ("live", 4L, 2L, 2L)).toDF("k", "t", "x", "y")
    val out = Timeseries.ccf(df, "k", "t", "x", "y", maxLag = 1)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out(("flat", 0)).isEmpty) // x constant → NULL
    assert(out(("live", 0)) == Some(1.0)) // y ≡ x → exact 1 at lag 0
  }

  test("ljungBox: too-short and zero-variance series answer NULL, " +
    "not a wrong Q") {
    val df = Seq(
      ("short", 1L, 1L), ("short", 2L, 3L), ("short", 3L, 1L),
      ("flat", 1L, 5L), ("flat", 2L, 5L), ("flat", 3L, 5L),
      ("flat", 4L, 5L), ("flat", 5L, 5L)).toDF("k", "t", "x")
    val out = Timeseries.ljungBox(df, "k", "t", "x", maxLag = 3)
      .collect().map(r => r.getString(0) ->
        Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    // short: only lags 1..2 exist (n = 3) → incomplete → NULL
    assert(out("short").isEmpty)
    // flat: ρ is NULL at every lag (zero variance) → NULL
    assert(out("flat").isEmpty)
  }

  test("periodogram: a planted period-8 cycle peaks at k = n/8; " +
    "constant series answers zero power everywhere") {
    // n = 16 buckets, the pattern repeats twice → fundamental at k = 2
    val pat = Seq(9L, 7L, 5L, 7L, 9L, 11L, 13L, 11L)
    val df = (0 until 16).map(i => ("cyc", i.toLong, pat(i % 8))) ++
      (0 until 16).map(i => ("flat", i.toLong, 4L))
    val out = Timeseries.periodogram(
      df.toDF("k", "t", "x"), "k", "t", "x", maxFreq = 24)
    val cyc = out.filter("k = 'cyc'").collect()
      .map(r => r.getAs[Long]("freq") -> r).toMap
    assert(cyc.size == 8) // min(maxFreq, n/2) frequencies
    assert(cyc(2L).getAs[Int]("is_peak") == 1)
    assert(cyc(2L).getAs[Double]("period_buckets") == 8.0)
    val others = cyc.filterKeys(_ != 2L).values
    assert(others.forall(r => r.getAs[Int]("is_peak") == 0 &&
      r.getAs[Double]("power") < cyc(2L).getAs[Double]("power")))
    val flat = out.filter("k = 'flat'").collect()
    assert(flat.length == 8 &&
      flat.forall(_.getAs[Double]("power") == 0.0))
    intercept[IllegalArgumentException] {
      Timeseries.periodogram(df.toDF("k", "t", "x"), "k", "t", "x", 0)
    }
  }

  test("haarEnergy: hand-computed 4-point spectrum; short keys omitted") {
    // [5,1,3,3]: level 1 details (5-1, 3-3) → energy 16/2 = 8;
    // level 2 detail (5+1)-(3+3) = 0 → energy 0; share = 1.0 / 0.0
    val df = (Seq(5L, 1L, 3L, 3L).zipWithIndex
      .map { case (x, i) => ("h", i.toLong, x) } ++
      Seq(("short", 0L, 1L), ("short", 1L, 2L), ("short", 2L, 3L)))
      .toDF("k", "t", "x")
    val out = Timeseries.haarEnergy(df, "k", "t", "x", levels = 2)
      .collect().map(r => (r.getString(0), r.getAs[Int]("level")) -> r)
      .toMap
    assert(out.keySet == Set("h" -> 1, "h" -> 2)) // short key omitted
    assert(out("h" -> 1).getAs[Long]("n_coeffs") == 2L)
    assert(out("h" -> 1).getAs[Double]("energy") == 8.0)
    assert(out("h" -> 1).getAs[Double]("share") == 1.0)
    assert(out("h" -> 2).getAs[Double]("energy") == 0.0)
    assert(out("h" -> 2).getAs[Double]("share") == 0.0)
  }

  test("hurst: a trending walk reads persistent, an alternating " +
    "series anti-persistent; validation is loud") {
    val trend = (0 until 64).map(i => ("up", i.toLong, i.toLong * 3L))
    val alt = (0 until 64).map(i =>
      ("alt", i.toLong, if (i % 2 == 0) 10L else 0L))
    val out = Timeseries.hurst(
      (trend ++ alt).toDF("k", "t", "x"), "k", "t", "x",
      windows = Seq(8, 16, 32))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("up").getAs[Long]("n_scales") == 3L)
    assert(out("up").getAs[Double]("hurst") > 0.9)
    assert(out("alt").getAs[Double]("hurst") < 0.5)
    intercept[IllegalArgumentException] {
      Timeseries.hurst(trend.toDF("k", "t", "x"), "k", "t", "x", Seq(2))
    }
    intercept[IllegalArgumentException] {
      Timeseries.hurst(trend.toDF("k", "t", "x"), "k", "t", "x",
        Seq(8, 8))
    }
  }

  test("saxRank: hand word over single-bucket spans; short series " +
    "shorten the word; validation is loud") {
    // 8 values, 8 segments → span means are the values; rank-quartile
    // symbols: 0,0→a 4,4→b 6,6→c 10,10→d, word in time order
    val vals = Seq(0L, 0L, 10L, 10L, 4L, 4L, 6L, 6L)
    val df = (vals.zipWithIndex.map { case (x, i) =>
      ("w", i.toLong, x) } ++
      (0 until 4).map(i => ("short", i.toLong, i.toLong * 2L)))
      .toDF("k", "t", "x")
    val out = Timeseries.saxRank(df, "k", "t", "x",
      segments = 8, alphabet = 4)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("w").getAs[String]("sax_word") == "aaddbbcc")
    assert(out("w").getAs[Long]("n_segments") == 8L)
    assert(out("short").getAs[String]("sax_word").length == 4)
    assert(out("short").getAs[Long]("n_periods") == 4L)
    intercept[IllegalArgumentException] {
      Timeseries.saxRank(df, "k", "t", "x", segments = 1)
    }
    intercept[IllegalArgumentException] {
      Timeseries.saxRank(df, "k", "t", "x", alphabet = 27)
    }
  }

  test("dtw: a monotone warp of the same shape costs 0; constant " +
    "offset pays per-cell; the guard is loud") {
    // a=[1,2,3] vs b=[1,2,2,3]: the doubled 2 warps for free → 0.
    // c=[0,0,0] vs d=[1,1]: every cell costs 1, best path 3 cells → 3.
    val df = (Seq(1L, 2L, 3L).zipWithIndex.map { case (x, i) =>
        ("a", i.toLong, x) } ++
      Seq(1L, 2L, 2L, 3L).zipWithIndex.map { case (x, i) =>
        ("b", i.toLong, x) } ++
      Seq(0L, 0L, 0L).zipWithIndex.map { case (x, i) =>
        ("c", i.toLong, x) } ++
      Seq(1L, 1L).zipWithIndex.map { case (x, i) =>
        ("d", i.toLong, x) }).toDF("k", "t", "x")
    val out = Timeseries.dtw(df, "k", "t", "x")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 6) // 4 choose 2 ordered pairs
    assert(out(("a", "b")).getAs[Long]("dtw") == 0L)
    assert(out(("a", "b")).getAs[Double]("dtw_norm") == 0.0)
    assert(out(("c", "d")).getAs[Long]("dtw") == 3L)
    assert(out(("c", "d")).getAs[Double]("dtw_norm") == 0.6)
    assert(out(("a", "b")).getAs[Long]("n_a") == 3L)
    assert(out(("a", "b")).getAs[Long]("n_b") == 4L)
    val e = intercept[Exception] {
      Timeseries.dtw(df, "k", "t", "x", maxPeriods = 3).collect()
    }
    assert(e.getMessage.contains("maxPeriods"), e.getMessage)
    // the keys²/2 pair stage refuses corpus-cardinality key columns
    // loudly (4 series > maxKeys=3) instead of going quadratic
    val ek = intercept[Exception] {
      Timeseries.dtw(df, "k", "t", "x", maxKeys = 3).collect()
    }
    assert(ek.getMessage.contains("maxKeys"), ek.getMessage)
    intercept[IllegalArgumentException] {
      Timeseries.dtw(df, "k", "t", "x", maxKeys = 1)
    }
  }

  test("gumbelReturnLevels: moment fit on two blocks matches the " +
    "closed form; return levels rise with the period; single block " +
    "answers NULL") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 10L), (1L, 3L), (2L, 20L), (2L, 5L))
      .toDF("day", "x")
    val r = Timeseries.gumbelReturnLevels(df, "day", "x")
      .collect().head
    assert(r.getAs[Long]("n_blocks") == 2L)
    assert(r.getAs[Double]("mean_max") == 15.0)
    // maxima {10, 20}: sd = sqrt(50) d6-staged → replay the chain
    val sd = math.rint(math.sqrt(50.0) * 1e6) / 1e6
    val beta = math.rint(sd * math.sqrt(6.0) / math.Pi * 1e6) / 1e6
    val mu = math.rint((15.0 - 0.5772156649 * beta) * 1e6) / 1e6
    assert(math.abs(r.getAs[Double]("beta") - beta) < 1e-9)
    assert(math.abs(r.getAs[Double]("mu") - mu) < 1e-9)
    val rl10 = r.getAs[Double]("rl_10")
    val rl100 = r.getAs[Double]("rl_100")
    assert(rl10 > r.getAs[Double]("mean_max"))
    assert(rl100 > rl10)
    val single = Seq((1L, 10L), (1L, 3L)).toDF("day", "x")
    val rs = Timeseries.gumbelReturnLevels(single, "day", "x")
      .collect().head
    assert(rs.isNullAt(rs.fieldIndex("beta")))
    assert(rs.isNullAt(rs.fieldIndex("rl_10")))
    val e = intercept[IllegalArgumentException] {
      Timeseries.gumbelReturnLevels(df, "day", "x",
        returnPeriods = Seq(1L))
    }
    assert(e.getMessage.contains(">= 2"), e.getMessage)
  }

  test("neweyWestSlope: exact-linear residuals zero out the HAC " +
    "variance (NULL se); a noisy trend reports the OLS slope with a " +
    "positive robust se; short series is loud") {
    // y = 2t exactly: every residual is 0 → s_hac = 0 → NULL se
    val exact = (1L to 10L).map(t => (t, 2L * t)).toDF("t", "y")
    val re = Timeseries.neweyWestSlope(exact, "t", "y")
      .collect().head
    assert(re.getAs[Double]("slope") == 2.0)
    assert(re.getAs[Double]("s_hac") == 0.0)
    assert(re.isNullAt(re.fieldIndex("se_hac")))
    // y = t + alternating ±3 noise: slope stays 1-ish, se positive
    val noisy = (1L to 12L).map(t =>
      (t, t + (if (t % 2L == 0L) 3L else -3L))).toDF("t", "y")
    val rn = Timeseries.neweyWestSlope(noisy, "t", "y")
      .collect().head
    assert(math.abs(rn.getAs[Double]("slope") - 1.0) < 0.2)
    assert(rn.getAs[Double]("se_hac") > 0.0)
    assert(!rn.isNullAt(rn.fieldIndex("t_hac")))
    val loud = intercept[Exception] {
      Timeseries.neweyWestSlope(
        (1L to 6L).map(t => (t, t)).toDF("t", "y"), "t", "y",
        lags = 3).collect()
    }
    assert(loud.getMessage.contains("lags+4"), loud.getMessage)
  }

  test("decompositionStrength: a pure period signal is seasonal-" +
    "strong; a pure linear trend scores trend strength 1 with NULL " +
    "seasonal strength") {
    import org.apache.spark.sql.functions.col
    val seasonal = (1L to 12L).map(t =>
      ("s", t, if (t % 2L == 0L) 100L else 0L)).toDF("k", "t", "x")
    val rs = Timeseries.decompositionStrength(seasonal, "k", "t",
      "x", period = 4).collect().head
    assert(rs.getAs[Double]("seasonal_strength") > 0.8,
      rs.toString)
    val linear = (1L to 12L).map(t => ("l", t, 10L * t))
      .toDF("k", "t", "x")
    val rl = Timeseries.decompositionStrength(linear, "k", "t",
      "x", period = 4).collect().head
    assert(rl.getAs[Double]("trend_strength") == 1.0)
    assert(rl.isNullAt(rl.fieldIndex("seasonal_strength")))
  }

  test("turningPointsTest: hand extrema count; plateaus are not " +
    "turns; n<3 answers NULL") {
    import org.apache.spark.sql.functions.col
    // [1,3,2,4,1]: 3 strict interior extrema; E = 2(5−2)/3 = 2
    val df = Seq(("a", 1L, 1L), ("a", 2L, 3L), ("a", 3L, 2L),
      ("a", 4L, 4L), ("a", 5L, 1L),
      ("p", 1L, 1L), ("p", 2L, 2L), ("p", 3L, 2L), ("p", 4L, 1L),
      ("s", 1L, 7L), ("s", 2L, 9L)).toDF("k", "t", "x")
    val out = Timeseries.turningPointsTest(df, "k", "t", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n_turning") == 3L)
    assert(out("a").getAs[Double]("expected") == 2.0)
    val z = out("a").getAs[Double]("z")
    assert(z > 1.3 && z < 1.35, z.toString)
    assert(out("a").getAs[Int]("significant") == 0)
    assert(out("p").getAs[Long]("n_turning") == 0L)
    assert(out("s").isNullAt(out("s").fieldIndex("z")))
  }

  test("bartelsRankVonNeumann: a perfect trend reads RVN 0.4 and " +
    "rejects; a constant series answers NULL") {
    import org.apache.spark.sql.functions.col
    // [1..5]: doubled ranks [2,4,6,8,10], NM = 16, DN = 40 → 0.4
    val df = ((1L to 5L).map(t => ("tr", t, t)) ++
      (1L to 5L).map(t => ("c", t, 7L))).toDF("k", "t", "x")
    val out = Timeseries.bartelsRankVonNeumann(df, "k", "t", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("tr").getAs[Double]("rvn") == 0.4)
    assert(out("tr").getAs[Double]("z") < -2.0)
    assert(out("tr").getAs[Int]("significant") == 1)
    assert(out("c").isNullAt(out("c").fieldIndex("rvn")))
    assert(out("c").getAs[Int]("significant") == 0)
  }

  test("kpssTest: hand exact-rational eta on an alternating series; " +
    "a constant series answers NULL eta with stationary=1") {
    import org.apache.spark.sql.functions.col
    // [5,1,5,1] at L=1: c=[8,−8,8,−8], ΣP²=128, G0=256, G1=−192,
    // E=512−384=128 → η = 128·2/(4·128) = 0.5 (> .463 → flag 0)
    val df = (Seq(5L, 1L, 5L, 1L).zipWithIndex.map { case (x, i) =>
      ("alt", i.toLong, x) } ++
      Seq(("c", 1L, 3L), ("c", 2L, 3L), ("c", 3L, 3L)))
      .toDF("k", "t", "x")
    val out = Timeseries.kpssTest(df, "k", "t", "x", lags = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("alt").getAs[Double]("eta") == 0.5)
    assert(out("alt").getAs[Int]("stationary") == 0)
    assert(out("c").isNullAt(out("c").fieldIndex("eta")))
    assert(out("c").getAs[Int]("stationary") == 1)
    intercept[IllegalArgumentException] {
      Timeseries.kpssTest(df, "k", "t", "x", lags = 40)
    }
  }

  test("coxStuartTrend: offset pairing with the middle point " +
    "dropped; signTest's continuity correction") {
    import org.apache.spark.sql.functions.col
    // even [1..6]: pairs (1,4),(2,5),(3,6) all up → z = 2/√3;
    // odd [1..5]: offset 3, middle dropped → 2 pairs
    val df = ((1L to 6L).map(t => ("e", t, t)) ++
      (1L to 5L).map(t => ("o", t, t))).toDF("k", "t", "x")
    val out = Timeseries.coxStuartTrend(df, "k", "t", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("e").getAs[Long]("n_up") == 3L)
    assert(out("e").getAs[Long]("n_down") == 0L)
    assert(out("e").getAs[Double]("z") == 1.154701)
    assert(out("e").getAs[String]("trend") == "none")
    assert(out("o").getAs[Long]("n_up") == 2L)
    assert(out("o").getAs[Long]("n_down") == 0L)
  }

  test("dieboldMariano: hand HAC chain collapses to DM=4; a zero-" +
    "variance differential answers NULL") {
    import org.apache.spark.sql.functions.col
    // e1=[2,0,2,0], e2=0: d=[4,0,4,0], c=[8,−8,8,−8], E=128 at L=1
    // → DM = 8·4·√2/√128 = 4 exactly; mean d = 2
    val df = (Seq(2L, 0L, 2L, 0L).zipWithIndex.map { case (e, i) =>
      ("m", i.toLong, e, 0L) } ++
      (1 to 4).map(i => ("z", i.toLong, 1L, 1L)))
      .toDF("k", "t", "e1", "e2")
    val out = Timeseries.dieboldMariano(df, "k", "t", "e1", "e2",
      lags = 1).collect().map(r => r.getString(0) -> r).toMap
    assert(out("m").getAs[Double]("mean_loss_diff") == 2.0)
    assert(out("m").getAs[Double]("dm_stat") == 4.0)
    assert(out("m").getAs[Int]("better_model") == 2)
    assert(out("z").isNullAt(out("z").fieldIndex("dm_stat")))
    assert(out("z").getAs[Int]("better_model") == 0)
  }

  test("pinballScorecard: exact order-statistic picks and all-" +
    "integer ppm loss terms; bad quantiles are loud") {
    import org.apache.spark.sql.functions.col
    // train x=[10..50]: P50 rank ⌈.5·5⌉=3 → 30; P10 rank 1 → 10;
    // test {25,45}: P50 loss (2.5e6+7.5e6)/2e6 = 5, P10 = 2.5
    val df = (Seq(10L, 20L, 30L, 40L, 50L).zipWithIndex.map {
      case (x, i) => ("a", i.toLong + 1L, x) } ++
      Seq(("a", 6L, 25L), ("a", 7L, 45L))).toDF("k", "t", "x")
    val out = Timeseries.pinballScorecard(df, "k", "t", "x",
      splitT = 6L, quantilesPpm = Seq(100000L, 500000L))
      .collect().map(r => r.getAs[Long]("q_ppm") -> r).toMap
    assert(out(500000L).getAs[Long]("prediction") == 30L)
    assert(out(500000L).getAs[Double]("pinball_loss") == 5.0)
    assert(out(100000L).getAs[Long]("prediction") == 10L)
    assert(out(100000L).getAs[Double]("pinball_loss") == 2.5)
    assert(out(500000L).getAs[Long]("n_train") == 5L)
    assert(out(500000L).getAs[Long]("n_test") == 2L)
    intercept[IllegalArgumentException] {
      Timeseries.pinballScorecard(df, "k", "t", "x", 6L, Seq(0L))
    }
    intercept[IllegalArgumentException] {
      Timeseries.pinballScorecard(df, "k", "t", "x", 6L,
        Seq(500000L, 500000L))
    }
  }

  test("xbarRChart: hand subgroups flag the excursion; the " +
    "incomplete tail subgroup drops; off-table sizes are loud") {
    import org.apache.spark.sql.functions.col
    // n=2 subgroups of [1,3][2,2][10,10][4,0] (+ dangling 9th point):
    // x̄ = 2,2,10,2 → X̄̄=4, R̄=1.5; A₂=1.88 → UCL 6.82 — only the
    // (10,10) subgroup is out
    val df = Seq(1L, 3L, 2L, 2L, 10L, 10L, 4L, 0L, 100L).zipWithIndex
      .map { case (x, i) => ("k", i.toLong, x) }.toDF("k", "t", "x")
    val out = Timeseries.xbarRChart(df, "k", "t", "x", subgroupSize = 2)
      .collect().map(r => r.getAs[Long]("subgroup") -> r).toMap
    assert(out.size == 4) // the 9th point's subgroup dropped
    assert(out(0L).getAs[Double]("grand_mean") == 4.0)
    assert(out(0L).getAs[Double]("r_bar") == 1.5)
    assert(out(0L).getAs[Double]("ucl_xbar") == 6.82)
    assert(out(0L).getAs[Double]("lcl_xbar") == 1.18)
    assert(out(0L).getAs[Double]("ucl_r") == 4.9005)
    assert(out(2L).getAs[Int]("xbar_out") == 1)
    assert(Seq(0L, 1L, 3L).forall(out(_).getAs[Int]("xbar_out") == 0))
    assert(out(3L).getAs[Int]("r_out") == 0)
    intercept[IllegalArgumentException] {
      Timeseries.xbarRChart(df, "k", "t", "x", subgroupSize = 11)
    }
  }

  private def d6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("cChart: hand Poisson limits flag the spike; LCL clamps at 0; " +
    "negative counts are loud") {
    // counts 1,2,3,4,15: c̄ = 5, UCL = 5+3√5 = 11.708204, LCL = 0
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 15L))
      .toDF("u", "c")
    val out = Timeseries.cChart(df, "u", "c").collect()
      .map(r => r.getAs[Long]("unit") -> r).toMap
    assert(out(1L).getAs[Double]("c_bar") == 5.0)
    assert(out(1L).getAs[Double]("ucl") ==
      d6(5.0 + 3.0 * math.sqrt(5.0)))
    assert(out(1L).getAs[Double]("lcl") == 0.0)
    assert(out(5L).getAs[Int]("out_of_control") == 1)
    assert(Seq(1L, 2L, 3L, 4L)
      .forall(out(_).getAs[Int]("out_of_control") == 0))
    val loud = intercept[Exception] {
      Timeseries.cChart(Seq((1L, -1L)).toDF("u", "c"), "u", "c")
        .collect()
    }
    assert(loud.getMessage.contains("negative count"), loud.getMessage)
  }

  test("uChart: per-unit limits tighten with size; the small noisy " +
    "unit flags; zero size is loud") {
    // defects 10/5 over sizes 100/1: ū = 15/101; unit 2's rate 5.0
    // blows its wide limit, unit 1's 0.1 sits inside its tight one
    val df = Seq((1L, 10L, 100L), (2L, 5L, 1L)).toDF("u", "c", "n")
    val out = Timeseries.uChart(df, "u", "c", "n").collect()
      .map(r => r.getAs[Long]("unit") -> r).toMap
    val ubar = d6(15.0 / 101.0)
    assert(out(1L).getAs[Double]("u_bar") == ubar)
    assert(out(1L).getAs[Double]("u") == 0.1)
    assert(out(1L).getAs[Double]("ucl") ==
      d6(ubar + 3.0 * math.sqrt(ubar / 100.0)))
    assert(out(1L).getAs[Int]("out_of_control") == 0)
    assert(out(2L).getAs[Double]("u") == 5.0)
    assert(out(2L).getAs[Int]("out_of_control") == 1)
    val loud = intercept[Exception] {
      Timeseries.uChart(Seq((1L, 1L, 0L)).toDF("u", "c", "n"),
        "u", "c", "n").collect()
    }
    assert(loud.getMessage.contains("unit size"), loud.getMessage)
  }

  test("permutationEntropy: monotone series reads 0; hand two-pattern " +
    "entropy; short series emit no row; bad m is loud") {
    val mono = Seq.tabulate(5)(i => ("k", i.toLong, (i + 1).toLong))
      .toDF("k", "t", "x")
    val m = Timeseries.permutationEntropy(mono, "k", "t", "x", m = 3)
      .collect()(0)
    assert(m.getAs[Long]("n_windows") == 3L)
    assert(m.getAs[Long]("n_patterns") == 1L)
    assert(m.getAs[Double]("entropy") == 0.0)
    assert(m.getAs[Double]("pe_norm") == 0.0)
    // [1,5,2,6,3] → patterns {4,1,4}: p = 2/3, 1/3 → d6 terms
    // −0.270310, −0.366204 → H = 0.636514
    val zig = Seq(("k", 0L, 1L), ("k", 1L, 5L), ("k", 2L, 2L),
      ("k", 3L, 6L), ("k", 4L, 3L)).toDF("k", "t", "x")
    val z = Timeseries.permutationEntropy(zig, "k", "t", "x", m = 3)
      .collect()(0)
    assert(z.getAs[Long]("n_windows") == 3L)
    assert(z.getAs[Long]("n_patterns") == 2L)
    assert(z.getAs[Double]("entropy") == 0.636514)
    assert(z.getAs[Double]("pe_norm") == d6(0.636514 / math.log(6.0)))
    // a 2-point series has no complete m=3 window → no row
    assert(Timeseries.permutationEntropy(
      Seq(("s", 0L, 1L), ("s", 1L, 2L)).toDF("k", "t", "x"),
      "k", "t", "x", m = 3).collect().isEmpty)
    intercept[IllegalArgumentException] {
      Timeseries.permutationEntropy(mono, "k", "t", "x", m = 6)
    }
    // a NULL x is loud (ADVICE r16): an interior NULL would fall
    // through every ordinal comparison to the 0 branch and bias the
    // pattern id silently — only the last lead is completeness-checked
    val nullX = Seq(("k", 0L, java.lang.Long.valueOf(1L)),
      ("k", 1L, null.asInstanceOf[java.lang.Long]),
      ("k", 2L, java.lang.Long.valueOf(2L)),
      ("k", 3L, java.lang.Long.valueOf(3L))).toDF("k", "t", "x")
    val loudNull = intercept[Exception] {
      Timeseries.permutationEntropy(nullX, "k", "t", "x", m = 3)
        .collect()
    }
    assert(loudNull.getMessage.contains("NULL x"), loudNull.getMessage)
  }
}
