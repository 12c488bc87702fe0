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
}
