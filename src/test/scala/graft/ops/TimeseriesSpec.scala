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
}
