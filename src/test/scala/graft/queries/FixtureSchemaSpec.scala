package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins the fixture-schema contract: the engine accepts an events table
  * whose on-disk `ts` is ANY of the flavors the driver's fixture has
  * shipped — epoch-nanos BIGINT (the legacy nanos-as-long read),
  * timestamp (µs, UTC-adjusted), or timestamp_ntz (the current
  * `timestamp[us]` parquet) — and computes the SAME answer on each.
  *
  * The round-9 incident: the driver regenerated `events.ts` from
  * TIMESTAMP(NANOS) to timestamp[us] and 33 entries stopped analyzing
  * while 3 silently computed ms-scale timestamps. [[Tables.tsUs]] is the
  * one adaptive entry point now; this spec is the regression gate that
  * keeps it that way if the fixture moves again.
  */
class FixtureSchemaSpec extends SparkSpec {

  import spark.implicits._

  // a tiny events fixture: two users, one 40-minute gap (so q21 splits
  // user 1 into two sessions), sub-second offsets to exercise µs math
  private val baseUs = 1700000000L * 1000000L // 2023-11-14T22:13:20Z in µs
  private val fixtureRows = Seq(
    // (event_id, us_offset, user_id, event_type, value)
    (1L, 0L, 1L, "signup", 1.0),
    (2L, 5L * 60000000L + 250000L, 1L, "click", 2.0),
    (3L, 50L * 60000000L, 1L, "purchase", 30.0), // > 30-min gap: session 2
    (4L, 2L * 60000000L, 2L, "view", 4.0))

  /** Write the mini fixture with the given ts flavor; returns the dir. */
  private def stage(flavor: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_fixture_$flavor")
    val df = fixtureRows
      .toDF("event_id", "us_off", "user_id", "event_type", "value")
      .withColumn("us", lit(baseUs) + col("us_off"))
      .withColumn("ts", flavor match {
        case "nanos_long" => col("us") * 1000L
        case "timestamp" => timestamp_micros(col("us"))
        case "timestamp_ntz" => timestamp_micros(col("us")).cast(TimestampNTZType)
      })
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), lit(null).cast("string").as("props"))
    df.coalesce(1).write.mode("overwrite").parquet(dir.resolve("tmp").toString)
    // the driver fixture is a single FILE named events.parquet (the
    // streaming stages Files.copy it as one); extract the part file
    val part = java.nio.file.Files.list(dir.resolve("tmp")).iterator()
    val single = Iterator.continually(part)
      .takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error("no part file written"))
    java.nio.file.Files.move(single, dir.resolve("events.parquet"))
    TempDirs.deleteRecursively(dir.resolve("tmp"))
    dir.toString
  }

  private def sessions(dir: String): Set[Seq[Any]] =
    rows(Pipeline.q21Sessions(spark, dir)
      .select("user_id", "session_id", "n_events", "total_value", "n_purchases"))

  test("tsUs normalizes every shipped ts flavor to identical epoch-µs") {
    for (flavor <- Seq("nanos_long", "timestamp", "timestamp_ntz")) {
      val dir = stage(flavor)
      val got = Tables.eventsUs(spark, dir)
        .select("event_id", "ts_us").as[(Long, Long)].collect().toMap
      val want = fixtureRows.map { case (id, off, _, _, _) => id -> (baseUs + off) }.toMap
      assert(got == want, s"flavor=$flavor")
    }
  }

  test("q21 sessionization computes the same sessions on all ts flavors") {
    val byFlavor =
      Seq("nanos_long", "timestamp", "timestamp_ntz").map(f => f -> sessions(stage(f)))
    val (_, reference) = byFlavor.head
    // user 1 splits at the 40-min gap; user 2 has one single-event session
    assert(reference.map(r => (r(0), r(2))) ==
      Set((1L, 2L), (1L, 1L), (2L, 1L)))
    for ((flavor, got) <- byFlavor.tail)
      assert(got == reference, s"flavor=$flavor diverges from nanos_long")
  }

  test("streaming sessionization drains the same sessions on all flavors") {
    // the streaming path was round 9's SILENT failure mode (µs values
    // read where ns were assumed): q38 stages sentinels, reads a real
    // file stream with the footer-derived schema, and drains — all of
    // which must adapt per flavor and agree
    val byFlavor = Seq("nanos_long", "timestamp", "timestamp_ntz").map { f =>
      val out = StreamingEntries.all("q38_streaming_sessions")(spark, stage(f))
      f -> rows(out.select("user_id", "session_id", "n_events",
        "start_us", "end_us"))
    }
    val (_, reference) = byFlavor.head
    // same session structure as the batch q21 test, with µs bounds:
    // user 1 session 1 spans [base, base+5min+250ms]
    assert(reference.exists(r => r(0) == 1L && r(2) == 2L &&
      r(3) == baseUs && r(4) == baseUs + 5L * 60000000L + 250000L), reference)
    assert(reference.size == 3)
    for ((flavor, got) <- byFlavor.tail)
      assert(got == reference, s"flavor=$flavor diverges from nanos_long")
  }

  test("tsUs rejects an unsupported ts type loudly") {
    val df = Seq(("x", 1L)).toDF("ts", "event_id")
    intercept[IllegalArgumentException] {
      Tables.tsUs(df, "ts")
    }
  }

  test("tsLit round-trips through tsUs for every flavor") {
    val us = baseUs + 123456L
    for (dt <- Seq(LongType, TimestampType, TimestampNTZType)) {
      val df = spark.range(1).select(Tables.tsLit(dt, us).as("ts"))
      assert(df.schema("ts").dataType == dt, s"dt=$dt")
      val got = df.select(Tables.tsUs(df, "ts")).as[Long].head()
      assert(got == us, s"dt=$dt")
    }
  }
}
