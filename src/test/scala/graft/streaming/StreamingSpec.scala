package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** MemoryStream-driven coverage of the streaming operators. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowedCounts aggregates per tumbling window with watermark") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.windowedCounts(in.toDF(), "ts", "user_id")
      .writeStream.format("memory").queryName("wc").outputMode("update").start()
    in.addData(
      Event(1L, ts(0), "view", 1.0), Event(1L, ts(5), "view", 2.0),
      Event(1L, ts(12), "view", 4.0), Event(2L, ts(1), "click", 8.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wc")
      .selectExpr("user_id", "n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // user 1: [0,10) has 2 events (3.0), [10,20) has 1 (4.0); user 2: 1 (8.0)
    assert(rows == Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
  }

  test("windowedCounts with slide lands each event in len/slide windows") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.windowedCounts(in.toDF(), "ts", "user_id",
        windowLen = "20 minutes", slide = Some("10 minutes"))
      .writeStream.format("memory").queryName("swc")
      .outputMode("update").start()
    in.addData(Event(1L, ts(15), "view", 2.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("swc")
      .selectExpr("window.start", "n_events").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    // minute 15 is inside [0,20) and [10,30): exactly two windows
    assert(rows == Set((ts(0), 1L), (ts(10), 1L)))
  }

  test("dedupStream drops replayed keys inside the watermark horizon") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.dedupStream(in.toDF(), "ts", Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    in.addData(
      Event(1L, ts(0), "view", 1.0), Event(1L, ts(0), "view", 1.0),
      Event(1L, ts(0), "click", 2.0))
    q.processAllAvailable()
    in.addData(Event(1L, ts(0), "view", 1.0)) // replay in a later batch
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dd").count() == 2)
  }

  test("intervalJoin pairs points with containing intervals, boundaries inclusive") {
    implicit val sql = spark.sqlContext
    val pts = MemoryStream[(Long, Timestamp)]
    val ivs = MemoryStream[(Long, Timestamp)]
    val joined = Streaming.intervalJoin(
      pts.toDF().toDF("pid", "p_ts"), "p_ts",
      ivs.toDF().toDF("iid", "i_ts"), "i_ts",
      lengthUs = 10L * 60 * 1000000, // 10 minutes
      bucketWidthUs = 10L * 60 * 1000000)
    val q = joined.select("pid", "iid")
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    ivs.addData((100L, ts(10)), (200L, ts(40)))
    pts.addData(
      (1L, ts(10)), // start boundary of 100 (inclusive)
      (2L, ts(20)), // end boundary of 100 (inclusive)
      (3L, ts(25)), // inside no interval
      (4L, ts(45))) // inside 200
    q.processAllAvailable()
    // a LATER batch can still match state from the first (symmetric join)
    pts.addData((5L, ts(15)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ij").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 100L), (4L, 200L), (5L, 100L)))
  }

  test("left_outer intervalJoin emits unmatched points once the watermark passes") {
    implicit val sql = spark.sqlContext
    val pts = MemoryStream[(Long, Timestamp)]
    val ivs = MemoryStream[(Long, Timestamp)]
    val joined = Streaming.intervalJoin(
      pts.toDF().toDF("pid", "p_ts"), "p_ts",
      ivs.toDF().toDF("iid", "i_ts"), "i_ts",
      lengthUs = 10L * 60 * 1000000,
      bucketWidthUs = 10L * 60 * 1000000,
      watermark = "5 minutes",
      joinType = "left_outer")
    val q = joined.select("pid", "iid")
      .writeStream.format("memory").queryName("loij").outputMode("append").start()
    ivs.addData((100L, ts(10)))
    pts.addData(
      (1L, ts(15)), // inside 100 → matched
      (2L, ts(45))) // inside nothing → must still emit (null iid)
    q.processAllAvailable()
    // far-future rows on BOTH sides advance both watermarks past t=45+10m
    ivs.addData((-1L, ts(10000)))
    pts.addData((-1L, ts(10000)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("loij").collect()
      .filter(_.getLong(0) != -1L)
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, null)))
  }

  test("asOfStatic enriches with the latest snapshot at-or-before event time") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val dim = Seq(
      (1L, ts(10), 100.0), (1L, ts(30), 200.0),
      (3L, ts(5), 300.0))
      .toDF("k", "snap_ts", "price")
    val joined = Streaming.asOfStatic(
      in.toDF().toDF("k", "e_ts", "tag"), "e_ts", dim, Seq("k"), "snap_ts")
    val q = joined.select("k", "tag", "price")
      .writeStream.format("memory").queryName("asf").outputMode("append").start()
    in.addData(
      (1L, ts(5), "before-first"), // → null
      (1L, ts(10), "equal-instant"), // → 100 (snapshot at own time)
      (1L, ts(29), "mid"), // → 100
      (1L, ts(31), "after-second"), // → 200
      (2L, ts(50), "no-key"), // → null
      (3L, ts(60), "open-end")) // → 300 (last interval unbounded)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asf").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got == Set(
      (1L, "before-first", null), (1L, "equal-instant", 100.0),
      (1L, "mid", 100.0), (1L, "after-second", 200.0),
      (2L, "no-key", null), (3L, "open-end", 300.0)))
  }

  test("asOfStatic caches the interval frame: dim evaluated once across batches") {
    implicit val sql = spark.sqlContext
    // an accumulator-tagged dim: every EXECUTION of the dim subtree adds
    // one per partition, so a per-micro-batch rebuild shows up as growth
    def tagged(acc: org.apache.spark.util.LongAccumulator) =
      Seq((1L, ts(10), 100.0), (1L, ts(30), 200.0))
        .toDS()
        .mapPartitions { it => acc.add(1); it }
        .toDF("k", "snap_ts", "price")
    val accCached = spark.sparkContext.longAccumulator("dim_evals_cached")
    val in = MemoryStream[(Long, Timestamp, String)]
    val joined = Streaming.asOfStatic(
      in.toDF().toDF("k", "e_ts", "tag"), "e_ts",
      tagged(accCached), Seq("k"), "snap_ts")
    val q = joined.select("k", "tag", "price")
      .writeStream.format("memory").queryName("asfc").outputMode("append").start()
    in.addData((1L, ts(15), "b1"))
    q.processAllAvailable()
    val afterFirst = accCached.value
    in.addData((1L, ts(35), "b2"))
    q.processAllAvailable()
    in.addData((1L, ts(40), "b3"))
    q.processAllAvailable()
    q.stop()
    assert(afterFirst > 0) // the dim really ran through the tagged stage
    assert(accCached.value == afterFirst,
      s"dim re-evaluated across batches: ${accCached.value} vs $afterFirst")
    val got = spark.table("asfc").collect()
      .map(r => (r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(("b1", 100.0), ("b2", 200.0), ("b3", 200.0)))
    // cacheDim = false is the pre-cache behavior: re-executed per batch
    val accPlain = spark.sparkContext.longAccumulator("dim_evals_plain")
    val in2 = MemoryStream[(Long, Timestamp, String)]
    val q2 = Streaming.asOfStatic(
        in2.toDF().toDF("k", "e_ts", "tag"), "e_ts",
        tagged(accPlain), Seq("k"), "snap_ts", cacheDim = false)
      .select("k", "tag", "price")
      .writeStream.format("memory").queryName("asfp").outputMode("append").start()
    in2.addData((1L, ts(15), "b1"))
    q2.processAllAvailable()
    val plainFirst = accPlain.value
    in2.addData((1L, ts(35), "b2"))
    q2.processAllAvailable()
    q2.stop()
    assert(accPlain.value > plainFirst,
      "uncached dim should re-execute on the second micro-batch")
  }

  test("file-source stream: readStream over the events fixture parquet") {
    // the real readStream → transform → writeStream path (not MemoryStream):
    // ts normalized to µs by the schema-adaptive helper, whatever the
    // fixture's current on-disk flavor
    val dir = "/root/testdata/sf0.001"
    // file streams watch a DIRECTORY; stage the fixture file into one
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
      .withColumn("ts",
        timestamp_micros(graft.queries.Tables.tsUs(schema, "ts")))
    val q = Streaming.windowedCounts(stream, "ts", "event_type",
        windowLen = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("fs").outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    val batchTotals = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val streamTotals = spark.table("fs")
      .groupBy("event_type").sum("n_events").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamTotals == batchTotals) // stream saw every event exactly once
  }

  test("sessionize closes sessions on gap and on stream end (timeout)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.sessionize(in.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // user 1: two events 10min apart (one session), then a 50-min gap
    // opens session 2; user 2: a single event
    in.addData(
      Event(1L, ts(0), "view", 1.0), Event(1L, ts(10), "view", 2.0),
      Event(2L, ts(0), "view", 8.0))
    q.processAllAvailable()
    in.addData(Event(1L, ts(60), "view", 4.0))
    q.processAllAvailable()
    // advance the watermark far past every open session's gap so the
    // event-time timeout fires and the open sessions close
    in.addData(Event(99L, ts(600), "view", 0.0))
    q.processAllAvailable()
    in.addData(Event(99L, ts(1300), "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess").as[Session].collect()
      .map(s => (s.user_id, s.session_id) -> ((s.n_events, s.total_value))).toMap
    assert(sessions((1L, 1L)) == ((2L, 3.0)))
    assert(sessions((1L, 2L)) == ((1L, 4.0)))
    assert(sessions((2L, 1L)) == ((1L, 8.0)))
  }

  test("funnel binds greedily, emits exactly once, tombstones the user") {
    implicit val sql = spark.sqlContext
    def us(minute: Int): Long = ts(minute).getTime * 1000L
    val in = MemoryStream[Event]
    val q = Streaming.funnel(in.toDS(), Seq("a", "b", "c"),
      maxSpanUs = 20L * 60 * 1000000, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("fun").outputMode("append").start()
    // u1 completes a→b→c inside the 20-min span; u2's c PRECEDES its b
    // (greedy: stalls after b); u3's c lands outside the span
    in.addData(
      Event(1L, ts(0), "a", 0), Event(1L, ts(5), "b", 0), Event(1L, ts(10), "c", 0),
      Event(2L, ts(0), "a", 0), Event(2L, ts(2), "c", 0), Event(2L, ts(5), "b", 0),
      Event(3L, ts(0), "a", 0), Event(3L, ts(5), "b", 0), Event(3L, ts(30), "c", 0))
    q.processAllAvailable()
    // two watermark advances: the first batch moves the watermark past
    // every t1+span, the second's trigger fires the timeouts
    in.addData(Event(98L, ts(600), "view", 0))
    q.processAllAvailable()
    in.addData(Event(97L, ts(700), "view", 0))
    q.processAllAvailable()
    // tombstone check: a LATER step-1 event for an emitted user must not
    // restart the funnel (batch t1 = global min — one row per user)
    in.addData(Event(1L, ts(800), "a", 0))
    q.processAllAvailable()
    in.addData(Event(96L, ts(1500), "view", 0))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("fun").count() == 3) // exactly once — no re-entry row
    val rows = spark.table("fun").as[FunnelResult].collect()
      .map(r => r.user_id -> r.step_us).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L) == Seq(us(0), us(5), us(10)))
    assert(rows(2L) == Seq(us(0), us(5))) // c@2 before b — never bound
    assert(rows(3L) == Seq(us(0), us(5))) // c@30 outside span
  }

  test("funnel binds out-of-order arrivals inside the watermark like batch") {
    implicit val sql = spark.sqlContext
    def us(minute: Int): Long = ts(minute).getTime * 1000L
    val in = MemoryStream[Event]
    val q = Streaming.funnel(in.toDS(), Seq("a", "b", "c"),
      maxSpanUs = 20L * 60 * 1000000, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("fun_ooo").outputMode("append").start()
    // c@10 arrives BEFORE b@5 across batches: eager per-batch binding
    // would discard c (step b not bound yet) and stall at a→b; buffering
    // until the watermark passes must bind the batch answer a→b→c
    in.addData(Event(5L, ts(0), "a", 0), Event(5L, ts(10), "c", 0))
    q.processAllAvailable()
    in.addData(Event(5L, ts(5), "b", 0)) // late but within the watermark
    q.processAllAvailable()
    in.addData(Event(99L, ts(600), "view", 0))
    q.processAllAvailable()
    in.addData(Event(98L, ts(700), "view", 0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("fun_ooo").as[FunnelResult].collect()
      .map(r => r.user_id -> r.step_us).toMap
    assert(rows == Map(5L -> Seq(us(0), us(5), us(10))))
  }

  test("sessionizeTws (transformWithState) matches sessionize on RocksDB") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2.conf.set("spark.sql.shuffle.partitions", "2")
    implicit val sql = s2.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val in = MemoryStream[Event]
    val q = Streaming.sessionizeTws(in.toDS(), gapMinutes = 30)
      .toDF().writeStream.format("memory").queryName("tws_sess")
      .outputMode("append").start()
    // user 1: two sessions (gap > 30m between minute 10 and 70);
    // user 2: one session extended across micro-batches
    in.addData(
      Event(1L, ts(0), "view", 1.0), Event(1L, ts(10), "view", 2.0),
      Event(2L, ts(5), "click", 4.0))
    q.processAllAvailable()
    in.addData(
      Event(1L, ts(70), "view", 8.0), Event(2L, ts(20), "view", 16.0))
    q.processAllAvailable()
    // watermark-advancing tail closes every session (sentinel far ahead;
    // the second tail event closes the first tail user's session too)
    in.addData(Event(99L, ts(600), "view", 0.0))
    q.processAllAvailable()
    in.addData(Event(98L, ts(700), "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = s2.table("tws_sess")
      .selectExpr("user_id", "session_id", "n_events", "total_value")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows == Set(
      (1L, 1L, 2L, 3.0), (1L, 2L, 1L, 8.0), (2L, 1L, 2L, 20.0),
      (99L, 1L, 1L, 0.0)))
  }

  test("sessionizeTws emits mid-batch session breaks inline") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2.conf.set("spark.sql.shuffle.partitions", "2")
    implicit val sql = s2.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val in = MemoryStream[Event]
    val q = Streaming.sessionizeTws(in.toDS(), gapMinutes = 30)
      .toDF().writeStream.format("memory").queryName("tws_mid")
      .outputMode("append").start()
    // one batch, two sessions for user 5: the first closes INLINE (no
    // timer involved), before any watermark movement
    in.addData(
      Event(5L, ts(0), "view", 1.0), Event(5L, ts(90), "view", 2.0))
    q.processAllAvailable()
    val early = s2.table("tws_mid").count()
    q.stop()
    assert(early == 1L) // first session emitted in the same batch
  }

  test("drained entry timestamps stay inside the fixture's µs range") {
    // the invariant that catches a silent timestamp-scale error (the
    // round-9 fixture flip put streamed timestamps 1000× off) even
    // without a DuckDB oracle: every drained event-time the entries
    // surface must fall inside the fixture's own [min, max] epoch-µs
    // span (sentinel rows are filtered by the entries themselves)
    import org.apache.spark.sql.functions.{col, max, min}
    val dir = "/root/testdata/sf0.001"
    val bounds = graft.queries.Tables.eventsUs(spark, dir)
      .agg(min(col("ts_us")), max(col("ts_us"))).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    assert(lo > 1000000000L * 1000000L, "fixture ts should be past 2001 in µs")
    val entries = graft.queries.StreamingEntries.all
    val checks = Seq( // entry -> its surfaced µs columns
      "q38_streaming_sessions" -> Seq("start_us", "end_us"),
      "q63_streaming_asof" -> Seq("ts_us"),
      "q89_streaming_cdc_apply" -> Seq("ts_us"))
    for ((name, cols) <- checks; c <- cols) {
      val df = entries(name)(spark, dir)
      val mm = df.agg(min(col(c)), max(col(c))).head()
      assert(mm.getLong(0) >= lo && mm.getLong(1) <= hi,
        s"$name.$c [${mm.getLong(0)}, ${mm.getLong(1)}] outside fixture [$lo, $hi]")
    }
  }

  test("domainCapGateTws (transformWithState) matches the fMGWS counter") {
    implicit val sql = spark.sqlContext
    import graft.streaming.{DocArrival, GateVerdict}
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[DocArrival]
      val q = Streaming.domainCapGateTws(in.toDS(), maxPerDomain = 2)
        .writeStream.format("memory").queryName("gate_tws")
        .outputMode("append").start()
      in.addData(DocArrival(4L, "a"), DocArrival(2L, "a"))
      q.processAllAvailable()
      in.addData(DocArrival(9L, "a"))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("gate_tws").as[GateVerdict].collect()
        .map(v => v.doc_id -> (v.domain_rank, v.is_kept)).toMap
      assert(out == Map(2L -> (1L, 1), 4L -> (2L, 1), 9L -> (3L, 0)),
        s"got $out")
    } finally prev match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("domainCapGate counts persist across micro-batches") {
    implicit val sql = spark.sqlContext
    import graft.streaming.{DocArrival, GateVerdict}
    val in = MemoryStream[DocArrival]
    val q = Streaming.domainCapGate(in.toDS(), maxPerDomain = 3)
      .writeStream.format("memory").queryName("gate")
      .outputMode("append").start()
    in.addData(DocArrival(2L, "a"), DocArrival(1L, "a"), DocArrival(5L, "b"))
    q.processAllAvailable()
    in.addData(DocArrival(9L, "a"), DocArrival(8L, "a"), DocArrival(7L, "b"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("gate").as[GateVerdict].collect()
      .map(v => v.doc_id -> (v.domain_rank, v.is_kept)).toMap
    // batch 1 folds each group in id order; batch 2 CONTINUES the count
    assert(out(1L) == (1L, 1) && out(2L) == (2L, 1))
    assert(out(8L) == (3L, 1) && out(9L) == (4L, 0), s"state lost: $out")
    assert(out(5L) == (1L, 1) && out(7L) == (2L, 1))
  }

  test("ewmaMonitor: arrival order (even sentinel-first) cannot change " +
      "the chart, and it equals the batch operator") {
    implicit val sql = spark.sqlContext
    def day(i: Int) = f"2024-01-${i}%02d"
    val data = (1 to 10).map(i =>
      DayCount("k", day(i), if (i == 10) 100L else 10L))
    def drain(batches: Seq[Seq[DayCount]], name: String) = {
      val in = MemoryStream[DayCount]
      val q = Streaming.ewmaMonitor(in.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => r.getString(1) -> r.toSeq.drop(1)).toMap
    }
    val sentinel = DayCount("k", EwmaMonitor.Sentinel, 10L)
    // sentinel FIRST, then data shuffled across two batches
    val a = drain(Seq(Seq(sentinel), data.drop(5).reverse, data.take(5)),
      "ewma_a")
    // natural order, sentinel last
    val b = drain(Seq(data.take(7), data.drop(7) :+ sentinel), "ewma_b")
    assert(a == b)
    assert(a.size == 10)
    // equals the batch operator row-for-row
    val batch = graft.pipeline.Stats.ewmaControlChart(
        data.toDF("key", "day", "x"), "key", "day", "x")
      .collect().map(r => r.getString(1) -> r.toSeq.drop(1)).toMap
    assert(a == batch)
    // and the spike actually alarms
    assert(a(day(10)).last == 1)
  }

  test("cusumMonitor: any arrival order equals the batch cusum exactly") {
    implicit val sql = spark.sqlContext
    // 7 baseline periods at 100, then a sustained jump to 200
    val data = (0 until 12).map(i =>
      PeriodCount("k", i.toLong, if (i < 7) 100L else 200L))
    def drain(batches: Seq[Seq[PeriodCount]], name: String) = {
      val in = MemoryStream[PeriodCount]
      val q = Streaming.cusumMonitor(in.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => r.getLong(1) -> r.toSeq.drop(1)).toMap
    }
    val sentinel = PeriodCount("k", CusumMonitor.Sentinel, 12L)
    val a = drain(Seq(Seq(sentinel), data.drop(6).reverse, data.take(6)),
      "cusum_a")
    val b = drain(Seq(data.take(3), data.drop(3) :+ sentinel), "cusum_b")
    assert(a == b)
    assert(a.size == 12)
    // equals the batch operator row-for-row (key dropped both sides)
    val batch = graft.pipeline.Stats.cusum(
        data.toDF("key", "period", "x").drop("key")
          .withColumnRenamed("x", "v"), "period", "v")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(a == batch)
    // the jump alarms on the positive side and stays alarmed
    assert(a(7L)(4) == 1 && a(11L)(4) == 1)
    assert(a(6L)(4) == 0)
  }

  test("psiMonitor: any shard arrival order equals the batch psi " +
    "exactly; emission waits for the sentinel") {
    implicit val sql = spark.sqlContext
    // the q385 batch frame: ref = values 1..10 once each, cur shifted
    val raw = (1 to 10).flatMap(v => Seq(
      ("k", v.toLong * 2, v.toDouble, true),
      ("k", v.toLong * 2 + 1, v.toDouble + 3.0, false)))
      .toDF("k", "id", "v", "is_ref")
    val binned = graft.pipeline.Stats.psiBinCounts(
      raw, "k", "id", "v", "is_ref", bins = 10)
    val rows = binned.collect().flatMap(r => Seq(
      BinCount(r.getString(0), r.getLong(1), 1L, r.getLong(2)),
      BinCount(r.getString(0), r.getLong(1), 0L, r.getLong(3))))
    val sentinel = BinCount("k", PsiMonitor.Sentinel, 0L, rows.length.toLong)
    def drain(batches: Seq[Seq[BinCount]], name: String) = {
      val in = MemoryStream[BinCount]
      val q = Streaming.psiMonitor(in.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map(_.toSeq)
    }
    val a = drain(Seq(Seq(sentinel), rows.drop(7).reverse.toSeq,
      rows.take(7).toSeq), "psi_a")
    val b = drain(Seq(rows.take(3).toSeq, rows.drop(3).toSeq :+ sentinel),
      "psi_b")
    assert(a.toSeq == b.toSeq && a.length == 1)
    val batch = graft.pipeline.Stats.psi(
      raw, "k", "id", "v", "is_ref", bins = 10).collect().map(_.toSeq)
    assert(a.toSeq == batch.toSeq)
    // nothing emits before the sentinel
    val in2 = MemoryStream[BinCount]
    val q2 = Streaming.psiMonitor(in2.toDS())
      .writeStream.format("memory").queryName("psi_pre")
      .outputMode("append").start()
    in2.addData(rows.toSeq)
    q2.processAllAvailable()
    assert(spark.table("psi_pre").isEmpty)
    q2.stop()
  }

  test("cusumMonitor: an incomplete key fails loudly at its sentinel") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[PeriodCount]
    val q = Streaming.cusumMonitor(in.toDS(), baselinePeriods = 7)
      .writeStream.format("memory").queryName("cusum_short")
      .outputMode("append").start()
    in.addData(PeriodCount("k", 0L, 5L), PeriodCount("k", 1L, 5L),
      PeriodCount("k", CusumMonitor.Sentinel, 2L))
    val e = intercept[Exception] { q.processAllAvailable() }
    q.stop()
    def rootMsg(t: Throwable): String =
      if (t.getCause == null) String.valueOf(t.getMessage)
      else String.valueOf(t.getMessage) + rootMsg(t.getCause)
    assert(rootMsg(e).contains("baseline periods"))
  }

  test("hellingerMonitor: arrival order invariant; no emission " +
    "before the sentinel; identical slices score near 0") {
    implicit val sql = spark.sqlContext
    val raw = (1 to 10).flatMap(v => Seq(
      ("k", v.toLong * 2, v.toDouble, true),
      ("k", v.toLong * 2 + 1, v.toDouble, false)))
      .toDF("k", "id", "v", "is_ref")
    val binned = graft.pipeline.Stats.psiBinCounts(
      raw, "k", "id", "v", "is_ref", bins = 10)
    val rows = binned.collect().flatMap(r => Seq(
      BinCount(r.getString(0), r.getLong(1), 1L, r.getLong(2)),
      BinCount(r.getString(0), r.getLong(1), 0L, r.getLong(3))))
    val sentinel = BinCount("k", PsiMonitor.Sentinel, 0L,
      rows.length.toLong)
    def drain(batches: Seq[Seq[BinCount]], name: String) = {
      val in = MemoryStream[BinCount]
      val q = Streaming.hellingerMonitor(in.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map(_.toSeq)
    }
    val a = drain(Seq(Seq(sentinel), rows.reverse.toSeq), "hel_a")
    val b = drain(Seq(rows.take(5).toSeq, rows.drop(5).toSeq :+
      sentinel), "hel_b")
    assert(a.toSeq == b.toSeq && a.length == 1)
    // identical ref/cur slices: H ~ 0 (Laplace smoothing keeps it
    // tiny-positive at most)
    val h = a.head(3).asInstanceOf[Double]
    assert(h >= 0.0 && h < 0.01, s"hellinger $h")
    val in2 = MemoryStream[BinCount]
    val q2 = Streaming.hellingerMonitor(in2.toDS())
      .writeStream.format("memory").queryName("hel_pre")
      .outputMode("append").start()
    in2.addData(rows.toSeq)
    q2.processAllAvailable()
    assert(spark.table("hel_pre").isEmpty)
    q2.stop()
  }
}
