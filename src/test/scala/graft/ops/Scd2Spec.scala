package graft.ops

import graft.SparkSpec

class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private def changes(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "ts", "chg_id", "status")

  test("build collapses consecutive identical attrs into intervals") {
    val df = changes(
      (1L, 10L, 1L, "new"), (1L, 20L, 2L, "new"), // run 1: new [10, 30)
      (1L, 30L, 3L, "active"),                    // run 2: active [30, 50)
      (1L, 50L, 4L, "new"),                       // run 3: reversion reopens
      (2L, 5L, 5L, "active"))                     // single-run key
    val out = Scd2.build(df, Seq("user_id"), "ts", Seq("status"), Seq("chg_id"))
    assert(out.columns.toSeq ==
      Seq("user_id", "status", "valid_from", "valid_to", "is_current"))
    assert(rows(out) == Set(
      Seq(1L, "new", 10L, 30L, false),
      Seq(1L, "active", 30L, 50L, false),
      Seq(1L, "new", 50L, null, true),
      Seq(2L, "active", 5L, null, true)))
  }

  test("build: ties break on tieCols; NULL attrs compare null-safely") {
    val df = Seq(
      (1L, 10L, 1L, Option("a")),
      (1L, 10L, 2L, Option.empty[String]), // same instant: chg_id orders it second
      (1L, 20L, 3L, Option.empty[String]), // NULL == NULL → same run
      (1L, 30L, 4L, Option("a")))
      .toDF("user_id", "ts", "chg_id", "status")
    val out = Scd2.build(df, Seq("user_id"), "ts", Seq("status"), Seq("chg_id"))
    assert(rows(out) == Set(
      Seq(1L, "a", 10L, 10L, false),
      Seq(1L, null, 10L, 30L, false),
      Seq(1L, "a", 30L, null, true)))
  }

  test("build rejects missing keys/attrs and reserved columns") {
    val df = changes((1L, 1L, 1L, "x"))
    intercept[IllegalArgumentException] {
      Scd2.build(df, Nil, "ts", Seq("status"))
    }
    intercept[IllegalArgumentException] {
      Scd2.build(df, Seq("user_id"), "ts", Nil)
    }
    intercept[IllegalArgumentException] {
      Scd2.build(df.withColumn("_g_chg", org.apache.spark.sql.functions.lit(1)),
        Seq("user_id"), "ts", Seq("status"))
    }
  }

  test("merge(build(prefix), suffix) == build(all) on a time-split history") {
    // Deterministic pseudo-random history: 6 keys, 40 changes, statuses
    // cycle so runs of varying length (incl. reversions) appear.
    val all = (1 to 40).map { i =>
      val key = (i * 7 % 6).toLong
      val status = Seq("new", "active", "active", "churned")((i * 5 + key.toInt) % 4)
      (key, i.toLong * 10, i.toLong, status)
    }
    val (prefix, suffix) = all.partition(_._2 <= 250)
    val dim = Scd2.build(
      changes(prefix: _*), Seq("user_id"), "ts", Seq("status"), Seq("chg_id"))
    val merged = Scd2.merge(
      dim, changes(suffix: _*), Seq("user_id"), "ts", Seq("status"), Seq("chg_id"))
    val full = Scd2.build(
      changes(all: _*), Seq("user_id"), "ts", Seq("status"), Seq("chg_id"))
    assert(rows(merged) == rows(full))
  }

  test("SCD2 + as-of join reconstructs any point-in-time snapshot") {
    // the composition the operator exists for: asOf(probe@T, dim on
    // valid_from) must return each key's state at T — identical to
    // compacting the changelog truncated at T
    val hist = (1 to 30).map { i =>
      val key = (i % 3).toLong
      ((key, i.toLong * 10, i.toLong, Seq("a", "b", "c")((i * 7 + key.toInt) % 3)))
    }
    val changes = hist.toDF("user_id", "ts", "chg_id", "status")
    val dim = Scd2.build(changes, Seq("user_id"), "ts", Seq("status"), Seq("chg_id"))
    for (t <- Seq(45L, 150L, 300L)) {
      val probe = Seq(0L, 1L, 2L).toDF("user_id").withColumn("ts",
        org.apache.spark.sql.functions.lit(t))
      val viaAsof = Joins.asOf(
        probe, dim.select($"user_id", $"status", $"valid_from"),
        keys = Seq("user_id"), probeTs = "ts", buildTs = "valid_from")
        .select($"user_id", $"status")
      val truth = graft.ops.Changelog.latestByKey(
        changes.filter($"ts" <= t), Seq("user_id"), "ts", Seq("chg_id"))
        .select($"user_id", $"status")
      assert(rows(viaAsof) == rows(truth), s"snapshot at t=$t")
    }
  }

  test("merge leaves untouched keys byte-identical") {
    val dim = Scd2.build(
      changes((1L, 10L, 1L, "a"), (2L, 10L, 2L, "b")),
      Seq("user_id"), "ts", Seq("status"), Seq("chg_id"))
    val merged = Scd2.merge(
      dim, changes((2L, 20L, 3L, "c")),
      Seq("user_id"), "ts", Seq("status"), Seq("chg_id"))
    assert(rows(merged) == Set(
      Seq(1L, "a", 10L, null, true), // untouched
      Seq(2L, "b", 10L, 20L, false),
      Seq(2L, "c", 20L, null, true)))
  }
}
