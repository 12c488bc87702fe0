package graft.ops

import graft.SparkSpec

class ChangelogSpec extends SparkSpec {

  import spark.implicits._

  test("latestByKey keeps the argmax row per key with deterministic ties") {
    val changes = Seq(
      // key (1,"a"): latest ts wins
      (1L, "a", 10L, 100L, "v1"), (1L, "a", 20L, 101L, "v2"),
      // key (1,"b"): equal ts → higher change id wins
      (1L, "b", 30L, 200L, "x1"), (1L, "b", 30L, 201L, "x2"),
      // key (2,"a"): single row survives untouched
      (2L, "a", 5L, 300L, "y1"))
      .toDF("k1", "k2", "ts", "change_id", "payload")
    val out = Changelog.latestByKey(
      changes, Seq("k1", "k2"), "ts", tieCols = Seq("change_id"))
    assert(out.columns.toSeq == changes.columns.toSeq) // schema unchanged
    assert(rows(out) == Set(
      Seq(1L, "a", 20L, 101L, "v2"),
      Seq(1L, "b", 30L, 201L, "x2"),
      Seq(2L, "a", 5L, 300L, "y1")))
  }

  test("latestByKey requires a key") {
    intercept[IllegalArgumentException] {
      Changelog.latestByKey(Seq((1, 2)).toDF("a", "b"), Nil, "b")
    }
  }
}
