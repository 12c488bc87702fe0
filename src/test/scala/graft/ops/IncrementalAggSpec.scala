package graft.ops

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {

  import spark.implicits._

  private def events(rows: (String, Long, Double)*) =
    rows.toDF("k", "day", "v")

  test("finalize(partials) equals direct aggregation") {
    val df = events(
      ("a", 1L, 1.5), ("a", 1L, 2.5), ("a", 2L, -1.0),
      ("b", 1L, 10.0), ("b", 3L, 0.0))
    val out = IncrementalAgg.finalize(
      IncrementalAgg.partials(df, Seq("k"), "day", "v"), Seq("k"))
    assert(rows(out) == Set(
      Seq("a", 3L, 3.0, 1.0, -1.0, 2.5),
      Seq("b", 2L, 10.0, 5.0, 0.0, 10.0)))
  }

  test("merge law: partials(A ∪ B) == mergePartials(partials(A), partials(B))") {
    // pseudo-random split across keys AND buckets, including a bucket
    // present on both sides of the split
    val all = (1 to 60).map { i =>
      (s"k${i % 4}", (i % 5).toLong, (i * 13 % 7) - 3.0)
    }
    val (xs, ys) = all.partition(t => (t._2 + t._3).toInt % 2 == 0)
    val whole = IncrementalAgg.partials(events(all: _*), Seq("k"), "day", "v")
    val merged = IncrementalAgg.mergePartials(
      IncrementalAgg.partials(events(xs: _*), Seq("k"), "day", "v"),
      IncrementalAgg.partials(events(ys: _*), Seq("k"), "day", "v"),
      Seq("k"), "day")
    assert(rows(whole) == rows(merged))
    // and both finalize identically
    assert(rows(IncrementalAgg.finalize(whole, Seq("k"))) ==
      rows(IncrementalAgg.finalize(merged, Seq("k"))))
  }

  test("partials/finalize validate their inputs") {
    val df = events(("a", 1L, 1.0))
    intercept[IllegalArgumentException] {
      IncrementalAgg.partials(df, Nil, "day", "v")
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.finalize(df, Seq("k")) // not a partials() table
    }
  }
}
