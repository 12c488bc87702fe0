package graft.pipeline

import graft.SparkSpec

class RougeSpec extends SparkSpec {
  import spark.implicits._

  private def run(pairs: Seq[(Long, String, String)], n: Int) =
    Retrieval.rougeN(pairs.toDF("id", "cand", "ref"), "id", "cand", "ref", n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toList.sortBy(_._1)

  test("rougeN hand-computed unigram and bigram values") {
    val pairs = Seq((1L, "the cat sat", "the cat sat on the mat"))
    // ROUGE-1: match 3, P 3/3, R 3/6, F1 2/3
    assert(run(pairs, 1) ==
      List((1L, 3L, 3L, 6L, 1.0, 0.5, 0.666667)))
    // ROUGE-2: match 2 of cand-2/ref-5 grams, F1 = 0.8/1.4
    assert(run(pairs, 2) ==
      List((1L, 2L, 2L, 5L, 1.0, 0.4, 0.571429)))
  }

  test("rougeN clips repeated grams to the reference multiset") {
    // cand has four 'a', ref only two: clipped match = 2, not 4
    assert(run(Seq((1L, "a a a a", "a a")), 1) ==
      List((1L, 2L, 4L, 2L, 0.5, 1.0, 0.666667)))
  }

  test("rougeN zero-overlap and empty-gram rows score 0.0, never NaN") {
    val out = run(Seq(
      (1L, "x", "y"),          // disjoint unigrams
      (2L, "x", "y z")), 2)    // cand too short for any bigram
    assert(out == List(
      (1L, 0L, 0L, 0L, 0.0, 0.0, 0.0),
      (2L, 0L, 0L, 1L, 0.0, 0.0, 0.0)))
  }
}
