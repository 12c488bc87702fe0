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

  test("bleuN: identical candidate and reference scores exactly 1") {
    val out = Retrieval.bleuN(
      Seq((1L, "a b c d e", "a b c d e")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 4).collect().head
    assert(out.getAs[Long]("cand_len") == 5L)
    assert(out.getAs[Long]("ref_len") == 5L)
    for (n <- 1 to 4) assert(out.getAs[Double](s"p_$n") == 1.0)
    assert(out.getAs[Double]("bp") == 1.0)
    assert(out.getAs[Double]("bleu") == 1.0)
  }

  test("bleuN hand computation with a brevity penalty") {
    // cand "a b c" vs ref "a b c d": p1 = 3/3, p2 = 2/2, p3 = 1/1,
    // p4 = 0/0 → cand has NO 4-gram → unsmoothed BLEU = 0
    val zero = Retrieval.bleuN(
      Seq((1L, "a b c", "a b c d")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 4).collect().head
    assert(zero.getAs[Double]("bleu") == 0.0)
    // at maxN = 2: BLEU = BP · exp((ln 1 + ln 1)/2) = BP =
    // exp(1 − 4/3) = 0.716531
    val out = Retrieval.bleuN(
      Seq((1L, "a b c", "a b c d")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 2).collect().head
    assert(out.getAs[Double]("p_1") == 1.0)
    assert(out.getAs[Double]("p_2") == 1.0)
    assert(math.abs(out.getAs[Double]("bp") - 0.716531) < 1e-6)
    assert(math.abs(out.getAs[Double]("bleu") - 0.716531) < 1e-6)
  }

  test("chrF: identical pair scores 1; whitespace is stripped first") {
    val out = Retrieval.chrF(
      Seq((1L, "ab cd", "abcd")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 2).collect().head
    // after stripping, both sides are "abcd": 4 chars, 3 bigrams
    assert(out.getAs[Long]("n_chars_cand") == 4L)
    assert(out.getAs[Long]("n_chars_ref") == 4L)
    assert(out.getAs[Double]("f_1") == 1.0)
    assert(out.getAs[Double]("f_2") == 1.0)
    assert(out.getAs[Double]("chrf") == 1.0)
  }

  test("chrF hand computation with beta = 2") {
    // cand "abc" vs ref "abd": unigram clipped match 2 (a, b),
    // p1 = 2/3, r1 = 2/3 → F1 = 2/3; bigram match 1 ("ab"),
    // p2 = r2 = 1/2 → F2 = 1/2; chrF = (2/3 + 1/2)/2 = 0.583333
    val out = Retrieval.chrF(
      Seq((1L, "abc", "abd")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 2).collect().head
    assert(math.abs(out.getAs[Double]("f_1") - 2.0 / 3) < 1e-6)
    assert(out.getAs[Double]("f_2") == 0.5)
    assert(math.abs(out.getAs[Double]("chrf") - 0.583333) < 2e-6)
  }

  test("chrF: disjoint sides and short sides score explicit zeros") {
    val out = Retrieval.chrF(
      Seq((1L, "xx", "yy"), (2L, "a", "ab")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("chrf") == 0.0)
    // pair 2: unigram F > 0, but no cand bigram/trigram → f_2 = f_3 = 0
    assert(out(2L).getAs[Double]("f_2") == 0.0)
    assert(out(2L).getAs[Double]("f_3") == 0.0)
    assert(out(2L).getAs[Double]("f_1") > 0.0)
  }

  test("bleuN clips repeated candidate grams against the reference") {
    // cand "the the the" vs ref "the cat": clipped unigram match = 1
    // (ref has one 'the'), p1 = 1/3; no bigram overlap → BLEU(2) = 0
    val out = Retrieval.bleuN(
      Seq((1L, "the the the", "the cat")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 2).collect().head
    assert(math.abs(out.getAs[Double]("p_1") - 1.0 / 3) < 1e-6)
    assert(out.getAs[Double]("p_2") == 0.0)
    assert(out.getAs[Double]("bleu") == 0.0)
  }
}
