package graft.pipeline

import graft.SparkSpec

/** TextRank (TextStats.textRank, q315) and RAKE
  * (TextStats.rakeKeywords, q316) keyword extraction.
  */
class KeywordSpec extends SparkSpec {
  import spark.implicits._

  private val stop = Seq("the", "a")

  test("textRank: a hub token outranks its spokes") {
    val df = Seq((1L, "alpha beta alpha gamma alpha delta alpha beta"))
      .toDF("doc_id", "text")
    val out = TextStats.textRank(df, "doc_id", "text", stop)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rank")).toMap
    assert(out("alpha") > out("beta"))
    assert(out("alpha") > out("gamma") && out("alpha") > out("delta"))
  }

  test("textRank: stopwords are removed BEFORE windowing (bridge)") {
    // "x the y": after filtering, x and y are adjacent — the graph has
    // the (x, y) edge even though they never touch in the raw text
    val df = Seq((1L, "x the y the x the y")).toDF("doc_id", "text")
    val out = TextStats.textRank(df, "doc_id", "text", stop).collect()
    assert(out.map(_.getString(0)).toSet == Set("x", "y"))
    // symmetric 2-node graph: equal ranks
    assert(out.map(_.getAs[Double]("rank")).toSet.size == 1)
  }

  test("textRank counts occurrences of surviving tokens") {
    val df = Seq((1L, "m n m n m p")).toDF("doc_id", "text")
    val out = TextStats.textRank(df, "doc_id", "text", stop)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_occurrences"))
      .toMap
    assert(out("m") == 3L && out("n") == 2L && out("p") == 1L)
  }

  test("textRank is partitioning-invariant") {
    val docs = (1L to 40L)
      .map(i => (i, s"tok${i % 5} tok${(i + 1) % 5} the tok${(i + 2) % 7}"))
      .toDF("doc_id", "text")
    val a = TextStats.textRank(docs.coalesce(1), "doc_id", "text", stop)
      .collect().map(_.toSeq)
    val b = TextStats.textRank(docs.repartition(9), "doc_id", "text", stop)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("rakeKeywords matches the hand-scored two-phrase case") {
    // phrases: "deep learning", "deep model"; all word scores deg/freq
    // = 2.0, both phrases score 4.0; tie broken by phrase asc
    val df = Seq((1L, "deep learning the deep model")).toDF("doc_id", "text")
    val out = TextStats.rakeKeywords(df, "doc_id", "text", stop).collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("deep learning", "deep model"))
    assert(out.forall(_.getAs[Double]("score") == 4.0))
  }

  test("rakeKeywords: repeated phrases count occurrences, score once") {
    val df = Seq((1L, "big data the big data the x")).toDF("doc_id", "text")
    val out = TextStats.rakeKeywords(df, "doc_id", "text", stop)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_occurrences"), r.getAs[Double]("score"))).toMap
    // big: deg 4 freq 2 -> 2.0; data: same -> phrase score 4.0 (NOT
    // 8.0: instances must not inflate the sum)
    assert(out("big data") == (2L, 4.0))
    assert(out("x") == (1L, 1.0))
  }

  test("rakeKeywords drops runs longer than maxPhraseLen") {
    val df = Seq((1L, "one two three four five the u v"))
      .toDF("doc_id", "text")
    val out = TextStats.rakeKeywords(df, "doc_id", "text", stop,
      maxPhraseLen = 4).collect()
    assert(out.map(_.getString(0)).toSet == Set("u v"))
  }

  // -------------------------------------------- infoGainTokens (q333)

  test("infoGainTokens ranks a perfectly predictive token first") {
    // 'marker' appears in exactly the positive docs; 'noise' in all
    val docs = (1L to 20L).map { i =>
      val pos = i <= 10
      (i, if (pos) "marker noise filler" else "noise filler other",
        if (pos) 1 else 0)
    }.toDF("doc_id", "text", "y")
    val out = TextStats.infoGainTokens(docs, "doc_id", "text", "y",
      topK = 5, minDocs = 2).collect()
    assert(out.head.getString(0) == "marker")
    // perfectly predictive presence carries the full label entropy:
    // cells a=d=10 contribute 0.5*ln2 each (d6 per term)
    def d6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val half = d6(0.5 * math.log(2.0))
    assert(out.head.getAs[Double]("mutual_info") == d6(half + half))
    // an everywhere-token carries ~zero information
    val noise = out.find(_.getString(0) == "noise")
    assert(noise.forall(_.getAs[Double]("mutual_info") < 0.01))
  }

  test("infoGainTokens: presence is per-document, not per-occurrence") {
    // token repeated many times in one doc must count once
    val docs = Seq((1L, "x x x x x", 1), (2L, "y", 0), (3L, "x y", 1),
      (4L, "y y", 0), (5L, "x", 1), (6L, "y x", 0)).toDF("doc_id", "text", "y")
    val out = TextStats.infoGainTokens(docs, "doc_id", "text", "y",
      topK = 5, minDocs = 1).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_pos_docs")).toMap
    assert(out("x") == 3L)
  }

  test("infoGainTokens respects minDocs") {
    val docs = Seq((1L, "rare a b", 1), (2L, "a b", 0), (3L, "a b", 1))
      .toDF("doc_id", "text", "y")
    val out = TextStats.infoGainTokens(docs, "doc_id", "text", "y",
      topK = 10, minDocs = 2).collect().map(_.getString(0)).toSet
    assert(!out.contains("rare"))
  }

  // --------------------------------------------- goodTuring (q327)

  test("goodTuring matches the hand-computed spectrum") {
    // "a a a b b c": N1=N2=N3=1, N=6
    val df = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = TextStats.goodTuring(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 11) // r = 0..10
    def d6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // unseen mass = N1/N = 1/6
    assert(out(0L).getAs[Double]("p_gt") == d6(1.0 / 6.0))
    // r=1: r* = 2*N2/N1 = 2, p = 2/6
    assert(out(1L).getAs[Double]("r_star") == 2.0)
    assert(out(1L).getAs[Double]("p_gt") == d6(2.0 / 6.0))
    // r=2: r* = 3*N3/N2 = 3
    assert(out(2L).getAs[Double]("r_star") == 3.0)
    // r=3: N4 = 0 -> undefined, NULL
    assert(out(3L).isNullAt(out(3L).fieldIndex("r_star")))
    assert(out(3L).getAs[Long]("n_r") == 1L)
  }

  test("goodTuring discounts singletons on a Zipfy corpus") {
    // many singletons: r*(1) < 1 (mass moved to unseen)
    val text = ((1 to 50).map(i => s"hapax$i") ++
      (1 to 10).flatMap(i => Seq(s"dis$i", s"dis$i"))).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = TextStats.goodTuring(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // r* (1) = 2*N2/N1 = 2*10/50 = 0.4 < 1: the GT discount
    assert(out(1L).getAs[Double]("r_star") == 0.4)
    assert(out(0L).getAs[Double]("p_gt") > 0.0)
  }

  test("rakeKeywords favors words living in longer phrases") {
    // "q" appears alone (deg 1 = freq 1 -> 1.0) while "r s t" words all
    // score 3.0 -> the 3-word phrase scores 9.0
    val df = Seq((1L, "q the r s t")).toDF("doc_id", "text")
    val out = TextStats.rakeKeywords(df, "doc_id", "text", stop)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("score")).toMap
    assert(out("r s t") == 9.0 && out("q") == 1.0)
  }
}
