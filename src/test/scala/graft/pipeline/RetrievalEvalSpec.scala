package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batched BM25 (Retrieval.bm25MultiTopK) and ranking-quality metrics
  * (Retrieval.rankingMetrics) — the retrieval-eval pair behind q247.
  */
class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "x y a"), (2L, "x x y z b"), (3L, "y z w c"),
    (4L, "w w x a b"), (5L, "z z z y x")).toDF("doc_id", "text")

  test("bm25MultiTopK agrees with the single-query form per query") {
    val multi = Retrieval.bm25MultiTopK(corpus, "doc_id", "text",
      Seq(10L -> Seq("x"), 20L -> Seq("z", "w")), topK = 10)
      .select("query_id", "doc_id", "bm25_score")
      .as[(Long, Long, Double)].collect()
    for ((qid, terms) <- Seq(10L -> Seq("x"), 20L -> Seq("z", "w"))) {
      val single = Retrieval.bm25TopK(corpus, "doc_id", "text", terms,
          topK = 10)
        .as[(Long, Double)].collect().toMap
      val got = multi.filter(_._1 == qid).map(t => t._2 -> t._3).toMap
      assert(got.keySet == single.keySet, s"query $qid doc set")
      got.foreach { case (d, s) =>
        assert(math.abs(s - single(d)) < 1e-6, s"query $qid doc $d")
      }
    }
  }

  test("bm25MultiTopK ranks are 1..k in (score DESC, id ASC) order") {
    val out = Retrieval.bm25MultiTopK(corpus, "doc_id", "text",
      Seq(1L -> Seq("x", "y")), topK = 3)
      .orderBy("rank")
      .select("doc_id", "bm25_score", "rank")
      .as[(Long, Double, Long)].collect()
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 3L))
    val resorted = out.sortBy(r => (-r._2, r._1)).map(_._1).toSeq
    assert(out.map(_._1).toSeq == resorted)
  }

  test("rankingMetrics matches the hand computation") {
    val run = Seq(
      (1L, 101L, 1L), (1L, 102L, 2L), (1L, 103L, 3L),
      (2L, 101L, 1L), (2L, 102L, 2L)).toDF("query_id", "doc_id", "rank")
    // query 1: grade-3 doc retrieved at rank 2, grade-1 at rank 1,
    // a grade-2 doc (109) never retrieved; query 2: nothing judged
    val qrels = Seq(
      (1L, 102L, 3L), (1L, 109L, 2L), (1L, 101L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val out = Retrieval.rankingMetrics(run, qrels, "query_id", "doc_id",
        "rel", k = 3, relThreshold = 2)
      .collect().map(r => r.getLong(0) -> r).toMap

    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val q1 = out(1L)
    assert(q1.getAs[Long]("n_rel") == 2L)
    assert(q1.getAs[Long]("hits_at_k") == 1L)
    assert(math.abs(q1.getAs[Double]("recall_at_k") - 0.5) < 1e-6)
    assert(math.abs(q1.getAs[Double]("mrr_at_k") - 0.5) < 1e-6)
    val dcg = 1.0 / lg2(2.0) + 7.0 / lg2(3.0) // rank1 gain 1, rank2 gain 7
    val idcg = 7.0 / lg2(2.0) + 3.0 / lg2(3.0) + 1.0 / lg2(4.0)
    assert(math.abs(q1.getAs[Double]("dcg_at_k") - dcg) < 1e-5)
    assert(math.abs(q1.getAs[Double]("idcg_at_k") - idcg) < 1e-5)
    assert(math.abs(q1.getAs[Double]("ndcg_at_k") - dcg / idcg) < 1e-5)

    val q2 = out(2L)
    assert(q2.getAs[Long]("n_rel") == 0L)
    assert(q2.getAs[Long]("hits_at_k") == 0L)
    assert(q2.getAs[Double]("recall_at_k") == 0.0)
    assert(q2.getAs[Double]("mrr_at_k") == 0.0)
    assert(q2.getAs[Double]("ndcg_at_k") == 0.0)
  }

  test("IDCG band arithmetic equals the brute-force sorted ideal") {
    // 60 judged docs across grades 1..3, k = 10: the ideal list is
    // longer than k on every grade boundary shape
    val grades = (1L to 60L).map(d => (1L, d, (d % 3) + 1)) // 20 per grade
    val qrels = grades.toDF("query_id", "doc_id", "rel")
    val run = Seq((1L, 1L, 1L)).toDF("query_id", "doc_id", "rank")
    val k = 10
    val got = Retrieval.rankingMetrics(run, qrels, "query_id", "doc_id",
        "rel", k = k, relThreshold = 2)
      .select("idcg_at_k").as[Double].head()
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val ideal = grades.map(_._3).sortBy(-_).take(k).zipWithIndex
      .map { case (g, i) => (math.pow(2.0, g.toDouble) - 1) / lg2(i + 2.0) }
      .sum
    assert(math.abs(got - ideal) < 1e-5)
  }

  test("a judged query the run never retrieved scores explicit zeros") {
    // query 7 has relevant judgments but BM25 matched nothing — it
    // must come back as an all-zero row (n_rel intact), not vanish
    // and bias a downstream macro-average upward
    val run = Seq((1L, 101L, 1L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 101L, 2L), (7L, 201L, 3L), (7L, 202L, 2L))
      .toDF("query_id", "doc_id", "rel")
    val out = Retrieval.rankingMetrics(run, qrels, "query_id", "doc_id",
        "rel", k = 5, relThreshold = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 7L))
    val q7 = out(7L)
    assert(q7.getAs[Long]("n_rel") == 2L)
    assert(q7.getAs[Long]("hits_at_k") == 0L)
    assert(q7.getAs[Double]("recall_at_k") == 0.0)
    assert(q7.getAs[Double]("mrr_at_k") == 0.0)
    assert(q7.getAs[Double]("dcg_at_k") == 0.0)
    assert(q7.getAs[Double]("idcg_at_k") > 0.0) // the ideal exists
    assert(q7.getAs[Double]("ndcg_at_k") == 0.0)
  }

  test("rankingMetrics with recall-threshold grade 1 counts all judged") {
    val run = Seq((1L, 101L, 1L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 101L, 1L), (1L, 102L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val out = Retrieval.rankingMetrics(run, qrels, "query_id", "doc_id",
      "rel", k = 5, relThreshold = 1).collect().head
    assert(out.getAs[Long]("n_rel") == 2L)
    assert(math.abs(out.getAs[Double]("recall_at_k") - 0.5) < 1e-6)
    assert(math.abs(out.getAs[Double]("mrr_at_k") - 1.0) < 1e-6)
  }

  // ------------------------------------------------ wordErrorRate (q323)

  test("wordErrorRate counts token substitutions/insertions/deletions") {
    val df = Seq(
      (1L, "the cat sat on the mat", "the cat sat on the mat"), // 0 edits
      (2L, "the cat sat on the mat", "the dog sat on mat"),     // 1 sub + 1 del
      (3L, "a b c", "a b c d e"),                               // 2 ins
      (4L, "a b c d", "x y z w")                                // 4 subs
    ).toDF("id", "ref", "hyp")
    val out = Retrieval.wordErrorRate(df, "id", "ref", "hyp")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("distance"), r.getAs[Double]("wer"))).toMap
    assert(out(1L) == (0L, 0.0))
    assert(out(2L)._1 == 2L)
    assert(out(3L) == (2L, BigDecimal(2.0 / 3.0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(out(4L) == (4L, 1.0))
  }

  test("wordErrorRate: token-level, NOT character-level") {
    // 'cat'->'cart' is ONE token substitution (char distance would be 1
    // too, but 'catalog' proves the point: still one token edit)
    val df = Seq((1L, "the cat sleeps", "the catalog sleeps"))
      .toDF("id", "ref", "hyp")
    val out = Retrieval.wordErrorRate(df, "id", "ref", "hyp")
      .collect().head
    assert(out.getAs[Long]("distance") == 1L)
  }

  test("wordErrorRate handles repeated whitespace and counts lengths") {
    val df = Seq((1L, "a  b   c", "a c")).toDF("id", "ref", "hyp")
    val out = Retrieval.wordErrorRate(df, "id", "ref", "hyp")
      .collect().head
    assert(out.getAs[Long]("n_ref") == 3L)
    assert(out.getAs[Long]("n_hyp") == 2L)
    assert(out.getAs[Long]("distance") == 1L)
  }

  test("wordErrorRate fails loudly on empty references and huge vocabs") {
    val empty = Seq((1L, "", "a b")).toDF("id", "ref", "hyp")
    assert(intercept[Exception] {
      Retrieval.wordErrorRate(empty, "id", "ref", "hyp").collect()
    }.getMessage.contains("empty reference"))
    val big = Seq((1L, (1 to 60).map("r" + _).mkString(" "),
      (1 to 60).map("h" + _).mkString(" "))).toDF("id", "ref", "hyp")
    assert(intercept[Exception] {
      Retrieval.wordErrorRate(big, "id", "ref", "hyp").collect()
    }.getMessage.contains("alphabet exhausted"))
  }

  test("rankBiasedOverlap: identical rankings score (1-p) times the " +
    "geometric prefix sum; disjoint heads score 0; bad knobs are " +
    "loud") {
    import org.apache.spark.sql.functions.col
    // identical: X_d = d, terms p^{d-1} -> 0.5*(1+.5+.25) = .875
    val same = (1 to 5).map(i => (i, i)).toDF("rank_a", "rank_b")
    val r = Retrieval.rankBiasedOverlap(same, "rank_a", "rank_b",
      p = 0.5, depth = 3).collect().head
    assert(r.getAs[Long]("overlap_at_depth") == 3L)
    assert(r.getAs[Double]("agreement_at_depth") == 1.0)
    assert(r.getAs[Double]("rbo") == 0.875)
    // reversed: the two heads are disjoint at depth 2
    val rev = (1 to 5).map(i => (i, 6 - i)).toDF("rank_a", "rank_b")
    val rr = Retrieval.rankBiasedOverlap(rev, "rank_a", "rank_b",
      p = 0.5, depth = 2).collect().head
    assert(rr.getAs[Double]("rbo") == 0.0)
    intercept[IllegalArgumentException] {
      Retrieval.rankBiasedOverlap(same, "rank_a", "rank_b", p = 1.0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.rankBiasedOverlap(same, "rank_a", "rank_b",
        depth = 0)
    }
  }

  test("rankDistance: hand footrule and Kendall distance; " +
    "non-permutation ranks and oversize lists are loud; a singleton " +
    "list answers zero with NULL normalized forms") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // ra [1,2,3] vs rb [3,1,2]: footrule 4 (norm 4/4 = 1),
    // Kendall distance 2 (norm 2/3)
    val df = Seq(("x", 1L, 3L), ("y", 2L, 1L), ("z", 3L, 2L))
      .toDF("item", "ra", "rb")
    val r = graft.pipeline.Retrieval.rankDistance(df, "item", "ra", "rb")
      .collect()(0)
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("footrule") == 4L)
    assert(r.getAs[Double]("footrule_norm") == 1.0)
    assert(r.getAs[Long]("kendall_distance") == 2L)
    assert(r.getAs[Double]("kendall_norm") == 0.666667)
    // identical orders read zero everywhere
    val same = graft.pipeline.Retrieval.rankDistance(
      Seq(("x", 1L, 1L), ("y", 2L, 2L)).toDF("item", "ra", "rb"),
      "item", "ra", "rb").collect()(0)
    assert(same.getAs[Long]("footrule") == 0L)
    assert(same.getAs[Double]("kendall_norm") == 0.0)
    val single = graft.pipeline.Retrieval.rankDistance(
      Seq(("x", 1L, 1L)).toDF("item", "ra", "rb"),
      "item", "ra", "rb").collect()(0)
    assert(single.getAs[Long]("kendall_distance") == 0L)
    assert(single.isNullAt(single.fieldIndex("kendall_norm")))
    val dup = intercept[Exception] {
      graft.pipeline.Retrieval.rankDistance(
        Seq(("x", 1L, 1L), ("y", 1L, 2L)).toDF("item", "ra", "rb"),
        "item", "ra", "rb").collect()
    }
    assert(dup.getMessage.contains("permutation"), dup.getMessage)
    val big = intercept[Exception] {
      graft.pipeline.Retrieval.rankDistance(
        (1L to 4L).map(i => (s"i$i", i, i)).toDF("item", "ra", "rb"),
        "item", "ra", "rb", maxItems = 3).collect()
    }
    assert(big.getMessage.contains("maxItems"), big.getMessage)
  }
}
