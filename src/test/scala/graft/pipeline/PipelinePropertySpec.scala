package graft.pipeline

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property tests over random micro-corpora (deterministic seeds, the
  * DagSpec pattern): algebraic invariants the example-based spec can't pin
  * down — bounds, conservation, content-determinism.
  */
class PipelinePropertySpec extends SparkSpec {

  import spark.implicits._

  private val word = Gen.oneOf("spark", "scan", "row", "agg", "key", "hash",
    "table", "join", "batch", "merge")
  private val doc = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))
  private val corpus = Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, doc))

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  private def df(docs: List[String]) =
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("property: exactDedup conserves rows; keep_id is a member id") {
    (1 to 8).foreach { s =>
      val docs = sample(corpus, s.toLong)
      val out = TextDedup.exactDedup(df(docs), "doc_id", "text").collect()
      assert(out.map(_.getAs[Long]("n_copies")).sum == docs.size, s"seed $s")
      assert(out.forall { r =>
        val k = r.getAs[Long]("keep_id"); k >= 0 && k < docs.size
      }, s"seed $s")
    }
  }

  test("property: jaccard in (0,1], ordered pairs, identical docs score 1") {
    (1 to 8).foreach { s =>
      val docs = sample(corpus, 100L + s)
      val withDup = docs :+ docs.head // force one identical pair
      val sh = TextDedup.shingles(df(withDup), "doc_id", "text", n = 2)
      val pairs = TextDedup.jaccardPairs(sh, "doc_id", threshold = 0.0).collect()
      pairs.foreach { r =>
        val j = r.getAs[Double]("jaccard")
        assert(j > 0.0 && j <= 1.0, s"seed $s: $j")
        assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"), s"seed $s")
      }
      if (withDup.head.split(" ").length >= 2) {
        val dup = pairs.find(r => r.getAs[Long]("doc_a") == 0L &&
          r.getAs[Long]("doc_b") == withDup.size - 1L)
        assert(dup.exists(_.getAs[Double]("jaccard") == 1.0), s"seed $s")
      }
    }
  }

  test("property: prefix-filtered jaccard is LOSSLESS vs the exact path") {
    // the PPJoin losslessness claim, pinned over random corpora and two
    // thresholds: identical pair sets AND identical jaccard values
    (1 to 8).foreach { s =>
      val docs = sample(corpus, 300L + s) :+ sample(corpus, 300L + s).head
      Seq(0.2, 0.5).foreach { t =>
        val sh = TextDedup.shingles(df(docs), "doc_id", "text", n = 2)
        def key(r: org.apache.spark.sql.Row) =
          (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
            r.getAs[Long]("n_common"), r.getAs[Double]("jaccard"))
        val exact = TextDedup
          .jaccardPairs(sh, "doc_id", t, maxShingleDocs = Int.MaxValue)
          .collect().map(key).toSet
        val prefix = TextDedup.jaccardPairsPrefix(sh, "doc_id", t)
          .collect().map(key).toSet
        assert(prefix == exact, s"seed $s threshold $t")
      }
    }
  }

  test("property: simhash depends only on content") {
    (1 to 8).foreach { s =>
      val docs = sample(corpus, 200L + s)
      val frame = df(docs ++ docs) // every doc twice under different ids
      val fp = TextDedup.simhash(frame, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      docs.indices.foreach { i =>
        assert(fp(i.toLong) == fp((i + docs.size).toLong), s"seed $s doc $i")
      }
    }
  }

  test("property: dupClusters equals union-find on random graphs") {
    // filter-free generator: a < b by construction (Gen filters can
    // exhaust retries and yield None for some seeds)
    val edgeGen = for {
      n <- Gen.chooseNum(2, 14)
      m <- Gen.chooseNum(1, 18)
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 2)
        d <- Gen.chooseNum(1, n - 1 - a)
      } yield (a.toLong, (a + d).toLong))
    } yield edges
    (1 to 6).foreach { s =>
      val edges = sample(edgeGen, 400L + s).distinct
      if (edges.nonEmpty) {
        val got = TextDedup.dupClusters(edges.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
        assert(got.keySet == nodes, s"seed $s")
        nodes.foreach { x =>
          assert(got(x) == find(x), s"seed $s node $x: ${got(x)} != ${find(x)}")
        }
      }
    }
  }

  test("property: jaccardPairsAcross matches brute force on random corpora") {
    def sh3(t: String): Set[String] =
      t.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    (1 to 6).foreach { s =>
      val seen = sample(corpus, 500L + s)
      val crawl = sample(corpus, 600L + s)
      val exp = (for {
        (ct, ci) <- crawl.zipWithIndex
        (st, si) <- seen.zipWithIndex
        a = sh3(ct); b = sh3(st)
        inter = (a & b).size
        if a.nonEmpty && b.nonEmpty && inter > 0
        j = inter.toDouble / (a.size + b.size - inter)
        if j >= 0.3
      } yield (ci.toLong, si.toLong, inter.toLong, j)).toSet
      val got = TextDedup.jaccardPairsAcross(
        TextDedup.shingles(df(crawl), "doc_id", "text", n = 3),
        TextDedup.shingles(df(seen), "doc_id", "text", n = 3),
        "doc_id", threshold = 0.3)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got == exp, s"seed $s")
    }
  }

  test("property: identical docs have identical minhash signatures") {
    (1 to 8).foreach { s =>
      val d = sample(doc, 300L + s)
      if (d.split(" ").length >= 2) {
        val frame = Seq((0L, d), (1L, d)).toDF("doc_id", "text")
        val sh = TextDedup.shingles(frame, "doc_id", "text", n = 2)
        val sig = TextDedup.minhashSignatures(sh, "doc_id", numPerms = 8)
          .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
        assert(sig(0L) == sig(1L), s"seed $s")
      }
    }
  }

  test("property: tokenF1 is symmetric in (pred, gold); EM implies F1=1") {
    (1 to 6).foreach { s =>
      val a = sample(corpus, s.toLong)
      val b = sample(corpus, s.toLong + 100)
      val n = math.min(a.size, b.size)
      val pairs = (0 until n).map(i => (i.toLong, a(i), b(i)))
        .toDF("id", "pred", "gold")
      val fwd = Retrieval.evalTokenF1(pairs, "id", "pred", "gold")
        .collect().map(r => r.getLong(0) -> r).toMap
      val rev = Retrieval.evalTokenF1(
          pairs.select(col("id"), col("gold").as("pred"),
            col("pred").as("gold")), "id", "pred", "gold")
        .collect().map(r => r.getLong(0) -> r).toMap
      fwd.foreach { case (id, r) =>
        assert(r.getAs[Double]("f1") == rev(id).getAs[Double]("f1"),
          s"seed $s id $id")
        assert(r.getAs[Double]("f1") >= 0.0 && r.getAs[Double]("f1") <= 1.0)
        if (r.getAs[Int]("exact_match") == 1)
          assert(r.getAs[Double]("f1") == 1.0, s"seed $s id $id")
      }
    }
  }

  test("property: containment dominates jaccard on every surfaced pair") {
    (1 to 6).foreach { s =>
      val docs = sample(corpus, s.toLong)
      val sh = TextDedup.shingles(df(docs), "doc_id", "text", n = 2)
      val cont = TextDedup.containmentPairs(sh, "doc_id",
          threshold = 0.01, maxShingleDocs = Int.MaxValue)
        .collect()
      cont.foreach { r =>
        val cab = r.getAs[Double]("c_a_in_b")
        val cba = r.getAs[Double]("c_b_in_a")
        // jaccard = c/(na+nb−c) ≤ min containment direction bound:
        // both containments ≥ jaccard since |A∪B| ≥ max(|A|,|B|)
        val j = {
          val common = r.getAs[Long]("n_common").toDouble
          // reconstruct sizes from the two containments
          val sa = common / cab; val sb = common / cba
          common / (sa + sb - common)
        }
        assert(cab + 1e-9 >= j && cba + 1e-9 >= j, s"seed $s")
        assert(cab <= 1.0 + 1e-9 && cba <= 1.0 + 1e-9)
      }
    }
  }

  test("property: percentileGate keeps exactly max(1, floor(frac·n))") {
    (1 to 6).foreach { s =>
      val docs = sample(corpus, s.toLong)
      val scored = docs.zipWithIndex
        .map { case (t, i) => (s"g${i % 3}", i.toLong, t.length.toLong) }
        .toDF("grp", "id", "score")
      val out = Sampling.percentileGate(scored, "grp", "id", "score", 0.4)
        .collect()
      out.groupBy(_.getString(0)).foreach { case (g, rows) =>
        val n = rows.length
        val kept = rows.count(_.getAs[Int]("kept") == 1)
        assert(kept == math.max(1, math.floor(0.4 * n).toInt),
          s"seed $s group $g n=$n kept=$kept")
      }
    }
  }
}
