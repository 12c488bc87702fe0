package graft.pipeline

import graft.SparkSpec
import graft.functions.{GraftExtensions, NfcNormalize}
import graft.ops.Graph
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Round-8 corpus-curation operators: BM25 / vocabulary coverage
  * (Retrieval), NFC normalization (NfcNormalize), chunk-level corpus
  * dedup (TextDedup.chunkDedupCorpus), domain-mix sampling
  * (Sampling.budgetMixSample) and PageRank (Graph.pageRank).
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- canonicalUrl ----

  test("canonicalUrl: case, ports, fragments, tracking params, empty path") {
    val cases = Seq(
      // scheme+host case-fold, default port drop, path case kept
      "HTTP://WWW.Example.COM:80/Art/7" -> "http://www.example.com/Art/7",
      "https://Example.COM:443/a?page=1" -> "https://example.com/a?page=1",
      // non-default port survives
      "http://example.com:8080/x#sec" -> "http://example.com:8080/x",
      // tracking params: leading (hands ? to survivor), trailing, only
      "https://e.com/a?utm_source=f&page=2" -> "https://e.com/a?page=2",
      "https://e.com/a?page=2&utm_campaign=z" -> "https://e.com/a?page=2",
      "https://e.com/a?utm_a=1&fbclid=x" -> "https://e.com/a",
      // consecutive tracked params around a survivor
      "https://e.com/a?utm_a=1&gclid=2&p=3&utm_b=4" -> "https://e.com/a?p=3",
      // empty path → '/', host lowered
      "HTTPS://CDN.Example.com" -> "https://cdn.example.com/",
      // non-tracking params and path are untouched
      "https://e.com/A/B?x=1&y=2" -> "https://e.com/A/B?x=1&y=2")
    val out = cases.map(_._1).toDF("u")
      .select(TextClean.canonicalUrl(col("u")))
      .collect().map(_.getString(0)).toSeq
    assert(out == cases.map(_._2))
  }

  // ---- NfcNormalize ----

  test("nfcNormalize composes decomposed sequences; NFC text untouched") {
    val out = Seq(
        "Café",        // e + combining acute -> é
        "å b ñ", // ring/tilde
        "already fine",      // ASCII fast path
        "")
      .toDF("s").select(NfcNormalize.nfcNormalize(col("s"))).as[String]
      .collect()
    assert(out(0) == "Café")
    assert(out(1) == "å b ñ")
    assert(out(2) == "already fine")
    assert(out(3) == "")
    // composition shortens the codepoint count
    assert("Café".length == 5 && out(0).length == 4)
  }

  test("nfcNormalize codegen and interpreted paths agree; NULL propagates") {
    val strings = Seq("Café", "straße", "nö", "plain")
    val viaDf = strings.toDF("s")
      .select(NfcNormalize.nfcNormalize(col("s"))).as[String].collect().toSeq
    val viaEval = strings.map(s =>
      NfcNormalize(Literal(UTF8String.fromString(s)))
        .eval(null).asInstanceOf[UTF8String].toString)
    assert(viaDf == viaEval)
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(NfcNormalize.nfcNormalize(col("s"))).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("nfc_normalize registers for SQL and rejects non-string input") {
    GraftExtensions.install(spark)
    val r = spark.sql("SELECT nfc_normalize('Café') AS s")
      .as[String].collect()
    assert(r.head == "Café")
    val err = intercept[Exception] {
      spark.sql("SELECT nfc_normalize(42)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("nfcNormalize makes decomposed/precomposed dedup keys collide") {
    val docs = Seq((1L, "Café menu"), (2L, "Café menu"))
      .toDF("doc_id", "text")
    val naive = TextDedup.exactDedup(docs, "doc_id", "text")
    val normalized = TextDedup.exactDedup(
      docs.withColumn("text", NfcNormalize.nfcNormalize(col("text"))),
      "doc_id", "text")
    assert(naive.count() == 2)      // byte-distinct, visually identical
    assert(normalized.count() == 1) // the point of the normalization pass
  }

  // ---- Retrieval.bm25TopK ----

  test("bm25TopK matches the hand-computed score on a tiny corpus") {
    // 3 docs, query = {x}: df=2, N=3, avgdl = (2+4+3)/3 = 3
    // idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    // doc1: tf=1, dl=2: s = idf·1·2.2/(1 + 1.2·(0.25+0.75·2/3))
    // doc2: tf=2, dl=4: s = idf·2·2.2/(2 + 1.2·(0.25+0.75·4/3))
    val docs = Seq(
        (1L, "x y"), (2L, "x x y z"), (3L, "y z w")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("x"), topK = 10)
      .as[(Long, Double)].collect().toMap
    val idf = math.log(1.6)
    val s1 = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2.0 / 3))
    val s2 = idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 4.0 / 3))
    assert(out.keySet == Set(1L, 2L)) // doc3 has no query term
    assert(math.abs(out(1L) - s1) < 1e-6)
    assert(math.abs(out(2L) - s2) < 1e-6)
    // higher tf wins here despite the longer doc
    assert(out(2L) > out(1L))
  }

  test("bm25TopK respects topK with the (score, id) tie-break") {
    val docs = (1L to 20L).map(i => (i, "x pad")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("x"), topK = 5)
      .as[(Long, Double)].collect()
    // identical docs -> identical scores -> lowest ids win
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  // ---- Retrieval.vocabCoverage ----

  test("vocabCoverage counts OOV tokens against the top-N vocab") {
    // counts: a=4, b=3, c=2, d=1 -> vocab(2) = {a, b}
    val docs = Seq(
        (1L, "a a b c"), (2L, "a b d"), (3L, "a b c")).toDF("doc_id", "text")
    val out = Retrieval.vocabCoverage(docs, "doc_id", "text", vocabSize = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((4L, 1L, 0.25)))
    assert(out(2L) == ((3L, 1L, 0.333333)))
    assert(out(3L) == ((3L, 1L, 0.333333)))
  }

  test("vocabCoverage vocab cut is deterministic on count ties") {
    // b and c tie at 2; token ASC admits b, not c
    val docs = Seq((1L, "a a b b c c")).toDF("doc_id", "text")
    val out = Retrieval.vocabCoverage(docs, "doc_id", "text", vocabSize = 2)
      .as[(Long, Long, Long, Double)].collect().head
    assert(out._3 == 2L) // the two c's are OOV
  }

  // ---- TextDedup.chunkDedupCorpus ----

  test("chunkDedupCorpus strips shared chunks except from the min-id owner") {
    val boiler = "0123456789" // chunkChars = 10 -> exactly one chunk
    val docs = Seq(
        (5L, boiler + "aaaaaaaaaa"), // owner of the shared chunk
        (7L, boiler + "bbbbbbbbbb"),
        (9L, "cccccccccc" + "dddddddddd")).toDF("doc_id", "text")
    val out = TextDedup.chunkDedupCorpus(docs, "doc_id", "text", 10)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(5L) == ((2L, 0L, boiler + "aaaaaaaaaa"))) // owner keeps
    assert(out(7L) == ((2L, 1L, "bbbbbbbbbb")))          // boiler stripped
    assert(out(9L) == ((2L, 0L, "cccccccccc" + "dddddddddd")))
  }

  test("chunkDedupCorpus reassembles multi-chunk survivors in order") {
    // 25 chars at width 10 -> chunks of 10, 10, 5; no cross-doc dups
    val docs = Seq((1L, "aaaaaaaaaabbbbbbbbbbccccc")).toDF("doc_id", "text")
    val out = TextDedup.chunkDedupCorpus(docs, "doc_id", "text", 10)
      .as[(Long, Long, Long, String)].collect().head
    assert(out == ((1L, 3L, 0L, "aaaaaaaaaabbbbbbbbbbccccc")))
  }

  test("chunkDedupCorpus empties a document that is ALL shared boilerplate") {
    val docs = Seq(
        (1L, "xxxxxxxxxx"), (2L, "xxxxxxxxxx")).toDF("doc_id", "text")
    val out = TextDedup.chunkDedupCorpus(docs, "doc_id", "text", 10)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((1L, 0L, "xxxxxxxxxx")))
    assert(out(2L) == ((1L, 1L, ""))) // nothing survives; row still present
  }

  // ---- Sampling.budgetMixSample ----

  test("budgetMixSample clamps overweighted domains and drops unweighted") {
    val docs = (1L to 200L).map { i =>
      (i, if (i <= 50) "big" else if (i <= 100) "small" else "junk", 10L)
    }.toDF("doc_id", "domain", "sz")
    // big: 500 units, weight .5 of budget 1000 -> rate 1 (clamped)
    // small: 500 units, weight .05 -> rate 0.1; junk: no weight -> dropped
    val out = Sampling.budgetMixSample(docs, "doc_id", "domain", "sz",
      Map("big" -> 0.5, "small" -> 0.05), budget = 1000L)
    val byDom = out.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    assert(byDom("big") == 50L) // rate 1 keeps everything
    assert(byDom.get("junk").isEmpty)
    val small = byDom.getOrElse("small", 0L)
    assert(small > 0 && small < 25, s"~10% of 50 expected, got $small")
    // keep_rate column carries the clamped rate
    val rates = out.select("domain", "keep_rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(rates("big") == 1.0 && math.abs(rates("small") - 0.1) < 1e-12)
  }

  test("budgetMixSample is deterministic and salt-independent of splits") {
    val docs = (1L to 300L).map(i => (i, "d", 1L)).toDF("doc_id", "domain", "sz")
    val w = Map("d" -> 1.0)
    def ids(salt: String): Set[Long] =
      Sampling.budgetMixSample(docs, "doc_id", "domain", "sz", w,
        budget = 150L, salt = salt).select("doc_id").as[Long].collect().toSet
    assert(ids("mix") == ids("mix")) // rerun-stable
    val a = ids("mix"); val b = ids("other")
    assert(a != b) // different salt, independent membership
    assert(math.abs(a.size - 150) < 40 && math.abs(b.size - 150) < 40)
  }

  // ---- Graph.pageRank ----

  test("pageRank on a symmetric graph is uniform and sums to 1") {
    val edges = Seq(
        ("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)).toDF("s", "d", "n")
    val out = Graph.pageRank(edges, "s", "d", "n", iters = 10)
      .as[(String, Double)].collect().toMap
    assert(out.size == 3)
    out.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("pageRank matches the hand-iterated answer on an asymmetric graph") {
    // a -> b, b -> a, a -> a is absent; c -> a: classic 3-node chain
    val edges = Seq(
        ("a", "b", 1L), ("b", "a", 1L), ("c", "a", 1L)).toDF("s", "d", "n")
    val out = Graph.pageRank(edges, "s", "d", "n", iters = 10)
      .as[(String, Double)].collect().toMap
    // hand power iteration (c has no inlinks: (1-d)/3 each round)
    var (a, b, c) = (1.0 / 3, 1.0 / 3, 1.0 / 3)
    val t = (1.0 - 0.85) / 3
    for (_ <- 0 until 10) {
      val (na, nb, nc) = (t + 0.85 * (b + c), t + 0.85 * a, t)
      a = na; b = nb; c = nc
    }
    assert(math.abs(out("a") - a) < 1e-12, s"a: ${out("a")} vs $a")
    assert(math.abs(out("b") - b) < 1e-12)
    assert(math.abs(out("c") - c) < 1e-12)
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
  }

  test("pageRank redistributes dangling mass so scores still sum to 1") {
    // b has no outgoing edges: its mass re-enters uniformly
    val edges = Seq(("a", "b", 1L)).toDF("s", "d", "n")
    val out = Graph.pageRank(edges, "s", "d", "n", iters = 10)
      .as[(String, Double)].collect().toMap
    assert(out.size == 2)
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    assert(out("b") > out("a")) // b gets a's full vote plus teleport
  }

  test("pageRank weights edges: heavier edges carry more mass") {
    // a splits 3:1 between b and c
    val edges = Seq(
        ("a", "b", 3L), ("a", "c", 1L),
        ("b", "a", 1L), ("c", "a", 1L)).toDF("s", "d", "n")
    val out = Graph.pageRank(edges, "s", "d", "n", iters = 20)
      .as[(String, Double)].collect().toMap
    assert(out("b") > out("c"))
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
  }

  test("pageRank rejects negative weights loudly") {
    val edges = Seq(("a", "b", 1L), ("b", "a", -1L)).toDF("s", "d", "n")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(edges, "s", "d", "n", iters = 2).collect()
    }
    assert(e.getMessage.contains("non-negative"))
    val e2 = intercept[IllegalArgumentException] {
      Graph.hits(edges, "s", "d", "n", iters = 2).collect()
    }
    assert(e2.getMessage.contains("non-negative"))
  }

  test("pageRank demotes a zero-SUM-weight source to dangling, no NaN") {
    // b's only outgoing edge has weight 0: normalizing would be
    // 0.0/0.0 = NaN and poison every score — instead b's edges drop
    // and b redistributes as dangling mass; c (reachable only via the
    // zero edge) STAYS in the ranking universe
    val edges = Seq(("a", "b", 1L), ("b", "c", 0L)).toDF("s", "d", "n")
    val out = Graph.pageRank(edges, "s", "d", "n", iters = 10)
      .as[(String, Double)].collect().toMap
    assert(out.size == 3, s"node universe shrank: $out")
    out.values.foreach(v => assert(!v.isNaN && v > 0.0, out))
    // hand replay: b and c dangling, a's mass all to b
    var (a, b, c) = (1.0 / 3, 1.0 / 3, 1.0 / 3)
    val t = (1.0 - 0.85) / 3
    for (_ <- 0 until 10) {
      val dang = (b + c) / 3
      val (na, nb, nc) =
        (t + 0.85 * dang, t + 0.85 * (a + dang), t + 0.85 * dang)
      a = na; b = nb; c = nc
    }
    assert(math.abs(out("a") - a) < 1e-12, s"a: ${out("a")} vs $a")
    assert(math.abs(out("b") - b) < 1e-12)
    assert(math.abs(out("c") - c) < 1e-12)
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
  }

  test("pageRank/hits emit per-round l1_delta convergence metrics") {
    // the named observe() rides each round's materialization job and
    // reaches every QueryExecutionListener — capture them and assert
    // the fixed-iteration run actually reports (and reaches)
    // convergence on a graph that mixes well
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft_pagerank_it") ||
              name.startsWith("graft_hits_it"))
            seen.put(name, row.getAs[Double]("l1_delta"))
        }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val edges = Seq(
          ("a", "b", 1L), ("b", "c", 2L), ("c", "a", 1L), ("a", "c", 1L))
        .toDF("s", "d", "n")
      Graph.pageRank(edges, "s", "d", "n", iters = 12).collect()
      Graph.hits(edges, "s", "d", "n", iters = 12).collect()
      // listener delivery is async: poll until the last round's metric
      // lands (bounded)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while ((!seen.containsKey("graft_pagerank_it11") ||
          !seen.containsKey("graft_hits_it11")) &&
          System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.containsKey("graft_pagerank_it0"))
      assert(seen.containsKey("graft_pagerank_it11"))
      assert(seen.containsKey("graft_hits_it11"))
      // power iteration contracts by ~damping per round (0.85^11 of
      // the initial delta): the reported numbers must show that decay
      // (this is what an operator reads at 100 TB instead of
      // re-running) — near-zero needs ~80 rounds, not 12
      assert(seen.get("graft_pagerank_it11") < 1e-2,
        s"pagerank final delta ${seen.get("graft_pagerank_it11")}")
      assert(seen.get("graft_pagerank_it11") <
        seen.get("graft_pagerank_it0") / 5.0)
      assert(seen.get("graft_hits_it11") < 1e-2,
        s"hits final delta ${seen.get("graft_hits_it11")}")
    } finally spark.listenerManager.unregister(listener)
  }

  // ---- Graph.triangles ----

  test("triangles counts K4 as 3 per node, coefficient 1") {
    val nodes = Seq("a", "b", "c", "d")
    val edges = (for {
      x <- nodes; y <- nodes if x < y
    } yield (x, y)).toDF("s", "d")
    val out = Graph.triangles(edges, "s", "d")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.size == 4)
    out.values.foreach { case (deg, tri, cc) =>
      assert(deg == 3L && tri == 3L && math.abs(cc - 1.0) < 1e-15)
    }
  }

  test("triangles: star graph has none; pendant nodes report 0.0") {
    val edges = Seq(("hub", "x"), ("hub", "y"), ("hub", "z")).toDF("s", "d")
    val out = Graph.triangles(edges, "s", "d")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("hub") == ((3L, 0L, 0.0)))
    Seq("x", "y", "z").foreach(n => assert(out(n) == ((1L, 0L, 0.0))))
  }

  test("triangles canonicalizes direction, duplicates and self-loops") {
    // triangle a-b-c given with mixed directions, a dup edge and a loop
    val edges = Seq(("a", "b"), ("b", "a"), ("c", "b"), ("a", "c"),
      ("c", "c")).toDF("s", "d")
    val out = Graph.triangles(edges, "s", "d")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.size == 3)
    out.values.foreach { case (deg, tri, cc) =>
      assert(deg == 2L && tri == 1L && math.abs(cc - 1.0) < 1e-15)
    }
  }

  test("triangles: triangle with a pendant tail mixes coefficients") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "t"))
      .toDF("s", "d")
    val out = Graph.triangles(edges, "s", "d")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("a") == ((2L, 1L, 1.0)))
    assert(out("b") == ((2L, 1L, 1.0)))
    assert(out("c")._1 == 3L && out("c")._2 == 1L)
    assert(math.abs(out("c")._3 - 1.0 / 3) < 1e-15)
    assert(out("t") == ((1L, 0L, 0.0)))
  }

  test("triangles matches brute force on seeded random graphs") {
    // fixed-seed graphs, brute-force O(n^3) reference
    for (seed <- Seq(7, 23, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 14
      val und = (for {
        a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < 0.3
      } yield (s"n$a", s"n$b")).toSet
      val adj = und ++ und.map { case (a, b) => (b, a) }
      val names = adj.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val expTri = names.map { v =>
        val nb = names.filter(u => adj(( v, u)))
        val t = (for {
          i <- nb.indices; j <- i + 1 until nb.size
          if adj((nb(i), nb(j)))
        } yield 1).size
        v -> ((nb.size.toLong, t.toLong))
      }.toMap
      // feed edges in scrambled directions to exercise canonicalization
      val edges = und.toSeq.map { case (a, b) =>
        if (rnd.nextBoolean()) (a, b) else (b, a)
      }.toDF("s", "d")
      val out = Graph.triangles(edges, "s", "d")
        .as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(out == expTri, s"seed $seed")
    }
  }

  // ---- Graph.hits ----

  test("hits: two hubs, one authority — hub mass splits by edge weight") {
    // a -> c (w=1), b -> c (w=2): the shared auth(c) factors out of
    // h(u) = w(u,c)·auth(c), so h(a):h(b) = 1:2; c is the only authority
    val edges = Seq(("a", "c", 1L), ("b", "c", 2L)).toDF("s", "d", "n")
    val out = Graph.hits(edges, "s", "d", "n", iters = 10)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 3)
    assert(math.abs(out("a")._1 - 1.0 / 3) < 1e-12)
    assert(math.abs(out("b")._1 - 2.0 / 3) < 1e-12)
    assert(math.abs(out("c")._1 - 0.0) < 1e-12) // c points at nothing
    assert(math.abs(out("c")._2 - 1.0) < 1e-12)
    assert(math.abs(out("a")._2) < 1e-12 && math.abs(out("b")._2) < 1e-12)
  }

  test("hits: symmetric cycle is uniform; both vectors sum to 1") {
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("s", "d", "n")
    val out = Graph.hits(edges, "s", "d", "n", iters = 10)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    out.values.foreach { case (h, a) =>
      assert(math.abs(h - 1.0 / 3) < 1e-12)
      assert(math.abs(a - 1.0 / 3) < 1e-12)
    }
  }

  test("hits per-round normalization matches end-only normalization") {
    // the q139 oracle contract: scale factors cancel because every step
    // is linear — verify against a hand-run unnormalized iteration
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("a", "c", 3L),
      ("c", "a", 1L)).toDF("s", "d", "n")
    val w = Map(("a", "b") -> 2.0, ("b", "c") -> 1.0, ("a", "c") -> 3.0,
      ("c", "a") -> 1.0)
    val ns = Seq("a", "b", "c")
    var hub = ns.map(_ -> 1.0).toMap
    var auth = Map.empty[String, Double]
    for (_ <- 0 until 10) {
      auth = ns.map(v => v ->
        ns.map(u => w.getOrElse((u, v), 0.0) * hub(u)).sum).toMap
      hub = ns.map(u => u ->
        ns.map(v => w.getOrElse((u, v), 0.0) * auth(v)).sum).toMap
    }
    val hs = hub.values.sum; val as0 = auth.values.sum
    val out = Graph.hits(edges, "s", "d", "n", iters = 10)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    ns.foreach { n =>
      assert(math.abs(out(n)._1 - hub(n) / hs) < 1e-9, s"hub $n")
      assert(math.abs(out(n)._2 - auth(n) / as0) < 1e-9, s"auth $n")
    }
  }

  test("hits matches a hand-run iteration on seeded random weighted graphs") {
    for (seed <- Seq(5, 41)) {
      val rnd = new scala.util.Random(seed)
      val n = 8
      val es = (for {
        a <- 0 until n; b <- 0 until n
        if a != b && rnd.nextDouble() < 0.35
      } yield (s"n$a", s"n$b", rnd.nextInt(9).toLong + 1L))
      val ns = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val w = es.map(e => (e._1, e._2) -> e._3.toDouble).toMap
      var hub = ns.map(_ -> 1.0).toMap
      var auth = Map.empty[String, Double]
      for (_ <- 0 until 10) {
        auth = ns.map(v => v ->
          ns.map(u => w.getOrElse((u, v), 0.0) * hub(u)).sum).toMap
        val h = ns.map(u => u ->
          ns.map(v => w.getOrElse((u, v), 0.0) * auth(v)).sum).toMap
        val s = h.values.sum
        hub = h.map { case (k, v) => k -> v / s } // mirror per-round L1
      }
      val as0 = auth.values.sum
      val out = Graph.hits(es.toDF("s", "d", "n"), "s", "d", "n", iters = 10)
        .as[(String, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      ns.foreach { v =>
        assert(math.abs(out(v)._1 - hub(v)) < 1e-9, s"hub $v seed $seed")
        assert(math.abs(out(v)._2 - auth(v) / as0) < 1e-9,
          s"auth $v seed $seed")
      }
    }
  }

  // ---- Similarity.semanticDedup ----

  test("semanticDedup keeps min-id per near-dup component, others drop") {
    // vectors: 1 ≈ 2 ≈ 3 (chain), 4 orthogonal — {1,2,3} cluster, 1 kept
    val e = Seq(
        (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.999f, 0.04f)),
        (3L, Seq(0.995f, 0.09f)), (4L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(e, "vec_id", "embedding",
        threshold = 0.99, blocks = 2)
      .as[(Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((1L, 1)))
    assert(out(2L) == ((1L, 0)))
    assert(out(3L) == ((1L, 0)))
    assert(out(4L) == ((4L, 1))) // no pair: keeps itself
  }

  test("semanticDedupFromPairs accepts any candidate pair frame") {
    val e = Seq((10L, Seq(1.0f)), (20L, Seq(1.0f)), (30L, Seq(1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Seq((10L, 30L)).toDF("vec_a", "vec_b")
    val out = Similarity.semanticDedupFromPairs(e, "vec_id", pairs)
      .as[(Long, Long, Int)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out == Map(10L -> 1, 20L -> 1, 30L -> 0))
  }

  // ---- TextStats.bigramLogProb ----

  test("bigramLogProb matches the hand-computed smoothed model") {
    // corpus: "a b a b" and "a b": bigrams ab,ba,ab + ab
    // c12: (a,b)=3, (b,a)=1; c1: a=3, b=1; V=2, k=0.5
    // P(b|a) = 3.5/(3+1) = 0.875; P(a|b) = 1.5/(1+1) = 0.75
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextStats.bigramLogProb(docs, "doc_id", "text", addK = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val d1 = (math.log(0.875) + math.log(0.75) + math.log(0.875)) / 3
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - d1) < 1e-12)
    assert(out(2L)._1 == 1L)
    assert(math.abs(out(2L)._2 - math.log(0.875)) < 1e-12)
  }

  test("bigramLogProb ranks scrambled text below its source prose") {
    // same unigram bag, different order: bigram LM must separate them
    val prose = "the cat sat on the mat and the dog sat on the rug"
    val salad = "the the the cat dog mat on sat rug and sat on mat the"
    val docs = (1L to 6L).map(i => (i, prose)).toDF("doc_id", "text")
      .unionAll(Seq((99L, salad)).toDF("doc_id", "text"))
    val out = TextStats.bigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out(99L) < out(1L), s"salad ${out(99L)} !< prose ${out(1L)}")
  }

  test("bigramLogProb omits documents with fewer than two tokens") {
    val docs = Seq((1L, "only"), (2L, "two tokens")).toDF("doc_id", "text")
    val out = TextStats.bigramLogProb(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(2L))
  }

  // ---- Sampling.unimaxBudgets ----

  test("unimaxBudgets water-fills: small domains saturate, big ones split") {
    // caps {10, 100} at 1 epoch, budget 60: x saturates at 10, the
    // waterline gives y the remaining 50 (0.5 epochs)
    val rows = Seq.fill(10)(("x", 1L)) ++ Seq.fill(100)(("y", 1L))
    val out = Sampling.unimaxBudgets(rows.toDF("dom", "w"), "dom", "w",
        totalBudget = 60L, maxEpochs = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("x").getAs[Double]("budget") == 10.0)
    assert(out("x").getAs[Int]("saturated") == 1)
    assert(out("x").getAs[Double]("epochs") == 1.0)
    assert(out("y").getAs[Double]("budget") == 50.0)
    assert(out("y").getAs[Int]("saturated") == 0)
    assert(out("y").getAs[Double]("epochs") == 0.5)
  }

  test("unimaxBudgets: even domains share evenly; surplus is not invented") {
    val even = (Seq.fill(50)(("a", 1L)) ++ Seq.fill(50)(("b", 1L)))
      .toDF("dom", "w")
    val o1 = Sampling.unimaxBudgets(even, "dom", "w", 60L, maxEpochs = 1)
      .collect().map(_.getAs[Double]("budget"))
    assert(o1.toSeq == Seq(30.0, 30.0))
    // budget beyond total capacity: every domain caps out, Σ = capacity
    val o2 = Sampling.unimaxBudgets(even, "dom", "w", 500L, maxEpochs = 2)
      .collect().map(r => (r.getAs[Double]("budget"),
        r.getAs[Int]("saturated")))
    assert(o2.forall(_ == ((100.0, 1))))
  }

  // ---- TextStats.mooreLewisSelect ----

  test("mooreLewisSelect keeps in-domain text, rejects background text") {
    val inDom = Seq((100L, "the cat sat on the mat")).toDF("doc_id", "text")
    val gen = Seq(
      (100L, "the cat sat on the mat"),
      (101L, "stocks fell hard on friday"),
      (102L, "stocks rose hard on monday")).toDF("doc_id", "text")
    val cand = Seq(
      (1L, "the cat sat on the mat"),   // in-domain: delta > 0
      (2L, "stocks fell hard on monday"), // background-ish: delta < 0
      (3L, "one")).toDF("doc_id", "text") // unjudgeable
    val out = TextStats.mooreLewisSelect(inDom, gen, cand,
        "doc_id", "text", minDelta = 0.0)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("kept") == 1)
    assert(out(1L).getAs[Double]("delta") > 0.0)
    assert(out(2L).getAs[Int]("kept") == 0)
    assert(out(2L).getAs[Double]("delta") < 0.0)
    assert(out(3L).getAs[Int]("kept") == 0)
    assert(out(3L).isNullAt(out(3L).fieldIndex("delta")))
  }

  // ---- Stats.fleissKappa ----

  test("fleissKappa matches the hand computation; kappa < 0 possible") {
    // item 1 votes (a,a,b), item 2 (a,a,a): P̄ = (14−6)/12 = 2/3;
    // category totals a=5, b=1 → Pe = 26/36; κ = (2/3−13/18)/(5/18) = −0.2
    val df = Seq((1L, "a", "a", "b"), (2L, "a", "a", "a"))
      .toDF("item", "r1", "r2", "r3")
    val out = Stats.fleissKappa(df, "item", Seq("r1", "r2", "r3"))
      .collect().head
    assert(out.getAs[Long]("n_items") == 2L)
    assert(out.getAs[Long]("n_raters") == 3L)
    assert(math.abs(out.getAs[Double]("p_bar") - 2.0 / 3) < 1e-6)
    assert(math.abs(out.getAs[Double]("p_e") - 26.0 / 36) < 1e-6)
    assert(math.abs(out.getAs[Double]("kappa") - (-0.2)) < 1e-6)
  }

  test("fleissKappa: unanimous raters everywhere score kappa = 1") {
    val df = Seq((1L, "x", "x"), (2L, "x", "x")).toDF("item", "r1", "r2")
    assert(Stats.fleissKappa(df, "item", Seq("r1", "r2")).collect()
      .head.getAs[Double]("kappa") == 1.0)
  }

  // ---- TextDedup.containmentPairs ----

  test("containmentPairs finds the planted tail Jaccard misses") {
    // doc 2 IS doc 1's second half: containment(2→1) = 1.0, but
    // Jaccard ≈ 1/2 — below a 0.9 bar on either measure symmetric
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (2L, "w7 w8 w9 w10 w11 w12"),
      (3L, "x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text")
    val sh = TextDedup.shingles(docs, "doc_id", "text", n = 3)
    val out = TextDedup.containmentPairs(sh, "doc_id", threshold = 0.9,
        maxShingleDocs = Int.MaxValue)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Double]("c_b_in_a") == 1.0) // all of 2's shingles in 1
    assert(r.getAs[Double]("c_a_in_b") < 0.5)
    // and the symmetric measure indeed misses it at the same bar
    assert(TextDedup.jaccardPairs(sh, "doc_id", threshold = 0.9,
      maxShingleDocs = Int.MaxValue).count() == 0L)
  }

  test("containmentPairs: df-capped candidates still verify exactly") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "e f g h"),
      (3L, "a b c d e f g h z z2 z3")).toDF("doc_id", "text")
    val sh = TextDedup.shingles(docs, "doc_id", "text", n = 3)
    val exact = TextDedup.containmentPairs(sh, "doc_id", 0.9,
      maxShingleDocs = Int.MaxValue).collect().map(_.toSeq).toSet
    val capped = TextDedup.containmentPairs(sh, "doc_id", 0.9,
      maxShingleDocs = 500).collect().map(_.toSeq).toSet
    assert(exact == capped)
    assert(exact.nonEmpty)
  }

  // ---- TextStats.zipfFit / knQualityGate ----

  test("zipfFit recovers slope -1 exactly on a planted power law") {
    // token w_r appears ⌊240/r⌋ times for r = 1..6 → ln f ≈ −ln r +
    // ln 240; fit slope ≈ −1, r² ≈ 1 (floor() introduces tiny error)
    val words = (1 to 6).flatMap(r => Seq.fill(240 / r)(s"w$r"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = TextStats.zipfFit(docs, "text", topR = 6).collect().head
    assert(out.getAs[Long]("n_ranks") == 6L)
    assert(math.abs(out.getAs[Double]("slope") - (-1.0)) < 0.01)
    assert(out.getAs[Double]("r2") > 0.999)
  }

  test("zipfFit ranks ties deterministically and ignores empty tokens") {
    val docs = Seq((1L, "b b  a a c")).toDF("doc_id", "text")
    val out = TextStats.zipfFit(docs, "text", topR = 3).collect().head
    // freqs: a=2, b=2, c=1 → ranks a(1), b(2), c(3); just completes
    // deterministically — the d6/decimal pipeline is the oracle's job
    assert(out.getAs[Long]("n_ranks") == 3L)
    assert(out.getAs[Double]("slope") < 0.0)
  }

  test("heapsFit recovers beta = 1 when every doc adds fresh types") {
    // doc i contributes 5 unique tokens → V(n) = 5n exactly: beta 1,
    // ln_k = ln 5, r² = 1 (up to d6 rounding)
    val docs = (0L until 16L).map(i =>
      (i, (0 until 5).map(j => s"w_${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextStats.heapsFit(docs, "doc_id", "text", points = 8)
      .collect().head
    assert(out.getAs[Long]("n_points") == 8L)
    assert(math.abs(out.getAs[Double]("beta") - 1.0) < 0.001)
    assert(math.abs(out.getAs[Double]("ln_k") - math.log(5.0)) < 0.001)
    assert(out.getAs[Double]("r2") > 0.9999)
  }

  test("heapsFit flattens on a fully duplicated corpus") {
    // every doc repeats the same 3 tokens → V(n) constant → beta ≈ 0
    val docs = (0L until 16L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val out = TextStats.heapsFit(docs, "doc_id", "text", points = 8)
      .collect().head
    assert(math.abs(out.getAs[Double]("beta")) <= 2e-6)
  }

  test("knQualityGate is total: unjudgeable docs come back kept = 0") {
    val model = Seq((100L, "the cat sat on the mat")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the cat sat on the mat"),  // scores high vs itself
      (2L, "zz qq xx yy ww vv"),       // all-OOV, scores low
      (3L, "single")).toDF("doc_id", "text") // < 2 tokens: unjudgeable
    // threshold between the in-model doc (≈ −1.3 avg) and the all-OOV
    // doc (ln(1/(T+V)) = ln 0.1 ≈ −2.3 per bigram on this tiny model)
    val out = TextStats.knQualityGate(model, docs, "doc_id", "text",
        minAvgLogprob = -2.0)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L).getAs[Int]("kept") == 1)
    assert(out(2L).getAs[Int]("kept") == 0)
    assert(out(3L).getAs[Int]("kept") == 0)
    assert(out(3L).isNullAt(out(3L).fieldIndex("avg_logprob_kn")))
    assert(out(3L).getAs[Long]("n_bigrams") == 0L)
    // the judged docs order correctly: in-model beats all-OOV
    assert(out(1L).getAs[Double]("avg_logprob_kn") >
      out(2L).getAs[Double]("avg_logprob_kn"))
  }

  // ---- TextStats.bigramGreedyGenerate ----

  test("bigramGreedyGenerate walks the hand-computed argmax chain") {
    // corpus bigrams: (a,b)×3, (b,a)×1, (b,c)×2, (c,a)×1 →
    // best-next: a→b (3), b→c (2 beats a's 1), c→a; most frequent
    // token: a(4) > b(4 tie → a wins lexicographically? counts a=4,b=4
    // — top-1 seed is 'a' by (count DESC, token ASC))
    val docs = Seq(
      (1L, "a b c a b"), (2L, "a b a"), (3L, "b c")).toDF("doc_id", "text")
    val out = TextStats.bigramGreedyGenerate(docs, "doc_id", "text",
        seeds = 1, steps = 4)
      .collect().head
    // walk from a: a →b →c →a →b = "a b c a b", 4 steps
    assert(out.getAs[String]("seed") == "a")
    assert(out.getAs[String]("generated") == "a b c a b")
    assert(out.getAs[Long]("n_steps") == 4L)
  }

  test("bigramGreedyGenerate stalls on a successorless token") {
    // z ends every doc — the chain from z takes zero transitions
    val docs = Seq((1L, "z"), (2L, "z"), (3L, "q z")).toDF("doc_id", "text")
    val out = TextStats.bigramGreedyGenerate(docs, "doc_id", "text",
        seeds = 1, steps = 5)
      .collect().head
    assert(out.getAs[String]("seed") == "z")
    assert(out.getAs[String]("generated") == "z")
    assert(out.getAs[Long]("n_steps") == 0L)
  }

  test("bigramGreedyGenerate ignores empty tokens from multi-spaces") {
    // "a  b" splits to [a, "", b]: the empty token must enter neither
    // the seed ranking nor the transition table, and adjacency skips it
    val docs = Seq((1L, "a  b"), (2L, "a  b"), (3L, "a b"))
      .toDF("doc_id", "text")
    val rows = TextStats.bigramGreedyGenerate(docs, "doc_id", "text",
        seeds = 3, steps = 2)
      .collect()
    assert(rows.forall(r => r.getAs[String]("seed") != ""))
    val byS = rows.map(r => r.getAs[String]("seed") ->
      r.getAs[String]("generated")).toMap
    assert(byS("a") == "a b") // a→b despite the "" between them
  }

  test("bm25TopK is invariant to repeated query terms") {
    val docs = Seq((1L, "x y z"), (2L, "x x w")).toDF("doc_id", "text")
    val once = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("x", "y"))
      .as[(Long, Double)].collect().toMap
    val duped = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("x", "y", "x", "x")).as[(Long, Double)].collect().toMap
    assert(once == duped)
  }

  test("chunkDedupCorpus reassembly law: no cross-doc dups => identity") {
    // distinct single-char alphabets guarantee no shared chunks
    val docs = (0 until 8).map { i =>
      val ch = ('a' + i).toChar.toString
      (i.toLong, ch * (7 + 3 * i)) // lengths straddle chunk boundaries
    }.toDF("doc_id", "text")
    val out = TextDedup.chunkDedupCorpus(docs, "doc_id", "text", 5)
      .select("doc_id", "n_dropped", "dedup_text")
      .as[(Long, Long, String)].collect()
    val orig = docs.as[(Long, String)].collect().toMap
    out.foreach { case (id, dropped, text) =>
      assert(dropped == 0L, s"doc $id dropped chunks")
      assert(text == orig(id), s"doc $id reassembly differs")
    }
  }

  // ---- Sampling.dsirWeights / gumbelTopK ----

  test("dsirWeights tilts toward target-distinctive tokens") {
    val raw = Seq(
      (0L, "alpha alpha alpha"), // target-distinctive
      (1L, "omega omega omega"), // raw-only
      (2L, "alpha omega omega")).toDF("doc_id", "text")
    val target = Seq((10L, "alpha alpha")).toDF("doc_id", "text")
    val w = Sampling.dsirWeights(raw, target, "doc_id", "text",
      nBuckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(0) > w(2) && w(2) > w(1),
      s"expected alpha-heavy > mixed > omega-only, got $w")
    // 256 buckets, 2 distinct tokens: collision odds are negligible, so
    // per-token λ is exactly the smoothed log-ratio and doc 0's weight
    // is 3× one alpha-λ
    val lamAlpha = math.log(3.0 / (2 + 256.0)) - math.log(5.0 / (9 + 256.0))
    assert(math.abs(w(0) - 3 * lamAlpha) < 1e-9, s"got ${w(0)}")
  }

  test("dsirWeights counts token occurrences and skips empty docs") {
    val raw = Seq((0L, "a b  c"), (1L, ""), (2L, " ")).toDF("doc_id", "text")
    val target = Seq((9L, "a")).toDF("doc_id", "text")
    val out = Sampling.dsirWeights(raw, target, "doc_id", "text", 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 3L), s"got $out") // double space => empty tok dropped
  }

  test("dsirWeights is invariant to partitioning and target-only vocab") {
    val raw = (0L until 20L).map(i => (i, s"tok$i common")).toDF("doc_id", "text")
    val target = Seq((99L, "unseen common")).toDF("doc_id", "text")
    val a = Sampling.dsirWeights(raw, target, "doc_id", "text", 32)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(2)))
    val b = Sampling.dsirWeights(raw.repartition(7), target.repartition(3),
      "doc_id", "text", 32)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(a.sameElements(b))
  }

  test("gumbelTopK: k >= n keeps all rows; score matches the formula") {
    val df = Seq((1L, 2.0), (2L, -1.0)).toDF("doc_id", "logw")
    val out = Sampling.gumbelTopK(df, "doc_id", "logw", 5, salt = "s")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.size == 2)
    def h(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    def expect(id: Long, lw: Double): Double = {
      val u = (h(id) + 0.5) / 1000000.0
      BigDecimal(lw - math.log(-math.log(u)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(out(1L) - expect(1L, 2.0)) < 1e-9, s"got ${out(1L)}")
    assert(math.abs(out(2L) - expect(2L, -1.0)) < 1e-9, s"got ${out(2L)}")
  }

  test("gumbelTopK: overwhelming weight always wins; salt redraws") {
    val df = (0L until 50L).map(i => (i, if (i == 7L) 1000.0 else 0.0))
      .toDF("doc_id", "logw")
    (1 to 4).foreach { s =>
      val picked = Sampling.gumbelTopK(df, "doc_id", "logw", 5, salt = s"s$s")
        .collect().map(_.getLong(0)).toSet
      assert(picked.contains(7L), s"salt s$s missed the heavy doc")
    }
    val s1 = Sampling.gumbelTopK(df, "doc_id", "logw", 10, salt = "x")
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.gumbelTopK(df, "doc_id", "logw", 10, salt = "y")
      .collect().map(_.getLong(0)).toSet
    assert(s1 != s2, "independent salts drew identical samples")
  }

  test("stratifiedWeightedTopK: per-stratum cut, heavy weight wins " +
    "in its own stratum, non-positive weight is loud") {
    val df = ((0L until 30L).map(i =>
      (i, "en", if (i == 3L) 1.0e9 else 1.0)) ++
      (100L until 130L).map(i => (i, "fr", 1.0)))
      .toDF("doc_id", "lang", "w")
    val out = Sampling.stratifiedWeightedTopK(
      df, "lang", "doc_id", "w", k = 5, salt = "t")
    val kept = out.filter("kept = 1").collect()
      .groupBy(_.getString(1)).map { case (l, rs) =>
        l -> rs.map(_.getLong(0)).toSet }
    assert(kept("en").size == 5 && kept("fr").size == 5)
    assert(kept("en").contains(3L), "the 1e9-weight doc lost its stratum")
    // ranks are per-stratum dense 1..n
    val frRanks = out.filter("lang = 'fr'").collect()
      .map(_.getAs[Long]("samp_rank")).sorted.toSeq
    assert(frRanks == (1L to 30L).toSeq)
    val e = intercept[Exception] {
      Sampling.stratifiedWeightedTopK(
        Seq((1L, "en", 0.0)).toDF("doc_id", "lang", "w"),
        "lang", "doc_id", "w", k = 2).collect()
    }
    assert(e.getMessage.contains("non-positive weight"), e.getMessage)
  }

  test("groupKFold: a group's rows never straddle folds; folds are " +
    "salted-independent; k is validated") {
    val df = (0L until 200L).map(i => (i % 40L, i))
      .toDF("user_id", "event_id")
    val out = Sampling.groupKFold(df, "user_id", k = 5).collect()
    val byUser = out.groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(_.getAs[Long]("fold")).toSet }
    assert(byUser.values.forall(_.size == 1), "a user straddled folds")
    assert(out.map(_.getAs[Long]("fold")).toSet.subsetOf(
      (0L until 5L).toSet))
    val a = Sampling.groupKFold(df, "user_id", 5, salt = "a")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("fold")).toMap
    val b = Sampling.groupKFold(df, "user_id", 5, salt = "b")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("fold")).toMap
    assert(a != b, "independent salts produced identical folds")
    intercept[IllegalArgumentException] {
      Sampling.groupKFold(df, "user_id", 1)
    }
  }

  // ---- Similarity.hardNegatives / Sampling.temperatureShares/interleave ----

  test("hardNegatives never returns a same-label neighbor; ranks are dense") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), // query
      (1L, Array(0.99f, 0.1f), 0),  // same label: closest but excluded
      (2L, Array(0.9f, 0.3f), 1),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(0.8f, 0.5f), 2)).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vecs, "vec_id", "embedding", "label",
      col("vec_id") === 0, k = 2).orderBy("rank").collect()
    assert(out.forall(r => r.getAs[Int]("n_label") != r.getAs[Int]("q_label")))
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
    // hardest true negatives by cosine to (1,0): vec 2 then vec 4
    assert(out.map(_.getAs[Long]("nid")).toSeq == Seq(2L, 4L))
  }

  test("temperatureShares: alpha=1 is the natural mix; alpha<1 flattens") {
    val df = (0 until 90).map(i => (i.toLong, if (i < 80) "big" else "small"))
      .toDF("doc_id", "d")
    val nat = Sampling.temperatureShares(df, "d", 1.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(nat("big")._1 == nat("big")._2 && nat("small")._1 == nat("small")._2)
    val flat = Sampling.temperatureShares(df, "d", 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(flat("small") > nat("small")._2 && flat("big") < nat("big")._2)
    assert(math.abs(flat("small") + flat("big") - 1.0) < 1e-5)
  }

  test("interleave equals the single-window row_number reference") {
    // unequal domain sizes so late rounds lose domains
    val df = (0L until 23L).map(i => (i, s"d${i % 4}"))
      .filter { case (i, d) => !(d == "d3" && i > 11) } // d3 runs out early
      .toDF("doc_id", "dom")
    val out = Sampling.interleave(df, "doc_id", "dom")
    val got = out.orderBy("schedule_rank")
      .select("doc_id", "schedule_rank").as[(Long, Long)].collect()
    import org.apache.spark.sql.expressions.Window
    val ref = out.select(col("doc_id"),
        row_number().over(Window.orderBy(col("pos"), col("dom")))
          .cast("long").as("r"))
      .orderBy("r").as[(Long, Long)].collect()
    assert(got.map(_._1).sameElements(ref.map(_._1)))
    assert(got.map(_._2).toSeq == (1L to got.length).toSeq)
  }

  test("interleave enforces the domain cap loudly") {
    val df = (0L until 30L).map(i => (i, s"d$i")).toDF("doc_id", "dom")
    val e = intercept[IllegalArgumentException] {
      Sampling.interleave(df, "doc_id", "dom", maxDomains = 10)
    }
    assert(e.getMessage.contains("maxDomains"))
  }

  // ---- TextClean.extractContentLines / domainPolicyGate ----

  test("extractContentLines keeps prose, drops chrome/short/stop-free lines") {
    val stops = Seq("the", "a", "of", "to", "and", "in")
    val df = Seq((1L, Seq(
      "Home | Products | Contact",            // no stopwords -> drop
      "the quick brown fox jumps over the lazy dog today", // prose -> keep
      "OK",                                   // short -> drop
      "a second sentence with the right density of words", // prose -> keep
      "Copyright 2024 Example Corp All Rights Reserved"    // drop
    ).mkString("\n"))).toDF("doc_id", "text")
    val out = TextClean.extractContentLines(df, "text", stops,
      minChars = 20, stopNum = 1, stopDen = 20).collect()(0)
    assert(out.getAs[Long]("n_lines") == 5)
    assert(out.getAs[Long]("n_kept") == 2)
    val kept = out.getAs[String]("content_text").split("\n")
    assert(kept.length == 2 && kept(0).startsWith("the quick") &&
      kept(1).startsWith("a second"))
  }

  test("extractContentLines density boundary is exact: 1/20 at 1-in-20") {
    val stops = Seq("the")
    // exactly 20 tokens, 1 stopword: 20*1 >= 20*1 -> keep
    val at = (Seq("the") ++ (1 to 19).map(i => s"w$i")).mkString(" ")
    // 21 tokens, 1 stopword: 20*1 >= 21*1 is false -> drop
    val under = (Seq("the") ++ (1 to 20).map(i => s"w$i")).mkString(" ")
    val out = TextClean.extractContentLines(
      Seq((1L, s"$at\n$under")).toDF("doc_id", "text"), "text", stops,
      minChars = 1, stopNum = 1, stopDen = 20).collect()(0)
    assert(out.getAs[Long]("n_kept") == 1)
    assert(out.getAs[String]("content_text") == at)
  }

  test("domainPolicyGate blocks domains and caps crawl-order rank") {
    val df = (0L until 10L).map { i =>
      val d = if (i % 2 == 0) "good.org" else "spam.net"
      (i, s"https://www.$d/page/$i")
    }.toDF("doc_id", "url")
    val out = TextClean.domainPolicyGate(df, "doc_id", "url",
      blocked = Seq("spam.net"), maxPerDomain = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("domain"),
        r.getAs[Int]("is_blocked"), r.getAs[Long]("domain_rank"),
        r.getAs[Int]("is_kept"))).sortBy(_._1)
    assert(out.forall { case (i, d, b, _, _) =>
      d == (if (i % 2 == 0) "good.org" else "spam.net") &&
        b == (if (i % 2 == 0) 0 else 1) })
    // good.org docs 0,2,4,6,8: ranks 1..5, kept only first 3
    val good = out.filter(_._2 == "good.org")
    assert(good.map(_._4).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(good.map(_._5).toSeq == Seq(1, 1, 1, 0, 0))
    assert(out.filter(_._2 == "spam.net").forall(_._5 == 0))
  }

  // ---- TextStats.bigramLogProbAgainst / sentences; image dedup ----

  test("bigramLogProbAgainst matches the hand-computed held-out model") {
    val model = Seq((1L, "a b a b")).toDF("mid", "text") // c12: (a,b)=2 (b,a)=1; c1: a=2 b=1; V=2
    val target = Seq((7L, "a b"), (8L, "z z")).toDF("doc_id", "text")
    val out = TextStats.bigramLogProbAgainst(model, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val seen = math.log((2 + 0.5) / (2 + 0.5 * 2))     // p(b|a)
    val unseen = math.log((0 + 0.5) / (0 + 0.5 * 2))   // both counts floor
    assert(out(7L)._1 == 1L && math.abs(out(7L)._2 - seen) < 1e-12)
    assert(out(8L)._1 == 1L && math.abs(out(8L)._2 - unseen) < 1e-12)
    assert(out(7L)._2 > out(8L)._2, "in-model text must outscore unseen")
  }

  test("sentences splits on punctuation runs, trims tail, keeps order") {
    val df = Seq((1L, "First one. Second!!  Third thing? Tail.")).toDF("doc_id", "text")
    val out = TextStats.sentences(df, "doc_id", "text")
      .orderBy("sent_idx")
      .select("sent_idx", "sentence", "n_tokens").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0, "First one", 2L), (1, "Second", 1L),
      (2, "Third thing", 2L), (3, "Tail", 1L)))
  }

  test("image near-dup pairs: shared payloads pair at hamming 0, distinct don't") {
    val docs = Seq((0L, 5L), (1L, 6L), (2L, 5L)).toDF("doc_id", "seed")
    val specs = docs.select(col("seed")).distinct()
      .select(col("seed"), (col("seed") % 48 + 8).as("w"),
        (col("seed") % 37 + 8).as("h"))
    val hashed = Multimodal.aHashImagesBatched(
        Multimodal.encodeImagesBatched(specs, "seed", "w", "h"), "doc_id")
      .toDF().withColumnRenamed("doc_id", "seed")
    val fp = docs.join(hashed, "seed")
      .select(col("doc_id"),
        shiftleft(col("ahash_hi"), 32).bitwiseOR(col("ahash_lo")).as("simhash"))
    val pairs = TextDedup.simhashPairs(fp, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((0L, 2L, 0)))
  }

  test("splitLeakageAudit conserves pairs; grouped keys cannot cross") {
    val splits = Seq("train" -> 0.5, "test" -> 0.5)
    val pairs = (0L until 40L).map(i => (i, i + 100L)).toDF("a", "b")
    val out = Sampling.splitLeakageAudit(pairs, "a", "b", splits).collect()
    assert(out.map(_.getAs[Long]("n_pairs")).sum == 40L)
    out.foreach { r =>
      assert((r.getAs[Int]("is_cross") == 1) ==
        (r.getString(0) != r.getString(1)))
    }
    // row-level splits DO leak on this pair set (that's what the audit
    // is for) …
    assert(out.exists(_.getAs[Int]("is_cross") == 1))
    // … while pairs keyed by a shared group column cannot: both sides
    // hash the same key, so every pair lands on the diagonal (q173's
    // leakage-safety, stated through the audit)
    val grouped = (0L until 40L).map(i => (s"g${i % 7}", s"g${i % 7}"))
      .toDF("a", "b")
    val gOut = Sampling.splitLeakageAudit(grouped, "a", "b", splits).collect()
    assert(gOut.forall(_.getAs[Int]("is_cross") == 0))
    assert(gOut.map(_.getAs[Long]("n_pairs")).sum == 40L)
  }

  test("fixedSizeStratifiedSample: exact counts, nesting, partitioning-proof") {
    val df = (0L until 100L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "st")
    val out = Sampling.fixedSizeStratifiedSample(df, "doc_id", "st", 10)
    val counts = out.groupBy("st").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("s0" -> 10L, "s1" -> 10L, "s2" -> 10L))
    // a small stratum yields ALL its rows, ranks dense from 1
    val small = df.filter(col("doc_id") < 5)
    val allOf = Sampling.fixedSizeStratifiedSample(small, "doc_id", "st", 10)
    assert(allOf.count() == 5)
    assert(allOf.filter(col("st") === "s0")
      .orderBy("sample_rank").select("sample_rank")
      .as[Long].collect().toSeq == Seq(1L, 2L))
    // nesting: the 5-sample is exactly the first five ranks of the
    // 10-sample (hash-prefix order), and repartitioning changes nothing
    val ten = Sampling.fixedSizeStratifiedSample(df, "doc_id", "st", 10)
      .filter(col("sample_rank") <= 5).select("doc_id", "st").collect().toSet
    val five = Sampling.fixedSizeStratifiedSample(
      df.repartition(13), "doc_id", "st", 5)
      .select("doc_id", "st").collect().toSet
    assert(five == ten)
  }

  test("canonicalForDedup collapses case/space/normalization variants") {
    val c = TextClean.canonicalForDedup(col("s"))
    val out = Seq(
        "Hello   World café",       // precomposed, multi-space
        "hello world CAFE\u0301",   // decomposed, upper
        "  hello world café  ",     // padded
        "hello worlds café")        // genuinely different
      .toDF("s").select(c).as[String].collect()
    assert(out(0) == out(1) && out(1) == out(2))
    assert(out(0) == "hello world café")
    assert(out(3) != out(0))
  }

  // ---- TextStats.distinctNgramDiversity ----

  test("distinctNgramDiversity separates repetitive from diverse text") {
    val df = Seq(
      ("rep", "x x x x"),   // unigram: 4 total, 1 distinct
      ("div", "p q r")      // all grams distinct
    ).toDF("grp", "text")
    val out = TextStats.distinctNgramDiversity(df, "grp", "text", maxN = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    assert(out(("rep", 1)).getAs[Long]("n_total") == 4L)
    assert(out(("rep", 1)).getAs[Long]("n_distinct") == 1L)
    assert(out(("rep", 1)).getAs[Double]("distinct_ratio") == 0.25)
    assert(out(("rep", 2)).getAs[Long]("n_total") == 3L)
    assert(out(("rep", 2)).getAs[Long]("n_distinct") == 1L)
    assert(out(("div", 1)).getAs[Double]("distinct_ratio") == 1.0)
    assert(out(("div", 2)).getAs[Double]("distinct_ratio") == 1.0)
    // 'div' has one 3-gram; 'rep' has two (identical)
    assert(out(("div", 3)).getAs[Long]("n_total") == 1L)
    assert(out(("rep", 3)).getAs[Long]("n_distinct") == 1L)
  }

  test("distinctNgramDiversity: short groups report 0 grams, ratio 0") {
    val df = Seq(("s", "a b"), ("s", "  ")).toDF("grp", "text")
    val out = TextStats.distinctNgramDiversity(df, "grp", "text", maxN = 3)
      .collect().map(r => r.getInt(1) -> r).toMap
    assert(out(3).getAs[Long]("n_total") == 0L)
    assert(out(3).getAs[Long]("n_distinct") == 0L)
    assert(out(3).getAs[Double]("distinct_ratio") == 0.0)
    // grams pool across the group's documents: 2 unigrams from 'a b'
    assert(out(1).getAs[Long]("n_total") == 2L)
  }

  // ---- Similarity.mmdLinear ----

  test("mmdLinear: identical samples score 0; a shifted sample doesn't") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => (((i * 7 + d * 3) % 11).toFloat / 11f)))
    }
    val x = vecs.toDF("vec_id", "embedding")
    // Y = X exactly → every h-term cancels pairwise
    val same = Similarity.mmdLinear(x, x, "vec_id", "embedding")
      .collect().head
    assert(same.getAs[Long]("n_x") == 40L)
    assert(same.getAs[Long]("n_pairs") == 20L)
    assert(same.getAs[Double]("mmd2") == 0.0)
    // Y = X + constant shift in every dimension → mmd2 must move
    val y = vecs.map { case (i, v) => (i, v.map(_ + 0.4f)) }
      .toDF("vec_id", "embedding")
    val shifted = Similarity.mmdLinear(x, y, "vec_id", "embedding")
      .collect().head
    assert(math.abs(shifted.getAs[Double]("mmd2")) > 0.01)
  }

  // ---- TextClean.creditCardAudit ----

  test("creditCardAudit verifies Luhn, counts shape hits separately") {
    val docs = Seq(
      (1L, "pay with 4242 4242 4242 4242 thanks"),   // valid, spaced
      (2L, "ref 1234-5678-9012-3456 attached"),      // shape hit, invalid
      (3L, "call 555 0100 soon"),                    // too short: no hit
      (4L, "a 378282246310005 and 4242424242424241"),// valid + invalid
      (5L, "")).toDF("doc_id", "text")
    val out = TextClean.creditCardAudit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_luhn_valid"),
          r.getAs[Int]("has_card")))).toMap
    assert(out(1L) == ((1L, 1L, 1)))
    assert(out(2L) == ((1L, 0L, 0)))
    assert(out(3L) == ((0L, 0L, 0)))
    assert(out(4L) == ((2L, 1L, 1)))
    assert(out(5L) == ((0L, 0L, 0)))
  }

  test("creditCardAudit: over-long digit runs fail the length gate") {
    // 25 digits: candidate regex matches but the stripped length > 19
    val docs = Seq((1L, "id 1111111111111111111111111 x"))
      .toDF("doc_id", "text")
    val r = TextClean.creditCardAudit(docs, "doc_id", "text")
      .collect().head
    assert(r.getAs[Long]("n_candidates") == 0L)
  }

  // ---- TextStats.vocabOverlap ----

  test("vocabOverlap: hand-computed pairwise Jaccard, absent when 0") {
    val docs = Seq(
      ("en", "the cat sat"), ("en", "the dog"),
      ("de", "der cat hund"),
      ("fr", "zzz www")).toDF("lang", "text")
    // en vocab {the,cat,sat,dog}=4; de {der,cat,hund}=3; common {cat}
    val out = TextStats.vocabOverlap(docs, "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == Set(("de", "en"))) // fr shares nothing → absent
    val r = out(("de", "en"))
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("n_common") == 1L)
    assert(r.getAs[Double]("jaccard") == 1.0 / 6.0)
  }

  // ---- Sampling.percentileGate ----

  test("percentileGate keeps the top fraction per group, min 1") {
    val df = ((1L to 10L).map(i => ("big", i, i * 10L)) :+
      (("tiny", 99L, 5L))).toDF("grp", "id", "score")
    val out = Sampling.percentileGate(df, "grp", "id", "score", 0.3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    // big: floor(0.3·10)=3 → scores 100,90,80 (ids 10,9,8) kept
    val kept = out.toSeq.collect { case ((g, id), r)
      if r.getAs[Int]("kept") == 1 => (g, id) }.toSet
    assert(kept == Set(("big", 10L), ("big", 9L), ("big", 8L),
      ("tiny", 99L))) // tiny: floor(0.3·1)=0 → min-1 floor keeps its one
    assert(out(("big", 10L)).getAs[Long]("grp_rank") == 1L)
    assert(out(("big", 1L)).getAs[Long]("n_group") == 10L)
  }

  test("percentileGate: ties break by id ascending, deterministically") {
    val df = Seq(("g", 1L, 7L), ("g", 2L, 7L), ("g", 3L, 7L), ("g", 4L, 1L))
      .toDF("grp", "id", "score")
    val out = Sampling.percentileGate(df, "grp", "id", "score", 0.5)
      .collect().map(r => r.getLong(1) -> r.getAs[Int]("kept")).toMap
    // floor(0.5·4)=2: the two LOWEST ids among the tied 7s win
    assert(out == Map(1L -> 1, 2L -> 1, 3L -> 0, 4L -> 0))
  }

  // ---- TextStats.collocations ----

  test("collocations: planted phrase tops the list with positive PMI") {
    // 'hong kong' always adjacent (6×); filler words never repeat a
    // pair 6 times
    val docs = (1L to 6L).map(i =>
      (i, s"visit hong kong t$i again w$i")).toDF("doc_id", "text")
    val out = TextStats.collocations(docs, "doc_id", "text",
      topK = 5, minCount = 2).collect()
    val top = out.head
    assert(top.getAs[String]("w1") == "hong" &&
      top.getAs[String]("w2") == "kong")
    assert(top.getAs[Long]("n_pair") == 6L)
    assert(top.getAs[Long]("n_w1") == 6L && top.getAs[Long]("n_w2") == 6L)
    // PMI = ln 6 + 2 ln 36 − ln 30 − ln 6 − ln 6 (Nt=36 tokens, Nb=30)
    val expect = BigDecimal(math.log(6) + 2 * math.log(36) -
        math.log(30) - math.log(6) - math.log(6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getAs[Double]("pmi") == expect)
    // 'visit hong' also occurs 6x — present; pairs under minCount gone
    assert(out.forall(_.getAs[Long]("n_pair") >= 2L))
  }

  // ---- TextStats.templateScore ----

  test("templateScore: templated slice shows high dup_frac, low entropy") {
    val docs = Seq(
      ("tpl", "Buy now! Buy now! Call us!"),
      ("tpl", "Buy now! Call us!"),
      ("prose", "The sky darkened. Rain began. Streets emptied."))
      .toDF("source", "text")
    val out = TextStats.templateScore(docs, "source", "text", "[.!?]+")
      .collect().map(r => r.getString(0) -> r).toMap
    val tpl = out("tpl")
    // units: 'Buy now' ×3, 'Call us' ×2 → n=5, distinct=2
    assert(tpl.getAs[Long]("n_units") == 5L)
    assert(tpl.getAs[Long]("n_distinct") == 2L)
    assert(tpl.getAs[Double]("dup_frac") == 0.6)
    val prose = out("prose")
    assert(prose.getAs[Long]("n_units") == 3L)
    assert(prose.getAs[Double]("dup_frac") == 0.0)
    assert(prose.getAs[Double]("unit_entropy") >
      tpl.getAs[Double]("unit_entropy"))
  }

  // ---- TextStats.lexicalRichness ----

  test("lexicalRichness: hand-computed spectrum; repetition raises K") {
    val docs = Seq(
      ("rep", "x x x x y"),      // spectrum: V(4)=1, V(1)=1; N=5, V=2
      ("div", "p q r s t")       // all hapax: N=5, V=5
    ).toDF("grp", "text")
    val out = TextStats.lexicalRichness(docs, "grp", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val rep = out("rep")
    assert(rep.getAs[Long]("n_tokens") == 5L)
    assert(rep.getAs[Long]("n_types") == 2L)
    assert(rep.getAs[Long]("n_hapax") == 1L)
    assert(rep.getAs[Double]("ttr") == 0.4)
    assert(rep.getAs[Double]("hapax_ratio") == 0.5)
    // K = 10^4·(Σm²V(m) − N)/N² = 10^4·(16+1−5)/25 = 4800
    assert(rep.getAs[Double]("yule_k") == 4800.0)
    // D = Σm(m−1)V(m)/(N(N−1)) = 12/20 = 0.6
    assert(rep.getAs[Double]("simpson_d") == 0.6)
    val div = out("div")
    assert(div.getAs[Double]("yule_k") == 0.0)
    assert(div.getAs[Double]("simpson_d") == 0.0)
    assert(div.getAs[Double]("ttr") == 1.0)
  }

  // ---- TextStats.fightinWords ----

  test("fightinWords: the slice-exclusive term tops its side") {
    // 'alpha' only in A (20x), 'beta' only in B (20x), 'shared'
    // everywhere — shared must score near 0, alpha positive z, beta
    // negative z, |z_alpha| among the top
    val docs = (
      (1 to 20).map(i => (true, "alpha shared")) ++
      (1 to 20).map(i => (false, "beta shared"))).toDF("is_a", "text")
    val out = TextStats.fightinWords(docs, "is_a", "text",
        alpha0 = 10.0, topK = 3, minCount = 5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("alpha").getAs[Double]("z") > 0.5)
    assert(out("beta").getAs[Double]("z") < -0.5)
    assert(math.abs(out("shared").getAs[Double]("z")) <
      out("alpha").getAs[Double]("z"))
    assert(out("alpha").getAs[Long]("n_a") == 20L)
    assert(out("alpha").getAs[Long]("n_b") == 0L)
  }

  // ---- Retrieval.evalTokenF1 ----

  test("evalTokenF1: SQuAD normalization, partial credit, edge cases") {
    val rows = Seq(
      (1L, "The Eiffel Tower!", "eiffel tower"),        // EM after norm
      (2L, "in the city of Paris", "Paris France"),     // partial
      (3L, "no answer", "completely different thing"),  // zero overlap
      (4L, "a the an", "the a an"),                     // both empty → 1
      (5L, "", "something here")                        // pred empty → 0
    ).toDF("id", "pred", "gold")
    val out = Retrieval.evalTokenF1(rows, "id", "pred", "gold")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("exact_match") == 1)
    assert(out(1L).getAs[Double]("f1") == 1.0)
    // pred {in,city,of,paris} (4), gold {paris,france} (2), common 1:
    // P=1/4, R=1/2, F1 = 2·(1/8)/(3/4) = 1/3
    assert(out(2L).getAs[Long]("n_common") == 1L)
    assert(math.abs(out(2L).getAs[Double]("f1") - 1.0 / 3) < 1e-6)
    assert(out(3L).getAs[Double]("f1") == 0.0)
    assert(out(4L).getAs[Double]("f1") == 1.0) // article-only: both empty
    assert(out(4L).getAs[Int]("exact_match") == 1)
    assert(out(5L).getAs[Double]("f1") == 0.0)
  }

  // ---- Retrieval.rankBiasedOverlap ----

  test("rankBiasedOverlap: identical rankings, disjoint, hand case") {
    def run(docs: Long*) = docs.zipWithIndex
      .map { case (d, i) => (d, (i + 1).toLong) }.toDF("doc", "rank")
    // identical top-3: overlap d/d at every depth → RBO = (1−p)Σp^{d−1}
    val same = Retrieval.rankBiasedOverlap(
      run(7L, 8L, 9L), run(7L, 8L, 9L), "doc", "rank", k = 3)
      .collect().head
    assert(same.getAs[Long]("n_common") == 3L)
    val expectSame = BigDecimal(0.5 * (1.0 + 0.5 + 0.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(same.getAs[Double]("rbo") == expectSame)
    // disjoint → 0
    val disj = Retrieval.rankBiasedOverlap(
      run(1L, 2L), run(3L, 4L), "doc", "rank", k = 2).collect().head
    assert(disj.getAs[Long]("n_common") == 0L)
    assert(disj.getAs[Double]("rbo") == 0.0)
    // hand case: A = [1,2], B = [2,1] — overlap 0 at d=1, 2 at d=2:
    // RBO = 0.5·(1·0 + 0.5·(2/2)) = 0.25
    val swap = Retrieval.rankBiasedOverlap(
      run(1L, 2L), run(2L, 1L), "doc", "rank", k = 2).collect().head
    assert(swap.getAs[Double]("rbo") == 0.25)
  }

  // ---- Similarity.clusterJsDivergence ----

  test("clusterJsDivergence: JS is symmetric and probabilities close") {
    // distinct lattice vectors (duplicate vectors could legitimately
    // trip the portable empty-cluster guard); swapping ref and cur
    // must give the IDENTICAL js (same union → same codebook; the
    // term is symmetric in p and q)
    val mk = (lo: Long, hi: Long) => (lo until hi).map(i =>
      (i, Array.tabulate(6)(d => (i * 7 + d).toFloat / 300f)))
    val ref = mk(0L, 20L).toDF("vec_id", "embedding")
    val cur = mk(20L, 40L).toDF("vec_id", "embedding")
    val out = Similarity.clusterJsDivergence(ref, cur, "vec_id",
      "embedding").collect()
    assert(out.nonEmpty)
    val js = out.head.getAs[Double]("js")
    assert(js >= 0.0)
    // Laplace-smoothed histograms each sum to 1
    val pSum = out.map(_.getAs[Double]("p_ref")).sum
    assert(math.abs(pSum - 1.0) < 1e-4, s"p_ref summed to $pSum")
    val swapped = Similarity.clusterJsDivergence(cur, ref, "vec_id",
      "embedding").collect()
    assert(swapped.head.getAs[Double]("js") == js)
  }

  test("clusterJsDivergence: a shifted population moves the needle") {
    // small codebook: a 16-cluster fit on 48 near-collinear points
    // would legitimately empty clusters and trip the portable guard
    val mk = (off: Long, shift: Float) => (0L until 24L).map(i =>
      (i + off, Array.tabulate(6)(d =>
        shift + ((i * 5 + d) % 13).toFloat / 13f)))
    val ref = mk(0L, 0f).toDF("vec_id", "embedding")
    val cur = mk(100L, 0.9f).toDF("vec_id", "embedding")
    val out = Similarity.clusterJsDivergence(ref, cur, "vec_id",
      "embedding", nlist = 2, iters = 2).collect()
    val js = out.head.getAs[Double]("js")
    assert(js > 0.1, s"expected clear divergence, got $js")
  }

  test("mmdLinear drops the length-mismatch tail and odd couple") {
    val mk = (n: Int, off: Float) => (0L until n.toLong).map(i =>
      (i, Array.tabulate(4)(d => off + i.toFloat / n))).toDF(
      "vec_id", "embedding")
    val out = Similarity.mmdLinear(mk(9, 0f), mk(7, 0.1f),
      "vec_id", "embedding").collect().head
    assert(out.getAs[Long]("n_x") == 9L)
    assert(out.getAs[Long]("n_y") == 7L)
    // min(9,7)=7 ranked pairs → 3 couples
    assert(out.getAs[Long]("n_pairs") == 3L)
  }

  test("centroidSilhouette: separated clusters near 1, merged at 0, " +
    "single label raises") {
    import spark.implicits._
    val a = (1L to 8L).map(i =>
      (i, 0, Array(1.0f + (i % 2) * 0.01f, 0.0f)))
    val b = (1L to 8L).map(i =>
      (100L + i, 1, Array(-1.0f - (i % 2) * 0.01f, 0.0f)))
    val sep = (a ++ b).toDF("vec_id", "label", "embedding")
    val out = Similarity.centroidSilhouette(
      sep, "vec_id", "label", "embedding")
      .collect().map(r => r.getAs[Long]("label") -> r).toMap
    assert(out(0L).getAs[Long]("n_points") == 8L)
    assert(out(0L).getAs[Double]("mean_silhouette") > 0.9)
    assert(out(1L).getAs[Double]("mean_silhouette") > 0.9)
    // two labels over the IDENTICAL point cloud: a = b → s = 0 exactly
    val c1 = (1L to 6L).map(i => (i, 0, Array(i.toFloat, 1.0f)))
    val c2 = (1L to 6L).map(i => (50L + i, 1, Array(i.toFloat, 1.0f)))
    val merged = (c1 ++ c2).toDF("vec_id", "label", "embedding")
    Similarity.centroidSilhouette(merged, "vec_id", "label", "embedding")
      .collect().foreach { r =>
        assert(r.getAs[Double]("mean_silhouette") == 0.0)
      }
    val solo = c1.toDF("vec_id", "label", "embedding")
    assert(intercept[Exception] {
      Similarity.centroidSilhouette(solo, "vec_id", "label", "embedding")
        .collect()
    }.getMessage != null)
  }

  test("knnShapley: hand case, equal-share case, efficiency law") {
    import spark.implicits._
    // K=1, one test point at origin with label 0; train: near match
    // (label 0), far miss (label 1) → s_near = 1, s_far = 0
    val train = Seq((1L, 0, Array(0.1f, 0f)), (2L, 1, Array(5f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val test = Seq((100L, 0, Array(0f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val out = Valuation.knnShapley(train, test, "vec_id", "embedding",
      "label", k = 1).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("shapley") == 1.0)
    assert(out(2L).getAs[Double]("shapley") == 0.0)
    // all train points share the test label → every s_i = 1/N exactly
    val tr4 = (1L to 4L).map(i => (i, 0, Array(i.toFloat, 0f)))
      .toDF("vec_id", "label", "embedding")
    val o4 = Valuation.knnShapley(tr4, test, "vec_id", "embedding",
      "label", k = 2).collect()
    assert(o4.forall(_.getAs[Double]("shapley") == 0.25))
    // efficiency: Σ_i s_i ≈ v(full) = mean(m over top-K)
    val rnd = new scala.util.Random(5)
    val trBig = (1L to 40L).map(i =>
      (i, rnd.nextInt(3), Array(rnd.nextFloat(), rnd.nextFloat())))
      .toDF("vec_id", "label", "embedding")
    val teBig = Seq((200L, 1, Array(0.5f, 0.5f)))
      .toDF("vec_id", "label", "embedding")
    val k = 5
    val sv = Valuation.knnShapley(trBig, teBig, "vec_id", "embedding",
      "label", k = k)
    val total = sv.agg(sum(col("shapley"))).collect().head.getDouble(0)
    // compute v(full) by brute force on the driver
    val te = (0.5f, 0.5f)
    val ranked = (1L to 40L).map { i =>
      val r = trBig.filter(col("vec_id") === i).collect().head
      val e = r.getAs[scala.collection.Seq[Float]]("embedding")
      val q = e.map(v => math.floor(v * 1000.0).toLong)
      val tq = Seq(math.floor(te._1 * 1000.0).toLong,
        math.floor(te._2 * 1000.0).toLong)
      val d2 = q.zip(tq).map { case (a, b) => (a - b) * (a - b) }.sum
      (d2, i, r.getAs[Int]("label"))
    }.sortBy(t => (t._1, t._2))
    val vFull = ranked.take(k).count(_._3 == 1).toDouble / k
    assert(math.abs(total - vFull) < 1e-3,
      s"efficiency: sum $total vs v(full) $vFull")
  }

  test("knnShapley raises on an oversized test set") {
    import spark.implicits._
    val tr = Seq((1L, 0, Array(0f))).toDF("vec_id", "label", "embedding")
    val te = (1L to 5L).map(i => (100L + i, 0, Array(0f)))
      .toDF("vec_id", "label", "embedding")
    assert(intercept[Exception] {
      Valuation.knnShapley(tr, te, "vec_id", "embedding", "label",
        maxTest = 3).collect()
    }.getMessage != null)
  }

  test("burrowsDelta: two mirrored authors sit at the ±1σ poles") {
    import spark.implicits._
    // a: x-heavy, b: y-heavy → every used word has z = ±1 (A = 2),
    // so delta = mean |z_a − z_b| = 2
    val df = Seq((1L, "x x y", "a"), (2L, "x y y", "b"))
      .toDF("doc_id", "text", "src")
    val out = TextStats.burrowsDelta(df, "doc_id", "text", "src",
      topM = 2).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("author_a") == "a")
    assert(out.head.getAs[Long]("n_words") == 2L)
    assert(out.head.getAs[Double]("delta") == 2.0)
  }

  test("burrowsDelta: identical slices score 0; constant words drop") {
    import spark.implicits._
    val df = Seq((1L, "x y", "a"), (2L, "x y", "b"), (3L, "z z", "c"))
      .toDF("doc_id", "text", "src")
    val out = TextStats.burrowsDelta(df, "doc_id", "text", "src",
      topM = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("a", "b")).getAs[Double]("delta") == 0.0)
    assert(out(("a", "c")).getAs[Double]("delta") ==
      out(("b", "c")).getAs[Double]("delta"))
    assert(out(("a", "c")).getAs[Double]("delta") > 0.0)
    // no word is constant across slices here, all 3 used
    assert(out(("a", "c")).getAs[Long]("n_words") == 3L)
  }

  test("burrowsDelta raises on a single-slice corpus") {
    import spark.implicits._
    val df = Seq((1L, "x y", "only")).toDF("doc_id", "text", "src")
    assert(intercept[Exception] {
      TextStats.burrowsDelta(df, "doc_id", "text", "src").collect()
    }.getMessage != null)
  }

  test("readability: hand-counted words/sentences/syllables and scores") {
    import spark.implicits._
    // "The cat sat. It ran away!" → 6 words, 2 sentences,
    // syllables: the(1) cat(1) sat.(1) it(1) ran(1) away!(2) = 7,
    // complex (≥3 syl): none
    val df = Seq((1L, "The cat sat. It ran away!")).toDF("doc_id", "text")
    val r = TextStats.readability(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_syllables") == 7L)
    assert(r.getAs[Long]("n_complex") == 0L)
    def d6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("flesch_ease") ==
      d6(206.835 - 1.015 * 3.0 - 84.6 * 7.0 / 6.0))
    assert(r.getAs[Double]("fk_grade") ==
      d6(0.39 * 3.0 + 11.8 * 7.0 / 6.0 - 15.59))
    assert(r.getAs[Double]("fog_index") == d6(0.4 * 3.0))
  }

  test("readability: complex words count into fog; empty text is NULL") {
    import spark.implicits._
    // "incomprehensible" → vowel runs i-o-e-e-i-e = 6 → complex
    val df = Seq((1L, "incomprehensible"), (2L, ""), (3L, "12 34"))
      .toDF("doc_id", "text")
    val out = TextStats.readability(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_complex") == 1L)
    assert(out(1L).getAs[Long]("n_syllables") == 6L)
    assert(out(2L).getAs[Long]("n_words") == 0L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("flesch_ease")))
    assert(out(2L).getAs[Long]("n_sentences") == 1L) // floor at 1
    // no-vowel "words" still count 1 syllable each
    assert(out(3L).getAs[Long]("n_syllables") == 2L)
    assert(out(3L).getAs[Long]("n_words") == 2L)
  }

  // ---- TextStats.mtld ----

  test("mtld: hand-walked factor counts on repeat/alternating streams") {
    val df = Seq(
      // "a a a a": factor completes every 2nd token (25·1 < 18·2) →
      // f = 2, stream ends ON a boundary → MTLD = 4/2 = 2.0
      (1L, "a a a a"),
      // alternating 10 tokens: factors at t3/t6/t9 → f = 3, trailing
      // segment (1 token, 1 type) → 7·1·10/(7·1·3 + 0) = 70/21
      (2L, "a b a b a b a b a b"),
      // all unique: TTR never drops, no partial → NULL
      (3L, "a b c d")
    ).toDF("doc_id", "text")
    val out = TextStats.mtld(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("mtld") == 2.0)
    assert(out(2L).getAs[Double]("mtld_fwd") == 3.333333)
    assert(out(2L).getAs[Double]("mtld_bwd") == 3.333333)
    assert(out(2L).getAs[Double]("mtld") == 3.333333)
    assert(out(3L).isNullAt(out(3L).fieldIndex("mtld")))
  }

  test("mtld: repetitive text scores far below diverse text") {
    val rep = ("spam " * 100).trim
    val div = (1 to 100).map(i => s"w$i w${i % 7}").mkString(" ")
    val df = Seq((1L, rep), (2L, div)).toDF("doc_id", "text")
    val out = TextStats.mtld(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("mtld")).toMap
    assert(out(1L) < 3.0, s"repetitive: ${out(1L)}")
    assert(out(2L) > 10.0, s"diverse: ${out(2L)}")
  }

  // ---- TextStats.dpDispersion ----

  test("dpDispersion: proportional tokens score 0, concentrated 0.5") {
    // parts X and Y each hold 4 tokens; "w" splits 2/2 (v = s
    // everywhere → DP 0); "z" sits only in X (half the corpus → 0.5)
    val df = Seq(("X", "w w z z"), ("Y", "w w q q"))
      .toDF("source", "text")
    val out = TextStats.dpDispersion(df, "text", "source", minCount = 1L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Double]("dp"))).toMap
    assert(out("w") == ((4L, 0.0)))
    assert(out("z") == ((2L, 0.5)))
    assert(out("q") == ((2L, 0.5)))
  }

  // ---- TextStats.g2Keyness ----

  test("g2Keyness: hand G-squared with exact-integer direction") {
    def d6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // slice A = "x x x y" (4 tokens), B = "y y y z" (4 tokens)
    val df = Seq(("en", "x x x y"), ("de", "y y y z"))
      .toDF("lang", "text")
    val out = TextStats.g2Keyness(df, "text", col("lang") === "en",
      minCount = 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("g2"), r.getAs[Int]("direction")))).toMap
    // x: a=3, b=0, eA = 1.5 → G² = 2·d6(3·ln 2) = 4.158884, dir +1
    assert(out("x") == ((d6(2.0 * d6(3 * math.log(2.0))), 1)))
    // y: a=1, b=3, eA = eB = 2 → terms ln(.5), 3·ln(1.5), dir −1
    val gy = d6(2.0 * (d6(math.log(0.5)) + d6(3 * math.log(1.5))))
    assert(out("y") == ((gy, -1)))
    // z: a=0, b=1 → only the B term, dir −1
    assert(out("z")._2 == -1)
  }

  // ---- TextStats.fanoFactor ----

  test("fanoFactor: bursty token scores N·var/mean, uniform scores 0") {
    // "a" piles 4 occurrences into one of 4 docs: S = 4, Q2 = 16 →
    // F = 4·(4·16 − 16)/(3·4) = 16; "b" appears once per doc → var 0
    val df = Seq((1L, "a a a a b"), (2L, "b"), (3L, "b"), (4L, "b"))
      .toDF("doc_id", "text")
    val out = TextStats.fanoFactor(df, "doc_id", "text", minCount = 4L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Double]("fano")))).toMap
    assert(out("a") == ((4L, 1L, 16.0)))
    assert(out("b") == ((4L, 4L, 0.0)))
  }

  test("dpDispersion: minCount prunes the hapax tail") {
    val df = Seq(("X", "a a a rare"), ("Y", "a a a a"))
      .toDF("source", "text")
    val toks = TextStats.dpDispersion(df, "text", "source", minCount = 2L)
      .collect().map(_.getString(0)).toSet
    assert(toks == Set("a"))
  }

  // ---- TextStats.skipgramPpmi ----

  test("skipgramPpmi: hand counts on 'x y x y'; negatives clamp to " +
    "0; ties order by (center, context); validation is loud") {
    // fwd pairs (w=2): (x,y)x2 (x,x) (y,x) (y,y); directed doubles →
    // c(x,y)=c(y,x)=3, c(x,x)=c(y,y)=2, T=10, every marginal 5
    // ppmi(x,y)=ln(30/25)=d6(0.182322); ppmi(x,x)=ln(0.8)<0 → 0
    val df = Seq((1L, "x y x y")).toDF("doc_id", "text")
    val out = TextStats.skipgramPpmi(df, "doc_id", "text",
      window = 2, minCount = 1L, topK = 10).collect()
    assert(out.length == 4)
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getAs[Double]("ppmi")))).toMap
    assert(m(("x", "y")) == ((3L, 0.182322)))
    assert(m(("y", "x")) == ((3L, 0.182322)))
    assert(m(("x", "x")) == ((2L, 0.0)))
    assert(m(("y", "y")) == ((2L, 0.0)))
    // the tie at 0.182322 orders (x,y) before (y,x)
    assert((out(0).getString(0), out(0).getString(1)) == (("x", "y")))
    intercept[IllegalArgumentException] {
      TextStats.skipgramPpmi(df, "doc_id", "text", window = 0)
    }
  }

  // ---- TextStats.lz78Complexity ----

  test("lz78Complexity: hand-parsed phrase counts; repetitive text " +
    "parses shorter than diverse text") {
    // "aaaaaa" → a | aa | aaa → 3 phrases (trailing exact phrase
    // "aaa" completes the parse); "abcdef" → 6 one-char phrases;
    // "ababab" → a | b | ab | aba? no: a|b|ab|ab→grows "ab","aba"?
    // parse: a, b, ab, aba? chars: a b a b a b →
    //   a(new) b(new) a(seen)→ab(new) a(seen)→ab(seen)→trailing "ab"
    //   = 3 + trailing 1 = 4
    val df = Seq((1L, "aaaaaa"), (2L, "abcdef"), (3L, "ababab"),
      (4L, "")).toDF("doc_id", "text")
    val out = TextStats.lz78Complexity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Double]("lz_ratio"))))
      .toMap
    assert(out(1L) == ((6L, 3L, 0.5)))
    assert(out(2L) == ((6L, 6L, 1.0)))
    assert(out(3L) == ((6L, 4L, 0.666667)))
    assert(!out.contains(4L)) // empty doc omitted
    val e = intercept[Exception] {
      TextStats.lz78Complexity(
        Seq((1L, "x" * 50)).toDF("doc_id", "text"),
        "doc_id", "text", maxChars = 10).collect()
    }
    assert(e.getMessage.contains("maxChars"), e.getMessage)
  }

  test("negSamplingTable: 16^(3/4) = 8 exactly via double sqrt; " +
    "minCount prunes; count past maxCount is loud") {
    val df = Seq((1L, ("a " * 16).trim + " b")).toDF("doc_id", "text")
    val out = TextStats.negSamplingTable(df, "text", minCount = 1L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n") == 16L)
    assert(out("a").getAs[Double]("weight") == 8.0)
    assert(out("b").getAs[Double]("weight") == 1.0)
    assert(math.abs(out("a").getAs[Double]("p_ns") - 0.888889) < 1e-9)
    assert(math.abs(out("b").getAs[Double]("p_ns") - 0.111111) < 1e-9)
    val pruned = TextStats.negSamplingTable(df, "text", minCount = 2L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(pruned.keySet == Set("a"))
    assert(pruned("a").getAs[Double]("p_ns") == 1.0)
    val loud = intercept[Exception] {
      TextStats.negSamplingTable(df, "text", minCount = 1L,
        maxCount = 10L).collect()
    }
    assert(loud.getMessage.contains("maxCount"), loud.getMessage)
  }

  test("brayCurtis: hand profile distance; fully-disjoint slice " +
    "pairs never materialize (BC = 1 implicitly)") {
    // s1 {a:2,b:1} vs s2 {a:1,b:2}: shared min = 2 → 1 − 4/6
    val df = Seq((1L, "s1", "a a b"), (2L, "s2", "a b b"),
      (3L, "s3", "c")).toDF("doc_id", "source", "text")
    val out = TextStats.brayCurtis(df, "source", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == Set(("s1", "s2")))
    val r = out(("s1", "s2"))
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("shared_min") == 2L)
    assert(math.abs(r.getAs[Double]("bray_curtis") - 0.333333) < 1e-9)
    // identical profiles → 0
    val same = Seq((1L, "x", "a b"), (2L, "y", "a b"))
      .toDF("doc_id", "source", "text")
    val rs = TextStats.brayCurtis(same, "source", "text")
      .collect().head
    assert(rs.getAs[Double]("bray_curtis") == 0.0)
  }
}
