package graft.ops

import graft.SparkSpec

/** k-core decomposition (Graph.kCore, q313) and Adamic-Adar link
  * prediction (Graph.adamicAdar, q314).
  */
class GraphCoreSpec extends SparkSpec {
  import spark.implicits._

  // triangle {a,b,c} + pendant d-a + path d-e: the 2-core is exactly
  // the triangle
  private val triPlusTail = Seq(
    ("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "e"))

  test("kCore peels pendants: the 2-core of a triangle+tail is the triangle") {
    val out = Graph.kCore(triPlusTail.toDF("s", "d"), "s", "d", k = 2)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("core_degree"))
      .toMap
    assert(out == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("kCore cascade: removing one layer can strand the next") {
    // path a-b-c-d: 2-core is empty (peel cascades end to end)
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("s", "d")
    assert(Graph.kCore(path, "s", "d", k = 2).collect().isEmpty)
    // but the 1-core keeps everything
    assert(Graph.kCore(path, "s", "d", k = 1).count() == 4L)
  }

  test("kCore ignores self-loops, duplicates and edge direction") {
    val messy = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "c"),
      ("c", "a"), ("a", "b")).toDF("s", "d")
    val out = Graph.kCore(messy, "s", "d", k = 2)
      .collect().map(_.getString(0)).toSet
    assert(out == Set("a", "b", "c"))
  }

  test("kCore core_degree is the WITHIN-core degree, not the raw degree") {
    // a has raw degree 3 (b, c, pendant d) but core degree 2
    val out = Graph.kCore(triPlusTail.toDF("s", "d"), "s", "d", k = 2)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("core_degree"))
      .toMap
    assert(out("a") == 2L)
  }

  test("kCore maxRounds guards an unconverged peel loudly") {
    // a 12-node path needs ~6 cascade rounds at k=2 (to empty);
    // maxRounds=2 must throw, not return a half-peeled set
    val longPath = (0 until 12).sliding(2)
      .map(w => (s"n${w.head}", s"n${w.last}")).toSeq.toDF("s", "d")
    val e = intercept[IllegalStateException] {
      Graph.kCore(longPath, "s", "d", k = 2, maxRounds = 2).collect()
    }
    assert(e.getMessage.contains("maxRounds"))
  }

  test("adamicAdar scores the textbook common-neighbor case") {
    // u and v share neighbors w1 (deg 2) and w2 (deg 3):
    // score = 1/ln(2) + 1/ln(3)
    val edges = Seq(("u", "w1"), ("v", "w1"), ("u", "w2"), ("v", "w2"),
      ("x", "w2")).toDF("s", "d")
    val out = Graph.adamicAdar(edges, "s", "d", topK = 10).collect()
    val row = out.find(r => r.getString(0) == "u" && r.getString(1) == "v")
      .getOrElse(fail("missing (u,v) candidate"))
    assert(row.getAs[Long]("n_common") == 2L)
    def d6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = d6(d6(1.0 / math.log(2.0)) + d6(1.0 / math.log(3.0)))
    assert(row.getAs[Double]("aa_score") == expected)
  }

  test("adamicAdar excludes already-adjacent pairs") {
    // triangle: every pair adjacent -> no candidates at all
    val tri = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "d")
    assert(Graph.adamicAdar(tri, "s", "d").collect().isEmpty)
  }

  test("adamicAdar maxNeighborDegree prunes hub intermediates") {
    // star: hub h connects a,b,c,d — all pairs share only the hub
    val star = Seq(("h", "a"), ("h", "b"), ("h", "c"), ("h", "d"))
      .toDF("s", "d")
    assert(Graph.adamicAdar(star, "s", "d").count() == 6L)
    // cap below the hub degree: no intermediate survives
    assert(Graph.adamicAdar(star, "s", "d", maxNeighborDegree = 3)
      .collect().isEmpty)
  }

  test("modularity of two clean triangles in their own communities is 0.5") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "z"), ("z", "x")).toDF("s", "d")
    val mem = Seq(("a", "1"), ("b", "1"), ("c", "1"),
      ("x", "2"), ("y", "2"), ("z", "2")).toDF("node", "comm")
    val r = Graph.modularity(edges, "s", "d", mem, "node", "comm")
      .collect().head
    assert(r.getAs[Long]("n_edges") == 6L)
    assert(r.getAs[Long]("n_communities") == 2L)
    assert(r.getAs[Double]("modularity") == 0.5)
  }

  test("modularity of the all-in-one partition is 0") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val mem = Seq(("a", "1"), ("b", "1"), ("c", "1")).toDF("node", "comm")
    val r = Graph.modularity(edges, "s", "d", mem, "node", "comm")
      .collect().head
    assert(r.getAs[Double]("modularity") == 0.0)
  }

  test("modularity: nodes missing from membership are singletons") {
    // triangle split as {a,b} + singleton c: e_1 = 1, d_1 = 4; e_c = 0,
    // d_c = 2; m = 3 -> Q = (1/3 - (4/6)^2) + (0 - (2/6)^2) = -2/9
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val mem = Seq(("a", "g"), ("b", "g")).toDF("node", "comm")
    val r = Graph.modularity(edges, "s", "d", mem, "node", "comm")
      .collect().head
    assert(r.getAs[Long]("n_communities") == 2L)
    assert(r.getAs[Double]("modularity") ==
      BigDecimal(-2.0 / 9.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("assortativity of a star is exactly -1") {
    val star = Seq(("h", "a"), ("h", "b"), ("h", "c")).toDF("s", "d")
    val r = Graph.assortativity(star, "s", "d").collect().head
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Double]("assortativity") == -1.0)
  }

  test("assortativity fails loudly on a degree-regular graph") {
    val tri = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val e = intercept[Exception] {
      Graph.assortativity(tri, "s", "d").collect()
    }
    assert(e.getMessage.contains("degree variance"))
  }

  test("adamicAdar topK cuts by (score desc, u, v)") {
    // chain of shared neighbors with distinct degrees gives distinct
    // scores; ask for 2
    val edges = Seq(
      ("p", "w1"), ("q", "w1"),            // (p,q) via deg-2 w1
      ("r", "w2"), ("s", "w2"), ("t", "w2") // 3 pairs via deg-3 w2
    ).toDF("s", "d")
    val out = Graph.adamicAdar(edges, "s", "d", topK = 2).collect()
    assert(out.length == 2)
    // 1/ln(2) > 1/ln(3): (p,q) first, then the lexicographically
    // smallest deg-3 pair (r,s)
    assert(out(0).getString(0) == "p" && out(0).getString(1) == "q")
    assert(out(1).getString(0) == "r" && out(1).getString(1) == "s")
  }

  test("labelPropagation: two triangles across a bridge split into " +
    "two min-label communities; sizes roll up; iters validated") {
    // hand-replayed sync rounds with keep-current damping:
    // after round 2 the left triangle settles on "1", the right on
    // "4", and the bridge never merges them
    val edges = Seq(
      ("1", "2"), ("2", "3"), ("1", "3"), // left triangle
      ("4", "5"), ("5", "6"), ("4", "6"), // right triangle
      ("3", "4")) // bridge
      .toDF("s", "d")
    val out = Graph.labelPropagation(edges, "s", "d", iters = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getAs[Long]("community_size")))).toMap
    assert(Set("1", "2", "3").map(out(_)) == Set(("1", 3L)))
    assert(Set("4", "5", "6").map(out(_)) == Set(("4", 3L)))
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(edges, "s", "d", iters = 0)
    }
    // the documented sync-LPA dumbbell artifact: a degree-1 pendant
    // pair SWAPS labels each round (1-vs-0 strict majority beats the
    // keep-current damping) — period 2, identity at even iters
    val pairOdd = Graph.labelPropagation(
      Seq(("b", "a")).toDF("s", "d"), "s", "d", iters = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(pairOdd == Map("a" -> "b", "b" -> "a"))
    val pairEven = Graph.labelPropagation(
      Seq(("b", "a")).toDF("s", "d"), "s", "d", iters = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(pairEven == Map("a" -> "a", "b" -> "b"))
  }

  test("katz: two-node cycle converges geometrically toward beta/(1-alpha); " +
    "a no-in-edge node holds exactly beta; negative weights are loud") {
    import org.apache.spark.sql.functions.col
    // a ⇄ b, p = 1 both ways: c_{i+1} = 1 + 0.5·c_i from c₀ = 1 →
    // c_10 = 2 − 2^{-10}
    val cyc = Seq(("a", "b", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "w")
    val out = Graph.katz(cyc, "src", "dst", "w", iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("a") - (2.0 - math.pow(2.0, -10))) < 1e-12)
    assert(out("a") == out("b"))
    // a → b only: a has no in-edges → stays at beta = 1 every round;
    // b settles at 1 + 0.5·1 = 1.5
    val chain = Seq(("a", "b", 3L)).toDF("src", "dst", "w")
    val oc = Graph.katz(chain, "src", "dst", "w", iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(oc("a") == 1.0)
    assert(oc("b") == 1.5)
    val e = intercept[Exception] {
      Graph.katz(Seq(("a", "b", -1L)).toDF("src", "dst", "w"),
        "src", "dst", "w", iters = 1).collect()
    }
    assert(e.getMessage.contains("non-negative"), e.getMessage)
  }

  test("harmonicCentrality: hand path/cycle distances; node blow-up " +
    "is loud") {
    import org.apache.spark.sql.functions.col
    // a → b → c: H(a) = 0, H(b) = 1, H(c) = 1 + 1/2
    val path = Seq(("a", "b"), ("b", "c")).toDF("s", "d")
    val out = Graph.harmonicCentrality(path, "s", "d", maxRounds = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("harmonic") == 0.0)
    assert(out("a").getAs[Long]("n_reachable") == 0L)
    assert(out("b").getAs[Double]("harmonic") == 1.0)
    assert(out("c").getAs[Double]("harmonic") == 1.5)
    assert(out("c").getAs[Long]("n_reachable") == 2L)
    // 2-cycle: each node reaches the other at distance 1
    val cyc = Seq(("a", "b"), ("b", "a")).toDF("s", "d")
    val oc = Graph.harmonicCentrality(cyc, "s", "d", maxRounds = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(oc("a").getAs[Double]("harmonic") == 1.0)
    assert(oc("b").getAs[Double]("harmonic") == 1.0)
    val loud = intercept[Exception] {
      Graph.harmonicCentrality(path, "s", "d", maxNodes = 2L)
        .collect()
    }
    assert(loud.getMessage.contains("maxNodes"), loud.getMessage)
  }

  test("bipartiteProject: hand co-counts and the three " +
    "normalizations; a hot left member is loud") {
    import org.apache.spark.sql.functions.col
    // A∈{u1,u2,u3}, B∈{u1,u2} → co(A,B)=2: overlap 2/2=1,
    // cosine 2/√6, jaccard 2/3
    val m = Seq(("u1", "A"), ("u1", "B"), ("u2", "A"), ("u2", "B"),
      ("u3", "A")).toDF("u", "i")
    val r = Graph.bipartiteProject(m, "u", "i").collect().head
    assert(r.getAs[String]("item_a") == "A")
    assert(r.getAs[Long]("co_count") == 2L)
    assert(r.getAs[Long]("deg_a") == 3L && r.getAs[Long]("deg_b") == 2L)
    assert(r.getAs[Double]("overlap") == 1.0)
    assert(r.getAs[Double]("cosine") == 0.816497)
    assert(r.getAs[Double]("jaccard") == 0.666667)
    val hot = m.union(Seq(("u1", "C")).toDF("u", "i"))
    val loud = intercept[Exception] {
      Graph.bipartiteProject(hot, "u", "i", maxLeftDegree = 2)
        .collect()
    }
    assert(loud.getMessage.contains("maxLeftDegree"), loud.getMessage)
  }

  test("reciprocity: hand dyad census; self-loops and duplicates " +
    "drop; an empty edge set answers NULL") {
    import org.apache.spark.sql.functions.col
    val e = Seq(("1", "2"), ("2", "1"), ("1", "3"), ("4", "4"),
      ("1", "2")).toDF("s", "d")
    val r = Graph.reciprocity(e, "s", "d").collect().head
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Long]("n_mutual_edges") == 2L)
    assert(r.getAs[Long]("n_mutual_dyads") == 1L)
    assert(r.getAs[Long]("n_asym_dyads") == 1L)
    assert(r.getAs[Double]("reciprocity") == 0.666667)
    val re = Graph.reciprocity(e.filter(col("s") === "zz"), "s", "d")
      .collect().head
    assert(re.getAs[Long]("n_edges") == 0L)
    assert(re.isNullAt(re.fieldIndex("reciprocity")))
  }

  test("kTruss: the pendant edge peels out of the 3-truss; K4 is a " +
    "4-truss; k=2 is loud") {
    import org.apache.spark.sql.functions.col
    val triTail = Seq(("1", "2"), ("2", "3"), ("1", "3"), ("3", "4"))
      .toDF("s", "d")
    val t3 = Graph.kTruss(triTail, "s", "d", k = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(t3.keySet == Set(("1", "2"), ("1", "3"), ("2", "3")))
    assert(t3.values.forall(_ == 1L))
    assert(Graph.kTruss(triTail, "s", "d", k = 4).collect().isEmpty)
    val k4 = Seq(("1", "2"), ("1", "3"), ("1", "4"), ("2", "3"),
      ("2", "4"), ("3", "4")).toDF("s", "d")
    val t4 = Graph.kTruss(k4, "s", "d", k = 4).collect()
    assert(t4.length == 6 && t4.forall(_.getLong(2) == 2L))
    intercept[IllegalArgumentException] {
      Graph.kTruss(k4, "s", "d", k = 2)
    }
  }

  test("richClub: the triangle is a perfect club above the pendant " +
    "rung; a one-node club answers NULL phi") {
    import org.apache.spark.sql.functions.col
    // triangle {1,2,3} + pendant 3-4: deg 1:2, 2:2, 3:3, 4:1
    val e = Seq(("1", "2"), ("2", "3"), ("1", "3"), ("3", "4"))
      .toDF("s", "d")
    val out = Graph.richClub(e, "s", "d", ks = Seq(1, 2))
      .collect().map(r => r.getAs[Int]("k") -> r).toMap
    assert(out(1).getAs[Long]("n_rich_nodes") == 3L)
    assert(out(1).getAs[Long]("n_rich_edges") == 3L)
    assert(out(1).getAs[Double]("phi") == 1.0)
    assert(out(2).getAs[Long]("n_rich_nodes") == 1L)
    assert(out(2).isNullAt(out(2).fieldIndex("phi")))
    intercept[IllegalArgumentException] {
      Graph.richClub(e, "s", "d", ks = Seq(1, 1))
    }
  }

  test("coBucketEdges: hand-computed shared-bucket counts, duplicates " +
    "collapsed, minCount filter applied") {
    // bucket 1: {a,b,c}; bucket 2: {a,b}; bucket 3: {a,b} (row dup'd)
    val obs = Seq(("a", 1L), ("b", 1L), ("c", 1L), ("a", 2L), ("b", 2L),
      ("a", 3L), ("b", 3L), ("b", 3L)).toDF("k", "b")
    val out = Graph.coBucketEdges(obs, "k", "b")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "b") -> 3L, ("a", "c") -> 1L,
      ("b", "c") -> 1L))
    val strong = Graph.coBucketEdges(obs, "k", "b", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(strong == Set(("a", "b")))
  }

  test("coBucketEdges raises loudly BEFORE the pair stage when a " +
    "bucket exceeds maxBucketKeys; pruneHot drops the hot bucket " +
    "instead and keeps the rest") {
    // bucket 1 holds 4 keys (> cap 3); bucket 2 holds 2
    val obs = (Seq("a", "b", "c", "d").map(_ -> 1L) ++
      Seq("x" -> 2L, "y" -> 2L)).toDF("k", "b")
    val loud = intercept[Exception] {
      Graph.coBucketEdges(obs, "k", "b", maxBucketKeys = 3).collect()
    }
    assert(loud.getMessage.contains("coBucketEdges"), loud.getMessage)
    val pruned = Graph.coBucketEdges(obs, "k", "b", maxBucketKeys = 3,
        pruneHot = true)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned == Set(("x", "y")))
    // capped output ⊆ full output at a non-binding cap
    val full = Graph.coBucketEdges(obs, "k", "b", maxBucketKeys = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned.subsetOf(full) && full.size == 7)
  }

  test("handoffEdges: directed adjacent-bucket pairs with hand-computed " +
    "counts; self hand-offs dropped; the loud guard and pruneHot both " +
    "bind on occupancy") {
    // b1: {a,b}; b2: {b,c}; b3: {c}
    // b1→b2 pairs: (a,b),(a,c),(b,c) [b→b self dropped];
    // b2→b3 pairs: (b,c) [c→c self dropped] → (b,c) count 2
    val obs = Seq(("a", 1L), ("b", 1L), ("b", 2L), ("c", 2L), ("c", 3L))
      .toDF("k", "b")
    val out = Graph.handoffEdges(obs, "k", "b")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "b") -> 1L, ("a", "c") -> 1L,
      ("b", "c") -> 2L))
    assert(Graph.handoffEdges(obs, "k", "b", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("b", "c")))
    // a non-binding cap (every bucket ≤ 2 keys) changes nothing
    assert(Graph.handoffEdges(obs, "k", "b", maxBucketKeys = 2)
      .count() == 3L)
    // grow b1 to 3 keys: cap 2 must raise loudly, pruneHot must drop
    // exactly b1's hand-offs (leaving b2→b3's (b,c))
    val hot = (Seq(("a", 1L), ("b", 1L), ("b", 2L), ("c", 2L),
      ("c", 3L), ("z", 1L))).toDF("k", "b")
    val loud = intercept[Exception] {
      Graph.handoffEdges(hot, "k", "b", maxBucketKeys = 2).collect()
    }
    assert(loud.getMessage.contains("handoffEdges"), loud.getMessage)
    assert(Graph.handoffEdges(hot, "k", "b", maxBucketKeys = 2,
        pruneHot = true)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("b", "c")))
  }
}
