package graft.pipeline

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // Two 4-point blobs, one border point reaching blob 1 through 2 of
  // its cores, one far noise point. eps2 = 22500 (ε = 0.15 embedding
  // units), minPts = 4 counting self.
  private def blobs = Seq(
    1L -> Seq(0.0f, 0.0f), 2L -> Seq(0.1f, 0.0f),
    3L -> Seq(0.0f, 0.1f), 4L -> Seq(0.1f, 0.1f),
    5L -> Seq(0.2f, 0.1f),
    11L -> Seq(1.0f, 1.0f), 12L -> Seq(1.1f, 1.0f),
    13L -> Seq(1.0f, 1.1f), 14L -> Seq(1.1f, 1.1f),
    9L -> Seq(5.0f, 5.0f)
  ).map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")

  private def byId(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap

  test("dbscan separates blobs, attaches the border, flags noise") {
    val out = byId(Clustering.dbscan(blobs, "vec_id", "embedding",
      eps2 = 22500L, minPts = 4, blocks = 2))
    // blob cores (neighbors incl self; 2 and 4 also see the border
    // point 5), cluster = component min
    Seq(1L -> 4L, 2L -> 5L, 3L -> 4L, 4L -> 5L).foreach { case (id, nn) =>
      assert(out(id) == ((nn, "core", Some(1L))), s"vec $id: ${out(id)}")
    }
    Seq(11L, 12L, 13L, 14L).foreach { id =>
      assert(out(id) == ((4L, "core", Some(11L))), s"vec $id: ${out(id)}")
    }
    // border: reaches cores 2 and 4 only (3 neighbors incl self)
    assert(out(5L) == ((3L, "border", Some(1L))))
    // noise: alone
    assert(out(9L) == ((1L, "noise", None)))
  }

  test("an isolated core (star) is its own cluster; leaves are border") {
    // center sees 4 leaves; leaves see only the center (leaf-leaf
    // d2 = 20000 > eps2 = 12500); minPts = 5 makes ONLY the center
    // core, so the core-core edge set is empty — the own-id fallback.
    val star = Seq(
      7L -> Seq(0.0f, 0.0f), 21L -> Seq(0.1f, 0.0f),
      22L -> Seq(-0.1f, 0.0f), 23L -> Seq(0.0f, 0.1f),
      24L -> Seq(0.0f, -0.1f)
    ).map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val out = byId(Clustering.dbscan(star, "vec_id", "embedding",
      eps2 = 12500L, minPts = 5, blocks = 1))
    assert(out(7L) == ((5L, "core", Some(7L))))
    Seq(21L, 22L, 23L, 24L).foreach { id =>
      assert(out(id) == ((2L, "border", Some(7L))), s"vec $id: ${out(id)}")
    }
  }

  test("euclideanPairs block split does not change the pair set") {
    val one = Clustering.euclideanPairs(blobs, "vec_id", "embedding",
      eps2 = 22500L, blocks = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val four = Clustering.euclideanPairs(blobs, "vec_id", "embedding",
      eps2 = 22500L, blocks = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one == four)
    assert(one.forall { case (a, b, d2) => a < b && d2 <= 22500L })
    // the blob-1 diagonal pair at exactly 20000
    assert(one.contains((1L, 4L, 20000L)))
  }

  test("a border tied between two clusters pins to the MIN cluster id") {
    // two 4-point square blobs (side 0.125 — exact in float32), gap
    // 0.3125 > ε; X sits midway on the axis, within ε of exactly ONE
    // core in each blob (d² = 156² = 24336 ≤ eps2 = 31250, but the
    // diagonal cores are at 39961 > eps2). X has 3 neighbors incl self
    // < minPts = 4 → border, and its core neighbors live in clusters
    // 1 and 11 — the pinned tie rule attaches it to min = 1, making
    // the assignment a pure function of the pair set (textbook DBSCAN
    // leaves this to visit order)
    val pts = Seq(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(0.125f, 0.0f),
      3L -> Seq(0.0f, 0.125f), 4L -> Seq(0.125f, 0.125f),
      11L -> Seq(0.4375f, 0.0f), 12L -> Seq(0.5625f, 0.0f),
      13L -> Seq(0.4375f, 0.125f), 14L -> Seq(0.5625f, 0.125f),
      99L -> Seq(0.28125f, 0.0f)
    ).toDF("vec_id", "embedding")
    val out = byId(Clustering.dbscan(pts, "vec_id", "embedding",
      eps2 = 31250L, minPts = 4, blocks = 2))
    Seq(1L, 2L, 3L, 4L).foreach(id =>
      assert(out(id)._2 == "core" && out(id)._3 == Some(1L),
        s"vec $id: ${out(id)}"))
    Seq(11L, 12L, 13L, 14L).foreach(id =>
      assert(out(id)._2 == "core" && out(id)._3 == Some(11L),
        s"vec $id: ${out(id)}"))
    assert(out(99L) == ((3L, "border", Some(1L))))
  }

  test("reachability does not chain through borders: beyond-border is noise") {
    // blob cores ← B (within ε of core 2 only) ← Y (within ε of B
    // only). B is density-reachable → border; Y touches only the
    // NON-core B, so it is NOT reachable — noise, even though a path
    // of ε-steps connects it to the cluster (Ester 1996's asymmetry)
    val pts = Seq(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(0.125f, 0.0f),
      3L -> Seq(0.0f, 0.125f), 4L -> Seq(0.125f, 0.125f),
      50L -> Seq(0.28125f, 0.0f), // B: core2 + Y + self = 3 < 4
      60L -> Seq(0.4375f, 0.0f) // Y: B + self = 2 < 4, no core neighbor
    ).toDF("vec_id", "embedding")
    val out = byId(Clustering.dbscan(pts, "vec_id", "embedding",
      eps2 = 31250L, minPts = 4, blocks = 2))
    assert(out(50L) == ((3L, "border", Some(1L))))
    assert(out(60L) == ((2L, "noise", None)))
  }

  test("minPts = 1 degenerates: every point is core, singletons included") {
    val pts = Seq(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(5.0f, 5.0f),
      3L -> Seq(1.0f, 1.0f), 4L -> Seq(1.1f, 1.0f)
    ).toDF("vec_id", "embedding")
    val out = byId(Clustering.dbscan(pts, "vec_id", "embedding",
      eps2 = 22500L, minPts = 1, blocks = 2))
    assert(out(1L) == ((1L, "core", Some(1L)))) // isolated → own cluster
    assert(out(2L) == ((1L, "core", Some(2L))))
    assert(out(3L) == ((2L, "core", Some(3L))))
    assert(out(4L) == ((2L, "core", Some(3L)))) // component-min id
  }

  test("euclideanPairsAnn is a verified SUBSET of the exact pair set") {
    // false positives die at the exact integer d² verify, so ANN pairs
    // ⊆ exact pairs ALWAYS, whatever the recall — the one-sided law
    // that holds at every (tables, bits)
    val exact = Clustering.euclideanPairs(blobs, "vec_id", "embedding",
      eps2 = 22500L, blocks = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for ((t, b) <- Seq((4, 1), (32, 2), (8, 4))) {
      val ann = Clustering.euclideanPairsAnn(blobs, "vec_id", "embedding",
        eps2 = 22500L, tables = t, bits = b).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(ann.subsetOf(exact), s"tables=$t bits=$b: ${ann -- exact}")
      assert(ann.forall { case (a, bb, d2) => a < bb && d2 <= 22500L })
    }
  }

  test("autoBlocks targets ~64MB broadcast sides; dbscanAuto ≡ dbscan") {
    // 2000 × 64-dim rows ≈ 1 MB → one block (the fixture regime where
    // fixed blocks=8 was pure branch-join overhead); 1M rows ≈ 544 MB
    // → 9 blocks
    assert(Clustering.autoBlocks(2000L, 64) == 1)
    assert(Clustering.autoBlocks(1000000L, 64) == 9)
    assert(Clustering.autoBlocks(1L, 64) == 1)
    val auto = Clustering.dbscanAuto(blobs, "vec_id", "embedding",
      eps2 = 22500L, minPts = 4)
    val fixed = Clustering.dbscan(blobs, "vec_id", "embedding",
      eps2 = 22500L, minPts = 4, blocks = 2)
    assert(rows(auto) == rows(fixed))
  }

  test("ANN-fed DBSCAN equals the exact composition (recall 1.0)") {
    // q352's precondition at BOTH the spec SF and the driver's compare
    // SF (the q163 semantic-dedup playbook): at 32 tables × 2 bits the
    // LSH candidates contain EVERY true ε-pair of the fixture
    // embeddings at q347's far threshold (eps2 = 1.38·10⁶ on unit
    // vectors ⇔ cosine ≥ 0.31), so pair set — and therefore degrees,
    // roles and clusters — reproduce the exact operator bit-for-bit.
    // Below recall 1.0 the documented undercount law applies instead.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val exactPairs = Clustering.euclideanPairs(
        e, "vec_id", "embedding", eps2 = 1380000L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val annPairs = Clustering.euclideanPairsAnn(
        e, "vec_id", "embedding", eps2 = 1380000L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(annPairs == exactPairs,
        s"$sf: recall ${annPairs.size}/${exactPairs.size} — " +
          "the ANN feed's recall-1.0 precondition broke")
      val key = (df: org.apache.spark.sql.DataFrame) => rows(df)
      assert(key(Clustering.dbscanAnn(e, "vec_id", "embedding",
          eps2 = 1380000L, minPts = 5)) ==
        key(Clustering.dbscan(e, "vec_id", "embedding",
          eps2 = 1380000L, minPts = 5)),
        s"$sf: ANN-fed DBSCAN diverges from exact")
    }
  }

  test("auto-dialed ANN DBSCAN (q482): the lshAutoConfig-derived " +
    "config holds recall 1.0 per SF — byte-equal to exact — and " +
    "actually moves off the frozen fixture dial") {
    // q482's recall dial: at the family default 0.999 ONE boundary
    // pair drops at sf0.001 (measured — expected misses ~0.8 at 746
    // pairs); the entry pins 1−10⁻⁵, whose derived config holds
    // empirical recall 1.0 at both SFs (deterministic md5 planes)
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      assert(rows(Clustering.dbscanAnnAuto(e, "vec_id", "embedding",
          eps2 = 1380000L, minPts = 5, recall = 0.99999)) ==
        rows(Clustering.dbscan(e, "vec_id", "embedding",
          eps2 = 1380000L, minPts = 5)),
        s"$sf: auto-dialed ANN DBSCAN diverges from exact — the " +
          "derived config's recall-1.0 precondition broke")
    }
    // the dial must MOVE off the frozen 32×2: at the far ε floor +
    // hard recall it derives fewer, coarser tables (candidate cost
    // 13/4·n² vs the frozen 32/8·n²); at a PRODUCTION threshold it
    // climbs the bits ladder instead (purer buckets)
    val n = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet").count()
    val far = Similarity.lshAutoConfig(n, 0.31, 0.99999)
    assert(far != ((32, 2)) &&
      far._1.toDouble / (1 << far._2) < 32.0 / (1 << 2),
      s"far-ε auto config $far is not cheaper than the frozen dial")
    val tight = Similarity.lshAutoConfig(n, 0.9, 0.99999)
    assert(tight._2 > 2, s"tight-threshold auto config $tight did " +
      "not climb the bits ladder")
  }

  test("daviesBouldin: hand two-cluster geometry; single label is " +
    "loud") {
    // 1-D on float32-EXACT values: {0, 1} and {10, 11} → quantized
    // {0,1000} / {10000,11000}: scatter 500 each, centroid distance
    // |2·1000 − 2·21000|/4 = 10000 → DB = 1000/10000 = 0.1
    val df = Seq((1L, 0L, Seq(0.0f)), (2L, 0L, Seq(1.0f)),
      (3L, 1L, Seq(10.0f)), (4L, 1L, Seq(11.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.daviesBouldin(df, "vec_id", "label",
      "embedding").collect().map(r => r.getAs[Long]("label") -> r)
      .toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L).getAs[Double]("scatter") == 500.0)
    assert(out(1L).getAs[Double]("scatter") == 500.0)
    assert(out(0L).getAs[Double]("worst_ratio") == 0.1)
    assert(out(0L).getAs[Double]("db_index") == 0.1)
    assert(out(1L).getAs[Double]("db_index") == 0.1)
    val loud = intercept[Exception] {
      Similarity.daviesBouldin(
        Seq((1L, 0L, Seq(0.5f)), (2L, 0L, Seq(0.6f)))
          .toDF("vec_id", "label", "embedding"),
        "vec_id", "label", "embedding").collect()
    }
    assert(loud.getMessage.contains(">= 2 cluster labels"),
      loud.getMessage)
  }
}
