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
}
