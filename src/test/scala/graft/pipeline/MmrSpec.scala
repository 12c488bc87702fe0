package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // Query (id 0) along x; A is the most relevant, A2 a near-duplicate
  // of A, B orthogonal to everything relevant.
  private def fix = Seq(
    0L -> Seq(1.0f, 0.0f),
    1L -> Seq(0.95f, 0.312f),
    2L -> Seq(0.9f, 0.436f),
    3L -> Seq(0.0f, 1.0f)
  ).map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")

  private def run(lambda: Double, k: Int = 3, topN: Int = 3) =
    Similarity.mmrSelect(fix, "vec_id", "embedding",
      queryPred = col("vec_id") === 0, topN = topN, k = k,
      lambda = lambda)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2)))

  test("first pick is the pure relevance argmax") {
    assert(run(lambda = 0.3).head == ((1, 1L)))
  }

  test("diversity term promotes the orthogonal result over the near-dup") {
    // λ=0.3: B (rel 0, unlike anything picked) beats A2 (rel .9 but
    // ~.99-similar to A); λ=1 is pure relevance and keeps A2 second
    assert(run(lambda = 0.3).toSeq == Seq((1, 1L), (2, 3L), (3, 2L)))
    assert(run(lambda = 1.0).toSeq == Seq((1, 1L), (2, 2L), (3, 3L)))
  }

  test("selection stops when the candidate window is exhausted") {
    // window wants 5 but only 3 candidates exist → 3 rows out
    val out = Similarity.mmrSelect(fix, "vec_id", "embedding",
      queryPred = col("vec_id") === 0, topN = 5, k = 5, lambda = 0.5)
      .collect()
    assert(out.length == 3)
  }

  test("score ties break to the lower candidate id") {
    val twin = Seq(
      0L -> Seq(1.0f, 0.0f),
      7L -> Seq(0.5f, 0.5f),
      5L -> Seq(0.5f, 0.5f)
    ).map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(twin, "vec_id", "embedding",
      queryPred = col("vec_id") === 0, topN = 2, k = 2, lambda = 0.5)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(out.head == 5L)
  }
}
