package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bootstrap CI (Stats.bootstrapCI, q250) and Welch's t-test
  * (Stats.welchTTest, q251).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("bootstrapCI brackets the point estimate with a real band") {
    val df = (1L to 400L).map(i => (i, i % 37)).toDF("id", "x")
    val r = Stats.bootstrapCI(df, "id", "x", reps = 100).collect().head
    val (est, lo, hi) = (r.getAs[Double]("est_mean"),
      r.getAs[Double]("ci_low"), r.getAs[Double]("ci_high"))
    assert(r.getAs[Long]("n_rows") == 400L)
    assert(r.getAs[Long]("n_reps") == 100L)
    assert(lo < est && est < hi, s"band [$lo, $hi] must bracket $est")
    // Poisson-bootstrap SE of a mean ≈ sd/√n ≈ 10.7/20 ≈ 0.53; the
    // 95% band must be neither collapsed nor absurdly wide
    assert(hi - lo > 0.5 && hi - lo < 5.0, s"width ${hi - lo}")
  }

  test("bootstrapCI of a constant metric is a zero-width band") {
    // every reweighting of a constant column has the same mean — the
    // weights cancel; a non-degenerate band here would mean the
    // replicate means are touching the data, not the weights
    val df = (1L to 100L).map(i => (i, 7L)).toDF("id", "x")
    val r = Stats.bootstrapCI(df, "id", "x", reps = 20).collect().head
    assert(r.getAs[Double]("ci_low") == 7.0)
    assert(r.getAs[Double]("ci_high") == 7.0)
    assert(r.getAs[Double]("est_mean") == 7.0)
  }

  test("bootstrapCI is partitioning-invariant") {
    val df = (1L to 300L).map(i => (i, i % 11)).toDF("id", "x")
    val a = Stats.bootstrapCI(df.coalesce(1), "id", "x", reps = 24)
      .collect().head.toSeq
    val b = Stats.bootstrapCI(df.repartition(13), "id", "x", reps = 24)
      .collect().head.toSeq
    assert(a == b)
  }

  test("welchTTest matches the hand computation") {
    // arm0 = {1,2,3}: m=2, v=1; arm1 = {2,4,6}: m=4, v=4
    // t = -2/√(1/3 + 4/3) = -1.549193
    // df = (5/3)² / ((1/3)²/2 + (4/3)²/2) = 2.941176
    val df = Seq((0, 1L), (0, 2L), (0, 3L), (1, 2L), (1, 4L), (1, 6L))
      .toDF("arm", "x")
    val r = Stats.welchTTest(df, "arm", "x").collect().head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("mean_a") == 2.0)
    assert(r.getAs[Double]("mean_b") == 4.0)
    assert(r.getAs[Double]("var_a") == 1.0)
    assert(r.getAs[Double]("var_b") == 4.0)
    assert(math.abs(r.getAs[Double]("t_stat") - (-1.549193)) < 1e-6)
    assert(math.abs(r.getAs[Double]("welch_df") - 2.941176) < 1e-6)
    assert(r.getAs[Int]("significant") == 0)
  }

  test("welchTTest: identical arms give t = 0; a shifted arm triggers") {
    val base = (1L to 200L).map(i => i % 23)
    val aa = (base.map(x => (0, x)) ++ base.map(x => (1, x))).toDF("arm", "x")
    val r0 = Stats.welchTTest(aa, "arm", "x").collect().head
    assert(r0.getAs[Double]("t_stat") == 0.0)
    assert(r0.getAs[Int]("significant") == 0)
    val ab = (base.map(x => (0, x)) ++ base.map(x => (1, x + 10)))
      .toDF("arm", "x")
    val r1 = Stats.welchTTest(ab, "arm", "x").collect().head
    assert(r1.getAs[Int]("significant") == 1)
    assert(r1.getAs[Double]("t_stat") < -1.96)
  }

  test("psiDrift: hand-computed two-bucket swap") {
    // ref {a:3, b:1}, cur {a:1, b:3}; Laplace over B=2 observed buckets:
    // p_a = 4/6, q_a = 2/6 → term = (1/3)·ln2 = 0.231049 (d6); psi =
    // 0.462098 on every row of the dimension
    val df = (Seq.fill(3)(("a", false)) ++ Seq(("b", false)) ++
      Seq(("a", true)) ++ Seq.fill(3)(("b", true)))
      .toDF("k", "cur")
    val out = Stats.psiDrift(df, "cur", Seq("k" -> col("k")))
      .collect().map(r => (r.getAs[String]("bucket"),
        r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
        r.getAs[Double]("psi_term"), r.getAs[Double]("psi"))).toSet
    assert(out == Set(
      ("a", 3L, 1L, 0.231049, 0.462098),
      ("b", 1L, 3L, 0.231049, 0.462098)))
  }

  test("psiDrift: identical distributions score zero; one-sided buckets stay finite") {
    val same = (1 to 40).flatMap(i =>
      Seq((s"k${i % 4}", false), (s"k${i % 4}", true))).toDF("k", "cur")
    val zero = Stats.psiDrift(same, "cur", Seq("k" -> col("k"))).collect()
    assert(zero.forall(_.getAs[Double]("psi") == 0.0))
    // bucket 'n' never appears in ref — Laplace smoothing keeps the
    // term finite (clip-free by construction)
    val oneSided = (Seq.fill(5)(("m", false)) ++ Seq.fill(4)(("m", true)) ++
      Seq(("n", true))).toDF("k", "cur")
    val r = Stats.psiDrift(oneSided, "cur", Seq("k" -> col("k"))).collect()
    assert(r.forall(x => !x.getAs[Double]("psi_term").isNaN &&
      !x.getAs[Double]("psi_term").isInfinite))
    assert(r.head.getAs[Double]("psi") > 0.0)
  }

  test("psiDrift is partitioning-invariant and handles multi-dimension input") {
    val df = (1 to 60).map(i =>
      (s"t${i % 3}", (i % 7).toLong, i % 2 == 0)).toDF("t", "v", "cur")
    val dims = Seq("type" -> col("t"), "val" -> col("v"))
    val a = Stats.psiDrift(df, "cur", dims).collect().map(_.toSeq).toSet
    val b = Stats.psiDrift(df.repartition(7), "cur", dims)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.map(_.head).toSet == Set("type", "val"))
  }
}
