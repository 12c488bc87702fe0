package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 inference operators: two-sample KS (Stats.ksTest, q307),
  * Spearman rho (Stats.spearmanRho, q308), Kendall tau-b
  * (Stats.kendallTau, q309) and the always-valid mSPRT trajectory
  * (Stats.msprt, q311).
  */
class InferenceSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- KS

  test("ksTest matches the hand-computed ECDF gap") {
    // arm0 = {1,2,3,4}, arm1 = {3,4,5,6}: max gap at v=2 is |2/4 - 0| =
    // 0.5 (numerator |2*4 - 0*4| = 8 over n0*n1 = 16)
    val df = Seq((0, 1L), (0, 2L), (0, 3L), (0, 4L),
      (1, 3L), (1, 4L), (1, 5L), (1, 6L)).toDF("arm", "v")
    val r = Stats.ksTest(df, "arm", "v").collect().head
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("d_numerator") == 8L)
    assert(r.getAs[Double]("d_stat") == 0.5)
    val p = r.getAs[Double]("p_value")
    assert(p > 0.5 && p <= 1.0, s"tiny samples can't be significant: $p")
  }

  test("ksTest of identical samples is D = 0, p = 1") {
    // the lambda < 0.3 clamp region: the truncated series would give a
    // nonsense p here without it
    val df = (1L to 50L).flatMap(i => Seq((0, i % 7), (1, i % 7)))
      .toDF("arm", "v")
    val r = Stats.ksTest(df, "arm", "v").collect().head
    assert(r.getAs[Long]("d_numerator") == 0L)
    assert(r.getAs[Double]("d_stat") == 0.0)
    assert(r.getAs[Double]("p_value") == 1.0)
  }

  test("ksTest flags a planted distribution shift") {
    // arm1 shifted by 50: disjoint supports, D = 1, p ~ 0
    val df = (1L to 200L).map(i => (0, i % 20)) ++
      (1L to 200L).map(i => (1, 50 + i % 20))
    val r = Stats.ksTest(df.toDF("arm", "v"), "arm", "v").collect().head
    assert(r.getAs[Double]("d_stat") == 1.0)
    assert(r.getAs[Double]("p_value") < 0.001)
  }

  test("ksTest is partitioning-invariant") {
    val df = (1L to 300L).map(i => ((i % 2).toInt, (i * 31) % 97))
      .toDF("arm", "v")
    val a = Stats.ksTest(df.coalesce(1), "arm", "v").collect().head.toSeq
    val b = Stats.ksTest(df.repartition(13), "arm", "v")
      .collect().head.toSeq
    assert(a == b)
  }

  test("ksTest fails loudly on an empty arm") {
    val df = Seq((0, 1L), (0, 2L)).toDF("arm", "v")
    val e = intercept[Exception] {
      Stats.ksTest(df, "arm", "v").collect()
    }
    assert(e.getMessage.contains("non-empty"))
  }

  // ---------------------------------------------------------- Spearman

  test("spearmanRho is 1 for any monotone map and -1 reversed") {
    val up = (1L to 40L).map(i => (i, i * i)).toDF("x", "y")
    val dn = (1L to 40L).map(i => (i, -(i * i))).toDF("x", "y")
    assert(Stats.spearmanRho(up, "x", "y").collect().head
      .getAs[Double]("rho") == 1.0)
    assert(Stats.spearmanRho(dn, "x", "y").collect().head
      .getAs[Double]("rho") == -1.0)
  }

  test("spearmanRho matches the tied-rank hand computation") {
    // x=(1,1,2), y=(1,2,3): average ranks give rho = 18/sqrt(432) =
    // 0.866025 (scipy agrees)
    val df = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("x", "y")
    val r = Stats.spearmanRho(df, "x", "y").collect().head
    assert(r.getAs[Long]("n_rows") == 3L)
    assert(math.abs(r.getAs[Double]("rho") - 0.866025) < 1e-6)
  }

  test("spearmanRho fails loudly on a constant column") {
    val df = (1L to 10L).map(i => (i, 5L)).toDF("x", "y")
    val e = intercept[Exception] {
      Stats.spearmanRho(df, "x", "y").collect()
    }
    assert(e.getMessage.contains("rank variance"))
  }

  test("spearmanRho is partitioning-invariant") {
    val df = (1L to 200L).map(i => ((i * 7) % 53, (i * 13) % 31))
      .toDF("x", "y")
    val a = Stats.spearmanRho(df.coalesce(1), "x", "y")
      .collect().head.toSeq
    val b = Stats.spearmanRho(df.repartition(11), "x", "y")
      .collect().head.toSeq
    assert(a == b)
  }

  // ----------------------------------------------------------- Kendall

  test("kendallTau matches hand-computed concordance (no ties)") {
    // x=(1,2,3), y=(1,3,2): C=2, D=1, tau = 1/3
    val df = Seq((1L, 1L), (2L, 3L), (3L, 2L)).toDF("x", "y")
    val r = Stats.kendallTau(df, "x", "y").collect().head
    assert(r.getAs[Long]("n_concordant") == 2L)
    assert(r.getAs[Long]("n_discordant") == 1L)
    assert(math.abs(r.getAs[Double]("tau_b") - 1.0 / 3.0) < 1e-6)
  }

  test("kendallTau tie-corrected: balanced grid is tau 0") {
    // x=(1,1,2,2), y=(1,2,1,2): C=1, D=1 -> tau_b = 0
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y")
    val r = Stats.kendallTau(df, "x", "y").collect().head
    assert(r.getAs[Long]("n_concordant") == 1L)
    assert(r.getAs[Long]("n_discordant") == 1L)
    assert(r.getAs[Double]("tau_b") == 0.0)
  }

  test("kendallTau fails loudly past maxCells") {
    val df = (1L to 50L).map(i => (i, i)).toDF("x", "y")
    val e = intercept[Exception] {
      Stats.kendallTau(df, "x", "y", maxCells = 10).collect()
    }
    assert(e.getMessage.contains("discretize"))
  }

  test("kendallTau fails loudly on a constant column") {
    val df = (1L to 10L).map(i => (i, 1L)).toDF("x", "y")
    val e = intercept[Exception] {
      Stats.kendallTau(df, "x", "y").collect()
    }
    assert(e.getMessage.contains("undefined"))
  }

  // ------------------------------------------------------------- mSPRT

  test("msprt p-trajectory is non-increasing and starts at 1") {
    val rows = (0L until 20L).flatMap { p =>
      (1L to 10L).flatMap(i => Seq((0, 10L + i % 3, p), (1, 10L + (i + 1) % 3, p)))
    }
    val out = Stats.msprt(rows.toDF("arm", "v", "period"),
        "arm", "v", "period", tau2 = 1.0)
      .orderBy("period").collect()
    val ps = out.map(_.getAs[Double]("p_always_valid"))
    assert(ps.head <= 1.0)
    ps.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
  }

  test("msprt detects a planted persistent shift") {
    // arm1 = arm0 + 50 across 30 periods: p must collapse below alpha
    val rows = (0L until 30L).flatMap { p =>
      (1L to 20L).flatMap(i =>
        Seq((0, 100L + i % 5, p), (1, 150L + i % 5, p)))
    }
    val out = Stats.msprt(rows.toDF("arm", "v", "period"),
        "arm", "v", "period", tau2 = 100.0)
      .orderBy("period").collect()
    assert(out.last.getAs[Double]("p_always_valid") < 0.05)
    assert(out.last.getAs[Int]("significant") == 1)
  }

  test("msprt null-experiment stays insignificant") {
    // A/A: identical per-period samples in both arms
    val rows = (0L until 30L).flatMap { p =>
      (1L to 20L).flatMap(i => Seq((0, 100L + i % 7, p), (1, 100L + i % 7, p)))
    }
    val out = Stats.msprt(rows.toDF("arm", "v", "period"),
        "arm", "v", "period", tau2 = 100.0)
      .orderBy("period").collect()
    assert(out.forall(_.getAs[Int]("significant") == 0))
    assert(out.last.getAs[Double]("p_always_valid") == 1.0)
  }

  // ------------------------------------------------- krippendorffAlpha

  test("krippendorffAlpha matches the hand-computed partial design") {
    // units: A=(1,1) B=(1,2) C=(2,2): A_o=4/6, A_e=12/30, alpha=0.444445
    val df = Seq(("A", 1L), ("A", 1L), ("B", 1L), ("B", 2L),
      ("C", 2L), ("C", 2L)).toDF("u", "v")
    val r = Stats.krippendorffAlpha(df, "u", "v").collect().head
    assert(r.getAs[Long]("n_ratings") == 6L)
    assert(r.getAs[Double]("a_o") == 0.666667)
    assert(r.getAs[Double]("a_e") == 0.4)
    assert(r.getAs[Double]("alpha") == 0.444445)
  }

  test("krippendorffAlpha: perfect agreement is 1, single ratings drop") {
    val df = Seq(("A", 1L), ("A", 1L), ("B", 2L), ("B", 2L),
      ("LONELY", 1L)).toDF("u", "v")
    val r = Stats.krippendorffAlpha(df, "u", "v").collect().head
    // the single-rating unit contributes nothing
    assert(r.getAs[Long]("n_ratings") == 4L)
    assert(r.getAs[Double]("alpha") == 1.0)
  }

  test("krippendorffAlpha fails loudly on single-class data") {
    val df = Seq(("A", 1L), ("A", 1L), ("B", 1L), ("B", 1L))
      .toDF("u", "v")
    val e = intercept[Exception] {
      Stats.krippendorffAlpha(df, "u", "v").collect()
    }
    assert(e.getMessage.contains("single-class"))
  }

  // --------------------------------------------- classBalancedWeights

  test("classBalancedWeights saturates instead of 1/n exploding") {
    val rows = Seq.fill(2000)("big") ++ Seq.fill(20)("small")
    val out = Stats.classBalancedWeights(rows.toDF("lang"), "lang")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("eff_n"), r.getAs[Double]("weight"))).toMap
    // rare class upweighted, but far less than the 100x raw ratio
    assert(out("small")._2 > out("big")._2)
    assert(out("small")._2 / out("big")._2 < 50.0)
    // effective n < n and saturating for the big class
    assert(out("big")._1 < 1000.0)
    // weights normalize to mean 1
    val mean = out.values.map(_._2).sum / out.size
    assert(math.abs(mean - 1.0) < 1e-5)
  }

  test("classBalancedWeights: a single-example class gets eff_n 1") {
    val rows = Seq.fill(100)("a") :+ "b"
    val out = Stats.classBalancedWeights(rows.toDF("lang"), "lang")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("eff_n"))
      .toMap
    assert(out("b") == 1.0)
  }

  // ----------------------------------------------------- hillTailIndex

  test("hillTailIndex matches the hand computation at k = 2") {
    val df = (Seq(8L, 4L, 2L) ++ Seq.fill(10)(1L)).toDF("x")
    val r = Stats.hillTailIndex(df, "x", k = 2).collect().head
    def d6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = d6((d6(math.log(8.0 / 2.0)) + d6(math.log(4.0 / 2.0)))
      / 2.0)
    assert(r.getAs[Long]("threshold") == 2L)
    assert(r.getAs[Double]("hill_gamma") == expected)
  }

  test("hillTailIndex recovers a planted Pareto tail exponent") {
    // x_i ~ (n/i)^(1/2): alpha = 2 Pareto tail
    val n = 500
    val df = (1 to n)
      .map(i => math.floor(1000.0 * math.sqrt(n.toDouble / i)).toLong)
      .toDF("x")
    val a = Stats.hillTailIndex(df, "x", k = 50).collect().head
      .getAs[Double]("tail_alpha")
    assert(a > 1.5 && a < 2.5, s"tail_alpha $a not near 2")
  }

  test("hillTailIndex needs more than k positive values") {
    val df = (1L to 20L).toDF("x")
    val e = intercept[Exception] {
      Stats.hillTailIndex(df, "x", k = 50).collect()
    }
    assert(e.getMessage.contains("need > 50"))
  }

  // -------------------------------------------------------- rakeWeights

  test("rakeWeights hits both margin targets on an unbalanced 2x2") {
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(50)(("b", "y"))
    val out = Stats.rakeWeights(rows.toDF("r", "c"), "r", "c",
      rowTargets = Map("a" -> 0.5, "b" -> 0.5),
      colTargets = Map("x" -> 0.5, "y" -> 0.5))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("weight"))).toMap
    def margin(f: ((String, String)) => Boolean) =
      out.filter { case (k, _) => f(k) }
        .map { case (_, (n, w)) => n * w }.sum
    // total 100: every margin should be ~50 after 10 rounds
    assert(math.abs(margin(_._1 == "a") - 50.0) < 0.5)
    assert(math.abs(margin(_._1 == "b") - 50.0) < 0.5)
    assert(math.abs(margin(_._2 == "x") - 50.0) < 0.5)
    assert(math.abs(margin(_._2 == "y") - 50.0) < 0.5)
  }

  test("rakeWeights on an already-balanced table is identically 1") {
    val rows = for (r <- Seq("a", "b"); c <- Seq("x", "y");
      _ <- 1 to 25) yield (r, c)
    val out = Stats.rakeWeights(rows.toDF("r", "c"), "r", "c",
      Map("a" -> 0.5, "b" -> 0.5), Map("x" -> 0.5, "y" -> 0.5))
      .collect()
    assert(out.forall(_.getAs[Double]("weight") == 1.0))
  }

  test("rakeWeights zeroes cells with zero target share and guards size") {
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "x"))
    val out = Stats.rakeWeights(rows.toDF("r", "c"), "r", "c",
      Map("a" -> 1.0, "b" -> 0.0), Map("x" -> 1.0))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("weight"))
      .toMap
    assert(out("b") == 0.0 && out("a") > 0.0)
    val e = intercept[IllegalArgumentException] {
      Stats.rakeWeights(rows.toDF("r", "c"), "r", "c",
        Map("a" -> 0.5, "b" -> 0.5), Map("x" -> 1.0), maxCells = 1)
    }
    assert(e.getMessage.contains("maxCells"))
  }

  // ------------------------------------------------- calibrationError

  test("calibrationError: a perfectly calibrated bin scores ece 0") {
    // all scores 0.5, half positive: confidence = accuracy = 0.5
    val df = (1 to 10).map(i => (500000L, if (i <= 5) 1L else 0L))
      .toDF("score6", "y")
    val r = Stats.calibrationError(df, "score6", "y").collect().head
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Double]("ece") == 0.0)
    assert(r.getAs[Double]("mce") == 0.0)
    assert(r.getAs[Double]("brier") == 0.25)
  }

  test("calibrationError flags systematic overconfidence") {
    // every score says 0.9, truth is always 0: gap 0.9 everywhere
    val df = (1 to 20).map(_ => (900000L, 0L)).toDF("score6", "y")
    val r = Stats.calibrationError(df, "score6", "y").collect().head
    assert(r.getAs[Double]("ece") == 0.9)
    assert(r.getAs[Double]("mce") == 0.9)
    assert(r.getAs[Double]("brier") == 0.81)
  }

  test("calibrationError bins by equal score width, score 1e6 in top bin") {
    val df = Seq((1000000L, 1L), (0L, 0L), (999999L, 1L))
      .toDF("score6", "y")
    val r = Stats.calibrationError(df, "score6", "y").collect().head
    // perfect predictions: brier 0 at d6, ece ~ 1e-6-scale gap only
    assert(r.getAs[Double]("brier") == 0.0)
    assert(r.getAs[Double]("ece") < 1e-5)
  }

  // --------------------------------------------------------- Theil-Sen

  test("theilSen ignores a gross outlier that would wreck OLS") {
    // y = 2x except one wild point: 6 of 10 pairwise slopes are exactly
    // 2 -> median slope 2, median residual 0
    val df = Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 6L), (4L, 1000L))
      .toDF("x", "y")
    val r = Stats.theilSen(df, "x", "y").collect().head
    assert(r.getAs[Long]("n_points") == 5L)
    assert(r.getAs[Long]("n_pairs") == 10L)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 0.0)
  }

  test("theilSen exact fit recovers slope and intercept") {
    val df = (1L to 20L).map(i => (i, 3L * i + 7L)).toDF("x", "y")
    val r = Stats.theilSen(df, "x", "y").collect().head
    assert(r.getAs[Double]("slope") == 3.0)
    assert(r.getAs[Double]("intercept") == 7.0)
  }

  test("theilSen guards point counts loudly") {
    val one = Seq((1L, 1L)).toDF("x", "y")
    assert(intercept[Exception] {
      Stats.theilSen(one, "x", "y").collect()
    }.getMessage.contains("2.."))
    val many = (1L to 30L).map(i => (i, i)).toDF("x", "y")
    assert(intercept[Exception] {
      Stats.theilSen(many, "x", "y", maxPoints = 10).collect()
    }.getMessage.contains("2..10"))
  }

  // ------------------------------------------------------------- CUSUM

  test("cusum stays silent on a flat series") {
    val df = (0L until 20L).map(p => (p, 100L)).toDF("period", "v")
    val out = Stats.cusum(df, "period", "v").orderBy("period").collect()
    assert(out.forall(_.getAs[Double]("s_pos") == 0.0))
    assert(out.forall(_.getAs[Double]("s_neg") == 0.0))
    assert(out.forall(_.getAs[Int]("alarm_pos") == 0))
    assert(out.forall(_.getAs[Int]("alarm_neg") == 0))
  }

  test("cusum fires on a planted level shift, with the hand value") {
    // baseline 7 days at 100 (mu0 = 100), then 200: first jump period
    // accumulates (200 - 100 - 5) = 95 -> s_pos = 95, above h = 50
    val df = ((0L until 7L).map(p => (p, 100L)) ++
      (7L until 12L).map(p => (p, 200L))).toDF("period", "v")
    val out = Stats.cusum(df, "period", "v").orderBy("period").collect()
    assert(out(6).getAs[Int]("alarm_pos") == 0)
    assert(out(7).getAs[Double]("s_pos") == 95.0)
    assert(out(7).getAs[Int]("alarm_pos") == 1)
    assert(out.last.getAs[Int]("alarm_pos") == 1)
    assert(out.forall(_.getAs[Int]("alarm_neg") == 0))
  }

  test("cusum catches a downward drift on the negative side") {
    val df = ((0L until 7L).map(p => (p, 100L)) ++
      (7L until 14L).map(p => (p, 30L))).toDF("period", "v")
    val out = Stats.cusum(df, "period", "v").orderBy("period").collect()
    assert(out.last.getAs[Int]("alarm_neg") == 1)
    assert(out.last.getAs[Int]("alarm_pos") == 0)
  }

  test("cusum guards a short or empty baseline loudly") {
    val df = (0L until 3L).map(p => (p, 10L)).toDF("period", "v")
    val e = intercept[Exception] {
      Stats.cusum(df, "period", "v", baselinePeriods = 7).collect()
    }
    assert(e.getMessage.contains("baseline"))
  }

  test("msprt reports null stats with p = 1 before both arms have data") {
    val rows = Seq((0, 10L, 0L), (0, 11L, 0L), (0, 12L, 0L),
      (0, 13L, 1L), (1, 10L, 1L), (1, 12L, 1L),
      (0, 11L, 2L), (1, 13L, 2L))
    val out = Stats.msprt(rows.toDF("arm", "v", "period"),
        "arm", "v", "period", tau2 = 1.0)
      .orderBy("period").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("delta")))
    assert(out(0).getAs[Double]("p_always_valid") == 1.0)
    assert(!out(2).isNullAt(out(2).fieldIndex("delta")))
  }
}
