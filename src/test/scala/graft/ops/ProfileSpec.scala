package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  import spark.implicits._

  test("columnProfile counts rows, nulls and distincts per column") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (None, Some("b")), (Some(3), Some("b")))
      .toDF("x", "s")
    val out = Profile.columnProfile(df)
    assert(rows(out) == Set(
      Seq("x", 4L, 1L, 2L), // distinct ignores the null
      Seq("s", 4L, 1L, 2L)))
  }

  test("columnProfile validates column names and respects the subset") {
    val df = Seq((1, 2)).toDF("a", "b")
    assert(Profile.columnProfile(df, Seq("b")).count() == 1)
    intercept[IllegalArgumentException] {
      Profile.columnProfile(df, Seq("nope"))
    }
  }

  test("histogram buckets [lo,hi) with under/overflow and null-skip") {
    val df = Seq[Option[Double]](
      Some(-1.0), Some(0.0), Some(5.0), Some(9.9), Some(10.0), Some(25.0),
      None).toDF("v")
    val out = Profile.histogram(df, "v", lo = 0.0, hi = 10.0, nBuckets = 2)
    assert(rows(out) == Set(
      Seq(0L, null, null, 1L), // -1 underflows
      Seq(1L, 0.0, 5.0, 1L), // 0.0 only: edges are half-open
      Seq(2L, 5.0, 10.0, 2L), // 5.0 and 9.9
      Seq(3L, null, null, 2L))) // 10.0 (hi is exclusive) and 25.0
  }

  test("histogram validates its parameters") {
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException] {
      Profile.histogram(df, "v", 0.0, 10.0, 0)
    }
    intercept[IllegalArgumentException] {
      Profile.histogram(df, "v", 10.0, 10.0, 4)
    }
  }

  test("keySkew reports top-K shares with deterministic tie-break") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(2)("b") ++ Seq.fill(2)("a") ++
      Seq("c") ++ Seq(null.asInstanceOf[String])).toDF("k")
    val out = Profile.keySkew(df, "k", topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // null excluded from counts AND the total; count ties break by key asc
    assert(out.toSeq == Seq(
      ("hot", 6L, 0.545455), ("a", 2L, 0.181818), ("b", 2L, 0.181818)))
  }

  test("keySkew plans a TakeOrdered top-K, not a global sort") {
    val df = Seq.tabulate(100)(i => s"k${i % 37}").toDF("k")
    val q = Profile.keySkew(df, "k", topK = 5)
    q.collect() // materialize so AQE finalizes the stages
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Sort ["), plan) // no global sort anywhere
  }

  test("iqrOutliers fences at q1/q3 ± 1.5·IQR per key") {
    // key a: values 0..100 by 10 plus an extreme 1000 → exactly one
    // outlier; key b: tight cluster, none.
    val a = (0 to 100 by 10).map(v => ("a", v.toLong)) :+ (("a", 1000L))
    val b = Seq(("b", 5L), ("b", 6L), ("b", 7L))
    val df = (a ++ b).toDF("k", "v")
    val out = Profile.iqrOutliers(df, Seq("k"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("a", 12L, 1L), ("b", 3L, 0L)))
  }

  test("winsorizeIqr clips to the fences and keeps every row") {
    val a = (0 to 100 by 10).map(v => ("a", v.toLong)) :+ (("a", 1000L))
    val df = a.toDF("k", "v")
    // fences: q1=27.5, q3=82.5, IQR=55 → [-55, 165]; only 1000 clips
    val out = Profile.winsorizeIqr(df, Seq("k"), "v")
    assert(out.count() == 12)
    val clipped = out.collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(clipped(1000L) == 165.0)
    assert(clipped(0L) == 0.0 && clipped(100L) == 100.0) // inside: untouched
    val nulls = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)),
      ("a", Some(3L))).toDF("k", "v")
    val nOut = Profile.winsorizeIqr(nulls, Seq("k"), "v").collect()
    assert(nOut.count(_.isNullAt(2)) == 1) // NULL passes through
  }

  test("iqrOutliers guards keys, reserved names and factor") {
    val df = Seq(("a", 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Profile.iqrOutliers(df, Nil, "v")
    }
    intercept[IllegalArgumentException] {
      Profile.iqrOutliers(df, Seq("k"), "v", factor = -1.0)
    }
    intercept[IllegalArgumentException] {
      Profile.iqrOutliers(
        Seq(("a", 1L, 0.0)).toDF("k", "v", "_g_q1"), Seq("k"), "v")
    }
  }

  test("quantileBuckets assigns equal-depth buckets; boundary rows go up") {
    // values 1..100: quartile boundaries at 25.75, 50.5, 75.25
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val out = Profile.quantileBuckets(df, "v", nBuckets = 4)
      .select("v", "bucket").as[(Long, Long)].collect().toMap
    assert(out(1L) == 0L && out(25L) == 0L)
    assert(out(26L) == 1L && out(50L) == 1L)
    assert(out(51L) == 2L && out(75L) == 2L)
    assert(out(76L) == 3L && out(100L) == 3L)
    // equal depth: 25 rows per bucket
    val sizes = Profile.quantileBuckets(df, "v", 4)
      .groupBy("bucket").count().as[(Long, Long)].collect().toMap
    assert(sizes == Map(0L -> 25L, 1L -> 25L, 2L -> 25L, 3L -> 25L))
  }

  test("quantileBuckets: a row equal to an integer boundary goes up") {
    // 5 values, median boundary = exactly 30: the 30 row lands in the
    // upper bucket (left-open boundary intervals)
    val df = Seq(10L, 20L, 30L, 40L, 50L).toDF("v")
    val out = Profile.quantileBuckets(df, "v", nBuckets = 2)
      .select("v", "bucket").as[(Long, Long)].collect().toMap
    assert(out(20L) == 0L && out(30L) == 1L && out(40L) == 1L)
    intercept[IllegalArgumentException] {
      Profile.quantileBuckets(df, "v", nBuckets = 1)
    }
  }

  test("kAnonymity flags exactly the small equivalence classes") {
    // class (25, 'F') has 3 records < k=3? no — violation is < k, so
    // 3 is safe at k=3; (30, 'M') has 1 → flagged; nulls form their
    // own class
    val df = Seq(
      (25, "F"), (25, "F"), (25, "F"),
      (30, "M"),
      (40, null), (40, null)).toDF("age", "sex")
    val out = Profile.kAnonymity(df, Seq("age", "sex"), k = 3)
      .collect().map(r => (r.get(0), Option(r.get(1))) ->
        ((r.getAs[Long]("n_records"), r.getAs[Int]("is_violation")))).toMap
    assert(out((25, Some("F"))) == ((3L, 0)))
    assert(out((30, Some("M"))) == ((1L, 1)))
    assert(out((40, None)) == ((2L, 1)))
    intercept[IllegalArgumentException] {
      Profile.kAnonymity(df, Seq(), k = 3)
    }
  }

  test("lDiversity catches the homogeneity attack kAnonymity misses") {
    // class 'a': 4 records but ONE sensitive value → distinct_l 1,
    // entropy_l 1.0, violation at l=2; class 'b': 2/2 split →
    // distinct_l 2, entropy_l = exp(ln 2) = 2, safe
    val df = Seq(
      ("a", "flu"), ("a", "flu"), ("a", "flu"), ("a", "flu"),
      ("b", "flu"), ("b", "flu"), ("b", "cold"), ("b", "cold"))
      .toDF("zip", "diag")
    val out = Profile.lDiversity(df, Seq("zip"), "diag", l = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n_records") == 4L)
    assert(out("a").getAs[Long]("distinct_l") == 1L)
    assert(out("a").getAs[Double]("entropy_l") == 1.0)
    assert(out("a").getAs[Int]("is_violation") == 1)
    assert(out("b").getAs[Long]("distinct_l") == 2L)
    assert(math.abs(out("b").getAs[Double]("entropy_l") - 2.0) < 1e-5)
    assert(out("b").getAs[Int]("is_violation") == 0)
  }

  test("lDiversity: entropy l punishes skew that distinct l forgives") {
    // 9/1 split: distinct_l = 2 passes l=2, but entropy l ≈ 1.38 —
    // the stricter bar the caller can gate on
    val df = (Seq.fill(9)(("z", "flu")) :+ (("z", "rare")))
      .toDF("zip", "diag")
    val r = Profile.lDiversity(df, Seq("zip"), "diag", l = 2)
      .collect().head
    assert(r.getAs[Long]("distinct_l") == 2L)
    assert(r.getAs[Int]("is_violation") == 0)
    val el = r.getAs[Double]("entropy_l")
    assert(el > 1.3 && el < 1.5, s"entropy_l was $el")
  }

  test("tCloseness: EMD against the global distribution, hand case") {
    // global over {1,2}: 50/50. class 'a' = all 1s → cum diff at v=1
    // is |1.0 − 0.5| = 0.5, at v=2 it's 0; t = 0.5/(2−1) = 0.5.
    // class 'b' mirrors. Both flagged at threshold 0.2.
    val df = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L))
      .toDF("zip", "band")
    val out = Profile.tCloseness(df, Seq("zip"), "band", threshold = 0.2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("t") == 0.5)
    assert(out("a").getAs[Int]("is_violation") == 1)
    assert(out("b").getAs[Double]("t") == 0.5)
    assert(out("b").getAs[Int]("is_violation") == 1)
  }

  test("tCloseness: a class matching the global distribution scores 0") {
    val df = Seq(
      ("u", 1L), ("u", 2L), ("u", 3L),
      ("v", 1L), ("v", 2L), ("v", 3L)).toDF("zip", "band")
    val out = Profile.tCloseness(df, Seq("zip"), "band", threshold = 0.2)
      .collect()
    assert(out.forall(_.getAs[Double]("t") == 0.0))
    assert(out.forall(_.getAs[Int]("is_violation") == 0))
  }

  test("tCloseness: oversized sensitive domain fails loudly") {
    val df = (1L to 50L).map(v => ("z", v)).toDF("zip", "band")
    val e = intercept[Exception] {
      Profile.tCloseness(df, Seq("zip"), "band", threshold = 0.2,
        maxDomain = 10).collect()
    }
    assert(e.getMessage.contains("maxDomain"))
  }

  // ------------------------------------------------ dpNoisyCounts (q329)

  test("dpNoisyCounts is reproducible and epsilon-scaled") {
    val df = (1L to 200L).map(i => (s"g${i % 4}", i)).toDF("g", "id")
    val a = Profile.dpNoisyCounts(df, Seq("g"), epsilon = 100.0)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("noisy_count"))
      .toMap
    val b = Profile.dpNoisyCounts(df.repartition(7), Seq("g"),
        epsilon = 100.0)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("noisy_count"))
      .toMap
    assert(a == b)
    // epsilon = 100: Lap(0.01) noise — counts off by at most 1
    assert(a.values.forall(v => math.abs(v - 50L) <= 1L))
  }

  test("dpNoisyCounts clamps negative releases to zero") {
    // tiny counts + tiny epsilon: some noisy counts would go negative
    val df = (1L to 40L).map(i => (s"g${i % 20}", i)).toDF("g", "id")
    val out = Profile.dpNoisyCounts(df, Seq("g"), epsilon = 0.01)
      .collect()
    assert(out.forall(_.getAs[Long]("noisy_count") >= 0L))
    // and the noise actually moves at least one group (true count 2)
    assert(out.exists(_.getAs[Long]("noisy_count") != 2L))
    assert(out.forall(_.getAs[Double]("epsilon") == 0.01))
  }

  test("dpNoisyCounts: different salts draw independent noise") {
    val df = (1L to 400L).map(i => (s"g${i % 8}", i)).toDF("g", "id")
    def rel(salt: String) =
      Profile.dpNoisyCounts(df, Seq("g"), epsilon = 0.5, salt = salt)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("noisy_count"))
        .toMap
    assert(rel("dp") != rel("dp2"))
  }

  // ------------------------------------------------- benfordAudit (q310)

  test("benfordAudit digits come from the decimal string, shares hand-check") {
    // 10 values: digit 1 ×5, digit 2 ×3, digit 9 ×2 — including
    // boundary values where float log10 could misbucket
    val df = Seq(1L, 10L, 199L, 1000000L, 123456L,
      2L, 25L, 299999L, 9L, 999999L).toDF("v")
    val out = Profile.benfordAudit(df, "v").collect()
      .map(r => r.getAs[Int]("digit") -> r).toMap
    assert(out.size == 9)
    assert(out(1).getAs[Long]("n_obs") == 5L)
    assert(out(2).getAs[Long]("n_obs") == 3L)
    assert(out(9).getAs[Long]("n_obs") == 2L)
    assert(out(3).getAs[Long]("n_obs") == 0L)
    assert(out(1).getAs[Double]("obs_share") == 0.5)
    // expected share of digit 1 is log10(2) = 0.301030 at d6
    assert(out(1).getAs[Double]("exp_share") == 0.30103)
    // chi2 and mad are constant across rows
    assert(out.values.map(_.getAs[Double]("chi2")).toSet.size == 1)
    assert(out.values.map(_.getAs[Double]("mad")).toSet.size == 1)
  }

  test("benfordAudit: a Benford-exact sample scores near-zero MAD") {
    // counts proportional to log10(1+1/d) out of 1000
    val counts = (1 to 9).map(d =>
      d -> math.round(1000 * math.log10(1.0 + 1.0 / d)))
    val df = counts.flatMap { case (d, n) =>
      (1L to n).map(i => d.toLong * math.pow(10, 3).toLong + i % 1000)
    }.toDF("v")
    val r = Profile.benfordAudit(df, "v").collect().head
    assert(r.getAs[Double]("mad") < 0.001)
    assert(r.getAs[Double]("chi2") < 1.0)
  }

  test("benfordAudit ignores non-positive values and guards empty input") {
    val df = Seq(-5L, 0L, 7L).toDF("v")
    val out = Profile.benfordAudit(df, "v").collect()
    assert(out.map(_.getAs[Long]("n_obs")).sum == 1L)
    val bad = Seq(-1L, 0L).toDF("v")
    val e = intercept[Exception] {
      Profile.benfordAudit(bad, "v").collect()
    }
    assert(e.getMessage.contains("no positive"))
  }

  test("skewAdvisor: exact counts, d6 shares, ceil-salt per heavy key") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val out = Profile.skewAdvisor(df, Seq("k"), targetRowsPerTask = 2L)
      .collect()
      .map(r => r.getString(1) -> ((r.getLong(0), r.getLong(2),
        r.getAs[Double]("share"), r.getLong(4), r.getLong(5),
        r.getLong(6)))).toMap
    assert(out("a") == ((1L, 6L, 0.6, 3L, 10L, 3L)))
    assert(out("b") == ((2L, 3L, 0.3, 2L, 10L, 3L)))
    assert(out("c") == ((3L, 1L, 0.1, 1L, 10L, 3L)))
  }

  test("skewAdvisor: topK truncates on the (count desc, key asc) order") {
    val df = (Seq.fill(5)("z") ++ Seq.fill(5)("y") ++ Seq("x")).toDF("k")
    val keys = Profile.skewAdvisor(df, Seq("k"), 100L, topK = 2)
      .collect().map(_.getString(1)).toSeq
    assert(keys == Seq("y", "z")) // tie on 5 → key asc
  }
}
