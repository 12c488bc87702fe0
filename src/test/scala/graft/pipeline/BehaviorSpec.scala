package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  // (user, type, ts) — u1 completes a→b→c; u2 stalls at b (c precedes
  // b); u3 completes a→b but c lands outside the span; u4 never starts.
  private def fixture = Seq(
    (1L, "a", 100L), (1L, "b", 200L), (1L, "c", 300L),
    (2L, "a", 100L), (2L, "c", 150L), (2L, "b", 200L),
    (3L, "a", 100L), (3L, "b", 500L), (3L, "c", 1300L),
    (4L, "b", 100L), (4L, "c", 200L)
  ).toDF("user_id", "event_type", "ts")

  test("funnelUsers binds each step greedily within the span") {
    val out = Behavior.funnelUsers(fixture, "user_id", "event_type", "ts",
      steps = Seq("a", "b", "c"), maxSpan = 1000L)
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      (1L, 100L, Some(200L), Some(300L)),
      (2L, 100L, Some(200L), None), // c at 150 precedes b — not counted
      (3L, 100L, Some(500L), None) // c at 1300 > 100+1000
    ))
  }

  test("funnelCounts is non-increasing and matches funnelUsers") {
    val counts = Behavior.funnelCounts(fixture, "user_id", "event_type",
      "ts", steps = Seq("a", "b", "c"), maxSpan = 1000L)
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(counts.toSeq == Seq((1, "a", 3L), (2, "b", 3L), (3, "c", 1L)))
  }

  test("funnel greedy-first semantics: an early step-2 can forfeit step 3") {
    // b binds at 200 (greedy); the only c (150) precedes it, even though
    // binding b to a later occurrence could never help here — but with
    // b at 200 AND 400 and c at 300, greedy still completes via c > 200.
    val df = Seq(
      (1L, "a", 100L), (1L, "b", 200L), (1L, "b", 400L), (1L, "c", 300L)
    ).toDF("user_id", "event_type", "ts")
    val row = Behavior.funnelUsers(df, "user_id", "event_type", "ts",
      Seq("a", "b", "c"), maxSpan = 1000L).collect().head
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((100L, 200L, 300L)))
  }

  test("transitions counts adjacent pairs with deterministic tie-break") {
    val df = Seq(
      // u1: a->b->b->c; the two ts=200 events order by event_id (2 then 3)
      (1L, 1L, "a", 100L), (1L, 2L, "b", 200L), (1L, 3L, "b", 200L),
      (1L, 4L, "c", 300L),
      (2L, 5L, "a", 100L) // single event: no transition
    ).toDF("user_id", "event_id", "event_type", "ts")
    val out = Behavior.transitions(df, "user_id", "event_type", "ts",
      tieCol = "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(("a", "b", 1L), ("b", "b", 1L), ("b", "c", 1L)))
  }

  test("cohortRetention assigns cohorts by first activity period") {
    val df = Seq(
      (1L, 5L), (1L, 15L), (1L, 25L), // cohort 0, active 0/1/2
      (2L, 15L), (2L, 35L), // cohort 1, active offsets 0 and 2
      (3L, 15L) // cohort 1, offset 0 only
    ).toDF("user_id", "ts")
    val out = Behavior.cohortRetention(df, "user_id", "ts", periodLen = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 2L), (1L, 2L, 1L)))
  }

  test("streaks groups consecutive periods into islands") {
    val df = Seq(
      // u1: periods 0,1,2 then 5,6 → streaks of 3 and 2
      (1L, 5L), (1L, 15L), (1L, 25L), (1L, 55L), (1L, 65L),
      // u2: 0 and 2 → two singleton streaks; tie on max len breaks to
      // the EARLIEST start
      (2L, 5L), (2L, 25L),
      // duplicate events inside one period collapse
      (3L, 5L), (3L, 6L)
    ).toDF("user_id", "ts")
    val out = Behavior.streaks(df, "user_id", "ts", periodLen = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (1L, 2L, 3L, 0L), // 2 streaks, longest 3 starting at period 0
      (2L, 2L, 1L, 0L), // tie → earliest start
      (3L, 1L, 1L, 0L)))
  }

  test("interArrivalStats: hand-computed moments, <3-event keys omitted") {
    // user 1: ts 0,10,30 → gaps 10,20: mean 15, var (2·500−900)/2 = 50,
    // cv = sqrt(50)/15; user 2: one gap → omitted; user 3: metronomic
    // gaps 5,5,5 → cv exactly 0
    val df = Seq(
      (1L, 0L), (1L, 10L), (1L, 30L),
      (2L, 0L), (2L, 5L),
      (3L, 0L), (3L, 5L), (3L, 10L), (3L, 15L))
      .toDF("user_id", "ts_us")
    val got = Behavior.interArrivalStats(df, "user_id", "ts_us")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got.keySet == Set(1L, 3L))
    // cv d6-rounds: sqrt(50)/15 = 0.4714045… → 0.471405
    assert(got(1L) == ((3L, 10L, 20L, 15L, 0.471405)))
    assert(got(3L) == ((4L, 5L, 5L, 5L, 0.0)))
  }

  test("sessionPaths: gap split, tie order, truncation, top-k") {
    // u1: a,b then (gap) c — two sessions "a>b" and "c"; u2: a,b in one
    // session (tied ts at 100 orders by event_id: 1 before 2); u3: a
    // 12-event session truncates to its first 10 types
    val rows = Seq(
      (1L, 1L, "a", 100L), (1L, 2L, "b", 200L), (1L, 3L, "c", 5000L),
      (2L, 1L, "a", 100L), (2L, 2L, "b", 100L)) ++
      (1L to 12L).map(i => (3L, i, (if (i <= 10) "x" else "y"), 100L + i))
    val df = rows.toDF("user_id", "event_id", "event_type", "ts")
    // numeric gap over the long ts: 1000 µs
    val got = Behavior.sessionPaths(df, "user_id", "event_type", "ts",
        gap = "1000", tieBreak = Seq("event_id"), maxLen = 10, topK = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "a>b" -> 2L, "c" -> 1L,
      "x>x>x>x>x>x>x>x>x>x" -> 1L))
    // topK cuts on (count DESC, path ASC)
    val top1 = Behavior.sessionPaths(df, "user_id", "event_type", "ts",
        gap = "1000", tieBreak = Seq("event_id"), topK = 1)
      .collect().map(_.getString(0)).toSeq
    assert(top1 == Seq("a>b"))
  }

  test("funnelDelays: per-step delay distribution from greedy bindings") {
    // u1: a@100 → b@300 → c@600 (delays 200, 500)
    // u2: a@100 → b@200 (delay 100), no c in span
    // u3: a only. step-b delays {100,200}: p50 = 150/1e6 s; step-c {500}
    val df = Seq(
      (1L, "a", 100L), (1L, "b", 300L), (1L, "c", 600L),
      (2L, "a", 100L), (2L, "b", 200L), (2L, "c", 2000L),
      (3L, "a", 100L)
    ).toDF("user_id", "event_type", "ts")
    val got = Behavior.funnelDelays(df, "user_id", "event_type", "ts",
        steps = Seq("a", "b", "c"), maxSpan = 1000L)
      .collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got(2) == (("b", 2L, 100L, 200L, 1.5e-4, 1.9e-4)))
    assert(got(3) == (("c", 1L, 500L, 500L, 5.0e-4, 5.0e-4)))
  }

  test("reserved-name guards reject colliding inputs") {
    val bad = Seq((1L, "a", 1L, 1L)).toDF("user_id", "event_type", "ts", "_g_ts")
    intercept[IllegalArgumentException] {
      Behavior.funnelUsers(bad, "user_id", "event_type", "ts", Seq("a", "b"), 10L)
    }
    intercept[IllegalArgumentException] {
      Behavior.funnelUsers(bad.drop("_g_ts"), "user_id", "event_type", "ts",
        Seq("a"), 10L) // < 2 steps
    }
    intercept[IllegalArgumentException] {
      Behavior.cohortRetention(
        Seq((1L, 1L, 1L)).toDF("user_id", "ts", "_g_period"),
        "user_id", "ts", 10L)
    }
  }

  test("attribution: journeys reset at conversions; first/last credit") {
    // user 1: view, click, BUY, click, BUY  → journey 0: first=view,
    // last=click; journey 1: first=last=click
    // user 2: BUY (no touches → no credit), then view (no conversion
    // → no credit)
    val ev = Seq(
      (1L, 10L, 100L, "view"), (1L, 11L, 200L, "click"),
      (1L, 12L, 300L, "buy"), (1L, 13L, 400L, "click"),
      (1L, 14L, 500L, "buy"),
      (2L, 20L, 100L, "buy"), (2L, 21L, 200L, "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Behavior.attribution(ev, "user_id", "event_id", "ts",
        "event_type", convType = "buy")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("first_touch"), r.getAs[Long]("last_touch"))))
      .toMap
    assert(out("view") == ((1L, 0L)))
    assert(out("click") == ((1L, 2L)))
    assert(!out.contains("buy"))
  }

  test("shapleyAttribution: conservation, solo credit, symmetry") {
    // journey 1 (user 1): touches {a} → conv: a gets full credit 1
    // journey 2 (user 2): touches {a, b} → conv: symmetric → 0.5 each
    // user 3: conv with no touches → contributes nothing
    val ev = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "conv"),
      (2L, 3L, 10L, "a"), (2L, 4L, 15L, "b"), (2L, 5L, 20L, "conv"),
      (3L, 6L, 10L, "conv"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Behavior.shapleyAttribution(ev, "user_id", "event_id",
        "ts", "event_type", "conv")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_journeys"), r.getAs[Double]("shapley")))).toMap
    assert(out("a") == ((2L, 1.5)))  // full 1 + shared 0.5
    assert(out("b") == ((1L, 0.5)))
    // conservation: sum of credit = attributed conversions (2, not 3)
    assert(out.values.map(_._2).sum == 2.0)
  }

  test("shapleyAttribution: channel-cardinality guard fires") {
    val ev = (0L until 20L).map(i =>
      (1L, i, i * 10, s"ch$i")).toDF("user_id", "event_id", "ts",
      "event_type")
    val e = intercept[IllegalArgumentException] {
      Behavior.shapleyAttribution(
        ev.unionByName(Seq((1L, 99L, 999L, "conv"))
          .toDF("user_id", "event_id", "ts", "event_type")),
        "user_id", "event_id", "ts", "event_type", "conv",
        maxChannels = 8)
    }
    assert(e.getMessage.contains("maxChannels"))
  }

  test("attribution: timestamp ties break by event id") {
    val ev = Seq(
      (1L, 2L, 100L, "b_touch"), (1L, 1L, 100L, "a_touch"),
      (1L, 3L, 200L, "conv")).toDF("user_id", "event_id", "ts",
      "event_type")
    val out = Behavior.attribution(ev, "user_id", "event_id", "ts",
        "event_type", "conv")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("first_touch"), r.getAs[Long]("last_touch"))))
      .toMap
    assert(out("a_touch") == ((1L, 0L))) // lower id wins the tie
    assert(out("b_touch") == ((0L, 1L)))
  }

  test("associationRules: hand-checkable support/confidence/lift") {
    // baskets (per user): u1 {a,b} (a twice — distinct collapses it),
    // u2 {a,b}, u3 {a}, u4 {b,c}. (b,c) co-occurs once → cut at
    // minCount 2.
    val ev = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (4L, "b"), (4L, "c"))
      .toDF("user_id", "event_type")
    val out = Behavior.associationRules(ev, Seq("user_id"), "event_type",
      minCount = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out.keySet == Set(("a", "b"), ("b", "a")))
    // a→b: 2 baskets of 4; conf 2/3; lift (2·4)/(3·3)
    assert(out(("a", "b")) == ((2L, 0.5, 0.666667, 0.888889)))
    assert(out(("b", "a")) == ((2L, 0.5, 0.666667, 0.888889)))
  }

  // Viterbi fixture HMM: sticky states (stay +1, switch −1), obs "a"
  // strongly prefers state A (+2/−2), "b" prefers state B (−2/+2),
  // "n" is neutral (0/0). Start (0, 0).
  private def viterbi(df: org.apache.spark.sql.DataFrame, maxLen: Int = 100) =
    Behavior.viterbiDecode(df, "user_id", "event_type", "ts", "event_id",
      emit = Seq(("a", 2L, -2L), ("b", -2L, 2L), ("n", 0L, 0L)),
      start = (0L, 0L), trans = (1L, -1L, -1L, 1L), maxLen = maxLen)

  test("viterbiDecode recovers the planted regime switch") {
    val ev = Seq(
      (1L, 1L, 100L, "a"), (1L, 2L, 200L, "a"), (1L, 3L, 300L, "b"),
      (1L, 4L, 400L, "b")).toDF("user_id", "event_id", "ts", "event_type")
    val r = viterbi(ev).collect().head
    // AABB: 2 + (1+2) + (−1+2) + (1+2) = 9
    assert(r.getAs[String]("path") == "AABB")
    assert(r.getAs[Long]("best_score") == 9L)
    assert(r.getAs[Long]("n_obs") == 4L)
  }

  test("viterbiDecode stickiness smooths an isolated contrary observation") {
    // a a b a a — switching to B for the lone b costs two transitions
    // (−1 −1) for an emission gain of 4: path stays AAAAA only if the
    // stay bonus wins; here scores say switch: AABAA = 2+3+1+1+3 = 10
    // vs AAAAA = 2+3−1+3+3 = 10 — a TIE, resolved to the lower state
    // path AAAAA by the >= discipline.
    val ev = Seq(
      (1L, 1L, 100L, "a"), (1L, 2L, 200L, "a"), (1L, 3L, 300L, "b"),
      (1L, 4L, 400L, "a"), (1L, 5L, 500L, "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = viterbi(ev).collect().head
    assert(r.getAs[Long]("best_score") == 10L)
    assert(r.getAs[String]("path") == "AAAAA")
  }

  test("viterbiDecode truncates to maxLen and orders ties by event id") {
    val ev = Seq(
      (1L, 2L, 100L, "b"), (1L, 1L, 100L, "a"), (1L, 3L, 200L, "b"),
      (1L, 4L, 300L, "b")).toDF("user_id", "event_id", "ts", "event_type")
    val r = viterbi(ev, maxLen = 3).collect().head
    // order a(id1) b(id2) b(id3); truncated to 3 obs: ABB = 2+1+3 = 6
    assert(r.getAs[Long]("n_obs") == 3L)
    assert(r.getAs[String]("path") == "ABB")
    assert(r.getAs[Long]("best_score") == 6L)
  }

  test("viterbiDecode scores unknown event types 0 in both states") {
    val ev = Seq(
      (1L, 1L, 100L, "a"), (1L, 2L, 200L, "zzz"), (1L, 3L, 300L, "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = viterbi(ev).collect().head
    // A?A with ?=A (stay beats switch-and-back): 2 + (1+0) + (1+2) = 6
    assert(r.getAs[String]("path") == "AAA")
    assert(r.getAs[Long]("best_score") == 6L)
  }

  // ------------------------------------------- stationaryDistribution

  private def piOf(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("stationaryDistribution: deterministic cycle is exactly uniform") {
    // one user walks a→b→c→a: P is the cyclic permutation, whose
    // stationary vector is uniform — and the quantized iteration holds
    // floor(10⁶/3) = 333333 per state at EVERY step (permutations
    // only reorder), so 30 iters emit exactly 0.333333 each
    val ev = Seq(
      (1L, 1L, 100L, "a"), (1L, 2L, 200L, "b"),
      (1L, 3L, 300L, "c"), (1L, 4L, 400L, "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = piOf(Behavior.stationaryDistribution(
      ev, "user_id", "event_type", "ts", "event_id"))
    assert(out == Map("a" -> 0.333333, "b" -> 0.333333, "c" -> 0.333333))
  }

  test("stationaryDistribution: a sink state self-loops and absorbs") {
    // a→b only: b has no outgoing transitions, so it self-loops (the
    // absorbing convention) and all mass drains into it by iter 1
    val ev = Seq((1L, 1L, 100L, "a"), (1L, 2L, 200L, "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = piOf(Behavior.stationaryDistribution(
      ev, "user_id", "event_type", "ts", "event_id"))
    assert(out == Map("a" -> 0.0, "b" -> 1.0))
  }

  test("stationaryDistribution matches the hand-replayed quantized " +
    "iteration on a 2-state chain (planted counts, known fixed point)") {
    // counts: a→a 1, a→b 1, b→a 1 ⇒ P = [[.5,.5],[1,0]], exact
    // stationary vector (2/3, 1/3). The operator's contract is the
    // QUANTIZED trajectory, replayed here in plain Scala: p6 rows
    // (500000, 500000) and (1000000, 0), pi₀ = (500000, 500000),
    // π′_j = floor(Σ_i π_i·p6[i][j] / 10⁶), 30 steps
    val ev = Seq(
      (1L, 1L, 100L, "a"), (1L, 2L, 200L, "a"),
      (1L, 3L, 300L, "b"), (1L, 4L, 400L, "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val p6 = Array(Array(500000L, 500000L), Array(1000000L, 0L))
    var pi = Array(500000L, 500000L)
    for (_ <- 1 to 30) {
      pi = Array.tabulate(2)(j =>
        math.floorDiv((0 until 2).map(i => pi(i) * p6(i)(j)).sum, 1000000L))
    }
    val expected = Map(
      "a" -> BigDecimal(pi(0).toDouble / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      "b" -> BigDecimal(pi(1).toDouble / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val out = piOf(Behavior.stationaryDistribution(
      ev, "user_id", "event_type", "ts", "event_id"))
    assert(out == expected)
    // and the quantized trajectory sits on the true fixed point
    assert(math.abs(out("a") - 2.0 / 3.0) < 1e-3, out)
    assert(math.abs(out("b") - 1.0 / 3.0) < 1e-3, out)
  }

  test("transitionEntropy: deterministic chain has U = 1; " +
    "single-state chain answers NULL U") {
    // a,b,a,b,a: a→b and b→a only — next is fully determined by prev
    val ev = (1L to 5L).map(i =>
      (1L, i, i * 100L, if (i % 2 == 1) "a" else "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = Behavior.transitionEntropy(
      ev, "user_id", "event_type", "ts", "event_id").collect().head
    assert(r.getAs[Long]("n_transitions") == 4L)
    assert(r.getAs[Double]("h_cond") == 0.0)
    assert(r.getAs[Double]("h_next") == 0.693147) // ln 2, d6
    assert(r.getAs[Double]("uncertainty_coeff") == 1.0)
    val mono = Seq((1L, 1L, 100L, "a"), (1L, 2L, 200L, "a"),
      (1L, 3L, 300L, "a")).toDF("user_id", "event_id", "ts", "event_type")
    val rm = Behavior.transitionEntropy(
      mono, "user_id", "event_type", "ts", "event_id").collect().head
    assert(rm.getAs[Double]("h_next") == 0.0)
    assert(rm.isNullAt(rm.fieldIndex("uncertainty_coeff")))
  }

  test("stationaryDistribution: the maxStates guard fires loudly") {
    val ev = Seq(
      (1L, 1L, 100L, "a"), (1L, 2L, 200L, "b"), (1L, 3L, 300L, "c"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val e = intercept[Exception] {
      Behavior.stationaryDistribution(
        ev, "user_id", "event_type", "ts", "event_id",
        maxStates = 2).collect()
    }
    assert(e.getMessage.contains("exceeds maxStates"),
      s"unexpected: ${e.getMessage}")
  }

  test("orderedPairSupport: existence counts once per user, ties do " +
    "not count, repeats support both directions; type blow-up is loud") {
    // u1: a@1 b@2 → (a,b); u2: b@1 a@2 → (b,a); u3: a@1 b@1 tie →
    // neither; u4: a@1 a@5 b@3 → both directions
    val ev = Seq((1L, "a", 1L), (1L, "b", 2L),
      (2L, "b", 1L), (2L, "a", 2L),
      (3L, "a", 1L), (3L, "b", 1L),
      (4L, "a", 1L), (4L, "a", 5L), (4L, "b", 3L))
      .toDF("u", "t", "ts")
    val out = Behavior.orderedPairSupport(ev, "u", "t", "ts")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == Set(("a", "b"), ("b", "a")))
    assert(out(("a", "b")).getAs[Long]("n_users") == 2L)
    assert(out(("b", "a")).getAs[Long]("n_users") == 2L)
    assert(out(("a", "b")).getAs[Long]("n_users_total") == 4L)
    assert(out(("a", "b")).getAs[Double]("support") == 0.5)
    val loud = intercept[Exception] {
      Behavior.orderedPairSupport(
        Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L))
          .toDF("u", "t", "ts"),
        "u", "t", "ts", maxTypesPerUser = 2).collect()
    }
    assert(loud.getMessage.contains("maxTypesPerUser"), loud.getMessage)
  }

  test("rfmSegments: five cleanly separated users land in five " +
    "diagonal segments with exact quintile codes") {
    // user u: active only day u, u events, u dollars → rec sorts
    // opposite to f and m
    val ev = (1 to 5).flatMap(u => (1 to u).map(i =>
      (u.toLong, u.toLong, 100L))).toDF("u", "day", "cents")
    val out = Behavior.rfmSegments(ev, "u", "day", "cents")
      .collect()
    assert(out.length == 5)
    assert(out.forall(_.getAs[Long]("n_users") == 1L))
    assert(out.forall(_.getAs[Double]("user_frac") == 0.2))
    val codes = out.map(r => (r.getAs[Long]("r_code"),
      r.getAs[Long]("f_code"), r.getAs[Long]("m_code"))).toSet
    // recency code runs OPPOSITE to frequency/monetary here: the
    // most recent (u = 5) is also the heaviest user
    assert(codes == Set((5L, 1L, 1L), (4L, 2L, 2L), (3L, 3L, 3L),
      (2L, 4L, 4L), (1L, 5L, 5L)), codes.toString)
  }

  test("dauMauStickiness: hand trailing-window ratios over a " +
    "three-user fixture") {
    val ev = ((1L to 7L).map(d => (1L, d)) :+ ((2L, 7L)) :+
      ((3L, 1L))).toDF("u", "day")
    val out = Behavior.dauMauStickiness(ev, "u", "day", window = 7)
      .collect().map(r => r.getAs[Long]("day") -> r).toMap
    assert(out(1L).getAs[Long]("dau") == 2L)
    assert(out(1L).getAs[Long]("mau") == 2L)
    assert(out(1L).getAs[Double]("stickiness") == 1.0)
    assert(out(7L).getAs[Long]("dau") == 2L)
    assert(out(7L).getAs[Long]("mau") == 3L)
    assert(math.abs(out(7L).getAs[Double]("stickiness") - 0.666667)
      < 1e-9)
    assert(out(4L).getAs[Long]("dau") == 1L)
  }
}
