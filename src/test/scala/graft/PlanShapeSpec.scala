package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Pins the documented plan SHAPES of flagship entries — the scale
  * claims in docs/SCALING.md stated as executable assertions, so a
  * refactor that silently adds an exchange (or turns a broadcast into
  * a sort-merge join) fails here instead of surfacing as a 100 TB
  * regression. Counts run on the pre-AQE physical plan at sf0.001,
  * PlanLintSpec's convention.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Post-EnsureRequirements plan with AQE off: sparkPlan has no
    * exchanges inserted yet, and the AQE wrapper hides them — this is
    * the concrete static plan whose exchange count the docs promise.
    */
  private def plans(name: String): Seq[SparkPlan] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
      p +: p.subqueriesAll
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
  private def shuffles(name: String): Int =
    plans(name).map(_.collect { case e: ShuffleExchangeExec => e }.size).sum

  test("q200 content extraction and q204 sentences are zero-shuffle scans") {
    assert(shuffles("q200_content_extract") == 0)
    assert(shuffles("q204_sentences") == 0)
  }

  test("q228 tagger + mixer is a zero-shuffle scan") {
    // Dolma-style tagging and mixing are both in-row struct work —
    // re-mixing must never cost an exchange
    assert(shuffles("q228_tag_mix") == 0)
  }

  test("q231 curation funnel holds its one-exchange contract") {
    // mix, classifier scoring and split are in-row; the ONLY exchange
    // is the md5-canonical dedup window (model-fit jobs run at entry
    // CONSTRUCTION, driver-side, and are not part of this plan)
    assert(shuffles("q231_curation_funnel") == 1)
  }

  test("q201 domain policy gate shuffles exactly once (the cap window)") {
    assert(shuffles("q201_domain_policy") == 1)
  }

  test("q202 end-to-end pipeline holds its two-exchange contract") {
    // the policy gate's domain-keyed window + the dedup's hash-keyed
    // window; every other stage (extraction, scrub, token gate, split)
    // must stay at the scan
    assert(shuffles("q202_pipeline_e2e") == 2)
  }

  test("q199 interleave never plans an unpartitioned window") {
    val wins = plans("q199_interleave")
      .flatMap(_.collect { case w: WindowExec => w })
    assert(wins.nonEmpty, "expected the per-domain position window")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "interleave's windows must all be domain-partitioned")
  }

  test("q255 entity resolution pairs only through the block equi-join") {
    // blocking is the whole 100 TB story: the self-join must be a hash
    // equi-join on (brand, size) — never a nested-loop/cartesian pair
    // enumeration with the JW filter applied after the fact
    val ps = plans("q255_entity_resolution")
    val nl = ps.flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
        => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c })
    assert(nl.isEmpty, s"entity resolution fell back to all-pairs: $nl")
    val eq = ps.flatMap(_.collect {
      case j: BroadcastHashJoinExec => j
      case j: SortMergeJoinExec => j })
    assert(eq.nonEmpty, "expected a hash/sort-merge equi-join on block keys")
  }

  test("q254 carries no document text below the top-k boundary") {
    // the binary-lifting LCP contract: below the (len DESC, rank)
    // top-k cut, frames hold ranks / positions / ≤16-char seed
    // prefixes only — full text joins on exactly ONCE, above the cut,
    // to render the topK previews. The old formulation attached each
    // rank's whole representative text to the corpus-sized frame
    // (L² bytes per document — the Kasai-avoidable naive-LCP cost).
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val ps = plans("q254_longest_repeats")
    val topk = ps.flatMap(_.collect { case t: TakeOrderedAndProjectExec => t })
    assert(topk.nonEmpty, "expected the top-k cut in the plan")
    val textish = (n: org.apache.spark.sql.execution.SparkPlan) =>
      n.output.exists(a => a.name == "_t" || a.name == "text")
    // below the cut: no join or exchange output carries document text
    // (scans still READ text to project lengths/seed prefixes in-row)
    topk.foreach { t =>
      assert(!t.collect {
        case j: BaseJoinExec => textish(j)
        case e: ShuffleExchangeExec => textish(e)
      }.exists(identity),
        "document text crossed a join/exchange below the top-k cut")
    }
    // above the cut: the preview attach is the one text-carrying join
    val above = ps.flatMap(_.collect { case j: BaseJoinExec => j })
      .filter(j => j.output.exists(_.name == "_t"))
    assert(above.size == 1, s"expected exactly one preview join, got $above")
  }

  test("q208 ANN-fed miner never plans the all-pairs nested loop") {
    // q197 is the DECLARED exact baseline (broadcast nested loop by
    // design); its scale composition q208 must meet candidates through
    // equi-joins only
    val nl = plans("q208_hard_negatives_ann").flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
        => j })
    assert(nl.isEmpty, s"ANN-fed miner fell back to all-pairs: $nl")
  }

  test("q352 ANN-fed DBSCAN never plans the all-pairs nested loop") {
    // q347 is the DECLARED exact baseline (hash-blocked broadcast
    // nested loop by design); its scale composition q352 must meet
    // ε-candidates through the (tbl, bucket) equi-join only — the
    // q208/q163 pin applied to clustering
    val nl = plans("q352_dbscan_ann").flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
        => j })
    assert(nl.isEmpty, s"ANN-fed DBSCAN fell back to all-pairs: $nl")
  }

  test("q445 ANN-fed hubness never plans the all-pairs nested loop") {
    // q360 is the DECLARED exact baseline (all-queries broadcast
    // nested loop by design); its scale composition q445 must meet
    // kNN candidates through the (tbl, bucket) bucket SELF-join only
    // — the q352/q208 pin applied to the hubness audit
    val nl = plans("q445_hubness_ann").flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
        => j })
    assert(nl.isEmpty, s"ANN-fed hubness fell back to all-pairs: $nl")
  }

  test("q482/q483 auto-dialed ANN twins never plan the all-pairs " +
    "nested loop — the q352/q445 pin survives the config derivation") {
    // the lshAutoConfig derivation changes (tables, bits), never the
    // plan family: candidates must still meet through bucket
    // equi-joins only
    for (q <- Seq("q482_dbscan_ann_auto", "q483_hubness_ann_auto")) {
      val nl = plans(q).flatMap(_.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
          => j })
      assert(nl.isEmpty, s"$q fell back to all-pairs: $nl")
    }
  }

  test("q384's guarded co-purchase edge stage keeps every join an " +
    "equi-join (the occupancy guard adds no cartesian)") {
    // coBucketEdges' occ-count join and the pair self-join are both
    // hash equi-joins; the raise_error guard rides the bucket key —
    // no plan-shape regression from guarding (VERDICT r15 #1)
    val nl = plans("q384_lpa").flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
        => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec
        => c })
    assert(nl.isEmpty, s"guarded edge stage planned a non-equi join: $nl")
  }

  test("q282 card audit is a zero-shuffle scan (regex + Luhn in-row)") {
    // the PII chain's whole 100 TB story: candidates, strip, length
    // gate and the codegen'd checksum are all projections
    assert(shuffles("q282_card_audit") == 0)
  }

  test("q284 percentile gate holds its one-exchange contract") {
    // rank + group count share the single group-keyed exchange
    assert(shuffles("q284_percentile_gate") == 1)
    val wins = plans("q284_percentile_gate")
      .flatMap(_.collect { case w: WindowExec => w })
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "percentileGate windows must all be group-partitioned")
  }

  test("q281 mmd and q275 containment never plan a cartesian product") {
    // q281's only nested-loop joins are the documented 1-row scalar
    // count broadcasts; a CartesianProduct (data × data) is the
    // all-pairs failure both ops exist to avoid
    Seq("q281_mmd_two_sample", "q275_containment").foreach { q =>
      val cp = plans(q).flatMap(_.collect {
        case c: org.apache.spark.sql.execution.joins
          .CartesianProductExec => c })
      assert(cp.isEmpty, s"$q fell back to a cartesian product: $cp")
    }
  }

  test("q210 fixed-size sample: the rank window reuses TopK's exchange") {
    // TopKPerKeyExec reports its child's partitioning, so the
    // sample_rank window over the same key must NOT re-shuffle
    assert(shuffles("q210_fixed_stratified") == 1)
  }

  test("q192 DSIR joins the lambda model by broadcast, never sort-merge") {
    // the tagged union-aggregate replaced the B-row full-outer join, so
    // the ONLY join in the weighting pass is the broadcast of the
    // lambda frame onto the exploded tokens
    val ps = plans("q192_dsir_select")
    val smj = ps.flatMap(_.collect { case j: SortMergeJoinExec => j })
    assert(smj.isEmpty,
      s"DSIR must not sort-merge-join anywhere: $smj")
    val bhj = ps.flatMap(_.collect { case j: BroadcastHashJoinExec => j })
    assert(bhj.nonEmpty,
      "expected the B-row lambda frame to broadcast onto the tokens")
  }

  test("AQE splits the 90%-hot plain join (the q84 regime) at runtime") {
    // docs/SCALING.md's skew story has two legs: deterministic salting
    // (Joins.salted, JoinsSpec) and AQE's runtime skew split for the
    // plain join. The second leg was only a conf claim until now — pin
    // it: a 90%-hot sort-merge join under AQE must come back with the
    // OptimizeSkewedJoin marker (SortMergeJoinExec.isSkewJoin), so a
    // future conf regression fails HERE, not as a q84 bench delta.
    // Thresholds are scaled to test-size partitions; the *decision
    // logic* (skewed-partition factor vs median) is the production one.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // q84's shape at a size where the skewed partition clears the
      // (scaled) threshold: ~90% of 200k rows on one key, dim of 50.
      val hot = spark.range(0, 200000).select(
        col("id").as("event_id"),
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 50).as("hk"),
        (col("id") * 3).as("value"))
      val dim = spark.range(0, 50)
        .select(col("id").as("hk"), (col("id") * 7).as("dim_tag"))
      val joined = hot.join(dim, Seq("hk"))
        .select(col("event_id"), col("hk"), col("value"), col("dim_tag"))
      // collect(), not count(): count() plans a NEW QueryExecution and
      // the skew marker must be read off the one that actually ran
      assert(joined.collect().length == 200000)
      val finalPlan = (joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }).toString
      // string match: the SMJ sits inside query-stage wrappers that
      // TreeNode.collect does not descend into
      assert(finalPlan.contains("SortMergeJoin"),
        s"expected a sort-merge join, got:\n$finalPlan")
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the hot join as skew-handled:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q314 Adamic-Adar pairs through equi-joins, never a cartesian") {
    // the common-neighbor generator is the (w)-keyed adjacency
    // self-join; a CartesianProduct (data x data) is the all-pairs
    // failure the hub cap exists to avoid
    val ps = plans("q314_adamic_adar")
    val cart = ps.flatMap(_.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec
        => c })
    assert(cart.isEmpty, s"adamicAdar planned a cartesian: $cart")
    val eq = ps.flatMap(_.collect {
      case j: BroadcastHashJoinExec => j
      case j: SortMergeJoinExec => j })
    assert(eq.nonEmpty, "expected hash/sort-merge joins on the " +
      "shared-neighbor key")
  }

  test("q323 WER is a zero-shuffle in-row projection") {
    // the alphabet bijection + levenshtein chain must never cost an
    // exchange — per-row eval is the whole 100 TB story
    assert(shuffles("q323_wer") == 0)
  }

  test("q307 KS and q320 CUSUM windows run over grouped/bounded frames") {
    // both operators' cumulative windows sit on VALUE-/PERIOD-grouped
    // frames after map-side-combined aggregates — the corpus itself
    // crosses one hash-aggregate exchange, nothing more per stat
    assert(shuffles("q307_ks_test") <= 3)
    assert(shuffles("q320_cusum") <= 3)
  }

  test("q317 quantile normalization windows are slice-partitioned") {
    val wins = plans("q317_quantile_normalize")
      .flatMap(_.collect { case w: WindowExec => w })
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "quantileNormalize rank windows must be slice-partitioned " +
        "(a global window would serialize the corpus)")
  }

  test("q315 TextRank explodes the corpus once; graph rounds are " +
      "vocabulary-sized") {
    // the pageRank loop materializes per round, so the ENTRY plan only
    // shows the final round: its joins must be hash joins on the
    // vocab-sized frames, never a cartesian
    val ps = plans("q315_textrank")
    val cart = ps.flatMap(_.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec
        => c })
    assert(cart.isEmpty, s"textRank planned a cartesian: $cart")
  }

  test("q430 energy distance plans ZERO joins — the crossing-count " +
      "identity replaces the pair join") {
    val ps = plans("q430_energy_distance")
    val joins = ps.flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j })
    assert(joins.isEmpty, s"energy distance planned a join: $joins")
  }

  test("q402 ordered-pair support pairs through the user equi-join, " +
      "never a cartesian") {
    // the only non-equi join allowed is the 1-row totals broadcast
    // (the in-plan-scalar discipline); the PAIR stage itself must be
    // an equi-join on the user key
    val ps = plans("q402_ordered_pairs")
    val cart = ps.flatMap(_.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec
        => c })
    assert(cart.isEmpty, s"ordered pairs planned a cartesian: $cart")
    val equi = ps.flatMap(_.collect {
      case j: BroadcastHashJoinExec => j
      case j: SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
        => j })
    assert(equi.nonEmpty, "expected an equi pair join on the user key")
  }

  test("q425 threshold sweep reads the corpus ONCE — all thresholds " +
      "are conditional sums in a single aggregate") {
    val ps = plans("q425_threshold_sweep")
    val scans = ps.flatMap(_.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f })
    assert(scans.size == 1, s"threshold sweep scans ${scans.size} times")
  }

  test("q442 correlation matrix aggregates once and never re-joins " +
      "the metric frame") {
    val ps = plans("q442_corr_matrix")
    val joins = ps.flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j })
    assert(joins.isEmpty, s"corrMatrix planned a join: $joins")
    val scans = ps.flatMap(_.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f })
    assert(scans.size == 1, s"corrMatrix scans ${scans.size} times")
  }

  // ---- round-15 scale-claim pins ----

  test("q457 KPSS plans ZERO joins — the exact-rational collapsed " +
      "form is pure window chains") {
    val ps = plans("q457_kpss")
    val joins = ps.flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j })
    assert(joins.isEmpty, s"KPSS planned a join: $joins")
  }

  test("q459 Diebold–Mariano plans ZERO joins — the HAC assembly " +
      "rides lead windows, never a self-join") {
    val ps = plans("q459_diebold_mariano")
    val joins = ps.flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j })
    assert(joins.isEmpty, s"Diebold–Mariano planned a join: $joins")
  }

  test("q461 bipartite projection pairs through the left-key " +
      "equi-join, never a cartesian") {
    val ps = plans("q461_bipartite")
    val cart = ps.flatMap(_.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec
        => c
      case n: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => n })
    assert(cart.isEmpty, s"bipartite projection went all-pairs: $cart")
  }

  test("q476 k-truss meets triangles through equi-joins only (final " +
      "round plan — earlier rounds are materialized)") {
    val ps = plans("q476_ktruss")
    val cart = ps.flatMap(_.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec
        => c
      case n: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => n })
    assert(cart.isEmpty, s"k-truss went all-pairs: $cart")
  }

  test("q477 RBO never globally sorts the users frame — each side's " +
      "head is a TakeOrdered top-depth over its own partial-agg pass " +
      "(≤2 corpus scans), the union pivot is join-free, and every " +
      "unpartitioned window sits above the depth-bounded limit " +
      "(VERDICT r17 #2)") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val ps = plans("q477_rbo")
    // column pruning makes the two head aggregates genuinely different
    // (each reads only its own metric), so exchange reuse cannot fire:
    // two partial-agg scans, never more — and never a sort
    val scans = ps.flatMap(_.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f })
    assert(scans.size <= 2, s"RBO scans ${scans.size} times")
    val joins = ps.flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j })
    assert(joins.isEmpty, s"RBO planned a join: $joins")
    val topk = ps.flatMap(_.collect {
      case t: TakeOrderedAndProjectExec => t })
    assert(topk.size == 2, s"expected the two top-depth heads, got $topk")
    val globalSorts = ps.flatMap(_.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s })
    assert(globalSorts.isEmpty,
      s"RBO still globally sorts the users frame: $globalSorts")
    // the head rank windows are unpartitioned but depth-bounded: a
    // TakeOrdered sits strictly below each
    val wins = ps.flatMap(_.collect { case w: WindowExec
      if w.partitionSpec.isEmpty => w })
    assert(wins.nonEmpty && wins.forall(w => w.child.collect {
      case t: TakeOrderedAndProjectExec => t }.nonEmpty),
      "every unpartitioned window must sit above the top-depth cut")
  }

  test("q481 trimmed stats plans ZERO joins — rank blocks are one " +
      "window plus one keyed rollup") {
    val ps = plans("q481_trimmed_stats")
    val joins = ps.flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j })
    assert(joins.isEmpty, s"trimmed stats planned a join: $joins")
  }

  // ---- round-17 class-6 pins: global-order statistics ----

  /** The class-6 law (SCALING.md): an UNPARTITIONED window may only
    * consume an already-collapsed frame — value-grouped, sharded
    * offsets (≤shards rows), or a G-row rollup — never raw corpus
    * rows. Operationally: every unpartitioned WindowExec must have at
    * least one aggregate strictly below it (the collapse, or the
    * 1-row broadcast count whose guard rides the sort key in the
    * loud-bound class). The pre-r17 shape — row_number over a bare
    * scan/project — has no aggregate below and fails here.
    */
  private def assertNoRawRowGlobalWindow(name: String): Unit = {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // a ReusedExchangeExec is a leaf that POINTS at the collapsed
    // subtree — pierce it, or a reused value-grouped aggregate reads
    // as a raw frame
    def hasAggBelow(p: SparkPlan): Boolean =
      p.collect { case a: BaseAggregateExec => a }.nonEmpty ||
        p.collect { case r: ReusedExchangeExec => r }
          .exists(r => hasAggBelow(r.child))
    val wins = plans(name)
      .flatMap(_.collect { case w: WindowExec => w })
    val bad = wins.filter(w => w.partitionSpec.isEmpty &&
      !hasAggBelow(w.child))
    assert(bad.isEmpty,
      s"$name: unpartitioned window over a raw row-level frame:\n" +
        bad.map(_.simpleStringWithNodeId()).mkString("\n"))
  }

  test("class-6 rank statistics never window raw corpus rows " +
      "(the nine r16-flagged entries + the rfm sweep)") {
    Seq("q469_hoeffdings_d", "q471_mood_median", "q472_ansari_bradley",
      "q484_brunner_munzel", "q487_hosmer_lemeshow", "q491_lorenz",
      "q492_kakwani", "q493_anderson_darling", "q502_gain_lift",
      "q443_rfm",
      // the r17 additions ship under the same law from day one
      "q504_cucconi", "q505_lepage", "q506_gehan_wilcoxon",
      "q507_dunn").foreach(assertNoRawRowGlobalWindow)
  }

  test("class-6 sharded-rank entries actually shard — a partitioned " +
      "rank window is present (q487/q491/q492/q502/q443)") {
    Seq("q487_hosmer_lemeshow", "q491_lorenz", "q492_kakwani",
      "q502_gain_lift", "q443_rfm").foreach { name =>
      val wins = plans(name)
        .flatMap(_.collect { case w: WindowExec => w })
      assert(wins.exists(_.partitionSpec.nonEmpty),
        s"$name: expected the shard-partitioned rank window")
    }
  }

  test("q493 Anderson–Darling plans ZERO joins — the substitution " +
      "form removes the rank-key self-join") {
    val ps = plans("q493_anderson_darling")
    val joins = ps.flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j })
    assert(joins.isEmpty, s"Anderson–Darling planned a join: $joins")
  }

  // ---- round-18: the class-6 law, corpus-wide (VERDICT r17 #1) ----

  /** Column names that mean "one row per corpus unit": an aggregate
    * keyed on one of these COLLAPSES NOTHING — its output frame scales
    * with the corpus, and feeding it into an unpartitioned window is
    * exactly the shape r17's "aggregate strictly below" test could not
    * see (q477's per-user aggregate under the global rank windows).
    */
  private val corpusKeyNames = Set("user_id", "doc_id", "vec_id",
    "event_id", "l_orderkey", "o_orderkey", "_u")

  /** r19 hardening (VERDICT r18 #7): the name set alone is blind to a
    * RENAME (`user_id AS uid` escaped it) and to GENERATED columns (a
    * `groupBy(term)` over exploded tokens collapses to the vocabulary,
    * which scales with the corpus). This walks a grouping attribute
    * back through pure alias chains in the subtree below the
    * aggregate; the key is corpus-scaling if the chain terminates at
    * (a) a data-leaf column whose NAME is a corpus unit key, or (b)
    * any Generate (explode) output. A key that passes through a real
    * function (hash bucket, time floor, substring) stops the trace
    * and PASSES — boundedness of derived keys is the operator
    * author's responsibility, sanctioned per-entry in the whitelist
    * with a reason when the structural test cannot see it.
    */
  private def corpusScalingKey(
      a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec)
      : Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{Alias,
      AttributeReference, ExprId}
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // every node in (and referenced by) the subtree, piercing reuse
    def all(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case q => q }.flatMap {
        case r: ReusedExchangeExec => r +: all(r.child)
        case q => Seq(q)
      }
    val nodes = all(a)
    val aliasOf: Map[ExprId, org.apache.spark.sql.catalyst.expressions
        .Expression] =
      nodes.flatMap(_.expressions).flatMap(_.collect {
        case al: Alias => al.exprId -> al.child
      }).toMap
    // only DATA-FED generators scale: explode of a literal sequence
    // (bootstrapCI's replicate axis) references no input attribute and
    // is bounded by the code literal. (The UNBOUND generator — the
    // bound one's references are ordinals, always empty.)
    val generated: Set[ExprId] = nodes.collect {
      case g: GenerateExec if g.generator.references.nonEmpty =>
        g.generatorOutput.map(_.exprId)
    }.flatten.toSet
    val leafCols: Map[ExprId, String] = nodes
      .filter(_.children.isEmpty)
      .flatMap(_.output.map(o => o.exprId -> o.name.toLowerCase)).toMap
    @annotation.tailrec
    def scaling(id: ExprId, hops: Int): Boolean =
      if (hops > 64) false
      else if (generated.contains(id)) true
      else aliasOf.get(id) match {
        case Some(ar: AttributeReference) => scaling(ar.exprId, hops + 1)
        case Some(_) => false // a real function — trace stops, passes
        case None => leafCols.get(id).exists(corpusKeyNames.contains)
      }
    a.groupingExpressions.exists {
      case ar: AttributeReference =>
        corpusKeyNames.contains(ar.name.toLowerCase) ||
          scaling(ar.exprId, 0)
      case g => corpusKeyNames.contains(g.name.toLowerCase)
    }
  }

  /** Entries whose unpartitioned windows are sanctioned for a reason
    * the structural test cannot see, each with the reason (the
    * VERDICT-approved whitelist arm of the law). Keep this SHORT: a
    * new entry should satisfy the structural law by construction —
    * the r18 sweep needed ZERO whitelist entries (the two violations
    * it surfaced, q424_icc's and q428_page_trend's global audit-max
    * windows, were FIXED with distributed broadcast maxima instead).
    */
  private val class6Whitelist: Map[String, String] = Map.empty

  test("class-6 law, corpus-wide: every unpartitioned window in every " +
      "entry sits above a LIMIT, a collapsing (non-corpus-keyed) " +
      "aggregate frontier, or a loud guard — never raw/corpus-keyed " +
      "rows (VERDICT r17 #1; red on the pre-r18 q477 shape)") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.{GlobalLimitExec,
      TakeOrderedAndProjectExec, CollectLimitExec, RangeExec,
      LocalTableScanExec, SparkPlan}
    import org.apache.spark.sql.catalyst.expressions.RaiseError

    // bounded-frontier walk: TRUE iff every leafward path from p hits
    // a limit, a non-corpus-keyed aggregate, or a literal leaf before
    // any data leaf. The FIRST aggregate on a path decides (aggregates
    // above a corpus-keyed one may re-collapse — the survival duration
    // frames — so only the frontier matters); a corpus-keyed frontier
    // aggregate is the q477 shape and fails the walk.
    def bounded(p: SparkPlan): Boolean = p match {
      case a: BaseAggregateExec =>
        // r19: provenance-hardened (rename + generate blind spots)
        !corpusScalingKey(a)
      case _: GlobalLimitExec | _: TakeOrderedAndProjectExec |
           _: CollectLimitExec => true
      case _: RangeExec | _: LocalTableScanExec => true // literal frames
      case r: ReusedExchangeExec => bounded(r.child)
      case leaf if leaf.children.isEmpty => false // scan/RDD: raw rows
      case other => other.children.forall(bounded)
    }
    // loud-bound clause (hoeffdingsD's class): the window input is raw
    // BY DESIGN, bounded at runtime by a raise_error guard riding a
    // consumed column, with the count from a distributed (groupless)
    // aggregate underneath
    def guarded(p: SparkPlan): Boolean = {
      val hasRaise = (p +: p.collect { case q => q }).exists(
        _.expressions.exists(_.exists {
          case _: RaiseError => true
          case _ => false
        }))
      def scalarAggBelow(q: SparkPlan): Boolean =
        q.collect { case a: BaseAggregateExec
          if a.groupingExpressions.isEmpty => a }.nonEmpty ||
          q.collect { case r: ReusedExchangeExec => r }
            .exists(r => scalarAggBelow(r.child))
      hasRaise && scalarAggBelow(p)
    }
    val names =
      SparkEntry.queries.keys.filterNot(SparkEntry.mutating).toSeq.sorted
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    names.foreach { n =>
      try {
        val wins = plans(n)
          .flatMap(_.collect { case w: WindowExec
            if w.partitionSpec.isEmpty => w })
        val bad = wins.filterNot(w =>
          bounded(w.child) || guarded(w.child) ||
            class6Whitelist.contains(n))
        if (bad.nonEmpty)
          violations += s"$n: ${bad.size} unpartitioned window(s) over " +
            s"an unbounded/corpus-keyed frame"
      } catch {
        case e: Exception => violations += s"$n: failed to plan: " +
          s"${String.valueOf(e.getMessage).take(120)}"
      }
    }
    assert(violations.isEmpty,
      s"\nclass-6 corpus-wide violations:\n  ${violations.mkString("\n  ")}")
  }

  test("the corpus-wide class-6 law actually fires on the retired " +
      "q477 shape (a global rank window over a per-user aggregate)") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.functions._
    val W = org.apache.spark.sql.expressions.Window
    val df = spark.range(100).select(col("id").as("user_id"),
      (col("id") * 7 % 13).as("x"))
      .groupBy(col("user_id")).agg(sum(col("x")).as("sx"))
      .select(row_number().over(W.partitionBy(lit(1))
        .orderBy(col("sx").desc, col("user_id").asc)).as("r"))
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = df.queryExecution.executedPlan
      val wins = p.collect { case w: WindowExec
        if w.partitionSpec.isEmpty => w }
      assert(wins.nonEmpty, "expected the unpartitioned window")
      // the r17 law would have passed this (an aggregate IS below);
      // the r18 frontier walk must reject it — per-user keyed
      def frontierOk(q: org.apache.spark.sql.execution.SparkPlan): Boolean =
        q match {
          case a: BaseAggregateExec =>
            !a.groupingExpressions.map(_.name.toLowerCase)
              .exists(Set("user_id").contains(_))
          case leaf if leaf.children.isEmpty => true // range = literal
          case other => other.children.forall(frontierOk)
        }
      assert(wins.exists(w => !frontierOk(w.child)),
        "the frontier walk failed to flag the per-user aggregate")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  // ---- round-19: hash-join build sides in the heavy entries ----

  test("heavy entries never BUILD a hash table from a corpus-scaling " +
      "frame without AQE protection: every BroadcastHashJoin build " +
      "side is bounded (a broadcast of a corpus frame OOMs the driver " +
      "at scale regardless of AQE), and ShuffledHashJoin build sides " +
      "that do scale with the corpus are enumerated with the reason " +
      "they are safe (VERDICT r18 #6 / SCALING.md SHJ caveat)") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    import org.apache.spark.sql.execution.{CollectLimitExec,
      GlobalLimitExec, LocalTableScanExec, RangeExec,
      TakeOrderedAndProjectExec}
    // bounded = every leafward path collapses (non-corpus-keyed
    // aggregate / limit / literal) before a data leaf — the class-6
    // walk's definition, reused for build sides
    def bounded(p: SparkPlan): Boolean = p match {
      case a: BaseAggregateExec => !corpusScalingKey(a)
      case _: GlobalLimitExec | _: TakeOrderedAndProjectExec |
           _: CollectLimitExec => true
      case _: RangeExec | _: LocalTableScanExec => true
      // a materialized intermediate (localCheckpoint → LogicalRDD, or
      // a temp-dir parquet round-trip — q224's per-round Lloyd
      // centroid/codebook frames, k rows by construction): shape
      // analysis cannot cross a materialization boundary; boundedness
      // there is the materializing operator's documented contract.
      // Only scans of the FIXTURE corpus count as raw corpus rows.
      case _: org.apache.spark.sql.execution.RDDScanExec => true
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        !f.relation.location.rootPaths.exists(_.toString.contains(dir))
      case r: ReusedExchangeExec => bounded(r.child)
      case leaf if leaf.children.isEmpty => false
      case other => other.children.forall(bounded)
    }
    // the cost tail (≥ ~4 s in the r18 bench) — where a build-side
    // OOM would actually hurt
    val heavy = Seq("q352_dbscan_ann", "q482_dbscan_ann_auto",
      "q445_hubness_ann", "q483_hubness_ann_auto", "q243_semantic_dedup_ann_auto",
      "q129_semantic_dedup", "q163_semantic_dedup_ann", "q249_semdedup",
      "q259_sa_dedup_cut", "q254_longest_repeats", "q253_repeated_suffixes",
      "q252_suffix_ranks", "q269_chrf", "q343_cdc_dup_pairs",
      "q342_cdc_chunks", "q393_cox_ph", "q325_modularity", "q384_lpa",
      "q16_ngram_jaccard", "q112_jaccard_prefix", "q345_knn_shapley",
      "q224_ann_ivfpq_portable", "q231_curation_funnel", "q379_lz78",
      "q246_unigram_apply")
    // under the bench/CLI join preference, so the law checks the plans
    // the bench actually times — and with AUTO-broadcast off: at
    // sf0.001 every frame estimates under the 10 MB threshold, so the
    // static planner broadcasts corpus frames the real-scale planner
    // never would; with the threshold at -1 the surviving
    // BroadcastHashJoins are exactly the code's EXPLICIT broadcast()
    // hints, which are the ones that must be bounded at any scale
    val prevPref = spark.conf.get("spark.sql.join.preferSortMergeJoin",
      "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold",
      "10485760")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val broadcastViolations =
      scala.collection.mutable.ArrayBuffer.empty[String]
    val shjScaling = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      heavy.foreach { n =>
        val ps = plans(n)
        ps.flatMap(_.collect {
          case j: org.apache.spark.sql.execution.joins
              .BroadcastHashJoinExec => j
        }).foreach { j =>
          val build = j.buildSide match {
            case BuildLeft => j.left
            case BuildRight => j.right
          }
          // sanctioned-by-contract broadcasts: a selective filter over
          // the fixture is structurally a raw scan, but the operator's
          // CONTRACT bounds it (a retrieval query set ≪ the corpus) —
          // enumerate each with its reason, like the SHJ arm below
          val broadcastSanction: Map[String, String] = Map(
            "q224_ann_ivfpq_portable" ->
              ("explicit broadcast(queries/probes): the retrieval " +
                "QUERY-side frame (vec_id-filtered, ≪ corpus by the " +
                "top-k contract) and the probed-centroid slice"))
          if (!bounded(build) && !broadcastSanction.contains(n))
            broadcastViolations += s"$n: broadcast of an unbounded " +
              s"frame:\n${build.simpleStringWithNodeId()}"
        }
        ps.flatMap(_.collect { case j: ShuffledHashJoinExec => j })
          .foreach { j =>
            val build = j.buildSide match {
              case BuildLeft => j.left
              case BuildRight => j.right
            }
            if (!bounded(build)) shjScaling += n
          }
      }
    } finally {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", prevPref)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
    assert(broadcastViolations.isEmpty,
      s"\ncorpus-scaling BROADCAST build sides:\n  " +
        broadcastViolations.mkString("\n  "))
    // SHJ build sides that scale with the corpus are SAFE here only
    // because every session (bench, verify, CLI) runs AQE, which
    // re-plans each join from REAL shuffle sizes — at 100 TB the size
    // gate (estimate < threshold × partitions) fails for these frames
    // and the join reverts to sort-merge; the static sf0.001 plan
    // shows SHJ because tiny estimates pass the same gate. The
    // enumeration below is the watch list: a NEW name appearing means
    // a restructure moved a corpus frame onto a build side — re-check
    // the entry against SCALING.md's SHJ caveat before sanctioning it.
    // the r19 sweep needed ZERO sanctions: with auto-broadcast off and
    // the SHJ preference on, every shuffled-hash build side in the
    // heavy entries is bounded or a materialized intermediate — the
    // muchSmaller gate picks the collapsed side everywhere
    val sanctioned = Set.empty[String]
    val unsanctioned = shjScaling.distinct.filterNot(sanctioned)
    assert(unsanctioned.isEmpty,
      s"\nNEW corpus-scaling ShuffledHashJoin build sides (sanction " +
        s"after review, or restructure):\n  ${unsanctioned.mkString("\n  ")}")
  }

  // ---- round-19: provenance hardening of the class-6 law ----

  test("the hardened walk reds on a groupBy(term) global-window shape " +
      "— a generated (exploded) grouping key is corpus-scaling even " +
      "though 'term' is not in the unit-name set (VERDICT r18 #7)") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.functions._
    val W = org.apache.spark.sql.expressions.Window
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .select(col("term"),
        row_number().over(W.partitionBy(lit(1))
          .orderBy(col("n").desc, col("term").asc)).as("r"))
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = df.queryExecution.executedPlan
      val wins = p.collect { case w: WindowExec
        if w.partitionSpec.isEmpty => w }
      assert(wins.nonEmpty, "expected the unpartitioned window")
      val frontier = wins.flatMap(_.child.collect {
        case a: BaseAggregateExec => a })
      assert(frontier.nonEmpty, "expected the term-keyed aggregate")
      assert(frontier.exists(corpusScalingKey),
        "the provenance walk failed to flag the generated term key")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("the hardened walk reds on a RENAMED unit key — `user_id AS " +
      "uid` must not escape the name set (VERDICT r18 #7)") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id").as("uid"), col("value"))
      .groupBy(col("uid")).agg(sum(col("value")).as("sv"))
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = df.queryExecution.executedPlan
      val aggs = p.collect { case a: BaseAggregateExec => a }
      assert(aggs.nonEmpty)
      assert(aggs.exists(corpusScalingKey),
        "the provenance walk failed to trace uid back to user_id")
      // and a genuinely derived key still passes: bucketed by a hash
      val ok = spark.read.parquet(s"$dir/events.parquet")
        .groupBy((xxhash64(col("user_id")) % 64).as("b"))
        .agg(count(lit(1)).as("n"))
      val aggs2 = ok.queryExecution.executedPlan
        .collect { case a: BaseAggregateExec => a }
      assert(aggs2.nonEmpty && !aggs2.exists(corpusScalingKey),
        "a hash-bucketed key must not flag (the trace stops at the " +
          "function boundary)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
