package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed SUFFIX-ARRAY construction by prefix doubling
  * (Manber–Myers): the index structure behind EXACT substring
  * deduplication of training corpora (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better" — their suffix-array
  * pass is the published exact complement of the winnowed-fingerprint
  * gate in [[TextDedup]]/q180). After construction, two suffixes share
  * a rank iff they are the same string, so repeated-substring queries
  * become rank equi-joins instead of string scans.
  *
  * Algorithm: every (doc, pos) suffix starts with the dense rank of
  * its first `initOrder` characters (bytewise substring comparison IS
  * the suffix order restricted to that depth, shorter-prefix-first
  * included — so a deeper seed just skips the cheap early rounds,
  * measured 10 → 6 rounds on the fixture at initOrder = 16); each
  * doubling round then refines order-k to order-2k by dense-ranking
  * the pair (rank(pos), rank(pos + k)) — one self-equi-join plus one
  * GLOBAL dense rank. Suffixes never cross document boundaries
  * (pos + k past the end ranks as the 0 sentinel: a shorter suffix
  * sorts before every extension — the suffix-array convention).
  *
  * The global dense rank is the scale-bearing piece: a naive
  * `dense_rank() OVER (ORDER BY ...)` is one partition holding the
  * corpus (the forbidden single-partition window). Instead: RANGE
  * repartition on the pair key (equal keys provably co-locate), a
  * per-shard dense rank, and a broadcast cumulative-offset table of
  * per-shard distinct counts — the q53 deterministic-shuffle idiom.
  * Shard boundaries are sampled and data-dependent, but the OUTPUT is
  * boundary-invariant: offsets only re-base the same total order.
  * Per round the corpus shuffles twice (range + the window's hash on
  * the shard id); rounds = ⌈log₂ max_len⌉, with an early stop the
  * moment every rank is distinct (each later round would be a no-op,
  * which is also why a fixed-unroll oracle replays bit-identically).
  * Lineage is flattened per round (localCheckpoint / checkpoint — the
  * [[TextDedup.dupClusters]] materialization contract).
  *
  * Skew note: a pathologically repetitive corpus (one substring
  * repeated everywhere) concentrates one pair key; range partitioning
  * keeps that key on one shard by necessity. The early rounds are
  * where it bites (few distinct ranks); by round ⌈log₂ L⌉ of a
  * corpus with duplicate DOCS the groups are exactly the duplicate
  * sets. For adversarial inputs, salt the heavy key through a
  * two-phase rank (count heavy keys first) — documented, not built.
  *
  * Output: (`idCol`, `pos` 1-based, `sa_rank`) — `sa_rank` is the
  * 1-based dense rank of the suffix string over ALL suffixes of all
  * documents; equal ranks = byte-identical suffixes.
  */
object SuffixArray {

  /** Shard-and-offset global dense rank over `cs`, given an ORDER-
    * ALIGNED shard column `shardCol` (equal keys share a shard; shard
    * ids sort with the keys): per-shard dense rank + a broadcast
    * cumulative-offset re-base. The ranked frame is MATERIALIZED
    * before the bounded counts collect — the offsets pass and the
    * caller's consumption would otherwise each recompute the whole
    * upstream subtree (measured 2× per round on q252) — which also
    * flattens the loop's lineage, so callers need no second checkpoint.
    * Passes (distinct, rows) totals to `onTotals` from the same
    * collect — no extra count job.
    */
  private def rankOverShards(
      df: DataFrame, shardCol: String, cs: Seq[String],
      onTotals: (Long, Long) => Unit): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(cs.map(col): _*)
    val ranked = df.withColumn("_lr", dense_rank().over(w).cast("long"))
    val local =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        ranked.checkpoint(eager = true)
      else ranked.localCheckpoint(eager = true)
    val counts = local.groupBy(col(shardCol))
      .agg(max(col("_lr")).as("_n"), count(lit(1)).as("_rows"))
      .collect().sortBy(_.getLong(0))
    onTotals(counts.map(_.getLong(1)).sum, counts.map(_.getLong(2)).sum)
    val offsets = counts
      .scanLeft((-1L, 0L, 0L)) { case ((_, cum, _), r) =>
        (r.getLong(0), cum + r.getLong(1), cum)
      }.drop(1).map { case (pid, _, off) => (pid, off) }
    val offDf = df.sparkSession.createDataFrame(offsets.toSeq)
      .toDF(shardCol, "_off")
    local.join(broadcast(offDf), Seq(shardCol))
      .withColumn("_gr", col("_off") + col("_lr"))
      .drop(shardCol, "_lr", "_off")
  }

  /** Seed-round global dense rank: no prior rank structure exists, so
    * shards come from a RANGE repartition (equal keys provably
    * co-locate; partition ids sort with the keys).
    */
  private def globalDenseRank(
      df: DataFrame, cs: Seq[String],
      onTotals: (Long, Long) => Unit): DataFrame =
    rankOverShards(
      df.repartitionByRange(cs.map(col): _*)
        .withColumn("_pid", spark_partition_id().cast("long")),
      "_pid", cs, onTotals)

  /** The seed depth: initial ranks order the first 16 characters in
    * one string dense rank, and doubling starts at k = 16. Part of the
    * oracle contract (q252's CTE seeds identically).
    */
  val initOrder = 16

  def suffixRanks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 57,
      s"maxRounds in [1, 57], got $maxRounds")
    val maxRow = df.agg(max(length(col(textCol)))).head()
    require(!maxRow.isNullAt(0), "suffixRanks: empty corpus")
    val maxLen = maxRow.getInt(0)
    require((initOrder.toLong << maxRounds) >= maxLen,
      s"maxRounds=$maxRounds orders only ${initOrder}·2^$maxRounds chars; " +
        s"corpus max doc length is $maxLen — raise maxRounds (suffix " +
        "ranks would be silently truncated-order otherwise)")
    val sfx = df
      .select(col(idCol).as("_d"),
        explode(sequence(lit(1), length(col(textCol)))).as("_p"),
        col(textCol))
      .select(col("_d"), col("_p"),
        col(textCol).substr(col("_p"), lit(initOrder)).as("_c"))
    var distinct = 0L
    var n = 0L
    var ranks = globalDenseRank(sfx, Seq("_c"),
        (d, rows) => { distinct = d; n = rows })
      .select(col("_d"), col("_p"), col("_gr").as("_r"))
    var k = initOrder.toLong
    val shards = ranks.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt.max(1)
    while (distinct < n && k < maxLen) {
      val shifted = ranks.select(col("_d"), (col("_p") - k).as("_p"),
        col("_r").as("_r2"))
      val paired = ranks.join(shifted, Seq("_d", "_p"), "left")
        .withColumn("_r2", coalesce(col("_r2"), lit(0L)))
      // doubling rounds know the rank domain (1..distinct), so the
      // shard is computed in-row from equal-width rank bands — ONE
      // exchange per round (the window's) instead of range-sampling +
      // range exchange + window exchange. Order-aligned because the
      // shard depends only on _r: equal (_r, _r2) keys co-locate and
      // band b's keys all sort before band b+1's.
      val width = ((distinct + shards - 1) / shards).max(1L)
      // integer `div`, not `/`: double division loses exactness past
      // 2^53 ranks (the Analytics bucket-arithmetic discipline)
      val banded = paired.withColumn("_b",
        expr(s"(_r - 1L) div ${width}L"))
      // rankOverShards materializes internally; its output is a flat
      // (checkpoint + broadcast-join) lineage already
      ranks = rankOverShards(banded, "_b", Seq("_r", "_r2"),
          (d, _) => distinct = d)
        .select(col("_d"), col("_p"), col("_gr").as("_r"))
      k = k * 2
    }
    ranks.select(col("_d").as(idCol), col("_p").cast("long").as("pos"),
      col("_r").as("sa_rank"))
  }

  /** CROSS-DOCUMENT REPEATED SUBSTRINGS from the suffix ranks — the
    * report the exact-dedup pass acts on: for every suffix string of
    * length ≥ `minLen` shared by ≥ 2 documents, one row with the
    * group's size, its document spread, and the representative
    * (minimum (doc, pos)) occurrence. Equal `sa_rank` ⟺ equal suffix
    * string, so the whole report is ONE rank-keyed aggregate — no
    * string comparison after construction. Note these are shared
    * SUFFIXES (substrings that run to a document's end — the
    * suffix-granularity view); a maximal-internal-substring report
    * walks LCPs of rank-adjacent suffixes on the same index.
    *
    * `textCol`-free by design: length rides along as (doc length −
    * pos + 1) computed before the explode is discarded, so callers
    * join nothing back.
    */
  def repeatedSuffixes(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int,
      maxRounds: Int = 20): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val ranks = suffixRanks(df, idCol, textCol, maxRounds)
    val lens = df.select(col(idCol), length(col(textCol)).cast("long")
      .as("_len"))
    ranks.join(lens, Seq(idCol))
      .withColumn("suffix_len", col("_len") - col("pos") + 1L)
      .filter(col("suffix_len") >= minLen)
      .groupBy(col("sa_rank"), col("suffix_len"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"),
        // a doc appears at most once per rank group (same-doc suffixes
        // have distinct lengths), so min_by is tie-free
        min(col(idCol)).as("rep_doc"),
        min_by(col("pos"), col(idCol)).as("rep_pos"))
      .filter(col("n_docs") >= 2)
      .select(col("sa_rank"), col("suffix_len"), col("n_occurrences"),
        col("n_docs"), col("rep_doc"), col("rep_pos"))
  }

  /** LONGEST REPEATED SUBSTRINGS — the maximal-internal-substring
    * report ([[repeatedSuffixes]]' suffix-granularity caveat, closed):
    * the classic suffix-array result that every maximal repeat is
    * either (a) the LCP of two RANK-ADJACENT distinct suffixes, or
    * (b) a whole duplicated suffix (a rank with ≥ 2 occurrences —
    * dense ranking collapsed what a tie-broken SA would lay adjacent).
    * The top `topK` candidates by (length DESC, rank ASC), each with a
    * ≤ 60-char preview — the report Lee et al. 2022 act on when
    * deciding what to cut.
    *
    * LCP per adjacent pair is computed IN-ROW from the two
    * representative suffixes (first-mismatch scan via one array HOF —
    * O(L) per pair, ~n pairs total, no join fan-out); representatives
    * join text back ONCE per rank, so the corpus-sized frame is
    * touched twice after construction (reps + text attach). Output:
    * (`sa_rank`, `repeat_len`, `n_occurrences`, `source`
    * 'adjacent'|'dup', `rep_doc`, `rep_pos`, `preview`).
    */
  def longestRepeats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int = 20,
      maxRounds: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val ranks = suffixRanks(df, idCol, textCol, maxRounds)
    val texts = df.select(col(idCol).as("_td"), col(textCol).as("_t"))
    val reps = ranks.groupBy(col("sa_rank"))
      .agg(min(col(idCol)).as("rep_doc"),
        min_by(col("pos"), col(idCol)).as("rep_pos"),
        count(lit(1)).as("n_occurrences"))
      .join(texts, col("rep_doc") === col("_td"))
      .select(col("sa_rank"), col("rep_doc"), col("rep_pos"),
        col("n_occurrences"),
        (length(col("_t")).cast("long") - col("rep_pos") + 1L)
          .as("_slen"), col("_t"))
    // (b) duplicated whole suffixes: the repeat IS the suffix
    val dups = reps.filter(col("n_occurrences") >= 2)
      .select(col("sa_rank"), col("_slen").as("repeat_len"),
        col("n_occurrences"), lit("dup").as("source"),
        col("rep_doc"), col("rep_pos"),
        col("_t").substr(col("rep_pos").cast("int"),
          least(col("_slen"), lit(60L)).cast("int")).as("preview"))
    // (a) rank-adjacent LCPs: dense ranks make adjacency r ↔ r+1
    val a = reps.select(col("sa_rank"), col("rep_doc"), col("rep_pos"),
      col("_slen").as("_la"), col("_t").as("_ta"))
    val b = reps.select((col("sa_rank") - 1L).as("sa_rank"),
      col("rep_pos").as("_pb"), col("_slen").as("_lb"),
      col("_t").as("_tb"))
    val bound = least(col("_la"), col("_lb"))
    val eqArr = transform(sequence(lit(1L), bound), i =>
      col("_ta").substr((col("rep_pos") + i - 1L).cast("int"), lit(1)) ===
        col("_tb").substr((col("_pb") + i - 1L).cast("int"), lit(1)))
    val mism = array_position(eqArr, false)
    val adj = a.join(b, "sa_rank")
      .withColumn("repeat_len",
        when(mism === 0L, bound).otherwise(mism - 1L))
      .filter(col("repeat_len") >= 1L)
      .select(col("sa_rank"), col("repeat_len"),
        lit(2L).as("n_occurrences"), lit("adjacent").as("source"),
        col("rep_doc"), col("rep_pos"),
        col("_ta").substr(col("rep_pos").cast("int"),
          least(col("repeat_len"), lit(60L)).cast("int")).as("preview"))
    dups.unionByName(adj)
      .orderBy(col("repeat_len").desc, col("sa_rank").asc,
        col("source").asc)
      .limit(topK)
  }
}
