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
  * its first character; round i refines ranks to order-2^i by
  * dense-ranking the pair (rank(pos), rank(pos + 2^(i-1))) — the
  * classic doubling step, each round one self-equi-join plus one
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

  /** Boundary-safe distributed dense rank over (`c1`, `c2`):
    * range-partition, rank per shard, re-base with broadcast offsets.
    * Returns the input plus `_gr` (global dense rank) and passes the
    * per-round distinct total to `onDistinct` (early-stop scalar).
    */
  private def globalDenseRank(
      df: DataFrame, c1: String, c2: String,
      onDistinct: Long => Unit): DataFrame = {
    val parts = df.repartitionByRange(col(c1), col(c2))
      .withColumn("_pid", spark_partition_id().cast("long"))
    val w = Window.partitionBy(col("_pid")).orderBy(col(c1), col(c2))
    val local = parts.withColumn("_lr", dense_rank().over(w).cast("long"))
    val counts = local.groupBy(col("_pid")).agg(max(col("_lr")).as("_n"))
      .collect().sortBy(_.getLong(0))
    onDistinct(counts.map(_.getLong(1)).sum)
    val offsets = counts
      .scanLeft((-1L, 0L, 0L)) { case ((_, cum, _), r) =>
        (r.getLong(0), cum + r.getLong(1), cum)
      }.drop(1).map { case (pid, _, off) => (pid, off) }
    val offDf = df.sparkSession.createDataFrame(offsets.toSeq)
      .toDF("_pid", "_off")
    local.join(broadcast(offDf), Seq("_pid"))
      .withColumn("_gr", col("_off") + col("_lr"))
      .drop("_pid", "_lr", "_off")
  }

  def suffixRanks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 62,
      s"maxRounds in [1, 62], got $maxRounds")
    def materialize(d: DataFrame): DataFrame =
      if (d.sparkSession.sparkContext.getCheckpointDir.isDefined)
        d.checkpoint(eager = true)
      else d.localCheckpoint(eager = true)

    val maxRow = df.agg(max(length(col(textCol)))).head()
    require(!maxRow.isNullAt(0), "suffixRanks: empty corpus")
    val maxLen = maxRow.getInt(0)
    require((1L << maxRounds) >= maxLen,
      s"maxRounds=$maxRounds orders only 2^$maxRounds chars; corpus max " +
        s"doc length is $maxLen — raise maxRounds (suffix ranks would be " +
        "silently truncated-order otherwise)")
    val sfx = df
      .select(col(idCol).as("_d"),
        explode(sequence(lit(1), length(col(textCol)))).as("_p"),
        col(textCol).substr(col("_p"), lit(1)).as("_c"))
    // initial order-1 ranks: dense rank of the first character. The
    // distinct-char frame is alphabet-bounded, so its rank window is a
    // bounded single-partition frame (the 1-row-scalar class), and the
    // corpus-sized side only broadcast-joins against it.
    val chars = sfx.select(col("_c")).distinct()
      .withColumn("_r", row_number().over(Window.orderBy(col("_c")))
        .cast("long"))
    var ranks = materialize(
      sfx.join(broadcast(chars), Seq("_c")).select(col("_d"), col("_p"),
        col("_r")))
    val n = ranks.count()
    var k = 1L
    var distinct = 0L
    var round = 0
    while (distinct < n && k < maxLen) {
      val shifted = ranks.select(col("_d"), (col("_p") - k).as("_p"),
        col("_r").as("_r2"))
      val paired = ranks.join(shifted, Seq("_d", "_p"), "left")
        .withColumn("_r2", coalesce(col("_r2"), lit(0L)))
      ranks = materialize(
        globalDenseRank(paired, "_r", "_r2", d => distinct = d)
          .select(col("_d"), col("_p"), col("_gr").as("_r")))
      k = k * 2
      round += 1
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
}
