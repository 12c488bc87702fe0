package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.JaroWinkler.jaroWinkler

/** Blocked entity resolution: find records that NAME the same
  * real-world thing under slightly different strings (the record-
  * linkage step every multi-source training corpus needs before
  * entity-level dedup or attribute merge).
  *
  * Two-phase shape — the only one that survives 100 TB:
  *
  *   1. BLOCKING: records pair only within equal values of cheap
  *      structured keys (brand, container, host, …). The self-join is
  *      a plain equi-join on the block key → one hash-partitioned
  *      shuffle, no cartesian anywhere in the plan. Pair count is
  *      Σ_b |b|², so block keys must keep |b| bounded — callers pick
  *      keys with known cardinality floors and the audit report
  *      ([[blockSizes]]) is the guard rail a production run checks
  *      BEFORE paying for the scoring pass (the same discipline as
  *      TextDedup's df-pruned shingle join).
  *   2. SCORING: Jaro-Winkler (codegen'd custom expression — prefix-
  *      weighted, the name-matching classic) plus exact Levenshtein on
  *      the normalized names, IN-ROW on the joined pairs. No second
  *      shuffle; the threshold filter runs inside the same codegen
  *      stage as the join output.
  *
  * Normalization (lower + trim) is deliberately minimal and part of
  * the contract — callers wanting accent-folding compose
  * [[graft.functions.AccentStrip]] upstream.
  *
  * Reference anchor: sayn's capability surface has no linkage
  * operator; this extends the §2e dedup family (q76's edit-verified
  * pairing generalized to structured blocking + JW scoring).
  */
object EntityResolution {

  /** Candidate pairs within blocks, scored, thresholded.
    *
    * Output: (`id_a`, `id_b`, `lev`, `jw`) with `id_a < id_b`,
    * `lev` the exact edit distance (long) and `jw` the Jaro-Winkler
    * similarity truncated at the d6 contract point (cross-engine
    * float discipline — see docs/SCALING.md).
    */
  def blockedPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockCols: Seq[String],
      jwMin: Double): DataFrame = {
    require(blockCols.nonEmpty, "blocking requires at least one key column")
    require(jwMin > 0.0 && jwMin < 1.0, s"jwMin must be in (0,1), got $jwMin")
    val norm = lower(trim(col(nameCol)))
    val base = df.select(
      col(idCol).as("_id") +: norm.as("_nm") +:
        blockCols.map(c => col(c).as(s"_b_$c")): _*)
    val a = base.select(
      col("_id").as("id_a") +: col("_nm").as("_na") +:
        blockCols.map(c => col(s"_b_$c")): _*)
    val b = base.select(
      col("_id").as("id_b") +: col("_nm").as("_nb") +:
        blockCols.map(c => col(s"_b_$c").as(s"_c_$c")): _*)
    val cond = blockCols.map(c => col(s"_b_$c") === col(s"_c_$c"))
      .reduce(_ && _) && col("id_a") < col("id_b")
    val jw = jaroWinkler(col("_na"), col("_nb"))
    a.join(b, cond)
      .filter(jw >= jwMin)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("_na"), col("_nb")).cast("long").as("lev"),
        jw.cast("decimal(28,6)").cast("double").as("jw"))
  }

  /** Blocking audit: per-block record count and implied pair count,
    * largest first — the pre-flight a production linkage run reads
    * before paying Σ|b|² (a block that holds 1% of a 100 TB corpus
    * means 10⁻⁴·N² pairs; re-key before scoring).
    */
  def blockSizes(df: DataFrame, blockCols: Seq[String]): DataFrame = {
    require(blockCols.nonEmpty, "blocking requires at least one key column")
    df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("n_records"))
      .withColumn("n_pairs",
        (col("n_records") * (col("n_records") - 1) / 2).cast("long"))
      .orderBy(col("n_pairs").desc +: blockCols.map(col): _*)
  }

  /** Fellegi–Sunter match/non-match weights via unsupervised EM
    * (Fellegi & Sunter 1969; the Winkler EM fit) — the probabilistic
    * model behind every serious record-linkage stack: candidate pairs
    * carry k boolean agreement fields, and a two-class mixture learns
    * P(agree_j | match) = m_j, P(agree_j | unmatch) = u_j and the
    * match prevalence p WITHOUT labels. Output per agreement PATTERN:
    * its pair count, the match posterior γ, and the classic F-S weight
    * ln(P(pattern|M)/P(pattern|U)) — the score a linkage threshold
    * acts on.
    *
    * Scale shape: ONE corpus-sized aggregate collapses the pairs to
    * the ≤ 2^k pattern table (k ≤ 10 enforced); the EM loop then runs
    * ENTIRELY driver-side over that bounded table — zero per-round
    * Spark jobs (tighter than the Lloyd class: the sufficient
    * statistics are the pattern counts, so one job total).
    * Replayable-training contract: γ is d6-rounded per round, the
    * per-pattern moment terms γ·c are then EXACT 6-dp decimals (6-dp
    * γ × integer c), accumulated order-free; every updated parameter
    * d6-rounds then clamps to [1e-6, 1−1e-6] (the standard EM
    * smoothing — also what keeps the final ln weights finite).
    *
    * Output: (agreementCols… as int, n_pairs, gamma, weight).
    */
  def fellegiSunterEM(
      pairs: DataFrame,
      agreementCols: Seq[String],
      iters: Int = 5,
      pInit: Double = 0.1,
      mInit: Double = 0.8,
      uInit: Double = 0.2): DataFrame = {
    require(agreementCols.nonEmpty && agreementCols.size <= 10,
      s"agreementCols must have 1..10 fields, got ${agreementCols.size}")
    require(iters >= 1 && iters <= 100, s"iters in [1,100], got $iters")
    val k = agreementCols.size
    val spark = pairs.sparkSession
    import spark.implicits._
    def d6c(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def clamp(v: Double): Double = math.min(0.999999, math.max(0.000001, v))
    val patDf = pairs.groupBy(
        agreementCols.map(c => col(c).cast("int").as(c)): _*)
      .agg(count(lit(1)).as("n_pairs"))
    // ≤ 2^k rows by construction — the bounded collect contract
    val pats = patDf.collect().map { r =>
      (agreementCols.indices.map(i => r.getInt(i)).toVector,
        r.getLong(k))
    }.sortBy(_._1.mkString)
    var p = pInit
    var m = Vector.fill(k)(mInit)
    var u = Vector.fill(k)(uInit)
    // products fold LEFT FROM THE PREVALENCE (p·x₁·x₂·…, exactly the
    // oracle SQL's left-assoc chain — starting from 1.0 would
    // associate differently and drift by ulps)
    def likeM(from: Double, a: Vector[Int]): Double =
      (0 until k).foldLeft(from)((acc, j) =>
        acc * (if (a(j) == 1) m(j) else 1.0 - m(j)))
    def likeU(from: Double, a: Vector[Int]): Double =
      (0 until k).foldLeft(from)((acc, j) =>
        acc * (if (a(j) == 1) u(j) else 1.0 - u(j)))
    for (_ <- 0 until iters) {
      val gam = pats.map { case (a, _) =>
        val num = likeM(p, a)
        d6c(num / (num + likeU(1.0 - p, a)))
      }
      // γ·c and (1−γ)·c are exact 6-dp decimals: order-free sums
      val gc = pats.zip(gam).map { case ((_, c), g) =>
        BigDecimal(g) * BigDecimal(c) }
      val ngc = pats.zip(gam).map { case ((_, c), g) =>
        BigDecimal(d6c(1.0 - g)) * BigDecimal(c) }
      val n = pats.map(_._2).sum
      val sumGc = gc.sum
      val sumNgc = ngc.sum
      p = clamp(d6c(sumGc.toDouble / n.toDouble))
      m = Vector.tabulate(k)(j => clamp(d6c(
        pats.indices.filter(i => pats(i)._1(j) == 1)
          .map(gc).sum.toDouble / sumGc.toDouble)))
      u = Vector.tabulate(k)(j => clamp(d6c(
        pats.indices.filter(i => pats(i)._1(j) == 1)
          .map(ngc).sum.toDouble / sumNgc.toDouble)))
    }
    val result = pats.map { case (a, c) =>
      val num = likeM(p, a)
      val gamma = d6c(num / (num + likeU(1.0 - p, a)))
      val weight = d6c(math.log(likeM(1.0, a)) - math.log(likeU(1.0, a)))
      (a.mkString(","), gamma, weight)
    }
    val scoreDf = broadcast(
      result.toSeq.toDF("_pk", "gamma", "weight"))
    patDf
      .withColumn("_pk", concat_ws(",",
        agreementCols.map(c => col(c).cast("string")): _*))
      .join(scoreDf, Seq("_pk"))
      .select(agreementCols.map(col) :+ col("n_pairs") :+ col("gamma") :+
        col("weight"): _*)
  }
}
