package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - [[bruteForceKnn]]: exact cosine top-k. The embedding is QUANTIZED to
  *     integers (floor(v·1000)) so every downstream sum is exact integer
  *     math and the cosine (int / sqrt(int·int)) is bit-reproducible across
  *     engines — that is what makes the operator oracle-checkable, and at
  *     scale it doubles as a poor-man's int8-style quantization. Work is
  *     O(queries × corpus); the query side is broadcast so the corpus never
  *     reshuffles. This is the baseline + re-rank kernel, not the scale path.
  *   - [[annLsh]]: random-hyperplane LSH. Vectors hash to sign-pattern
  *     buckets in L independent tables; candidates meet through an
  *     equi-join on (table, bucket) — never all-pairs — then exact cosine
  *     re-ranks the candidates. The 100 TB path: cost is
  *     O(rows × planes) hashing + O(candidates) re-rank, and the only
  *     shuffle is the bucket join.
  *
  * All scoring runs on built-in Catalyst expressions (posexplode + integer
  * aggregates); the plane projections use array higher-order functions.
  */
object Similarity {

  /** (id, pos, qv): quantized embedding elements, one row per dimension.
    * floor() not round() — round's tie behavior differs across engines.
    */
  def quantize(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(
      col(idCol),
      posexplode(col(embCol)).as(Seq("pos", "v")))
      .select(
        col(idCol), col("pos"),
        floor(col("v").cast("double") * lit(1000.0)).cast("long").as("qv"))

  /** Exact top-k neighbors by quantized cosine for the query set
    * (`queryPred` selects query ids). Output: (qid, nid, rank, cosine),
    * self-matches excluded, ties broken by neighbor id.
    *
    * The query side (queries × dims rows) is broadcast into a hash join on
    * `pos`, so the corpus scan stays partition-local; the per-(query,
    * vector) dot products then aggregate on the pair key. Norms are one
    * extra aggregate over the same quantized scan.
    */
  def bruteForceKnn(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int = 10): DataFrame = {
    val e = quantize(df, idCol, embCol)
    val q = e.filter(queryPred)
      .select(col(idCol).as("qid"), col("pos"), col("qv").as("q_qv"))
    val dots = e.join(broadcast(q), Seq("pos"))
      .groupBy(col("qid"), col(idCol).as("nid"))
      .agg(sum(col("q_qv") * col("qv")).as("dot"))
    val norms = e.groupBy(col(idCol)).agg(sum(col("qv") * col("qv")).as("nrm"))
    val cosine = col("dot").cast("double") /
      sqrt(col("q_nrm").cast("double") * col("n_nrm").cast("double"))
    val scored = dots
      .join(broadcast(norms.select(col(idCol).as("qid"), col("nrm").as("q_nrm"))), Seq("qid"))
      .join(norms.select(col(idCol).as("nid"), col("nrm").as("n_nrm")), Seq("nid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine.as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid").asc)
    scored.select(col("qid"), col("nid"), row_number().over(w).as("rank"), col("cosine"))
      .filter(col("rank") <= k)
  }

  /** All pairs with quantized cosine ≥ threshold (embedding-based
    * near-duplicate detection). Exact — pairs meet through the dimension
    * join, so this is O(corpus²) per dimension and is the ORACLE BASELINE
    * at test scale; at 100 TB use [[annLsh]] candidates followed by this
    * scoring restricted to candidates.
    */
  def embeddingDupPairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double): DataFrame = {
    val e = quantize(df, idCol, embCol)
    val a = e.select(col(idCol).as("vec_a"), col("pos"), col("qv").as("a_qv"))
    val b = e.select(col(idCol).as("vec_b"), col("pos"), col("qv").as("b_qv"))
    val dots = a.join(b, Seq("pos"))
      .filter(col("vec_a") < col("vec_b"))
      .groupBy(col("vec_a"), col("vec_b"))
      .agg(sum(col("a_qv") * col("b_qv")).as("dot"))
    val norms = e.groupBy(col(idCol)).agg(sum(col("qv") * col("qv")).as("nrm"))
    val cosine = col("dot").cast("double") /
      sqrt(col("na").cast("double") * col("nb").cast("double"))
    dots
      .join(norms.select(col(idCol).as("vec_a"), col("nrm").as("na")), Seq("vec_a"))
      .join(norms.select(col(idCol).as("vec_b"), col("nrm").as("nb")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosine.as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Deterministic pseudo-random unit-ish hyperplanes (xorshift64*, fixed
    * seed — no Math.random, reproducible across runs/JVMs). One plane per
    * (table, bit); components in [-0.5, 0.5).
    */
  private[pipeline] def planes(
      tables: Int, bits: Int, dims: Int): Array[Array[Array[Double]]] = {
    var state = 0x9E3779B97F4A7C15L
    def next(): Double = {
      state ^= state >>> 12; state ^= state << 25; state ^= state >>> 27
      val x = state * 0x2545F4914F6CDD1DL
      ((x >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    Array.fill(tables)(Array.fill(bits)(Array.fill(dims)(next())))
  }

  /** Approximate top-k neighbors via random-hyperplane LSH + exact
    * re-rank. Each vector gets `tables` bucket ids (one per hash table);
    * each bucket id packs `bits` sign bits of plane projections. Query and
    * corpus rows meet through an equi-join on (table, bucket) — the
    * candidate set — then quantized cosine re-ranks candidates and keeps
    * top-k per query.
    *
    * Recall/cost knobs: more `tables` → higher recall, linearly more
    * candidates; more `bits` → smaller buckets, fewer candidates, lower
    * recall per table. Hashing is O(rows × tables × bits × dims) inside
    * one projection — no shuffle until the bucket join.
    */
  def annLsh(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int = 10,
      tables: Int = 8,
      bits: Int = 8): DataFrame = {
    val dims = df.select(size(col(embCol))).head().getInt(0)
    val ps = planes(tables, bits, dims)
    val bucketStructs = (0 until tables).map { t =>
      val bucket = (0 until bits).map { b =>
        val plane = typedlit(ps(t)(b).toSeq)
        val dot = aggregate(
          zip_with(col(embCol), plane, (x, y) => x.cast("double") * y),
          lit(0.0), (acc, x) => acc + x)
        when(dot > 0, lit(1 << b)).otherwise(lit(0))
      }.reduce[Column](_ + _)
      struct(lit(t).as("tbl"), bucket.as("bucket"))
    }
    val hashed = df
      .select(col(idCol), explode(array(bucketStructs: _*)).as("h"))
      .select(col(idCol), col("h.tbl"), col("h.bucket"))
    val qb = df.filter(queryPred).select(col(idCol).as("qid"))
    val qHashed = hashed.join(qb, hashed(idCol) === qb("qid"), "left_semi")
      .select(col(idCol).as("qid"), col("tbl"), col("bucket"))
    val candidates = hashed.join(broadcast(qHashed), Seq("tbl", "bucket"))
      .filter(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol).as("nid"))
      .distinct()
    // exact re-rank restricted to candidates
    val e = quantize(df, idCol, embCol)
    val qe = e.join(qb, e(idCol) === qb("qid"), "left_semi")
      .select(col(idCol).as("qid"), col("pos"), col("qv").as("q_qv"))
    val ce = e.select(col(idCol).as("nid"), col("pos"), col("qv").as("n_qv"))
    val dots = ce.join(broadcast(qe), Seq("pos"))
      .join(candidates, Seq("qid", "nid"), "left_semi")
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("q_qv") * col("n_qv")).as("dot"))
    val norms = e.groupBy(col(idCol)).agg(sum(col("qv") * col("qv")).as("nrm"))
    val cosine = col("dot").cast("double") /
      sqrt(col("q_nrm").cast("double") * col("n_nrm").cast("double"))
    val scored = dots
      .join(broadcast(norms.select(col(idCol).as("qid"), col("nrm").as("q_nrm"))), Seq("qid"))
      .join(norms.select(col(idCol).as("nid"), col("nrm").as("n_nrm")), Seq("nid"))
      .select(col("qid"), col("nid"), cosine.as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid").asc)
    scored.select(col("qid"), col("nid"), row_number().over(w).as("rank"), col("cosine"))
      .filter(col("rank") <= k)
  }
}
