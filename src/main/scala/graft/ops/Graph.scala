package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Iterative graph measures over edge DataFrames. Same execution
  * discipline as [[graft.pipeline.TextDedup.dupClusters]]: per-round
  * eager materialization truncates lineage (reliable `checkpoint` when
  * the context has a checkpoint dir — executor-loss-safe on clusters —
  * else `localCheckpoint`), loop state lives on executors, and every
  * round is a fixed number of keyed exchanges — nothing driver-side
  * scales with the graph.
  */
object Graph {

  /** PageRank by power iteration over weighted directed edges:
    *
    *   score'(v) = (1−d)/N + d·(Σ_{u→v} score(u)·p(u→v) + dangling/N)
    *
    * where p normalizes `weightCol` per source (Σ_v p(u→v) = 1) and
    * `dangling` is the score mass sitting on nodes with no outgoing
    * edges, redistributed uniformly — Σ score stays exactly 1 every
    * round. Runs a FIXED `iters` rounds (deterministic output for a
    * deterministic input, unlike tolerance-stopped variants whose round
    * count flips on an ulp).
    *
    * Scale shape per round: one node-keyed join (scores ⋈ edges), one
    * dst-keyed partial aggregate, a 1-row dangling aggregate and the
    * 1-row N frame riding broadcast crossJoins — in-plan scalars, never
    * collected. The normalized edge and node frames are materialized
    * once before the loop. Power iteration needs O(diameter-independent)
    * rounds for convergence (damping contracts by 0.85/round), so
    * `iters`=10..20 covers web-scale graphs; each round's cost is the
    * two keyed exchanges, the classic distributed-PageRank shape.
    *
    * Output: (node, pagerank) for every node appearing in any edge.
    *
    * Precondition: `weightCol` values are non-negative with a positive
    * per-source sum (they normalize to transition probabilities); a
    * negative weight silently corrupts the distribution, and checking
    * it would cost a pass — validate upstream where weights are born
    * (transition counts and tf-idf weights are non-negative by
    * construction).
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iters: Int = 10,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(damping >= 0 && damping < 1, s"damping in [0,1), got $damping")
    def materialize(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)

    val perSrc = Window.partitionBy(col("_g_src"))
    // MATERIALIZED, not cache()d — the loop re-references these frames
    // every round and a cached frame still carries its full logical
    // plan, which Catalyst re-analyzes and re-optimizes per action
    // (the dupClusters lesson, BASELINE.md r8)
    val w = materialize(edges.select(
        col(srcCol).as("_g_src"), col(dstCol).as("_g_dst"),
        col(weightCol).cast("double").as("_g_w"))
      .withColumn("_g_p", col("_g_w") / sum(col("_g_w")).over(perSrc))
      .select(col("_g_src"), col("_g_dst"), col("_g_p")))
    val nodes = materialize(
      w.select(col("_g_src").as("node"))
        .union(w.select(col("_g_dst")))
        .distinct())
    // 1-row frames: N and the out-degree-bearing node set's complement
    // mass ride broadcasts — in-plan scalars, the q60/q113 discipline
    val nn = nodes.agg(count(lit(1)).cast("double").as("_g_n"))
    val srcs = materialize(w.select(col("_g_src").as("node")).distinct())
    var scores = materialize(
        nodes.crossJoin(broadcast(nn))
        .select(col("node"), (lit(1.0) / col("_g_n")).as("score")))
    var it = 0
    while (it < iters) {
      val contrib = scores
        .join(w, scores("node") === w("_g_src"))
        .groupBy(col("_g_dst"))
        .agg(sum(col("score") * col("_g_p")).as("_g_in"))
      val dangling = scores.join(srcs, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("score")), lit(0.0)).as("_g_dangling"))
      val next = nodes
        .join(contrib, nodes("node") === contrib("_g_dst"), "left")
        .crossJoin(broadcast(nn))
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(1.0 - damping) / col("_g_n") +
            lit(damping) * (coalesce(col("_g_in"), lit(0.0)) +
              col("_g_dangling") / col("_g_n"))).as("score"))
      scores = materialize(next)
      it += 1
    }
    scores.select(col("node"), col("score").as("pagerank"))
  }
}
