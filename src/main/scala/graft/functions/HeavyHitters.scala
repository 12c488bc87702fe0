package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters state: at most k counters + the number of
  * items processed (the error bound's denominator).
  */
final case class MGState(counters: Map[String, Long], processed: Long)

/** Misra-Gries heavy-hitters sketch as a typed Spark [[Aggregator]] — a
  * custom MERGEABLE aggregate the built-in function set doesn't have
  * (approx_count_distinct sketches cardinality, not frequency; exact
  * top-k shuffles every distinct term). Each partition folds its rows
  * into ≤ k counters; partial states merge associatively (Agarwal et
  * al., "Mergeable Summaries", PODS'12: sum counts, keep the top k,
  * subtract the (k+1)-th count); the exchange carries k counters per
  * partition regardless of row count.
  *
  * Guarantees (the PipelineSpec contract): estimates are lower bounds,
  * true_count − n/(k+1) ≤ estimate ≤ true_count, so every term with
  * true frequency > n/(k+1) survives the sketch. Which LOW-frequency
  * terms also appear depends on merge order — like every sketch here,
  * the result is partitioning-specific, hence a declared rows-only
  * entry (no cross-engine oracle can hash-match it).
  */
final class MisraGriesAgg(k: Int)
    extends Aggregator[String, MGState, Map[String, Long]] {
  require(k > 0 && k <= 65536, s"k in (0, 65536], got $k")

  override def zero: MGState = MGState(Map.empty, 0L)

  override def reduce(s: MGState, x: String): MGState = {
    val c = s.counters
    val c2 =
      if (c.contains(x)) c.updated(x, c(x) + 1L)
      else if (c.size < k) c.updated(x, 1L)
      else c.flatMap { case (t, n) => // classic MG: decrement all, drop zeros
        if (n > 1L) Some(t -> (n - 1L)) else None
      }
    MGState(c2, s.processed + 1L)
  }

  override def merge(a: MGState, b: MGState): MGState = {
    val summed = b.counters.foldLeft(a.counters) { case (m, (t, n)) =>
      m.updated(t, m.getOrElse(t, 0L) + n)
    }
    val trimmed =
      if (summed.size <= k) summed
      else {
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.flatMap { case (t, n) =>
          if (n - cut > 0L) Some(t -> (n - cut)) else None
        }
      }
    MGState(trimmed, a.processed + b.processed)
  }

  override def finish(s: MGState): Map[String, Long] = s.counters

  override def bufferEncoder: Encoder[MGState] = Encoders.product[MGState]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object HeavyHitters {

  /** Global heavy hitters of a string column: one row per surviving
    * counter, `(term, est_count)`, est_count a lower bound within
    * n/(k+1) of the truth. For per-key heavy hitters, use the same
    * Aggregator through `groupByKey(...).agg(new MisraGriesAgg(k)
    * .toColumn)` or the [[udaf]] form in an untyped groupBy.
    */
  def heavyHitters(df: DataFrame, column: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(column).cast("string")).as[String]
      .select(new MisraGriesAgg(k).toColumn.name("_g_hh"))
      .select(explode(col("_g_hh")))
      .toDF("term", "est_count")
  }

  /** The PORTABLE Misra-Gries twin: the same summary computed as ONE
    * giant merge instead of a stream fold. The mergeable-summaries
    * result (Agarwal et al., PODS '12) is that MG summaries combine by
    * adding counters, subtracting the (k+1)-st largest value and
    * dropping non-positives — applied to the exact count table (an MG
    * summary with zero error and too many counters), one such merge IS
    * the canonical order-independent MG summary: est(t) = count(t) −
    * c₍k+1₎ for the top k terms (count DESC, term ASC; c₍k+1₎ = 0 when
    * fewer than k+1 terms), positives only. Every MG guarantee holds —
    * est ≤ true count, est ≥ true − n/(k+1) (k+1 terms each count
    * ≥ c₍k+1₎, so c₍k+1₎ ≤ n/(k+1)), ≤ k counters — and unlike the
    * streaming fold ([[heavyHitters]]), which keeps its
    * partitioning-dependent survivor set, this form is a pure function
    * of the multiset: hash-exact cross-engine (q222's oracle).
    *
    * Scale shape: one hash aggregate (the only corpus-sized exchange)
    * then TakeOrderedAndProject(k+1) — the threshold and survivors are
    * a bounded k+1-row collect (the IVF-centroid contract).
    */
  def heavyHittersPortable(df: DataFrame, column: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val top = df.select(col(column).cast("string").as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(k + 1).collect()
    val thr = if (top.length > k) top(k).getLong(1) else 0L
    top.take(k).toSeq
      .map(r => (r.getString(0), r.getLong(1) - thr))
      .filter(_._2 > 0)
      .toDF("term", "est_count")
  }

  /** The sketch as an untyped aggregate function, usable in any
    * `groupBy(...).agg(...)` — including STREAMING windowed aggregation,
    * where the MG state (≤ k counters) becomes the store's value and
    * partial states merge exactly like map-side combines do in batch.
    */
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGriesAgg(k))
}
