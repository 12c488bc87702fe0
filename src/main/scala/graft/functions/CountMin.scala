package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch state: a depth×width counter table (flattened) plus
  * the processed-row count (the error bound's denominator).
  */
final case class CMState(table: Array[Long], processed: Long)

/** Count-Min sketch (Cormode & Muthukrishnan '05) as a typed mergeable
  * [[Aggregator]] — the frequency-ESTIMATE sibling of the Misra-Gries
  * top-k sketch: MG keeps only k surviving counters (membership is
  * partitioning-dependent), CM answers a point estimate for ANY term,
  * and because its state is a fixed table of exact integer sums the
  * whole sketch is PARTITIONING-INVARIANT — the same corpus yields the
  * same estimates on 1 partition or 1000 (asserted in PipelineSpec;
  * still no cross-engine oracle, since the hash family isn't
  * expressible in portable SQL — a declared rows-only entry).
  *
  * Guarantees: estimate ≥ true count always (counters only ever add),
  * and estimate ≤ true + 2n/width with probability ≥ 1 − 2^−depth.
  * The exchange carries depth×width longs per partition (32 KiB at
  * the 4×1024 default) regardless of row count.
  *
  * Hashes are MurmurHash3 string hashes under `depth` fixed seeds —
  * deterministic across JVMs, partitions and releases.
  */
final class CountMinAgg(depth: Int, width: Int, portable: Boolean = false)
    extends Aggregator[String, CMState, CMState] {
  require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
  require(width >= 16 && width <= (1 << 22), s"width in [16, 4M], got $width")

  override def zero: CMState = CMState(new Array[Long](depth * width), 0L)

  override def reduce(s: CMState, x: String): CMState = {
    var i = 0
    while (i < depth) {
      s.table(i * width + CountMin.bucket(x, i, width, portable)) += 1L
      i += 1
    }
    CMState(s.table, s.processed + 1L)
  }

  override def merge(a: CMState, b: CMState): CMState = {
    val t = a.table
    var i = 0
    while (i < t.length) { t(i) += b.table(i); i += 1 }
    CMState(t, a.processed + b.processed)
  }

  override def finish(s: CMState): CMState = s

  override def bufferEncoder: Encoder[CMState] = Encoders.product[CMState]
  override def outputEncoder: Encoder[CMState] = Encoders.product[CMState]
}

object CountMin {

  /** Row-i bucket of term x: MurmurHash3 under a fixed per-row seed,
    * floor-mod to the table width (the fast production default); with
    * `portable = true`, the first 32 md5 bits of "i:x" mod width — the
    * md5-ring convention (Sampling.portableHash) every other portable
    * twin uses, expressible verbatim in DuckDB so the whole counter
    * table is cross-engine rebuildable (q221). Pure function of
    * (x, i, width) either way; md5 costs ~4× murmur per token, the
    * price of the oracle, not of the operator.
    */
  def bucket(x: String, i: Int, width: Int, portable: Boolean = false): Int =
    if (portable) {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$x".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (h % width).toInt
    } else
      java.lang.Math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(x, 0x9747b28c + i), width)

  /** Point estimate from a finished sketch: min over the depth rows. */
  def estimate(s: CMState, x: String, depth: Int, width: Int,
      portable: Boolean = false): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = s.table(i * width + bucket(x, i, width, portable))
      if (c < best) best = c
      i += 1
    }
    best
  }

  /** Sketch the column once (one 1-row aggregate; the ~32 KiB state is
    * the IVF-centroid precedent: a summary small enough to ride the
    * closure), then estimate every distinct term in a distributed map.
    * Output: (term, est_count) — est_count ≥ the true count, within
    * 2n/width of it w.h.p.
    */
  def estimates(
      df: DataFrame,
      column: String,
      depth: Int = 4,
      width: Int = 1024,
      portable: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val terms = df.select(col(column).cast("string")).as[String]
    val sketch =
      terms.select(new CountMinAgg(depth, width, portable).toColumn).head()
    terms.distinct()
      .map(t => (t, estimate(sketch, t, depth, width, portable)))
      .toDF("term", "est_count")
  }
}
