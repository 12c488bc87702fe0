package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{BloomBitmap, BloomBitmapAgg}

/** Bloom-filter join pruning: drop probe rows whose key CANNOT be on the
  * build side before the join's shuffle, then run the exact join on the
  * survivors. The result is identical to the plain join (the bloom
  * filter admits false positives, never false negatives; the exact join
  * removes them) — what changes is WHERE rows die: at the probe scan,
  * before the exchange, instead of after it.
  *
  * This is the hand-rolled, deterministic form of Spark's runtime
  * bloom-filter injection (`spark.sql.optimizer.runtime.bloomFilter.*`,
  * which only fires on selective non-broadcastable builds). At 100 TB
  * the shuffle is the cost: a build side selecting 0.1% of keys prunes
  * ~99.9% of probe bytes off the wire for the price of one aggregation
  * over the build keys and a numBits/8-byte driver round-trip (1 MiB at
  * the default 2^23 bits — same bounded-driver-state contract as the
  * IVF centroids, graft.pipeline.Similarity).
  *
  * False-positive rate ≈ (1 - e^(-kn/m))^k; the 2^23-bit default holds
  * ~0.6M build keys at k=5 under 1% FPR. Size numBits to the build-side
  * key cardinality, not the probe size.
  */
object BloomPrune {

  /** `probe LEFT SEMI JOIN build` with bloom pre-pruning of the probe
    * side. Exactly equal to the unpruned semi join, for any bitmap size.
    */
  def semiJoin(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      numBits: Int = 1 << 23,
      numHashes: Int = 5): DataFrame = {
    val bitmap = buildBitmap(build, buildKey, numBits, numHashes)
    val pruned = probe.filter(
      BloomBitmap.mightContain(col(probeKey), bitmap, numBits, numHashes))
    pruned.join(
      build.select(col(buildKey)),
      pruned(probeKey) === build(buildKey), "left_semi")
  }

  /** Aggregate the build side's key positions into one bitmap. One
    * partial bitmap per partition ORs on the driver; the collect is
    * bounded at numBits/8 bytes by construction.
    */
  def buildBitmap(
      build: DataFrame, buildKey: String, numBits: Int, numHashes: Int): Array[Long] = {
    val positions = build
      .select(BloomBitmap.positions(col(buildKey), numBits, numHashes).as("p"))
      .as[Seq[Long]](org.apache.spark.sql.catalyst.encoders.ExpressionEncoder())
    positions.select(new BloomBitmapAgg(numBits).toColumn).head()
  }
}
