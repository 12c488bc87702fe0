package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter bitmap built as a mergeable typed [[Aggregator]], probed
  * with built-in (whole-stage-codegen'd) bit arithmetic — the runtime
  * row-filter primitive behind [[graft.ops.BloomPrune]].
  *
  * The k bit positions for a key are computed IN-PLAN by [[positions]]
  * (k seeded xxhash64 calls, mod numBits) on both the build and the
  * probe side, so the two sides agree by construction — the aggregator
  * never hashes anything itself, it only ORs position lists into a
  * fixed-size Array[Long]. Partials merge with a word-wise OR, so the
  * exchange carries one numBits/8-byte bitmap per partition regardless
  * of row count (same mergeable-summary shape as [[MisraGriesAgg]]).
  */
final class BloomBitmapAgg(numBits: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  require(numBits > 0 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  private val words = numBits / 64

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(b: Array[Long], positions: Seq[Long]): Array[Long] = {
    positions.foreach { p =>
      b((p >> 6).toInt) |= 1L << (p & 63L).toInt
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object BloomBitmap {

  /** The k bit positions of `key`: array(pmod(xxhash64(key, seed=i),
    * numBits)) for i in [0, numHashes). Pure built-in expressions —
    * codegen'd on both the build aggregation and the probe filter.
    */
  def positions(key: Column, numBits: Int, numHashes: Int): Column = {
    require(numHashes > 0 && numHashes <= 16, s"numHashes in (0,16], got $numHashes")
    array((0 until numHashes).map(i =>
      pmod(xxhash64(key, lit(i)), lit(numBits.toLong))): _*)
  }

  /** Membership probe of `key` against a driver-held bitmap, as a single
    * built-in-expression Column: every one of the k positions must have
    * its bit set. The bitmap enters the plan as ONE array literal (not
    * per-element codegen), so a 1 MiB filter is a broadcast-sized
    * constant, never a driver loop. False positives possible, false
    * negatives impossible — callers re-verify with an exact join.
    */
  def mightContain(
      key: Column, bitmap: Array[Long], numBits: Int, numHashes: Int): Column = {
    val words = typedlit(bitmap.toSeq)
    // forall over the in-plan position array: the bitmap literal appears
    // ONCE in the expression tree (k element_at's against the same array
    // would embed k copies of a MiB-sized literal in the serialized plan)
    forall(positions(key, numBits, numHashes), pos =>
      call_function("shiftright",
        element_at(words, (pos / 64).cast("int") + lit(1)),
        (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L))
  }
}
