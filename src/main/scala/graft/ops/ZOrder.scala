package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout for multi-dimensional data skipping — the
  * engine-side analog of a lakehouse `OPTIMIZE ZORDER BY`: interleave
  * the bits of two filter columns into one sort key, range-partition
  * and sort the write by it, and every later scan that filters a BOX
  * on both dimensions prunes most files/row-groups by their min/max
  * stats. A single-column sort clusters one dimension and scatters the
  * other; the Z-curve keeps points close in BOTH dimensions close in
  * file order — at 100 TB this is the difference between reading one
  * terabyte and one hundred.
  *
  * The key is built from BUILT-IN bit expressions (shift/and/or), so
  * it whole-stage-codegens without a custom Expression — the
  * compose-existing-ops preference. Values must fit `bits` unsigned
  * bits after the caller's normalization (rank/bucket wide domains
  * first; [[zKey]] validates bounds in-plan).
  */
object ZOrder {

  /** Morton key: bit i of `x` → bit 2i, bit i of `y` → bit 2i+1 of the
    * result. Bijective on [0, 2^bits)² — a null/out-of-range input
    * yields NULL (sorts last) rather than silently folding into a
    * wrong bucket.
    */
  def zKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val lim = 1L << bits
    val inRange = x >= 0 && x < lim && y >= 0 && y < lim
    val interleaved = (0 until bits).map { i =>
      val xi = shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i)
      val yi = shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i + 1)
      xi.bitwiseOR(yi)
    }.reduce(_ bitwiseOR _)
    when(inRange, interleaved)
  }

  /** Rewrite `df` into Z-order over two integer columns: one global
    * range partitioning on the Morton key (sampled range bounds — the
    * only exchange), then an in-partition sort, so parquet row-group
    * min/max stats become tight boxes on BOTH dimensions. `numFiles`
    * controls output granularity: more files ⇒ finer skipping, more
    * footer overhead. Write the result with
    * `.write.parquet(...)` — layout survives the round-trip.
    */
  def layoutByZOrder(
      df: DataFrame,
      xCol: String,
      yCol: String,
      numFiles: Int,
      bits: Int = 16): DataFrame = {
    require(numFiles >= 1, s"numFiles must be positive, got $numFiles")
    require(!df.columns.contains("_g_zkey"),
      "reserved column name in input: _g_zkey")
    df.withColumn("_g_zkey", zKey(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("_g_zkey"))
      .sortWithinPartitions(col("_g_zkey"))
      .drop("_g_zkey")
  }
}
