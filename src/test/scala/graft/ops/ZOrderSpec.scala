package graft.ops

import graft.SparkSpec
import graft.queries.TempDirs
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L
    (0 until bits).foreach { i =>
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (x, y)
  }

  test("zKey is a bijection on the grid and inverts cleanly") {
    val n = 32
    val grid = for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong)
    val out = grid.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zKey(col("x"), col("y"), 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._3).distinct.length == n * n) // injective on the grid
    assert(out.forall { case (x, y, z) => deinterleave(z, 5) == ((x, y)) })
    assert(out.forall { case (_, _, z) => z >= 0 && z < n.toLong * n })
  }

  test("zKey yields NULL on out-of-range or null inputs") {
    val out = Seq(
      (Some(-1L), Some(0L)), (Some(0L), Some(256L)), (None, Some(1L)),
      (Some(255L), Some(255L))
    ).toDF("x", "y")
      .select(ZOrder.zKey(col("x"), col("y"), 8).as("z"))
      .collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0) && out(2).isNullAt(0))
    assert(out(3).getLong(0) == (1L << 16) - 1) // all 16 bits set
  }

  test("Z-order layout prunes a 2-dim box query to far fewer files") {
    // full 256x256 grid: a box covering 1/64 of the plane. An x-sorted
    // layout slices the plane into x-stripes that ALL span the full y
    // range, so every stripe overlapping x∈[0,32) matches; the Z-order
    // layout keeps both dims clustered per file.
    val grid = for { x <- 0 until 256; y <- 0 until 256 }
      yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val base = TempDirs.tempDirCleanedAtExit(None, "graft_zorder_")

    def intersectingFiles(path: String): Long = {
      val boxed = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
      boxed.filter(col("x0") < 32 && col("x1") >= 0 &&
        col("y0") < 32 && col("y1") >= 0).count()
    }

    val zPath = base.resolve("z").toString
    ZOrder.layoutByZOrder(df, "x", "y", numFiles = 64, bits = 8)
      .write.mode("overwrite").parquet(zPath)
    val linPath = base.resolve("lin").toString
    df.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linPath)

    val zHit = intersectingFiles(zPath)
    val linHit = intersectingFiles(linPath)
    // 64 files ≈ one 32×32 Z-block each → the 32×32 query box touches
    // ~1 block; the x-sorted layout's stripes all span y, so every
    // stripe under x<32 (≈ 8 of 64) matches.
    assert(zHit * 2 <= linHit, s"zorder=$zHit linear=$linHit")
    // layout changes bytes on disk, never rows
    assert(spark.read.parquet(zPath).count() == 256L * 256)
  }
}
