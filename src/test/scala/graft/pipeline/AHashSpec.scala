package graft.pipeline

import graft.SparkSpec

class AHashSpec extends SparkSpec {

  import spark.implicits._

  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("aHash of a half-bright 8x8 image is the known bit pattern") {
    // 8×8 → one pixel per cell; left half white (luma 255), right black
    // (0); mean = 127 → bits set exactly where x < 4: 0x0F0F0F0F in
    // both halves.
    val bytes = pngBytes(8, 8)((x, _) => if (x < 4) 0xffffff else 0x000000)
    val df = Seq((1L, bytes)).toDF("doc_id", "media_bytes")
    val Array(row) = Multimodal.aHashImagesBatched(df, "doc_id").collect()
    assert(row == ImageAHash(1L, 0x0f0f0f0fL, 0x0f0f0f0fL))
  }

  test("aHash near-dup pairing composes with the SimHash pigeonhole bands") {
    import org.apache.spark.sql.functions._
    // 32×32 → each aHash cell is one 4×4 block. base = 4px checkerboard
    // (bits alternate); near = base with ONE block inverted (hamming 1);
    // far = 8px vertical stripes (disagrees on half the cells).
    val base = (x: Int, y: Int) =>
      if ((x / 4 + y / 4) % 2 == 0) 0xffffff else 0x000000
    val near = (x: Int, y: Int) =>
      if (x < 4 && y < 4) 0xffffff - base(x, y) else base(x, y)
    val far = (x: Int, _: Int) => if ((x / 8) % 2 == 0) 0xffffff else 0x000000
    val df = Seq(
      (1L, pngBytes(32, 32)(base)),
      (2L, pngBytes(32, 32)(near)),
      (3L, pngBytes(32, 32)(far))).toDF("doc_id", "media_bytes")
    val fps = Multimodal.aHashImagesBatched(df, "doc_id").toDF()
      .select(col("doc_id"),
        shiftleft(col("ahash_hi"), 32).bitwiseOR(col("ahash_lo")).as("simhash"))
    val pairs = TextDedup.simhashPairs(fps, "doc_id", maxHamming = 8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs)
  }

  test("aHash is batch-size invariant and rejects undecodable/small payloads") {
    val imgs = (1L to 5L).map(i =>
      (i, pngBytes(16, 12)((x, y) => if ((x + y + i).toInt % 3 == 0) 0xffffff else 0x202020)))
    val bad = Seq(
      (100L, Array[Byte](1, 2, 3)), // not an image
      (101L, pngBytes(4, 4)((_, _) => 0xffffff))) // under the 8×8 floor
    val df = (imgs ++ bad).toDF("doc_id", "media_bytes")
    val b1 = Multimodal.aHashImagesBatched(df, "doc_id", batchSize = 1).collect().toSet
    val b64 = Multimodal.aHashImagesBatched(df, "doc_id", batchSize = 64).collect().toSet
    assert(b1 == b64)
    assert(b1.filter(_.doc_id >= 100L).forall(r =>
      r.ahash_hi == -1L && r.ahash_lo == -1L))
  }
}
