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

  test("resizeImagesBatched box-averages channels with floor division") {
    // 4×4 → 2×2: each output pixel averages a 2×2 box. Top-left box:
    // (10,20,30)×3 + (14,20,30) → r=(30+14)/4=11, g=20, b=30.
    val px = Array(
      Array(0x0a141e, 0x0a141e, 0x111111, 0x111111),
      Array(0x0a141e, 0x0e141e, 0x111111, 0x131313),
      Array(0xff0000, 0x000000, 0xffffff, 0x000000),
      Array(0x00ff00, 0x000000, 0x000000, 0x000000))
    val df = Seq((1L, pngBytes(4, 4)((x, y) => px(y)(x)))).toDF("doc_id", "media_bytes")
    val out = Multimodal.decodePixelsBatched(
      Multimodal.resizeImagesBatched(df, "doc_id", 2, 2), "doc_id")
      .collect().map(r => ((r.x, r.y), r.rgb)).toMap
    assert(out((0, 0)) == 0x0b141e)
    assert(out((1, 0)) == 0x111111) // (17·3+19)/4 floors back to 17 per channel
    assert(out((0, 1)) == ((0xff / 4) << 16 | (0xff / 4) << 8)) // r and g boxes each hold one full-bright pixel
    assert(out((1, 1)) == ((0xff / 4) << 16 | (0xff / 4) << 8 | 0xff / 4))
  }

  test("resize drops undecodable and too-small payloads") {
    val df = Seq(
      (1L, pngBytes(8, 8)((_, _) => 0x123456)),
      (2L, Array[Byte](1, 2, 3)), // undecodable
      (3L, pngBytes(2, 2)((_, _) => 0))) // smaller than target
      .toDF("doc_id", "media_bytes")
    val out = Multimodal.resizeImagesBatched(df, "doc_id", 4, 4)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
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

  test("JPEG path: exact dims, perceptually stable hash across codecs") {
    import org.apache.spark.sql.functions.col
    // planted spec table mirroring q223's construction
    val specs = Seq((1L, 40, 24), (2L, 17, 55), (3L, 8, 8))
      .toDF("doc_id", "spec_w", "spec_h")
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    def profiles(q: Float) = Multimodal.jpegProfileBatched(
        Multimodal.encodeJpegBatched(
          specs, "doc_id", "spec_w", "spec_h", quality = q), "doc_id")
      .collect().map(p => p.doc_id ->
        ((p.width, p.height, (p.ahash_hi, p.ahash_lo)))).toMap
    val hi = profiles(0.9f)
    // container dimensions survive lossy coding EXACTLY
    assert(hi.map { case (id, (w, h, _)) => (id, w, h) }.toSet ==
      Set((1L, 40, 24), (2L, 17, 55), (3L, 8, 8)))
    // encode-decode-hash stability: vs the lossless PNG encode of the
    // SAME synthetic raster, and across JPEG quality levels. The
    // synthetic pattern is pseudo-random NOISE — JPEG's spectral worst
    // case, where threshold-adjacent cells flip easiest — so the pin is
    // 10 bits (measured: <=7), still well inside the q205 near-dup
    // pairing radius
    val png = Multimodal.aHashImagesBatched(
        Multimodal.encodeImagesBatched(specs, "doc_id", "spec_w", "spec_h"),
        "doc_id")
      .collect().map(p => p.doc_id -> ((p.ahash_hi, p.ahash_lo))).toMap
    val lo = profiles(0.5f)
    for (id <- Seq(1L, 2L, 3L)) {
      assert(hamming(hi(id)._3, png(id)) <= 10,
        s"doc $id: JPEG q0.9 drifted ${hamming(hi(id)._3, png(id))} bits from PNG")
      assert(hamming(hi(id)._3, lo(id)._3) <= 10,
        s"doc $id: q0.9 vs q0.5 drift ${hamming(hi(id)._3, lo(id)._3)} bits")
    }
    // undecodable payloads profile as the (-1,...) sentinel row
    val bad = Multimodal.jpegProfileBatched(
        Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "media_bytes"),
        "doc_id").collect()
    assert(bad.toSeq == Seq(ImageProfile(9L, -1, -1, -1L, -1L)))
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
