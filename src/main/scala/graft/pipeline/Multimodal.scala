package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One payload row entering the batched decoder. Top-level case class:
  * encoder codegen wants constructors without outer references.
  */
final case class MediaPayload(doc_id: Long, media_bytes: Array[Byte])

/** One row entering the batched image ENCODER: target dimensions only;
  * pixel content is derived deterministically from (doc_id, x, y).
  */
final case class ImageSpecRow(doc_id: Long, width: Int, height: Int)

/** Output of the (stub) image decode. */
final case class DecodedImage(doc_id: Long, width: Int, height: Int, checksum: Long)

/** Perceptual average-hash of a decoded image, split into two 32-bit
  * halves (cells 32–63 / 0–31) so neither engine shifts into the sign
  * bit when an oracle rebuilds it arithmetically.
  */
final case class ImageAHash(doc_id: Long, ahash_hi: Long, ahash_lo: Long)

/** One decoded-image profile row: container dimensions + perceptual
  * hash, the metadata a lossy-codec path can still promise exactly.
  */
final case class ImageProfile(
    doc_id: Long, width: Int, height: Int, ahash_hi: Long, ahash_lo: Long)

/** One row entering the batched WAV encoder: sample count only; sample
  * values derive deterministically from (doc_id, i).
  */
final case class WavSpecRow(doc_id: Long, n_samples: Int)

/** One decoded pixel (24-bit RGB) from the pixel-explode decode. */
final case class PixelRow(doc_id: Long, x: Int, y: Int, rgb: Int)

/** One row entering the batched animated-GIF encoder: frame count only;
  * frame content derives deterministically from (doc_id, frame, x, y).
  */
final case class AnimSpecRow(doc_id: Long, n_frames: Int)

/** One decoded animation frame: its index, the container's frame count
  * and the frame's white-pixel count (the two-color pattern's feature).
  */
final case class GifFrame(
    doc_id: Long, frame_idx: Int, n_frames: Long, white_count: Long)

/** Integer signal statistics of decoded PCM16 samples. `mean_square`
  * is the floor of sum(s²)/n — the RMS without the sqrt, kept integer
  * so any engine reproduces it exactly.
  */
final case class AudioStats(
    doc_id: Long, n_samples: Long, mean_square: Long, peak: Long)

/** Multimodal columns: image/audio/video as opaque `binary` payloads with a
  * typed metadata struct, plus the transform plumbing (decode, resize spec,
  * frame sampling) a training-data pipeline runs over them.
  *
  * Design for 100 TB: the payload travels as one BinaryType column so Spark
  * never interprets it; metadata lives in a separate struct so filters and
  * joins touch ONLY metadata (parquet column pruning keeps payload bytes on
  * disk — a `where meta.n_bytes < x` scan reads zero payload pages).
  * Partitioning guidance: repartition by a size-bucket column before heavy
  * decode stages so task input bytes stay balanced (see [[sizeBucket]]).
  *
  * Decode layers: HEADER decode is REAL — [[imageMeta]]/[[audioMeta]]
  * parse PNG/BMP/GIF dimensions and WAV audio parameters from the payload
  * bytes with built-in byte expressions (no codec library, stays in
  * codegen). PIXEL decode is ALSO real: [[imageioDecodeBatch]] runs the
  * JDK's `javax.imageio` codec (PNG/BMP/GIF/JPEG — ships with the JVM,
  * no external deps) inside the batched `mapPartitions` boundary, and is
  * the default codec of [[decodeImagesBatched]]; [[encodeImagesBatched]]
  * is the matching real encoder, so an encode→decode pixel round-trip
  * runs entirely in-plan. [[fakeDecodeMeta]]/[[stubDecodeBatch]] remain
  * as zero-dependency deterministic fakes for plan-shape tests and for
  * modalities whose codecs genuinely aren't in the JVM (video/audio
  * sample decode). A vectorized/native codec (Pandas-UDF `mapInPandas`
  * in PySpark, JNI here) slots into the same boundary without touching
  * any surrounding plan.
  */
object Multimodal {

  /** Largest per-row WAV sample count [[encodeWavBatched]] accepts:
    * 44 + 2·n must stay an Int, with headroom (≈1 GiB of PCM16).
    */
  val MaxWavSamples: Int = 1 << 29

  /** Metadata schema carried next to every payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sha256", StringType, nullable = false)))

  /** Wrap a text/binary column as a multimodal asset: payload bytes +
    * typed metadata struct. `modality` ∈ image|audio|video|text.
    */
  def ingest(df: DataFrame, payloadCol: String, modality: String): DataFrame = {
    val bytes =
      if (df.schema(payloadCol).dataType == BinaryType) col(payloadCol)
      else encode(col(payloadCol), "UTF-8")
    df.withColumn("media_bytes", bytes)
      .withColumn("media_meta", struct(
        lit(modality).as("modality"),
        length(col("media_bytes")).cast("long").as("n_bytes"),
        sha2(col("media_bytes"), 256).as("sha256")))
  }

  // ---- REAL header decode (no codec libraries needed) -------------------

  /** Big-endian unsigned int from `len` bytes at 1-based offset `off`. */
  private def be(b: org.apache.spark.sql.Column, off: Int, len: Int) =
    conv(hex(substring(b, off, len)), 16, 10).cast("long")

  /** Little-endian unsigned int: bytes re-assembled in reverse order. */
  private def le(b: org.apache.spark.sql.Column, off: Int, len: Int) =
    conv(concat((off + len - 1 to off by -1)
      .map(i => hex(substring(b, i, 1))): _*), 16, 10).cast("long")

  /** REAL image header decode for PNG / BMP / GIF payloads: container
    * detection by magic bytes and width/height extraction from the fixed
    * header layout (PNG IHDR big-endian at 17/21, BMP BITMAPINFOHEADER
    * little-endian at 19/23, GIF logical screen little-endian at 7/9) —
    * pure built-in byte expressions (substring/hex/conv), fully inside
    * whole-stage codegen, no UDF and no codec library. Unknown containers
    * yield nulls. Pixel DECOMPRESSION still needs a codec (see
    * [[decodeImagesBatched]]); header metadata does not.
    */
  def imageMeta(df: DataFrame, binCol: String = "media_bytes"): DataFrame = {
    val b = col(binCol)
    val isPng = hex(substring(b, 1, 8)) === lit("89504E470D0A1A0A")
    // 'BM' is genuinely all the magic BMP has (2 bytes, lookalikes
    // possible by format design); GIF carries the full 6-byte version
    // magic, so require it ("GIF87a" | "GIF89a")
    val isBmp = hex(substring(b, 1, 2)) === lit("424D")
    val isGif = hex(substring(b, 1, 6)).isin("474946383761", "474946383961")
    // BMP biHeight is SIGNED: negative means top-down row order — the
    // dimension is its magnitude
    val bmpHeightRaw = le(b, 23, 4)
    val bmpHeight = when(bmpHeightRaw >= 2147483648L, lit(4294967296L) - bmpHeightRaw)
      .otherwise(bmpHeightRaw)
    df.withColumn("image_format",
      when(isPng, "png").when(isBmp, "bmp").when(isGif, "gif"))
      .withColumn("width",
        when(isPng, be(b, 17, 4)).when(isBmp, le(b, 19, 4))
          .when(isGif, le(b, 7, 2)).cast("int"))
      .withColumn("height",
        when(isPng, be(b, 21, 4)).when(isBmp, bmpHeight)
          .when(isGif, le(b, 9, 2)).cast("int"))
  }

  /** REAL audio header decode for canonical WAV payloads (RIFF + "WAVE"
    * + a leading "fmt " chunk): channel count, sample rate and bit depth
    * from the fixed little-endian layout — same pure-byte-expression
    * approach as [[imageMeta]]. Non-WAV payloads yield nulls.
    */
  def audioMeta(df: DataFrame, binCol: String = "media_bytes"): DataFrame = {
    val b = col(binCol)
    val isWav = hex(substring(b, 1, 4)) === lit("52494646") &&
      hex(substring(b, 9, 8)) === lit("57415645666D7420")
    df.withColumn("audio_format", when(isWav, "wav"))
      .withColumn("n_channels", when(isWav, le(b, 23, 2)).cast("int"))
      .withColumn("sample_rate", when(isWav, le(b, 25, 4)).cast("int"))
      .withColumn("bits_per_sample", when(isWav, le(b, 35, 2)).cast("int"))
  }

  /** STUB decode: deterministic fake image dimensions / frame counts
    * derived from payload size (a real build replaces this projection with
    * a codec). Kept as pure column expressions so the stub exercises the
    * exact plan shape a real decode plugs into.
    */
  def fakeDecodeMeta(df: DataFrame): DataFrame =
    df
      .withColumn("fake_width",
        (lit(16) + col("media_meta.n_bytes") % 64).cast("int"))
      .withColumn("fake_height",
        (lit(16) + expr("media_meta.n_bytes div 64") % 64).cast("int"))
      .withColumn("fake_n_frames",
        (lit(1) + col("media_meta.n_bytes") % 30).cast("int"))

  /** Deterministic frame sampling for video payloads: every `stride`-th
    * frame index up to the (fake-)decoded frame count, exploded to one row
    * per sampled frame. The real pipeline shape: explode BEFORE decode so
    * frame extraction parallelizes per frame, not per video.
    */
  def sampleFrames(df: DataFrame, stride: Int = 10): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), col("fake_n_frames") - 1, lit(stride))))

  /** Batched decode plumbing — the Scala analog of a Pandas-UDF
    * `mapInPandas` stage: rows stream through the codec in bounded
    * batches, so a vectorized or native decoder amortizes its per-call
    * overhead and memory is bounded by `batchSize`, never by partition
    * size. The plan shape (typed mapPartitions after a payload
    * projection) is exactly what a real codec plugs into; the default
    * codec is the deterministic STUB [[stubDecodeBatch]].
    *
    * `mapPartitions` is justified here (the "last resort" rule): a batch
    * call into an external codec is genuine per-partition imperative
    * logic no Catalyst expression can express.
    */
  def decodeImagesBatched(
      df: DataFrame,
      idCol: String,
      batchSize: Int = 64,
      codec: Seq[MediaPayload] => Seq[DecodedImage] = imageioDecodeBatch)
      : Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col("media_bytes"))
      .as[MediaPayload]
      .mapPartitions(_.grouped(batchSize).flatMap(b => codec(b.toSeq)))
  }

  /** REAL batch codec: `javax.imageio.ImageIO` (JDK-bundled; decodes
    * PNG/BMP/GIF/JPEG with zero external deps, works headless). Returns
    * the decoded raster's true dimensions plus a rolling checksum over
    * the decoded RGB pixels in row-major order — the checksum depends on
    * decompressed pixel VALUES, so it proves real pixel decode, not just
    * header parsing. Undecodable payloads yield (-1, -1, 0) rather than
    * poisoning the batch.
    */
  def imageioDecodeBatch(batch: Seq[MediaPayload]): Seq[DecodedImage] =
    batch.map { p =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(p.media_bytes))
      if (img == null) DecodedImage(p.doc_id, -1, -1, 0L)
      else {
        val w = img.getWidth; val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sum = sum * 31 + (img.getRGB(x, y) & 0xffffff); x += 1
          }
          y += 1
        }
        DecodedImage(p.doc_id, w, h, sum)
      }
    }

  /** Deterministic pixel value for the synthetic encode path: a fixed
    * mix of (doc_id, x, y) into 24-bit RGB, reproducible by any engine
    * (and by [[PipelineSpec]] when cross-checking the decoded checksum).
    */
  def syntheticRgb(docId: Long, x: Int, y: Int): Int =
    (((docId * 2654435761L) + x * 7919L + y * 104729L) & 0xffffffL).toInt

  /** REAL batched image ENCODER — the write-side twin of
    * [[imageioDecodeBatch]]: fills a BufferedImage with the deterministic
    * [[syntheticRgb]] pattern at the requested per-row dimensions and
    * compresses it through `javax.imageio` (default PNG). Output rows are
    * (doc_id, media_bytes) payloads that any standards-compliant PNG
    * decoder — including [[imageMeta]]'s header parse — must agree on.
    * Runs in the same bounded-batch `mapPartitions` boundary as decode,
    * so encoder buffer memory is bounded by `batchSize`.
    */
  def encodeImagesBatched(
      df: DataFrame,
      idCol: String,
      widthCol: String,
      heightCol: String,
      format: String = "png",
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("doc_id"),
        col(widthCol).cast("int").as("width"),
        col(heightCol).cast("int").as("height"))
      .as[ImageSpecRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        val img = new java.awt.image.BufferedImage(
          r.width, r.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < r.height) {
          var x = 0
          while (x < r.width) {
            img.setRGB(x, y, syntheticRgb(r.doc_id, x, y)); x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, format, out)
        MediaPayload(r.doc_id, out.toByteArray)
      }))
      .toDF("doc_id", "media_bytes")
  }

  /** Perceptual average-hash (aHash) over REAL decoded pixels: decode
    * through `javax.imageio`, partition the raster into an 8×8 cell grid
    * (pixel (x,y) → cell (y·8/h, x·8/w)), average integer luma per cell
    * (BT.601 weights, integer arithmetic throughout), and set each
    * cell's bit iff its average ≥ the mean of the 64 cell averages. Two
    * images within a few Hamming bits are near-duplicates REGARDLESS of
    * resolution — the visual analog of SimHash, and the pairing step
    * composes with the same pigeonhole banding (`TextDedup.simhashPairs`
    * operates on any 64-bit fingerprint).
    *
    * All-integer and codec-exact for lossless formats, so an engine with
    * no image codec can reproduce the hash arithmetically from known
    * pixel values — exactly what the q93 DuckDB oracle does against this
    * implementation's output on real compressed PNGs. Requires w ≥ 8 and
    * h ≥ 8 (every cell must own ≥ 1 pixel); undecodable or too-small
    * payloads yield (-1, -1).
    */
  def aHashImagesBatched(
      df: DataFrame,
      idCol: String,
      batchSize: Int = 64): Dataset[ImageAHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col("media_bytes"))
      .as[MediaPayload]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.media_bytes))
        if (img == null || img.getWidth < 8 || img.getHeight < 8)
          ImageAHash(p.doc_id, -1L, -1L)
        else {
          val (hi, lo) = aHashOf(img)
          ImageAHash(p.doc_id, hi, lo)
        }
      }))
  }

  /** The aHash core over an in-memory raster — shared by the lossless
    * ([[aHashImagesBatched]]) and lossy ([[jpegProfileBatched]]) paths.
    */
  private def aHashOf(img: java.awt.image.BufferedImage): (Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y) & 0xffffff
        val luma = (299L * ((rgb >> 16) & 0xff) +
          587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)) / 1000L
        val cell = (y * 8 / h) * 8 + (x * 8 / w)
        cellSum(cell) += luma; cellCnt(cell) += 1
        x += 1
      }
      y += 1
    }
    val cellAvg = Array.tabulate(64)(i => cellSum(i) / cellCnt(i))
    val mean = cellAvg.sum / 64L
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 64) {
      if (cellAvg(i) >= mean) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  /** REAL batched JPEG ENCODER — the lossy member of the codec matrix
    * (PNG/BMP/GIF are bit-exact; the dominant format of an actual web
    * crawl is JPEG, which isn't): same deterministic [[syntheticRgb]]
    * fill as [[encodeImagesBatched]], compressed through the JDK's JPEG
    * writer at an explicit `quality`. Lossy coding makes pixel values
    * implementation-specific, so NO arithmetic pixel oracle exists by
    * design — the promises a JPEG path can keep exactly are container
    * dimensions and perceptual STABILITY (aHash within a few Hamming
    * bits across quality levels / vs the lossless encode), asserted in
    * PipelineSpec; q223 is the declared rows-only entry.
    */
  def encodeJpegBatched(
      df: DataFrame,
      idCol: String,
      widthCol: String,
      heightCol: String,
      quality: Float = 0.85f,
      batchSize: Int = 64): DataFrame = {
    require(quality > 0f && quality <= 1f, s"quality in (0,1], got $quality")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("doc_id"),
        col(widthCol).cast("int").as("width"),
        col(heightCol).cast("int").as("height"))
      .as[ImageSpecRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        val img = new java.awt.image.BufferedImage(
          r.width, r.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < r.height) {
          var x = 0
          while (x < r.width) {
            img.setRGB(x, y, syntheticRgb(r.doc_id, x, y)); x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val writer =
          javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(
          javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(quality)
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        try {
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(img, null, null),
            param)
        } finally { writer.dispose(); ios.close() }
        MediaPayload(r.doc_id, bos.toByteArray)
      }))
      .toDF("doc_id", "media_bytes")
  }

  /** Decode a (JPEG or any imageio-readable) payload ONCE and emit the
    * exact-by-contract profile: container dimensions + aHash. One codec
    * pass per row inside the bounded-batch boundary — dims and hash
    * never pay two decodes. Undecodable / sub-8×8 payloads yield
    * (-1, -1, -1, -1).
    */
  def jpegProfileBatched(
      df: DataFrame,
      idCol: String,
      batchSize: Int = 64): Dataset[ImageProfile] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col("media_bytes"))
      .as[MediaPayload]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.media_bytes))
        if (img == null || img.getWidth < 8 || img.getHeight < 8)
          ImageProfile(p.doc_id, -1, -1, -1L, -1L)
        else {
          val (hi, lo) = aHashOf(img)
          ImageProfile(p.doc_id, img.getWidth, img.getHeight, hi, lo)
        }
      }))
  }

  /** REAL batched image RESIZE through the codec boundary: decode via
    * `javax.imageio`, downscale by integer BOX AVERAGING (each output
    * pixel is the per-channel floor-average of its input box
    * [⌊x·w/outW⌋, ⌊(x+1)·w/outW⌋) × [⌊y·h/outH⌋, ⌊(y+1)·h/outH⌋)), and
    * re-encode. Box averaging is chosen over Graphics2D scaling because
    * its arithmetic is EXACT and engine-reproducible — the q120 oracle
    * recomputes every resized pixel from the synthetic-pattern formula
    * — and it is the correct downsampling filter anyway (area average =
    * no aliasing). Undecodable or smaller-than-target payloads are
    * dropped. Bounded-batch mapPartitions, like the other codecs.
    */
  def resizeImagesBatched(
      df: DataFrame,
      idCol: String,
      outW: Int,
      outH: Int,
      format: String = "png",
      batchSize: Int = 64): DataFrame = {
    require(outW >= 1 && outH >= 1, s"bad target size ${outW}x$outH")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col("media_bytes"))
      .as[MediaPayload]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.media_bytes))
        if (img == null || img.getWidth < outW || img.getHeight < outH) None
        else {
          val w = img.getWidth; val h = img.getHeight
          val out = new java.awt.image.BufferedImage(
            outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < outH) {
            val y0 = y * h / outH; val y1 = (y + 1) * h / outH
            var x = 0
            while (x < outW) {
              val x0 = x * w / outW; val x1 = (x + 1) * w / outW
              var r = 0L; var g = 0L; var b = 0L
              var yy = y0
              while (yy < y1) {
                var xx = x0
                while (xx < x1) {
                  val v = img.getRGB(xx, yy)
                  r += (v >> 16) & 0xff; g += (v >> 8) & 0xff; b += v & 0xff
                  xx += 1
                }
                yy += 1
              }
              val n = (x1 - x0).toLong * (y1 - y0)
              out.setRGB(x, y,
                (((r / n) << 16) | ((g / n) << 8) | (b / n)).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, format, bos)
          Some(MediaPayload(p.doc_id, bos.toByteArray))
        }
      }))
      .toDF("doc_id", "media_bytes")
  }

  /** Batched pixel-explode decode: one row per decoded pixel —
    * (doc_id, x, y, 24-bit rgb). The feature-extraction primitive
    * downstream stages (histograms, channel stats, patch models) build
    * on, and the strongest possible codec check: every pixel VALUE is a
    * row an oracle can rebuild. Use on small/resized images (the row
    * count is w×h per doc — explode AFTER [[resizeImagesBatched]], not
    * before). Undecodable payloads yield no rows.
    */
  def decodePixelsBatched(
      df: DataFrame,
      idCol: String,
      batchSize: Int = 64): Dataset[PixelRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col("media_bytes"))
      .as[MediaPayload]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.media_bytes))
        if (img == null) Iterator.empty
        else for {
          y <- Iterator.range(0, img.getHeight)
          x <- Iterator.range(0, img.getWidth)
        } yield PixelRow(p.doc_id, x, y, img.getRGB(x, y) & 0xffffff)
      }))
  }

  /** Deterministic 16-bit PCM sample for the synthetic WAV encode path —
    * the audio twin of [[syntheticRgb]], reproducible by any engine.
    */
  def syntheticPcm16(docId: Long, i: Int): Int =
    (((docId * 31L + i * 2654435761L) & 0xffffL) - 32768L).toInt

  /** REAL batched WAV ENCODER: fills a canonical mono PCM16 WAV (44-byte
    * RIFF/fmt/data header + little-endian samples) with the
    * deterministic [[syntheticPcm16]] signal at the requested per-row
    * sample count. The bytes satisfy [[audioMeta]]'s header parse and
    * any standards-compliant WAV reader. Bounded-batch mapPartitions,
    * like the image codecs.
    */
  def encodeWavBatched(
      df: DataFrame,
      idCol: String,
      nSamplesCol: String,
      sampleRate: Int = 16000,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("doc_id"),
        col(nSamplesCol).cast("int").as("n_samples"))
      .as[WavSpecRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        // negative counts would NegativeArraySizeException at task time and
        // counts past ~1G samples overflow the 44 + dataLen Int below
        require(r.n_samples >= 0 && r.n_samples <= MaxWavSamples,
          s"n_samples in [0, $MaxWavSamples], got ${r.n_samples} (doc ${r.doc_id})")
        val dataLen = r.n_samples * 2
        val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVEfmt ".getBytes("US-ASCII"))
          .putInt(16).putShort(1).putShort(1) // PCM, mono
          .putInt(sampleRate).putInt(sampleRate * 2)
          .putShort(2).putShort(16) // block align, bit depth
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        var i = 0
        while (i < r.n_samples) {
          buf.putShort(syntheticPcm16(r.doc_id, i).toShort); i += 1
        }
        MediaPayload(r.doc_id, buf.array())
      }))
      .toDF("doc_id", "media_bytes")
  }

  /** REAL batched PCM16 sample decode + integer signal statistics: parse
    * the canonical WAV layout (the one [[audioMeta]] reads and
    * [[encodeWavBatched]] writes — RIFF/"WAVEfmt "/leading fmt chunk,
    * "data" at offset 36), read the little-endian samples, and reduce to
    * all-integer stats (count, floor-mean-square, peak |s|) an engine
    * with no audio reader can reproduce arithmetically — the q95 oracle
    * does exactly that. Non-WAV or non-canonical payloads yield
    * (-1, -1, -1).
    */
  def audioStatsBatched(
      df: DataFrame,
      idCol: String,
      batchSize: Int = 64): Dataset[AudioStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col("media_bytes"))
      .as[MediaPayload]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { p =>
        val b = p.media_bytes
        def tag(off: Int, s: String): Boolean =
          b.length >= off + s.length &&
            s.getBytes("US-ASCII").zipWithIndex.forall { case (c, i) => b(off + i) == c }
        if (!tag(0, "RIFF") || !tag(8, "WAVEfmt ") || !tag(36, "data"))
          AudioStats(p.doc_id, -1L, -1L, -1L)
        else {
          val buf = java.nio.ByteBuffer.wrap(b)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val dataLen = buf.getInt(40)
          val n = dataLen / 2
          if (n <= 0 || 44 + dataLen > b.length) AudioStats(p.doc_id, -1L, -1L, -1L)
          else {
            var sumSq = 0L; var peak = 0L
            var i = 0
            while (i < n) {
              val s = buf.getShort(44 + 2 * i).toLong
              sumSq += s * s
              val a = math.abs(s)
              if (a > peak) peak = a
              i += 1
            }
            AudioStats(p.doc_id, n.toLong, sumSq / n, peak)
          }
        }
      }))
  }

  /** REAL batched audio DECIMATION — the audio twin of
    * [[resizeImagesBatched]]: decode the canonical WAV layout, reduce
    * the sample rate by `factor` with integer BOX AVERAGING (each
    * output sample is the average of its `factor` input samples,
    * TRUNCATED toward zero — JVM long division and DuckDB's `//` agree
    * on that convention for the negative sums signed PCM produces;
    * floorDiv would NOT), and re-encode at rate/factor. Exact arithmetic by
    * construction, so an oracle rebuilds every output sample from the
    * input formula. A trailing partial group averages over its actual
    * count. Non-canonical payloads are dropped.
    */
  def decimateWavBatched(
      df: DataFrame,
      idCol: String,
      factor: Int,
      batchSize: Int = 64): DataFrame = {
    require(factor >= 1, s"factor must be positive, got $factor")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col("media_bytes"))
      .as[MediaPayload]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { p =>
        val b = p.media_bytes
        def tag(off: Int, s: String): Boolean =
          b.length >= off + s.length &&
            s.getBytes("US-ASCII").zipWithIndex.forall { case (c, i) => b(off + i) == c }
        if (!tag(0, "RIFF") || !tag(8, "WAVEfmt ") || !tag(36, "data")) None
        else {
          val in = java.nio.ByteBuffer.wrap(b)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val rate = in.getInt(24)
          val n = in.getInt(40) / 2
          if (n <= 0 || 44 + n * 2 > b.length) None
          else {
            val outN = (n + factor - 1) / factor
            val dataLen = outN * 2
            val out = java.nio.ByteBuffer.allocate(44 + dataLen)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val outRate = math.max(rate / factor, 1)
            out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
              .put("WAVEfmt ".getBytes("US-ASCII"))
              .putInt(16).putShort(1).putShort(1)
              .putInt(outRate).putInt(outRate * 2)
              .putShort(2).putShort(16)
              .put("data".getBytes("US-ASCII")).putInt(dataLen)
            var i = 0
            while (i < outN) {
              val lo = i * factor
              val hi = math.min(lo + factor, n)
              var sum = 0L
              var j = lo
              while (j < hi) { sum += in.getShort(44 + 2 * j); j += 1 }
              out.putShort((sum / (hi - lo)).toShort)
              i += 1
            }
            Some(MediaPayload(p.doc_id, out.array()))
          }
        }
      }))
      .toDF("doc_id", "media_bytes")
  }

  /** Whether grid cell (x, y) of frame f in doc `docId`'s synthetic
    * animation is WHITE — a deterministic two-color pattern
    * (GIF-palette-safe: the indexed encoder preserves pure black/white
    * exactly, where arbitrary 24-bit colors would quantize) whose
    * per-frame white count varies with (doc, frame) so the q122 oracle
    * is non-degenerate.
    */
  def syntheticFrameWhite(docId: Long, f: Int, x: Int, y: Int): Boolean =
    (docId * 31 + f * 7 + x * 3 + y) % 5 < 2

  /** REAL batched multi-frame GIF ENCODER: each row becomes an animated
    * GIF of `framesCol` full frames (w×h, the [[syntheticFrameWhite]]
    * two-color pattern) written through `javax.imageio`'s sequence API
    * — the VIDEO-modality twin of [[encodeImagesBatched]], upgrading
    * frame handling from the deterministic fake to a real multi-frame
    * container.
    */
  def encodeGifAnimBatched(
      df: DataFrame,
      idCol: String,
      framesCol: String,
      w: Int,
      h: Int,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("doc_id"),
        col(framesCol).cast("int").as("n_frames"))
      .as[AnimSpecRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        val writer = javax.imageio.ImageIO
          .getImageWritersBySuffix("gif").next()
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < r.n_frames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y,
                if (syntheticFrameWhite(r.doc_id, f, x, y)) 0xffffff else 0)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        writer.dispose()
        ios.close()
        MediaPayload(r.doc_id, bos.toByteArray)
      }))
      .toDF("doc_id", "media_bytes")
  }

  /** REAL batched multi-frame GIF DECODER: count the container's frames
    * with the codec (`getNumImages(true)`) and reduce each decoded
    * frame's raster to its white-pixel count — one row per frame,
    * (doc_id, frame_idx, n_frames, white_count). The real replacement
    * for [[fakeDecodeMeta]]+[[sampleFrames]]'s frame counting on the
    * one animated container the JVM ships a codec for. Undecodable
    * payloads yield no rows.
    */
  def decodeGifFramesBatched(
      df: DataFrame,
      idCol: String,
      batchSize: Int = 64): Dataset[GifFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col("media_bytes"))
      .as[MediaPayload]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { p =>
        val readers = javax.imageio.ImageIO.getImageReadersBySuffix("gif")
        if (!readers.hasNext) Iterator.empty
        else {
          val reader = readers.next()
          val in = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(p.media_bytes))
          try {
            reader.setInput(in)
            val n = reader.getNumImages(true)
            (0 until n).iterator.map { f =>
              val img = reader.read(f)
              var white = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  if ((img.getRGB(x, y) & 0xffffff) == 0xffffff) white += 1
                  x += 1
                }
                y += 1
              }
              GifFrame(p.doc_id, f, n.toLong, white)
            }.toVector.iterator
          } catch {
            case _: Exception => Iterator.empty
          } finally {
            reader.dispose()
            in.close() // memory-backed here, but executors run for days
          }
        }
      }))
  }

  /** STUB batch codec (kept for plan-shape tests and as the template for
    * modalities with no JVM codec): deterministic fake dimensions from
    * payload size plus a rolling checksum over the bytes — enough to
    * prove the bytes crossed the boundary intact.
    */
  def stubDecodeBatch(batch: Seq[MediaPayload]): Seq[DecodedImage] =
    batch.map { p =>
      val n = p.media_bytes.length
      var sum = 0L
      var i = 0
      while (i < n) { sum = sum * 31 + (p.media_bytes(i) & 0xff); i += 1 }
      DecodedImage(p.doc_id, 16 + n % 64, 16 + (n / 64) % 64, sum)
    }

  /** Size-bucket column for balanced decode stages: payloads within a
    * bucket are within 2× of each other, so `repartition(col("size_bucket"))`
    * (or range-partition on it) evens out task input bytes before a heavy
    * per-row decode.
    */
  def sizeBucket(df: DataFrame): DataFrame =
    df.withColumn("size_bucket",
      ceil(log2(greatest(col("media_meta.n_bytes"), lit(1)))).cast("int"))
}
