package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One payload row entering the batched decoder. Top-level case class:
  * encoder codegen wants constructors without outer references.
  */
final case class MediaPayload(doc_id: Long, media_bytes: Array[Byte])

/** Output of the (stub) image decode. */
final case class DecodedImage(doc_id: Long, width: Int, height: Int, checksum: Long)

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
  * codegen). PIXEL/SAMPLE decode is a STUB: decompression needs external
  * native codecs (not in this build), so [[fakeDecodeMeta]] derives
  * deterministic fake dimensions and [[decodeImagesBatched]] runs a stub
  * batch codec. The Spark-side plumbing — schema, batch shape, column
  * pruning, partitioning — is real and tested; swap the stub for a
  * vectorized decode (Pandas-UDF style `mapInPandas` batches in PySpark,
  * or a JNI codec behind `mapPartitions` here) without touching any
  * surrounding plan.
  */
object Multimodal {

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
      codec: Seq[MediaPayload] => Seq[DecodedImage] = stubDecodeBatch)
      : Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col("media_bytes"))
      .as[MediaPayload]
      .mapPartitions(_.grouped(batchSize).flatMap(b => codec(b.toSeq)))
  }

  /** STUB batch codec (a real build swaps in the native decoder):
    * deterministic fake dimensions from payload size plus a rolling
    * checksum over the bytes — enough to prove the bytes crossed the
    * boundary intact.
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
