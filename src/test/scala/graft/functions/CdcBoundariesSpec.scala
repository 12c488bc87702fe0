package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the compiled CDC rolling-hash kernel (r19) bit-for-bit against
  * the retired interpreted SQL form — the exact expression string
  * r14–r18 cdcChunks evaluated — on fixture text and adversarial
  * cases (short docs, exact-window docs, astral code points).
  */
class CdcBoundariesSpec extends SparkSpec {
  import spark.implicits._

  /** The retired SQL form, verbatim: per-char ascii codes, unrolled
    * window sum, one mod M, filter positions.
    */
  private def retiredSql(window: Int, divisor: Int): String = {
    val M = 2147483647L
    val pows = Iterator.iterate(1L)(p => (p * 257L) % M)
      .take(window).toSeq
    val codes = "transform(sequence(1, length(s)), " +
      "i -> CAST(ascii(substr(s, i, 1)) AS BIGINT))"
    val winSum = (0 until window)
      .map(j => s"element_at(cs, i - $j) * ${pows(j)}L")
      .mkString(" + ")
    s"element_at(transform(array($codes), cs -> " +
      s"filter(sequence(1, size(cs)), i -> i >= $window AND " +
      s"(($winSum) % ${M}L) % $divisor = 0)), 1)"
  }

  test("compiled kernel equals the retired SQL fold on fixture text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text").as("s"))
      .filter(length(col("s")) > 0)
    for ((w, d) <- Seq((16, 64), (2, 2), (8, 16), (64, 4))) {
      val out = docs.select(col("doc_id"),
          CdcBoundaries.cdcBoundaries(col("s"), w, d).as("k"),
          expr(retiredSql(w, d)).as("r"))
        .filter(not(col("k") <=> col("r")))
      assert(out.isEmpty, s"w=$w d=$d: kernel diverged from the " +
        s"retired fold on ${out.count()} docs")
    }
  }

  test("compiled kernel handles the edges the fold handled") {
    val cases = Seq(
      "",                       // empty → empty boundary list
      "ab",                     // shorter than window
      "abcdefghijklmnop",       // exactly window chars (w=16)
      "x" * 100,                // degenerate repetition
      new String(Character.toChars(0x1F600)) * 40 + "end") // astral
      .zipWithIndex.map(_.swap)
    val df = cases.toDF("id", "s")
    val out = df.select(col("id"),
        CdcBoundaries.cdcBoundaries(col("s"), 16, 64).as("k"),
        expr(retiredSql(16, 64)).as("r"))
      .filter(not(col("k") <=> col("r")))
    assert(out.isEmpty, "kernel diverged on an edge case")
    // NULL propagates
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(CdcBoundaries.cdcBoundaries(col("s"), 16, 64)).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("window bounds are enforced like cdcChunks'") {
    intercept[IllegalArgumentException] {
      CdcBoundaries.cdcBoundaries(col("s"), 1, 64)
    }
    intercept[IllegalArgumentException] {
      CdcBoundaries.cdcBoundaries(col("s"), 65, 64)
    }
    intercept[IllegalArgumentException] {
      CdcBoundaries.cdcBoundaries(col("s"), 16, 1)
    }
  }
}
