package graft.pipeline

import graft.SparkSpec

class ChunkPackSpec extends SparkSpec {

  import spark.implicits._

  test("chunkDocuments: boundaries, overlap, short-doc floor, validation") {
    val docs = Seq((1L, "abcdefghij"), (2L, "ab")).toDF("doc_id", "text")
    val out = TextStats.chunkDocuments(docs, "doc_id", "text",
      chunkChars = 4, overlapChars = 1)
    // stride 3: ceil((10-1)/3) = 3 chunks; a doc shorter than one chunk
    // yields exactly itself
    assert(rows(out) == Set(
      Seq(1L, 0L, "abcd"), Seq(1L, 1L, "defg"), Seq(1L, 2L, "ghij"),
      Seq(2L, 0L, "ab")))
    // zero overlap covers the text exactly, no repeats
    val flat = TextStats.chunkDocuments(docs, "doc_id", "text", 3)
      .orderBy("doc_id", "chunk_idx")
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getString(2)).mkString }
    assert(flat == Map(1L -> "abcdefghij", 2L -> "ab"))
    intercept[IllegalArgumentException] {
      TextStats.chunkDocuments(docs, "doc_id", "text", 4, overlapChars = 4)
    }
  }

  test("compressionSignal: repetitive < prose < noise; bounds; batch invariance") {
    val rnd = new scala.util.Random(7)
    val docs = Seq(
      (1L, "spam " * 400), // highly repetitive
      (2L, ("the quick brown fox jumps over the lazy dog and then " +
        "wanders off towards the river bank looking for supper ") * 20),
      (3L, Array.fill(2000)((rnd.nextInt(94) + 33).toChar).mkString), // noise
      (4L, "")) // empty doc must not divide by zero
      .toDF("doc_id", "text")
    val rows4 = TextStats.compressionSignal(docs, "doc_id", "text").collect()
    val out = rows4.filterNot(_.isNullAt(3))
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) < out(2L) && out(2L) < out(3L), out)
    assert(out.values.forall(r => r >= 0.0 && r < 1.2), out)
    // empty text: ratio is NULL, not the deflate header artifact
    assert(rows4.find(_.getLong(0) == 4L).get.isNullAt(3))
    val b1 = TextStats.compressionSignal(docs, "doc_id", "text", batchSize = 1)
      .collect().map(_.toSeq).toSet
    assert(b1 == TextStats.compressionSignal(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet)
  }

  test("packContiguous: exact prefix bins, shard-count invariance") {
    val docs = (1L to 6L).map(i => (i, 5L)).toDF("doc_id", "sz")
    val out = Sampling.packContiguous(docs, "doc_id", "sz", capacity = 10)
      .select($"doc_id", $"pack_prefix", $"seq_bin")
    assert(rows(out) == Set(
      Seq(1L, 0L, 0L), Seq(2L, 5L, 0L), Seq(3L, 10L, 1L),
      Seq(4L, 15L, 1L), Seq(5L, 20L, 2L), Seq(6L, 25L, 2L)))
    // the sharded answer is shard-count independent (the law the q100
    // oracle pins against a one-window rebuild)
    val irregular = (1L to 100L).map(i => (i * 7 % 101, (i * 13 % 9))).toDF("doc_id", "sz")
    val a = Sampling.packContiguous(irregular, "doc_id", "sz", 16, shards = 1)
    val b = Sampling.packContiguous(irregular, "doc_id", "sz", 16, shards = 7)
    assert(rows(a) == rows(b))
    intercept[IllegalArgumentException] {
      Sampling.packContiguous(docs, "doc_id", "sz", 0)
    }
  }
}
