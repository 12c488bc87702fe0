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
