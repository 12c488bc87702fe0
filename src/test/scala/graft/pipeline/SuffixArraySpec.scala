package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction (SuffixArray.suffixRanks,
  * q252) and the cross-document repeated-suffix report (q253).
  */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(docs: Seq[(Long, String)]): Map[(Long, Long), Long] =
    SuffixArray.suffixRanks(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("banana: the classic suffix array") {
    // suffixes sorted: a(6) ana(4) anana(2) banana(1) na(5) nana(3)
    val rk = ranksOf(Seq((1L, "banana")))
    assert(rk == Map(
      (1L, 6L) -> 1L, (1L, 4L) -> 2L, (1L, 2L) -> 3L,
      (1L, 1L) -> 4L, (1L, 5L) -> 5L, (1L, 3L) -> 6L))
  }

  test("a shorter suffix sorts before every extension") {
    // all suffixes: ab < abc < b < bc < c
    val rk = ranksOf(Seq((1L, "ab"), (2L, "abc")))
    assert(rk((1L, 1L)) == 1L) // "ab"
    assert(rk((2L, 1L)) == 2L) // "abc"
    assert(rk((1L, 2L)) == 3L) // "b"
    assert(rk((2L, 2L)) == 4L) // "bc"
    assert(rk((2L, 3L)) == 5L) // "c"
  }

  test("byte-identical suffixes share a rank across documents") {
    val rk = ranksOf(Seq((1L, "same"), (2L, "same"), (3L, "tame")))
    for (p <- 1L to 4L) assert(rk((1L, p)) == rk((2L, p)))
    // "ame" is shared by all three from their second char
    assert(rk((1L, 2L)) == rk((3L, 2L)))
    assert(rk((1L, 1L)) != rk((3L, 1L))) // "same" vs "tame"
  }

  test("rank order equals brute-force string sort on random docs") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 12L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(15))("abcab" (rnd.nextInt(5))).mkString))
    val rk = ranksOf(docs)
    val brute = docs.flatMap { case (d, t) =>
      (1 to t.length).map(p => ((d, p.toLong), t.substring(p - 1)))
    }
    val expected = brute.map(_._2).distinct.sorted.zipWithIndex
      .map { case (sfx, i) => sfx -> (i + 1L) }.toMap
    brute.foreach { case (key, sfx) =>
      assert(rk(key) == expected(sfx), s"suffix '$sfx' at $key")
    }
  }

  test("suffixRanks is partitioning-invariant") {
    val docs = (1L to 20L).map(i => (i, ("abcab" * 8).drop((i % 5).toInt)))
    val one = SuffixArray.suffixRanks(
      docs.toDF("doc_id", "text").coalesce(1), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val many = SuffixArray.suffixRanks(
      docs.toDF("doc_id", "text").repartition(7), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(one == many)
  }

  test("longestRepeats finds the planted internal repeat via adjacent LCP") {
    // "abcdefgh" appears INSIDE two docs (not as a tail), so only the
    // LCP of rank-adjacent suffixes can see it; the trailing junk
    // differs so no suffix is shared
    val docs = Seq(
      (1L, "xx abcdefgh qq one"),
      (2L, "yy abcdefgh zz two"),
      (3L, "nothing in common")).toDF("doc_id", "text")
    val out = SuffixArray.longestRepeats(docs, "doc_id", "text", topK = 3)
      .collect()
      .sortBy(r => (-r.getAs[Long]("repeat_len"), r.getAs[Long]("sa_rank")))
    val top = out.head
    // the longest repeat is " abcdefgh " — 10 chars including BOTH
    // flanking spaces ("xx_" and "yy_" share the left one; the docs
    // diverge at 'q' vs 'z' after the right one)
    assert(top.getAs[String]("source") == "adjacent")
    assert(top.getAs[String]("preview") == " abcdefgh ")
    assert(top.getAs[Long]("repeat_len") == 10L)
    assert(top.getAs[Long]("rep_doc") == 1L)
    assert(top.getAs[Long]("rep_pos") == 3L)
  }

  test("longestRepeats reports a duplicated suffix as a dup row") {
    val docs = Seq(
      (1L, "AAA shared tail here"),
      (2L, "BBBB shared tail here"),
      (3L, "something else")).toDF("doc_id", "text")
    val out = SuffixArray.longestRepeats(docs, "doc_id", "text", topK = 2)
      .collect()
      .sortBy(r => (-r.getAs[Long]("repeat_len"), r.getAs[Long]("sa_rank")))
    val top = out.head
    // " shared tail here" (17 chars) is a full shared suffix → dup
    assert(top.getAs[String]("source") == "dup")
    assert(top.getAs[Long]("repeat_len") == 17L)
    assert(top.getAs[Long]("n_occurrences") == 2L)
    assert(top.getAs[String]("preview") == " shared tail here")
  }

  test("empty documents contribute no suffixes (phantom-sequence guard)") {
    // Spark's sequence(1, 0) yields [1, 0]; unguarded, an empty doc
    // would emit two phantom suffix rows incl. an invalid pos=0
    val withEmpty = Seq((1L, "ab"), (2L, ""), (3L, "abc"))
    val rk = ranksOf(withEmpty)
    assert(!rk.keySet.exists(_._1 == 2L))
    assert(rk == ranksOf(Seq((1L, "ab"), (3L, "abc"))))
  }

  test("adjacent rows report the two rank groups' summed occurrences") {
    // " abcdefgh " repeat: both flanking rank groups are singletons
    val docs = Seq(
      (1L, "xx abcdefgh qq one"),
      (2L, "yy abcdefgh zz two")).toDF("doc_id", "text")
    val top = SuffixArray.longestRepeats(docs, "doc_id", "text", topK = 1)
      .collect().head
    assert(top.getAs[String]("source") == "adjacent")
    assert(top.getAs[Long]("n_occurrences") == 2L)
  }

  test("heavy-key stress: one character repeated 100k times completes") {
    // the adversarial corpus for the rank exchange: every early-round
    // pair key is THE one heavy key; the distinct-first path collapses
    // it map-side instead of sorting its whole row mass on one shard
    val L = 100000
    val df = Seq((1L, "a" * L)).toDF("doc_id", "text")
    val rk = SuffixArray.suffixRanks(df, "doc_id", "text", maxRounds = 13)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(rk.size == L)
    // suffixes are "a"×(L−p+1): strictly shorter sorts first, so the
    // rank at position p is exactly L − p + 1
    for (p <- Seq(1, 2, L / 2, L - 1, L))
      assert(rk(p.toLong) == (L - p + 1).toLong, s"pos $p")
  }

  test("cutSharedSuffixes keeps the first occurrence, cuts the rest") {
    val docs = Seq(
      (1L, "AAA common tail"),
      (2L, "BBBB common tail"),
      (3L, "nothing here")).toDF("doc_id", "text")
    val out = SuffixArray.cutSharedSuffixes(docs, "doc_id", "text",
        minLen = 5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("orig_len"),
          r.getAs[Long]("kept_len")))).toMap
    // " common tail" (12 chars) is shared; doc1 (min id) keeps it,
    // doc2 is cut at its first qualifying position (5)
    assert(out(1L) == (("AAA common tail", 15L, 15L)))
    assert(out(2L) == (("BBBB", 16L, 4L)))
    assert(out(3L) == (("nothing here", 12L, 12L)))
  }

  test("cutSharedSuffixes cuts a whole-tail shadow down to empty") {
    val docs = Seq(
      (1L, "xyzhello world suffix"),
      (2L, "hello world suffix")).toDF("doc_id", "text")
    val out = SuffixArray.cutSharedSuffixes(docs, "doc_id", "text",
        minLen = 5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("kept_len")))).toMap
    assert(out(1L) == (("xyzhello world suffix", 21L)))
    assert(out(2L) == (("", 0L)))
  }

  test("law: after the cut, re-detection finds nothing above threshold") {
    val docs = Seq(
      (1L, "first document with a planted shared ending block"),
      (2L, "second doc, same planted shared ending block"),
      (3L, "third completely unrelated content"),
      (4L, "shared ending block")).toDF("doc_id", "text")
    val minLen = 10
    val cut = SuffixArray.cutSharedSuffixes(docs, "doc_id", "text", minLen)
      .select(col("doc_id"), col("text"))
    assert(SuffixArray.repeatedSuffixes(cut, "doc_id", "text", minLen)
      .count() == 0L)
    // and the cut is idempotent: cutting again changes nothing
    val twice = SuffixArray.cutSharedSuffixes(cut, "doc_id", "text", minLen)
    assert(twice.filter(col("kept_len") =!= col("orig_len")).count() == 0L)
  }

  test("repeatedSuffixes finds exactly the planted shared tail") {
    val docs = Seq(
      (1L, "xyzhello world suffix"),
      (2L, "hello world suffix"),
      (3L, "unrelated text here")).toDF("doc_id", "text")
    val out = SuffixArray.repeatedSuffixes(docs, "doc_id", "text",
        minLen = 5)
      .collect()
      .map(r => (r.getAs[Long]("suffix_len"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("rep_doc"), r.getAs[Long]("rep_pos")))
    // doc2 is doc1's tail from pos 4: every doc2 suffix of len >= 5 is
    // shared (len 18 down to 5 = 14 groups), nothing else is
    assert(out.length == 14)
    assert(out.forall(_._2 == 2L))
    assert(out.forall(_._3 == 1L)) // representative is the min doc id
    // the longest shared suffix is doc1's pos 4 ("hello world suffix")
    val longest = out.maxBy(_._1)
    assert(longest == ((18L, 2L, 1L, 4L)))
  }
}
