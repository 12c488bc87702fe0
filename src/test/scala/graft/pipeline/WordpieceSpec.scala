package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WordPiece vocabulary induction (TextStats.wordpieceTrain, q248) —
  * the likelihood-scored third member of the tokenizer trio.
  */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  test("likelihood scoring picks the cohesive pair, not the frequent one") {
    // words: "ab"×2, "cd"×1. Pair (a,##b) has count 2 but its symbols
    // also have count 2 → score ln2 − ln2 − ln2 = −ln2. Pair (c,##d)
    // has count 1 over singleton symbols → score 0. WordPiece must take
    // (c,##d); frequency-scored BPE takes the count-2 pair.
    val docs = Seq("ab ab cd").toDF("text")
    val wp = TextStats.wordpieceTrain(docs, "text", 1).collect().head
    assert(wp.getAs[String]("lhs") == "c")
    assert(wp.getAs[String]("rhs") == "##d")
    assert(wp.getAs[String]("merged") == "cd")
    assert(wp.getAs[Long]("pair_count") == 1L)
    assert(wp.getAs[Long]("score_unat") == 0L) // ln1 − ln1 − ln1
    val bpe = TextStats.bpeTrain(docs, "text", 1).collect().head
    assert(bpe.getAs[String]("lhs") == "a") // the families disagree here
  }

  test("## continuation convention survives fusion") {
    // "xyz": pairs (x,##y) and (##y,##z) both score 0 (all counts 1);
    // tie-break (lhs ASC) picks '##y' < 'x', merged keeps its prefix
    val docs = Seq("xyz").toDF("text")
    val out = TextStats.wordpieceTrain(docs, "text", 2)
      .orderBy("step").collect()
    assert(out(0).getAs[String]("merged") == "##yz")
    assert(out(0).getAs[Long]("units_after") == 2L) // [x, ##yz]
    // step 2 can only fuse (x, ##yz) → the full word
    assert(out(1).getAs[String]("merged") == "xyz")
    assert(out(1).getAs[Long]("units_after") == 1L)
  }

  test("micro-nat score matches the hand computation") {
    // "ee e": word "ee"×1 + "e"×1 → syms e:2 (once from "ee" pos1,
    // once from "e"), ##e:1; pair (e,##e) count 1:
    // score = ln1 − ln2 − ln1 = −ln2 → d6 → −0.693147 → −693147
    val docs = Seq("ee e").toDF("text")
    val out = TextStats.wordpieceTrain(docs, "text", 1).collect().head
    assert(out.getAs[Long]("score_unat") == -693147L)
  }

  test("units accounting decreases monotonically across steps") {
    val docs = Seq("spark merge spark vector merge table").toDF("text")
    val out = TextStats.wordpieceTrain(docs, "text", 4)
      .orderBy("step").select("units_after").as[Long].collect()
    assert(out.toSeq.sliding(2).forall { case Seq(a, b) => b < a })
  }

  test("100-merge run completes with bounded plan depth (both trainers)") {
    // the production-vocab regime check: the per-step fused layer must
    // not accumulate past the periodic materialization cadence — an
    // unchecked loop is O(steps²) re-execution and hits the codegen
    // expression-depth wall near real vocab sizes. 26 distinct 9-char
    // words give ~200 mergeable steps of pair diversity.
    val rnd = new scala.util.Random(42)
    val words = (0 until 26).map { i =>
      val c = ('a' + i).toChar
      s"$c" + (0 until 8).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val docs = Seq(words.mkString(" ")).toDF("text")
    val bpe = TextStats.bpeTrain(docs, "text", 100).collect()
    assert(bpe.length == 100)
    assert(bpe.forall(r =>
      r.getAs[String]("merged") ==
        r.getAs[String]("lhs") + r.getAs[String]("rhs")))
    val wp = TextStats.wordpieceTrain(docs, "text", 100).collect()
    assert(wp.length == 100)
    // units shrink overall: 100 greedy merges on a 234-symbol corpus
    assert(wp.last.getAs[Long]("units_after") <
      wp.head.getAs[Long]("units_after"))
  }

  test("training is partitioning-invariant") {
    val docs = (1 to 40).map(i => s"w$i word common common").toDF("text")
    val one = TextStats.wordpieceTrain(docs.coalesce(1), "text", 3)
      .collect().toSeq
    val many = TextStats.wordpieceTrain(docs.repartition(7), "text", 3)
      .collect().toSeq
    assert(one.map(_.toString) == many.map(_.toString))
  }
}
