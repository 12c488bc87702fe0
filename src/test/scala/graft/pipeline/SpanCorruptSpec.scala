package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanCorruptSpec extends SparkSpec {
  import spark.implicits._

  private val SentinelRe = "<extra_id_(\\d+)>".r

  /** Splice the target's spans back into the input at their sentinels —
    * the denoising objective's inverse. Exact round-trip is the law
    * spanCorrupt must satisfy on ANY text.
    */
  private def reconstruct(input: String, target: String): String = {
    val spans = scala.collection.mutable.Map[Int, scala.collection.mutable.Buffer[String]]()
    var cur = -1
    target.split(" ").filter(_.nonEmpty).foreach {
      case SentinelRe(k) =>
        cur = k.toInt; spans(cur) = scala.collection.mutable.Buffer()
      case tok => spans(cur) += tok
    }
    input.split(" ", -1).flatMap {
      case SentinelRe(k) => spans(k.toInt).toSeq
      case tok => Seq(tok)
    }.mkString(" ")
  }

  test("spanCorrupt round-trips every fixture document") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val out = TextStats.spanCorrupt(docs, "doc_id", "text")
      .join(docs, "doc_id")
      .select("text", "input_text", "target_text", "n_spans", "n_masked")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val orig = r.getString(0)
      assert(reconstruct(r.getString(1), r.getString(2)) == orig,
        s"round-trip failed for: ${orig.take(80)}")
    }
    // the objective actually fires: most docs carry spans, and the
    // corpus-level mask rate sits in the configured band (~9-17%)
    val masked = out.map(_.getLong(4)).sum.toDouble
    val total = out.map(_.getString(0).split(" ", -1).length).sum.toDouble
    assert(out.count(_.getLong(3) > 0) > out.length / 2)
    assert(masked / total > 0.05 && masked / total < 0.25,
      s"mask rate ${masked / total}")
  }

  test("sentinels number consecutively and appear in both streams") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    TextStats.spanCorrupt(docs, "doc_id", "text").collect().foreach { r =>
      val inIds = SentinelRe.findAllMatchIn(r.getAs[String]("input_text"))
        .map(_.group(1).toInt).toSeq
      val tgIds = SentinelRe.findAllMatchIn(r.getAs[String]("target_text"))
        .map(_.group(1).toInt).toSeq
      val n = r.getAs[Long]("n_spans").toInt
      assert(inIds == (0 until n).toSeq)
      assert(tgIds == (0 until n).toSeq)
    }
  }

  test("deterministic across runs and salts independent") {
    val docs = Seq((1L, ("tok " * 40).trim), (2L, "short doc"))
      .toDF("doc_id", "text")
    val a = TextStats.spanCorrupt(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = TextStats.spanCorrupt(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    val other = TextStats.spanCorrupt(docs, "doc_id", "text", salt = "sc2")
      .collect().map(_.toSeq).toSet
    // different salt → different span placement on a 40-token doc
    assert(a != other)
  }

  test("degenerate inputs stay total") {
    val docs = Seq((1L, ""), (2L, "one"), (3L, "a b")).toDF("doc_id", "text")
    val out = TextStats.spanCorrupt(docs, "doc_id", "text").collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_masked") >= 0L)
      val docId = r.getAs[Long]("doc_id")
      val orig = docs.collect().find(_.getLong(0) == docId).get.getString(1)
      assert(reconstruct(r.getAs[String]("input_text"),
        r.getAs[String]("target_text")) == orig)
    }
  }
}
