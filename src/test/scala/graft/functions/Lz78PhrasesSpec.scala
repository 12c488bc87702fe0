package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

/** Pins the compiled trie-walk kernel (r19) against the retired
  * higher-order-function fold's semantics: a straight set-of-strings
  * reference implementation of the SAME fold, plus hand-parsed cases
  * and the code-point (surrogate pair) boundary the old per-character
  * `split(t, '')` path implied.
  */
class Lz78PhrasesSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: the exact r14–r18 fold — dictionary as a set of phrase
    * strings, cur grows while `cur + c` is in the set, trailing
    * in-dictionary suffix counts as one final phrase.
    */
  private def reference(s: String): Long = {
    val ph = scala.collection.mutable.Set[String]()
    var cur = ""
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      val cand = cur + new String(Character.toChars(cp))
      if (ph.contains(cand)) cur = cand
      else { ph += cand; cur = "" }
    }
    ph.size.toLong + (if (cur.isEmpty) 0L else 1L)
  }

  test("trie walk matches the hand-parsed classics") {
    // aaaaaa → a | aa | aaa = 3; abcdef → 6; ababab → a|b|ab + trailing
    // "ab" = 4 (the CorpusOpsSpec lz78Complexity cases, kernel-level)
    assert(Lz78Phrases.ofString("aaaaaa") == 3L)
    assert(Lz78Phrases.ofString("abcdef") == 6L)
    assert(Lz78Phrases.ofString("ababab") == 4L)
    assert(Lz78Phrases.ofString("") == 0L)
  }

  test("trie walk equals the retired set-of-strings fold on varied text") {
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "to be or not to be that is the question to be or not",
      "a" * 200, ("ab" * 100) + "c", "xyxyxzxyxyxz",
      "mississippi river mississippi delta mississippi queen",
      (1 to 50).map(i => s"tok$i").mkString(" ") * 2)
    samples.foreach { s =>
      assert(Lz78Phrases.ofString(s) == reference(s), s.take(40))
    }
  }

  test("code points: surrogate pairs parse as single characters") {
    // U+1F600 (😀) is one code point / two UTF-16 units; per-char
    // semantics must treat it atomically (the old split(t,'') did)
    val smile = new String(Character.toChars(0x1F600))
    val s = smile * 6 // like "aaaaaa": expect 3 phrases
    assert(Lz78Phrases.ofString(s) == 3L)
    assert(Lz78Phrases.ofString(s) == reference(s))
    val mixed = s"a$smile" * 4 // alternating BMP/astral
    assert(Lz78Phrases.ofString(mixed) == reference(mixed))
  }

  test("codegen and interpreted paths agree; NULL propagates; SQL registers") {
    val strings = Seq("hello world hello", "aabbaabb", "q")
    val viaDf = strings.toDF("s")
      .select(Lz78Phrases.lz78Phrases(col("s"))).as[Long].collect()
    val viaEval = strings.map(s =>
      Lz78Phrases(Literal(UTF8String.fromString(s)))
        .eval(null).asInstanceOf[Long])
    assert(viaDf.toSeq == viaEval)
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(Lz78Phrases.lz78Phrases(col("s"))).collect()
    assert(nulls.head.isNullAt(0))
    GraftExtensions.install(spark)
    val r = spark.sql("SELECT lz78_phrases('ababab') AS n").as[Long].collect()
    assert(r.head == 4L)
    val err = intercept[Exception] {
      spark.sql("SELECT lz78_phrases(42)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
