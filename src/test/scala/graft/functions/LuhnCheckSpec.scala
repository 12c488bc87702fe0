package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class LuhnCheckSpec extends SparkSpec {
  import spark.implicits._

  test("luhnCheck validates known-good cards and rejects near-misses") {
    val cases = Seq(
      "4242424242424242" -> true,  // Visa test number
      "4242424242424241" -> false, // last digit off by one
      "5555555555554444" -> true,  // Mastercard test number
      "378282246310005" -> true,   // 15-digit Amex test number
      "1234567890123456" -> false,
      "0000000000000000" -> true,  // checksum 0 — shape gates length
      "79927398713" -> true)       // the classic worked example
    val out = cases.map(_._1).toDF("d")
      .select(LuhnCheck.luhnCheck(col("d"))).as[Boolean].collect()
    assert(out.toSeq == cases.map(_._2))
  }

  test("luhnCheck: non-digits and empty are false, NULL propagates") {
    val out = Seq("4242 4242 4242 4242", "", "abc", "42a4")
      .toDF("d").select(LuhnCheck.luhnCheck(col("d"))).as[Boolean].collect()
    assert(out.forall(_ == false)) // separators must be stripped FIRST
    val n = Seq[Option[String]](None).toDF("d")
      .select(LuhnCheck.luhnCheck(col("d"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("codegen and interpreted paths agree; kernel is shared") {
    val strings = Seq("4242424242424242", "1234567890123456", "79927398713")
    val viaDf = strings.toDF("d")
      .select(LuhnCheck.luhnCheck(col("d"))).as[Boolean].collect().toSeq
    val viaEval = strings.map(s =>
      LuhnCheck(Literal(UTF8String.fromString(s)))
        .eval(null).asInstanceOf[Boolean])
    assert(viaDf == viaEval)
  }
}
