package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

class ByteEntropySpec extends SparkSpec {
  import spark.implicits._

  test("byteEntropy matches the hand-computed histogram entropy") {
    // "aab": H = -(2/3·log2(2/3) + 1/3·log2(1/3)) = 0.918295834054...
    val out = Seq("aab", "", "aaaa", "ab")
      .toDF("s").select(ByteEntropy.byteEntropy(col("s"))).as[Double]
      .collect()
    assert(math.abs(out(0) - 0.9182958340544896) < 1e-12)
    assert(out(1) == 0.0) // empty string: zero information, total function
    assert(out(2) == 0.0) // single symbol
    assert(out(3) == 1.0) // uniform over two symbols: exactly 1 bit
  }

  test("codegen and interpreted paths agree bit-for-bit; NULL propagates") {
    val strings = Seq("hello world", "the quick brown fox", "aA0!\n\t")
    val viaDf = strings.toDF("s")
      .select(ByteEntropy.byteEntropy(col("s"))).as[Double].collect()
    val viaEval = strings.map(s =>
      ByteEntropy(Literal(UTF8String.fromString(s)))
        .eval(null).asInstanceOf[Double])
    assert(viaDf.toSeq == viaEval) // exact: shared kernel, fixed sum order
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(ByteEntropy.byteEntropy(col("s"))).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("byteEntropy equals the explode-chars formulation on ASCII") {
    val df = Seq((1L, "some sample text"), (2L, "zzzzzz top")).toDF("id", "s")
    val direct = df.select(col("id"), ByteEntropy.byteEntropy(col("s")).as("h"))
    val exploded = df
      .select(col("id"), explode(split(col("s"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy("id", "ch").count()
      .withColumn("n", sum("count").over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")))
      .groupBy("id")
      .agg(sum(-(col("count") / col("n")) * log2(col("count") / col("n")))
        .as("h"))
    val d = direct.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val e = exploded.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    d.foreach { case (k, v) => assert(math.abs(v - e(k)) < 1e-9, s"doc $k") }
  }

  test("byte_entropy registers for SQL and rejects non-string input") {
    GraftExtensions.install(spark)
    val r = spark.sql("SELECT byte_entropy('ab') AS h").as[Double].collect()
    assert(r.head == 1.0)
    val err = intercept[Exception] {
      spark.sql("SELECT byte_entropy(42)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
