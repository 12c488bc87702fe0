package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL registration of the custom codegen expressions: both paths share
  * one descriptor list, so asserting the live-install path against the
  * Column API covers the builder-injection path's builders too.
  */
class ExtensionsSpec extends SparkSpec {

  import spark.implicits._

  test("install registers simhash64 and long_array_dot for SQL") {
    GraftExtensions.install(spark)
    val df = Seq((1L, "the quick brown fox")).toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")

    val sqlHash = spark.sql(
      "SELECT simhash64(split(text, ' ')) AS h FROM ext_docs")
      .head.getLong(0)
    val colHash = df.select(SimHash64.simhash64(split($"text", " ")).as("h"))
      .head.getLong(0)
    assert(sqlHash == colHash)

    val sqlDot = spark.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head.getLong(0)
    assert(sqlDot == 32L)

    // install is idempotent
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT simhash64(array('a')) AS h").count() == 1)
  }

  test("ApproxDistinctRewrite swaps exact distinct for HLL only under the flag") {
    GraftExtensions.install(spark)
    val df = (1 to 1000).map(i => (i % 7, i % 400)).toDF("k", "v")
    df.createOrReplaceTempView("adr_t")
    def optimized(): String =
      spark.sql("SELECT k, count(DISTINCT v) AS d FROM adr_t GROUP BY k")
        .queryExecution.optimizedPlan.toString

    spark.conf.unset("spark.graft.approxDistinct.enabled")
    assert(!optimized().contains("approx_count_distinct"))

    spark.conf.set("spark.graft.approxDistinct.enabled", "true")
    try {
      assert(optimized().contains("approx_count_distinct"))
      // rewritten counts stay within HLL's advertised ±2% (×5 safety)
      val approx = spark
        .sql("SELECT count(DISTINCT v) AS d FROM adr_t").head.getLong(0)
      assert(math.abs(approx - 400L) <= 40, s"approx=$approx")
      // multi-column distinct stays exact (semantics subtler — not rewritten)
      assert(!spark.sql("SELECT count(DISTINCT k, v) FROM adr_t")
        .queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
    } finally spark.conf.unset("spark.graft.approxDistinct.enabled")
  }

  test("SQL builders reject wrong arities at analysis") {
    GraftExtensions.install(spark)
    val e = intercept[Exception](
      spark.sql("SELECT simhash64(array('a'), array('b'))").collect())
    assert(e.getMessage.contains("1 argument"))
    val e2 = intercept[Exception](
      spark.sql("SELECT long_array_dot(array(1L))").collect())
    assert(e2.getMessage.contains("2 arguments"))
  }
}
