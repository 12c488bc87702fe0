package graft.ops

import graft.SparkSpec

class TableDiffSpec extends SparkSpec {

  import spark.implicits._

  private def snap(rows: (Long, String, Double)*) =
    rows.toDF("id", "name", "score")

  test("diff classifies added/removed/changed/unchanged") {
    val a = snap((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0))
    val b = snap((2L, "y", 2.0), (3L, "zz", 3.5), (4L, "w", 4.0))
    val out = TableDiff.diff(a, b, Seq("id"), includeUnchanged = true)
    assert(rows(out.withColumn("changed_cols",
      org.apache.spark.sql.functions.array_join(
        org.apache.spark.sql.functions.col("changed_cols"), ","))) == Set(
      Seq(1L, "removed", null),
      Seq(2L, "unchanged", null),
      Seq(3L, "changed", "name,score"),
      Seq(4L, "added", null)))
  }

  test("default drops unchanged; NULLs compare null-safely") {
    val a = Seq((1L, Option.empty[String]), (2L, Option("v"))).toDF("id", "name")
    val b = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "name")
    val out = TableDiff.diff(a, b, Seq("id"))
    // key 1: NULL==NULL → unchanged → dropped; key 2: v→NULL → changed
    assert(out.count() == 1)
    assert(rows(out.selectExpr("id", "status", "changed_cols[0]")) ==
      Set(Seq(2L, "changed", "name")))
  }

  test("diff rejects schema mismatch and missing keys") {
    val a = snap((1L, "x", 1.0))
    intercept[IllegalArgumentException] {
      TableDiff.diff(a, a.drop("score"), Seq("id"))
    }
    intercept[IllegalArgumentException] { TableDiff.diff(a, a, Nil) }
  }
}
