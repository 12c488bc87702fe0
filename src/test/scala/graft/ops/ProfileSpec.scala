package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  import spark.implicits._

  test("columnProfile counts rows, nulls and distincts per column") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (None, Some("b")), (Some(3), Some("b")))
      .toDF("x", "s")
    val out = Profile.columnProfile(df)
    assert(rows(out) == Set(
      Seq("x", 4L, 1L, 2L), // distinct ignores the null
      Seq("s", 4L, 1L, 2L)))
  }

  test("columnProfile validates column names and respects the subset") {
    val df = Seq((1, 2)).toDF("a", "b")
    assert(Profile.columnProfile(df, Seq("b")).count() == 1)
    intercept[IllegalArgumentException] {
      Profile.columnProfile(df, Seq("nope"))
    }
  }
}
