package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("perKey equals the window formulation on random data") {
    val rnd = new scala.util.Random(42)
    val df = Seq.tabulate(500)(i =>
      (i.toLong, s"k${rnd.nextInt(7)}", rnd.nextInt(40).toDouble))
      .toDF("id", "k", "v")
    (1 to 3).foreach { k =>
      val custom = TopK.perKey(df, Seq("k"),
        Seq(col("v").desc, col("id").asc), k)
        .collect().map(_.toSeq).toSet
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
      val window = df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= k).drop("_rn")
        .collect().map(_.toSeq).toSet
      assert(custom == window, s"k=$k")
    }
  }

  test("perKey keeps whole groups when k exceeds the group size") {
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("id", "k", "v")
    val out = TopK.perKey(df, Seq("k"), Seq(col("v").desc, col("id")), k = 10)
    assert(out.count() == 3)
  }

  test("perKey plans one Exchange, a TopKPerKeyExec, and NO Sort") {
    val df = Seq.tabulate(100)(i => (i.toLong, s"k${i % 5}", i * 1.5))
      .toDF("id", "k", "v")
    val q = TopK.perKey(df, Seq("k"), Seq(col("v").desc, col("id")), k = 2)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Sort "), plan) // the win over the window plan
    assert("Exchange".r.findAllIn(
      plan.replace("ReusedExchange", "")).size <= 2, plan) // initial+final AQE print
  }

  test("perKey validates its arguments") {
    val df = Seq((1L, "a", 1.0)).toDF("id", "k", "v")
    intercept[IllegalArgumentException] {
      TopK.perKey(df, Nil, Seq(col("v")), 1)
    }
    intercept[IllegalArgumentException] {
      TopK.perKey(df, Seq("k"), Seq(col("v")), 0)
    }
  }
}
