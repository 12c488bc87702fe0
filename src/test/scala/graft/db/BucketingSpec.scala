package graft.db

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape proof for the bucketed-layout story (q94): a join of two
  * tables bucketed on the join key runs WITHOUT a shuffle — the
  * physical plan's exchange count is the evidence, not just the result.
  */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("join of co-bucketed tables is sort-merge with zero exchanges") {
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bkt_a")
    (1L to 500L).map(i => (i * 2, s"b$i")).toDF("k", "vb")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bkt_b")
    val a = spark.table("bkt_a")
    val b = spark.table("bkt_b")
    val joined = a.hint("merge").join(b, a("k") === b("k"))
    assert(joined.count() == 500)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
  }

  test("the same join WITHOUT bucketing shuffles both sides") {
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 500L).map(i => (i * 2, s"b$i")).toDF("k", "vb")
    val joined = a.hint("merge").join(b, a("k") === b("k"))
    assert(joined.count() == 500)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"), plan) // the shuffle bucketing removes
  }
}
