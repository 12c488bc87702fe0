package graft.db

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape proof for the scan-efficiency story (docs/SCALING.md
  * "Push down and prune"): filters reach the parquet reader as
  * PushedFilters and projections prune ReadSchema — the properties every
  * zero-shuffle operator's cost model assumes.
  */
class PushdownSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_pushdown_")
    (1L to 1000L).map(i => (i, s"name$i", i * 1.5, s"payload$i" * 10))
      .toDF("id", "name", "score", "payload")
      .write.mode("overwrite").parquet(d.toString)
    d.toString
  }

  test("filters reach the parquet scan as PushedFilters") {
    val q = spark.read.parquet(dir)
      .filter(col("id") > 900L && col("name").isNotNull)
      .select(col("id"), col("name"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), scan)
    assert(scan.contains("GreaterThan(id,900)"), scan)
    assert(q.count() == 100)
  }

  test("projection prunes ReadSchema to the selected columns only") {
    val q = spark.read.parquet(dir).select(col("id"), col("score"))
    val scan = q.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(scan)
    // the wide payload column must NOT be read for a 2-column projection
    assert(readSchema.contains("id") && readSchema.contains("score"), readSchema)
    assert(!readSchema.contains("payload"), readSchema)
  }

  test("partition pruning: a partition filter eliminates directories") {
    val d = java.nio.file.Files.createTempDirectory("graft_partprune_")
    (1L to 100L).map(i => (i, (i % 4).toString))
      .toDF("id", "part")
      .write.mode("overwrite").partitionBy("part").parquet(d.toString)
    val q = spark.read.parquet(d.toString).filter(col("part") === "2")
    q.collect()
    val scan = q.queryExecution.executedPlan.toString
    // pruned scan reports the partition filter; only one of 4 partitions
    // survives, visible as the partition count in the scan node
    assert(scan.contains("PartitionFilters: ["), scan)
    assert(scan.contains("part#"), scan) // the filter names the partition col
    assert(q.count() == 25)
  }
}
