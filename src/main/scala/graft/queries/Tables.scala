package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided parquet fixtures (TESTDATA.md).
  * Registers each table as a temp view so queries can use spark.sql too.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view for spark.sql queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      apply(spark, dir, n).createOrReplaceTempView(n)
    }
}
