package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession with an isolated warehouse + metastore per
  * suite (the Spark analog of the reference's sqlite :memory: fixture).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val base = java.nio.file.Files.createTempDirectory("graft_test_")

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", base.resolve("warehouse").toString)
    .config("javax.jdo.option.ConnectionURL",
      s"jdbc:derby:;databaseName=${base.resolve("metastore")};create=true")
    .getOrCreate()

  override def afterAll(): Unit = {
    // One JVM per sbt test run: sessions share the backing SparkContext, so
    // just clear this suite's catalog state rather than stopping Spark.
    spark.catalog.listTables().collect().foreach { t =>
      if (t.tableType == "VIEW") spark.sql(s"DROP VIEW IF EXISTS ${t.name}")
      else spark.sql(s"DROP TABLE IF EXISTS ${t.name}")
    }
    super.afterAll()
  }

  def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet
}
