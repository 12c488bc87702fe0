package graft.tasks

import graft.SparkSpec
import graft.core.DbObjectCompiler
import graft.db.SparkDatabase
import org.apache.spark.sql.functions._

/** Cross-database JDBC copy: CopyTask reading an embedded Derby
  * instance — full copy, incremental watermark copy, and the
  * pushed-down remote predicate.
  */
class CopyJdbcSpec extends SparkSpec {
  import spark.implicits._

  private def newDerby(name: String): String = {
    val db = java.nio.file.Files.createTempDirectory("graft_jdbc_spec_")
      .resolve(name)
    s"jdbc:derby:$db"
  }

  private def writeJdbc(df: org.apache.spark.sql.DataFrame,
      url: String, table: String): Unit =
    df.write.format("jdbc")
      .option("url", s"$url;create=true").option("dbtable", table)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .mode("overwrite").save()

  private def runCopy(cfg: Map[String, Any], taskName: String): String = {
    val db = new SparkDatabase(spark)
    val objects = new DbObjectCompiler("spark")
    val ctx = new TaskContext(taskName, "test", db, objects, Map.empty,
      RunArguments())
    val task = new CopyTask
    val r = for {
      _ <- task.config(ctx, cfg)
      _ <- task.setup()
      _ <- task.run()
    } yield ()
    r.left.foreach(e => fail(e.toString))
    objects.fromString(cfg("destination").toString)
      .map(objects.outValue).fold(e => fail(e.toString), identity)
  }

  test("full copy from a Derby source replicates rows and applies renames") {
    val url = newDerby("full")
    val src = Seq((1L, "a", 10.5), (2L, "b", 20.25), (3L, "c", 0.0))
      .toDF("id", "tag", "amt")
    writeJdbc(src, url, "T_FULL")
    val dst = runCopy(Map(
      "source" -> s"$url|T_FULL",
      "destination" -> "jdbc_full_dst",
      "columns" -> Seq(
        Map("name" -> "id", "type" -> "bigint"),
        Map("name" -> "amt", "type" -> "double", "dst_name" -> "amount"))),
      "jdbc_full")
    val out = spark.table(dst).as[(Long, Double)].collect().toSet
    assert(out == Set((1L, 10.5), (2L, 20.25), (3L, 0.0)))
  }

  test("incremental copy from Derby ships only past-watermark rows") {
    val url = newDerby("inc")
    val v1 = Seq((1L, 1L, "old"), (2L, 1L, "old")).toDF("id", "ver", "payload")
    writeJdbc(v1, url, "T_INC")
    val dst = runCopy(Map(
      "source" -> s"$url|T_INC",
      "destination" -> "jdbc_inc_dst",
      "incremental_key" -> "ver", "delete_key" -> "id"), "jdbc_inc1")
    assert(spark.table(dst).count() == 2)
    // remote table advances: id 2 updated at ver 3, id 9 appears
    val v2 = Seq((1L, 1L, "old"), (2L, 3L, "new"), (9L, 2L, "fresh"))
      .toDF("id", "ver", "payload")
    writeJdbc(v2, url, "T_INC")
    runCopy(Map(
      "source" -> s"$url|T_INC",
      "destination" -> "jdbc_inc_dst",
      "incremental_key" -> "ver", "delete_key" -> "id"), "jdbc_inc2")
    val out = spark.table(dst).select("id", "ver", "payload")
      .as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 1L, "old"), (2L, 3L, "new"), (9L, 2L, "fresh")))
  }

  test("the watermark predicate pushes into the remote JDBC scan") {
    val url = newDerby("push")
    writeJdbc(Seq((1L, 5L)).toDF("id", "ver"), url, "T_PUSH")
    val scan = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "T_PUSH")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()
      .filter(col("ver") > 3L)
    val plan = scan.queryExecution.executedPlan.toString
    // '*' marks a source-handled (remote WHERE) filter
    assert(plan.contains("PushedFilters") && plan.contains("*GreaterThan(ver,3)"),
      s"watermark filter not pushed:\n$plan")
  }
}
