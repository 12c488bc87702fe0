package graft.app

import graft.SparkSpec
import graft.core.DbObjectCompiler
import graft.db.SparkDatabase
import graft.tasks.RunArguments
import java.nio.file.Files

/** End-to-end: YAML project on disk → load → run (the fighters-project CLI
  * path, tests/test_cli.py analog).
  */
class ProjectSpec extends SparkSpec {

  lazy val db = new SparkDatabase(spark)
  import spark.implicits._

  def scaffold(): java.nio.file.Path = {
    val dir = Files.createTempDirectory("graft_proj_")
    Files.writeString(dir.resolve("project.yaml"),
      """default_db: spark
        |parameters:
        |  schema_filter: main
        |presets:
        |  model_table:
        |    type: autosql
        |    materialisation: table
        |groups:
        |  models:
        |    type: autosql
        |    materialisation: table
        |    destination: "{{ task.name }}"
        |    file_name: "auto_*.sql"
        |""".stripMargin)
    Files.writeString(dir.resolve("settings.yaml"),
      """default_profile: dev
        |profiles:
        |  dev:
        |    parameters:
        |      schema_filter: dev_main
        |""".stripMargin)
    val tasks = dir.resolve("tasks")
    Files.createDirectories(tasks)
    Files.writeString(tasks.resolve("base.yaml"),
      """tasks:
        |  seed_table:
        |    type: sql
        |    file_name: seed.sql
        |  top_rows:
        |    preset: model_table
        |    destination: top_rows
        |    file_name: top_rows.sql
        |""".stripMargin)
    val sql = dir.resolve("sql")
    Files.createDirectories(sql)
    Files.writeString(sql.resolve("seed.sql"),
      "CREATE OR REPLACE VIEW seed_v AS SELECT * FROM RANGE(10);")
    Files.writeString(sql.resolve("top_rows.sql"),
      "SELECT id FROM {{ src('seed_v') }} WHERE id >= 8")
    Files.writeString(sql.resolve("auto_model.sql"),
      "SELECT 1 AS marker")
    dir
  }

  test("yaml project loads: groups, presets, autogroups, profiles") {
    val dir = scaffold()
    val Right(loaded) = Project.load(dir)
    assert(loaded.parameters("schema_filter") == "dev_main") // profile wins
    val byName = loaded.specs.map(s => s.name -> s).toMap
    assert(byName.keySet == Set("seed_table", "top_rows", "auto_model"))
    // preset merged under task config
    assert(byName("top_rows").cfg("materialisation") == "table")
    assert(byName("top_rows").cfg("type") == "autosql")
    // autogroup expanded with file stem as name
    assert(byName("auto_model").group == "models")
    assert(byName("auto_model").cfg("destination") == "{{ task.name }}")
  }

  test("loaded project runs end-to-end with implicit ordering") {
    val dir = scaffold()
    val Right(loaded) = Project.load(dir)
    val app = new App(db, new DbObjectCompiler(loaded.defaultDb), loaded.parameters)
    val Right(report) = app.run(loaded.specs, RunArguments())
    assert(report.succeeded, report.errors)
    // seed before top_rows via src() lineage
    assert(report.order.indexOf("seed_table") < report.order.indexOf("top_rows"))
    assert(rows(spark.table("top_rows")) == Set(Seq(8L), Seq(9L)))
    // autogroup destination templated from task name
    assert(rows(spark.table("auto_model")) == Set(Seq(1)))
  }
}
