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

  test("preset inheritance: preset→preset DAG, group presets, cycles error") {
    val dir = Files.createTempDirectory("graft_proj_")
    Files.writeString(dir.resolve("project.yaml"),
      """presets:
        |  base_model:
        |    type: autosql
        |    materialisation: table
        |  incremental_model:
        |    preset: base_model
        |    materialisation: incremental
        |    delete_key: id
        |""".stripMargin)
    val tasks = dir.resolve("tasks")
    Files.createDirectories(tasks)
    Files.writeString(tasks.resolve("core.yaml"),
      """presets:
        |  core_inc:
        |    preset: incremental_model
        |    schema: core
        |tasks:
        |  t1:
        |    preset: core_inc
        |    sql: SELECT 1 AS id
        |  t2:
        |    preset: incremental_model
        |    delete_key: other
        |    sql: SELECT 2 AS id
        |""".stripMargin)
    val Right(loaded) = Project.load(dir)
    val byName = loaded.specs.map(s => s.name -> s.cfg).toMap
    // t1: group preset → project chain base←incremental←core_inc
    assert(byName("t1")("type") == "autosql")
    assert(byName("t1")("materialisation") == "incremental")
    assert(byName("t1")("delete_key") == "id")
    assert(byName("t1")("schema") == "core")
    // t2: task value wins over inherited preset value
    assert(byName("t2")("delete_key") == "other")
    assert(byName("t2")("materialisation") == "incremental")

    // unknown preset errors (the reference validates names)
    Files.writeString(tasks.resolve("core.yaml"),
      "tasks:\n  t1:\n    preset: nope\n    sql: SELECT 1\n")
    assert(Project.load(dir).isLeft)

    // preset cycle errors
    Files.writeString(tasks.resolve("core.yaml"),
      "tasks:\n  t1:\n    preset: a\n    sql: SELECT 1\n")
    Files.writeString(dir.resolve("project.yaml"),
      """presets:
        |  a:
        |    preset: b
        |  b:
        |    preset: a
        |""".stripMargin)
    assert(Project.load(dir).isLeft)
  }

  test("env overrides: stringify and from_prod (settings.py precedence)") {
    val dir = Files.createTempDirectory("graft_proj_")
    Files.writeString(dir.resolve("project.yaml"), "default_db: spark\n")
    Files.writeString(dir.resolve("settings.yaml"),
      """default_profile: dev
        |prod_stringify:
        |  table_prefix: prod
        |profiles:
        |  dev:
        |    stringify:
        |      table_prefix: dev
        |    from_prod:
        |      - logs_*
        |""".stripMargin)
    val env = Map(
      "GRAFT_TABLE_PREFIX" -> "envp",
      "GRAFT_SCHEMA_SUFFIX" -> "envsfx",
      "GRAFT_FROM_PROD" -> "dim_*, f_results")
    // no explicit --profile: env overrides apply (dev stringify updated,
    // from_prod REPLACED — settings.py:303-316)
    val Right(loaded) = Project.load(dir, env = env)
    assert(loaded.stringify.table.prefix.contains("envp"))
    assert(loaded.stringify.schema.suffix.contains("envsfx"))
    assert(loaded.prodStringify.table.prefix.contains("prod")) // untouched
    assert(loaded.fromProd == Seq("dim_*", "f_results"))
    // explicit --profile: env overrides are inert (reference's
    // profile_name-is-None gate)
    val Right(pinned) = Project.load(dir, Some("dev"), env = env)
    assert(pinned.stringify.table.prefix.contains("dev"))
    assert(pinned.stringify.schema.suffix.isEmpty)
    assert(pinned.fromProd == Seq("logs_*"))
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

  test("fileLoader serves project-relative templates, refuses traversal") {
    val dir = java.nio.file.Files.createTempDirectory("graft_loader_")
    java.nio.file.Files.createDirectories(dir.resolve("sql"))
    java.nio.file.Files.writeString(
      dir.resolve("sql/frag.sql"), "WHERE x > 0")
    java.nio.file.Files.writeString(
      dir.getParent.resolve("graft_loader_escape.txt"), "secret")
    val load = Project.fileLoader(dir)
    assert(load("sql/frag.sql") == Some("WHERE x > 0"))
    assert(load("missing.sql").isEmpty)
    assert(load("../graft_loader_escape.txt").isEmpty) // no traversal
    assert(load("sql/../../graft_loader_escape.txt").isEmpty)
    // and the compiler surfaces it end-to-end
    val ctx = graft.core.Compiler.Context(loader = load)
    assert(graft.core.Compiler.compile(
      "SELECT 1 {% include 'sql/frag.sql' %}", ctx)
      == Right("SELECT 1 WHERE x > 0"))
  }
}
