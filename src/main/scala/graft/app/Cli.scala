package graft.app

import graft.core.DbObjectCompiler
import graft.db.SparkDatabase
import graft.tasks.{RunArguments, UserTask}
import org.apache.spark.sql.SparkSession

/** Command-line entry point (sayn/cli.py surface):
  *
  *   run | compile | test
  *     [-t selector ...] [-x selector ...] [-f|--full-load]
  *     [--start-dt D] [--end-dt D] [--profile P] [--with-tests]
  *     [--fail-fast] [-u|--upstream-prod] [--project-dir DIR] [--debug]
  *
  * Exit code 1 when any task fails (cli.py:286-289).
  */
object Cli {

  def main(args: Array[String]): Unit = {
    val parsed = parse(args.toList)
    val projectDir = java.nio.file.Paths.get(
      parsed.getOrElse("project-dir", "."))

    Project.load(projectDir, parsed.get("profile")) match {
      case Left(e) =>
        System.err.println(s"config error: $e")
        sys.exit(1)
      case Right(loaded) =>
        // Hive-backed session catalog so tables/views persist across engine
        // invocations (the warehouse IS the state, like the reference —
        // SURVEY §4). Warehouse + metastore live under the project dir.
        val warehouse = projectDir.resolve(".graft").toAbsolutePath
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
          .appName("graft")
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", "32"))
          .config("spark.sql.adaptive.enabled", "true")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.warehouse.dir", warehouse.resolve("warehouse").toString)
          .config("javax.jdo.option.ConnectionURL",
            s"jdbc:derby:;databaseName=${warehouse.resolve("metastore")};create=true")
          .enableHiveSupport()
          .getOrCreate()
        spark.sparkContext.setLogLevel(
          if (parsed.contains("debug")) "INFO" else "WARN")

        val db = new SparkDatabase(spark)
        val objects = new DbObjectCompiler(
          loaded.defaultDb, loaded.stringify, loaded.prodStringify, loaded.fromProd)
        val runArgs = RunArguments(
          command = parsed.getOrElse("command", "run"),
          include = parsed.get("include").map(_.split(",").toSeq).getOrElse(Nil),
          exclude = parsed.get("exclude").map(_.split(",").toSeq).getOrElse(Nil),
          fullLoad = parsed.contains("full-load"),
          startDt = parsed.getOrElse("start-dt", RunArguments().startDt),
          endDt = parsed.getOrElse("end-dt", RunArguments().endDt),
          withTests = parsed.contains("with-tests"),
          failFast = parsed.contains("fail-fast"),
          upstreamProd = parsed.contains("upstream-prod"),
          profile = parsed.get("profile"),
          debug = parsed.contains("debug"))

        val app = new App(db, objects, loaded.parameters,
          userTasks = loadUserTasks(),
          compileDir = Some(projectDir.resolve("compile")))

        app.run(loaded.specs, runArgs) match {
          case Left(e) =>
            System.err.println(s"error: $e")
            spark.stop(); sys.exit(1)
          case Right(report) =>
            println(report.summary)
            report.errors.foreach { case (t, e) => System.err.println(s"  $t: $e") }
            spark.stop()
            sys.exit(if (report.succeeded) 0 else 1)
        }
    }
  }

  /** User tasks register via Java ServiceLoader: a project jar exposes
    * `graft.tasks.UserTask` implementations in META-INF/services (the
    * reflection-light analog of the reference's @task decorator registry,
    * sayn/tasks/python.py:231-246). Task name = simple class name
    * de-camelled, overridable with cfg `class`.
    */
  private def loadUserTasks(): Map[String, UserTask] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[UserTask]).iterator().asScala.map { ut =>
      val n = ut.getClass.getSimpleName.stripSuffix("$")
        .replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase
      n -> ut
    }.toMap
  }

  private def parse(args: List[String]): Map[String, String] = {
    val flags = Set("full-load", "with-tests", "fail-fast", "upstream-prod", "debug")
    val aliases = Map(
      "-t" -> "include", "-x" -> "exclude", "-f" -> "full-load",
      "-u" -> "upstream-prod", "-p" -> "profile")
    def norm(a: String): String =
      aliases.getOrElse(a, a.stripPrefix("--"))
    @annotation.tailrec
    def go(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case cmd :: tail if !cmd.startsWith("-") && !acc.contains("command") =>
          go(tail, acc + ("command" -> cmd))
        case a :: tail if flags.contains(norm(a)) =>
          go(tail, acc + (norm(a) -> "true"))
        case a :: v :: tail if a.startsWith("-") =>
          val key = norm(a)
          // repeated -t/-x accumulate
          val value = if (acc.contains(key)) acc(key) + "," + v else v
          go(tail, acc + (key -> value))
        case _ :: tail => go(tail, acc)
      }
    go(args, Map.empty)
  }
}
