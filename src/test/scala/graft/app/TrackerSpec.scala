package graft.app

import graft.SparkSpec
import graft.core.DbObjectCompiler
import graft.db.SparkDatabase
import graft.tasks.RunArguments
import scala.collection.mutable

/** Event-stream coverage: run/task/step events through a real App.run,
  * console + file listeners, DOT output, init scaffold, copy compile dump.
  */
class TrackerSpec extends SparkSpec {

  lazy val db = new SparkDatabase(spark)

  private class Capture extends EventListener {
    val events = mutable.ArrayBuffer.empty[RunEvent]
    override def onEvent(e: RunEvent): Unit = events += e
  }

  private def specs = Seq(
    TaskSpec("t_ok", "g", Map("type" -> "sql",
      "sql" -> "CREATE OR REPLACE VIEW trk_v AS SELECT 1 AS x")),
    TaskSpec("t_tbl", "g", Map("type" -> "autosql",
      "materialisation" -> "table", "destination" -> "trk_t",
      "sql" -> "SELECT * FROM {{ src('trk_v') }}", "parents" -> Seq("t_ok"))))

  test("run emits run/task/step lifecycle events in order") {
    val cap = new Capture
    val app = new App(db, new DbObjectCompiler("spark"))
    val Right(report) = app.run(specs, RunArguments(), Tracker(cap))
    assert(report.succeeded)
    val kinds = cap.events.map(_.getClass.getSimpleName)
    assert(kinds.head == "RunStarted")
    assert(kinds.last == "RunFinished")
    assert(kinds.count(_ == "TaskStarted") == 2)
    assert(kinds.count(_ == "TaskFinished") == 2)
    // sql tasks emit compile + materialisation steps
    val steps = cap.events.collect { case RunEvent.StepStarted(t, s, _) => (t, s) }
    assert(steps.contains(("t_ok", "compile")))
    assert(steps.contains(("t_ok", "execute_sql")))
    assert(steps.contains(("t_tbl", "load_table")))
    // every finished step carries a duration and ok=true
    val fins = cap.events.collect { case f: RunEvent.StepFinished => f }
    assert(fins.nonEmpty && fins.forall(f => f.ok && f.durationMs >= 0))
    // task order respected in events
    val started = cap.events.collect { case RunEvent.TaskStarted(t, _, _, _) => t }
    assert(started == Seq("t_ok", "t_tbl"))
  }

  test("failed task emits TaskFinished(failed) and skip propagates to child") {
    val cap = new Capture
    val bad = Seq(
      TaskSpec("t_bad", "g", Map("type" -> "sql", "sql" -> "SELECT FROM nope")),
      TaskSpec("t_child", "g", Map("type" -> "sql",
        "sql" -> "SELECT 1", "parents" -> Seq("t_bad"))))
    val app = new App(db, new DbObjectCompiler("spark"))
    val Right(report) = app.run(bad, RunArguments(), Tracker(cap))
    assert(!report.succeeded)
    val finished = cap.events.collect {
      case RunEvent.TaskFinished(t, st, _, _, _) => (t, st)
    }.toMap
    assert(finished("t_bad") == "failed")
    assert(finished("t_child") == "skipped")
    val failedStep = cap.events.collect {
      case RunEvent.StepFinished("t_bad", s, ok, _, _) => (s, ok)
    }
    assert(failedStep.exists(!_._2))
  }

  test("file tracker writes valid JSONL; console renders lines") {
    val cap = new Capture
    val tmp = java.nio.file.Files.createTempDirectory("graft_trk_")
    val file = new FileTracker(tmp.resolve("logs").resolve("run.jsonl"))
    val lines = mutable.ArrayBuffer.empty[String]
    val console = new ConsoleTracker(debug = true, out = lines += _)
    val app = new App(db, new DbObjectCompiler("spark"))
    val Right(_) = app.run(specs, RunArguments(), Tracker(cap, file, console))
    file.close()
    val written = java.nio.file.Files
      .readAllLines(tmp.resolve("logs").resolve("run.jsonl"))
    assert(written.size == cap.events.size)
    // every line parses as a JSON object with an event field
    written.forEach { l =>
      assert(l.startsWith("{") && l.endsWith("}") && l.contains("\"event\""), l)
    }
    assert(lines.exists(_.contains("[1/2] t_ok")))
    // run tally on the final line
    assert(lines.exists(l => l.startsWith("succeeded in") &&
      l.contains("2 succeeded")))
    // end-of-run summary table: one aligned row per task with status,
    // wall time and the step breakdown
    val hdr = lines.indexWhere(_ == "run summary:")
    assert(hdr >= 0, lines.mkString("\n"))
    val rows = lines.slice(hdr + 1, hdr + 3)
    assert(rows.exists(r => r.trim.startsWith("t_ok") &&
      r.contains("succeeded") && r.contains("execute_sql")), rows)
    assert(rows.exists(r => r.trim.startsWith("t_tbl") &&
      r.contains("succeeded") && r.contains("load_table")), rows)
    // wall time present on each row (ms or s suffix after the status)
    assert(rows.forall(r => r.matches(""".*\d+(\.\d+)?(ms|s)\b.*""")), rows)
  }

  test("failed task's summary row carries the error") {
    val lines = mutable.ArrayBuffer.empty[String]
    val console = new ConsoleTracker(debug = false, out = lines += _)
    val app = new App(db, new DbObjectCompiler("spark"))
    val bad = Seq(
      TaskSpec("t_bad", "g", Map("type" -> "sql", "sql" -> "SELECT FROM nope")))
    val Right(report) = app.run(bad, RunArguments(), Tracker(console))
    assert(!report.succeeded)
    val hdr = lines.indexWhere(_ == "run summary:")
    assert(hdr >= 0, lines.mkString("\n"))
    val row = lines(hdr + 1)
    assert(row.trim.startsWith("t_bad") && row.contains("failed") &&
      row.contains("error: "), row)
    assert(lines.last.startsWith("FAILED in"), lines.last)
  }

  test("end-of-run errors group by message, worst-first, listing tasks") {
    import RunEvent._
    val lines = mutable.ArrayBuffer.empty[String]
    val console = new ConsoleTracker(debug = false, out = lines += _)
    console.onEvent(RunStarted("run", 4, 0L))
    def fin(t: String, st: String, err: Option[String]): Unit =
      console.onEvent(TaskFinished(t, st, 5L, err, 0L))
    fin("a", "failed", Some("connection refused"))
    fin("b", "failed", Some("connection refused"))
    fin("c", "failed", Some("syntax error"))
    fin("d", "succeeded", None)
    console.onEvent(RunFinished(false, 20L, 0L))
    val hdr = lines.indexOf("errors:")
    assert(hdr >= 0, lines.mkString("\n"))
    // the 2× group leads; each line carries count, message, task list
    assert(lines(hdr + 1).trim == "2× connection refused — a, b", lines(hdr + 1))
    assert(lines(hdr + 2).trim == "1× syntax error — c", lines(hdr + 2))
    assert(lines.last.startsWith("FAILED in"), lines.last)
  }

  test("console task line carries the per-step duration breakdown") {
    import graft.tasks.{TaskContext, UserTask, RunArguments => RA}
    import graft.core.Result.Result
    val stepped = new UserTask {
      override def run(ctx: TaskContext): Result[Unit] = {
        ctx.track.step("stage")(())
        ctx.track.step("swap")(())
        Right(())
      }
    }
    val lines = mutable.ArrayBuffer.empty[String]
    val console = new ConsoleTracker(debug = false, out = lines += _)
    val app = new App(db, new DbObjectCompiler("spark"),
      userTasks = Map("st" -> stepped))
    val Right(report) = app.run(
      Seq(TaskSpec("st", "g", Map("type" -> "user"))), RA(), Tracker(console))
    assert(report.succeeded, report.errors)
    val line = lines.find(_.startsWith("[st] succeeded")).get
    assert(line.contains("stage") && line.contains("swap"), line)
  }

  test("user task requiredParameters are validated at config") {
    import graft.tasks.{TaskContext, UserTask, RunArguments => RA}
    import graft.core.Result.Result
    val needy = new UserTask {
      override def requiredParameters: Seq[String] = Seq("target_schema")
      override def run(ctx: TaskContext): Result[Unit] = Right(())
    }
    val specs = Seq(TaskSpec("needy", "g", Map("type" -> "user")))
    // missing → config error mentioning the parameter
    val bare = new App(db, new DbObjectCompiler("spark"),
      userTasks = Map("needy" -> needy))
    val r = bare.run(specs, RA())
    assert(r.isLeft || r.exists(!_.succeeded))
    // provided via project parameters → runs
    val fed = new App(db, new DbObjectCompiler("spark"),
      Map("target_schema" -> "dev"), userTasks = Map("needy" -> needy))
    assert(fed.run(specs, RA()).exists(_.succeeded))
    // provided via per-task parameters → runs
    val perTask = Seq(TaskSpec("needy", "g", Map(
      "type" -> "user", "parameters" -> Map("target_schema" -> "x"))))
    assert(bare.run(perTask, RA()).exists(_.succeeded))
  }

  test("dag() returns parent map; toDot renders graphviz") {
    val app = new App(db, new DbObjectCompiler("spark"))
    val Right(dag) = app.dag(specs)
    assert(dag("t_tbl").contains("t_ok"))
    val dot = Cli.toDot(dag)
    assert(dot.startsWith("digraph graft {"))
    assert(dot.contains("\"t_ok\" -> \"t_tbl\";"))
  }

  test("toSvg renders a layered image: boxes, edges, child right of parent") {
    val dag = Map(
      "load" -> Seq.empty[String],
      "stage" -> Seq("load"),
      "mart_a" -> Seq("stage"),
      "mart_b" -> Seq("stage", "load"))
    val svg = Cli.toSvg(dag)
    assert(svg.startsWith("<svg xmlns=\"http://www.w3.org/2000/svg\""))
    assert(svg.endsWith("</svg>"))
    // one box + label per task, one bezier edge per dependency
    assert(dag.keys.forall(n => svg.contains(s">$n</text>")))
    assert(svg.sliding(6).count(_ == "<rect ") == 4)
    assert(svg.sliding(6).count(_ == "<path ") == 4 + 1) // 4 edges + arrow marker
    // longest-path layering: mart_b sits one column right of stage even
    // though it also depends on load directly
    def x(n: String): Int = {
      val i = svg.indexOf(s">$n</text>")
      val tx = svg.lastIndexOf("<text x=\"", i) + "<text x=\"".length
      svg.substring(tx, svg.indexOf("\"", tx)).toInt
    }
    assert(x("load") < x("stage") && x("stage") < x("mart_a"))
    assert(x("mart_a") == x("mart_b"))
    // escaping: a node name with XML specials renders escaped
    val svg2 = Cli.toSvg(Map("a<b" -> Nil))
    assert(svg2.contains("a&lt;b") && !svg2.contains(">a<b<"))
  }

  test("init scaffolds a loadable, runnable project") {
    val base = java.nio.file.Files.createTempDirectory("graft_init_")
    val dir = base.resolve("proj")
    Cli.init(dir)
    val Right(loaded) = Project.load(dir)
    assert(loaded.specs.map(_.name).toSet == Set("load_data", "dim_numbers"))
    val app = new App(db, new DbObjectCompiler(loaded.defaultDb), loaded.parameters)
    val Right(report) = app.run(loaded.specs, RunArguments())
    assert(report.succeeded, report.errors)
    assert(spark.table("dim_numbers").count() == 100)
  }

  test("copy task compile() dumps projection and watermark") {
    import graft.tasks.{CopyTask, TaskContext}
    val ctx = new TaskContext("c", "g", db, new DbObjectCompiler("spark"),
      Map.empty, RunArguments())
    val task = new CopyTask
    val Right(_) = task.config(ctx, Map(
      "source" -> "src_t", "destination" -> "dst_t",
      "incremental_key" -> "updated_at", "delete_key" -> "id",
      "columns" -> Seq(
        Map("name" -> "id"),
        Map("name" -> "updated_at"),
        Map("name" -> "val", "type" -> "int", "dst_name" -> "value"))))
    val Right(Seq((step, text))) = task.compile()
    assert(step == "copy")
    assert(text.contains("val CAST AS INT AS value"))
    assert(text.contains("incremental watermark: updated_at"))
    assert(text.contains("SELECT MAX(updated_at) FROM"))
  }

  test("color mode paints statuses; padding stays escape-independent") {
    import RunEvent._
    def run(color: Boolean): Seq[String] = {
      val lines = mutable.ArrayBuffer.empty[String]
      val console =
        new ConsoleTracker(debug = false, color = color, out = lines += _)
      console.onEvent(RunStarted("run", 2, 0L))
      console.onEvent(TaskFinished("long_task_name", "succeeded", 5L, None, 0L))
      console.onEvent(TaskFinished("b", "failed", 5L, Some("boom"), 0L))
      console.onEvent(RunFinished(false, 20L, 0L))
      lines.toSeq
    }
    val plain = run(color = false)
    val colored = run(color = true)
    // plain output carries NO escape codes (piped/CI mode)
    assert(plain.forall(!_.contains("\u001b[")), plain)
    assert(colored.exists(_.contains("\u001b[32msucceeded")), colored)
    assert(colored.exists(_.contains("\u001b[31mfailed")), colored)
    assert(colored.last.contains("\u001b[31mFAILED"), colored.last)
    // stripping the escapes yields EXACTLY the plain lines: color is
    // presentation-only, and summary-table padding widths are unchanged
    val stripped = colored.map(_.replaceAll("\u001b\\[[0-9]+m", ""))
    assert(stripped == plain)
  }
}
