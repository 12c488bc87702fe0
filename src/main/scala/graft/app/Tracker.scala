package graft.app

import graft.tasks.TaskTracker

/** Run/task/step event stream — the engine analog of the reference's
  * logging stack (sayn/logging/: Logger/TaskEventTracker/ConsoleLogger/
  * FileLogger, 1,175 LoC). One event type, many listeners; trackers are
  * cheap enough to wire into every run, and the CLI attaches a console
  * renderer plus a JSONL file log.
  */
sealed trait RunEvent { def ts: Long }
object RunEvent {
  final case class RunStarted(command: String, nTasks: Int, ts: Long) extends RunEvent
  final case class TaskStarted(task: String, index: Int, total: Int, ts: Long) extends RunEvent
  final case class TaskFinished(
      task: String, status: String, durationMs: Long,
      error: Option[String], ts: Long) extends RunEvent
  final case class StepStarted(task: String, step: String, ts: Long) extends RunEvent
  final case class StepFinished(
      task: String, step: String, ok: Boolean, durationMs: Long, ts: Long) extends RunEvent
  final case class Message(
      level: String, task: Option[String], text: String, ts: Long) extends RunEvent
  final case class RunFinished(succeeded: Boolean, durationMs: Long, ts: Long) extends RunEvent
}

trait EventListener {
  def onEvent(e: RunEvent): Unit
  def close(): Unit = ()
}

/** Event multiplexer. A listener failure never fails the run; emission is
  * synchronized so parallel task execution can't interleave inside a
  * listener (the file log writes whole lines).
  */
final class Tracker(listeners: Seq[EventListener]) {
  def emit(e: RunEvent): Unit = synchronized {
    listeners.foreach(l => try l.onEvent(e) catch { case _: Exception => () })
  }
  def task(name: String): TaskTracker = new TaskTracker(name, emit)
  def close(): Unit =
    listeners.foreach(l => try l.close() catch { case _: Exception => () })
}

object Tracker {
  val noop: Tracker = new Tracker(Nil)
  def apply(listeners: EventListener*): Tracker = new Tracker(listeners)
  def now(): Long = System.currentTimeMillis()
}

/** Console renderer: one line per task with index/total, status,
  * duration and a per-step duration breakdown; live step lines with
  * `debug`; and an end-of-run SUMMARY TABLE — one aligned row per task
  * (status, wall time, step breakdown, error) plus the status tally
  * (the reference's per-step progress console and grouped run summary,
  * sayn/logging/log_formatter.py, reduced to plain lines — the
  * remaining delta vs its spinners is deliberate: a live repaint loop
  * garbles piped/CI output, which is where this engine's runs live).
  * With `color` (the CLI turns it on for a real terminal), statuses
  * paint ANSI green/red/yellow; padding always happens BEFORE painting
  * so summary-table alignment is escape-code-independent. Emission is
  * synchronized by [[Tracker]], so the per-task step state is safe
  * under the parallel executor.
  */
final class ConsoleTracker(
    debug: Boolean = false,
    color: Boolean = false,
    out: String => Unit = println) extends EventListener {
  import RunEvent._
  private def paint(code: String, s: String): String =
    if (color) s"\u001b[${code}m$s\u001b[0m" else s
  private def st(s: String): String =
    if (s.startsWith("succ")) paint("32", s)
    else if (s.startsWith("fail") || s == "FAILED") paint("31", s)
    else if (s == "skipped" || s == "not_in_query") paint("33", s)
    else s
  private val steps =
    scala.collection.mutable.Map.empty[String, Vector[(String, Boolean, Long)]]
  private val statuses = scala.collection.mutable.Map.empty[String, Int]
  // finish-order rows for the run summary: (task, status, ms, steps, err)
  private val finished = scala.collection.mutable.ArrayBuffer
    .empty[(String, String, Long, String, Option[String])]
  private def fmt(ms: Long): String =
    if (ms < 1000) s"${ms}ms" else f"${ms / 1000.0}%.1fs"
  override def onEvent(e: RunEvent): Unit = e match {
    case RunStarted(cmd, n, _) =>
      steps.clear(); statuses.clear(); finished.clear()
      out(s"$cmd: $n task(s)")
    case TaskStarted(t, i, n, _) => out(s"[$i/$n] $t ...")
    case TaskFinished(t, status, ms, err, _) =>
      statuses(status) = statuses.getOrElse(status, 0) + 1
      val stepDetail = steps.remove(t).filter(_.nonEmpty).map(_.map {
        case (s, ok, sms) => s"$s ${fmt(sms)}" + (if (ok) "" else " FAILED")
      }.mkString(", ")).getOrElse("")
      finished += ((t, status, ms, stepDetail, err))
      val detail = if (stepDetail.isEmpty) "" else s": $stepDetail"
      out(s"[$t] ${st(status)} (${fmt(ms)}$detail)" +
        err.map(e => s": $e").getOrElse(""))
    case StepStarted(t, s, _) => if (debug) out(s"  [$t] step $s ...")
    case StepFinished(t, s, ok, ms, _) =>
      steps(t) = steps.getOrElse(t, Vector.empty) :+ ((s, ok, ms))
      if (debug) out(s"  [$t] step $s ${if (ok) "done" else "FAILED"} (${fmt(ms)})")
    case Message(level, task, text, _) =>
      if (debug || level != "debug")
        out(s"  ${task.map(t => s"[$t] ").getOrElse("")}$text")
    case RunFinished(ok, ms, _) =>
      if (finished.nonEmpty) {
        val wTask = finished.map(_._1.length).max
        val wStatus = finished.map(_._2.length).max
        val wDur = finished.map(f => fmt(f._3).length).max
        out("run summary:")
        finished.foreach { case (t, status, tms, stepDetail, err) =>
          val base = s"  ${t.padTo(wTask, ' ')}  " +
            s"${st(status.padTo(wStatus, ' '))}  " +
            fmt(tms).reverse.padTo(wDur, ' ').reverse
          val tail = (if (stepDetail.isEmpty) "" else s"  $stepDetail") +
            err.map(e => s"  error: $e").getOrElse("")
          out(base + tail)
        }
      }
      // errors grouped by message (the reference's grouped end-of-run
      // error summary): one line per distinct error, worst-first, with
      // every task that hit it — so 40 tasks failing on one bad
      // connection read as one problem, not 40.
      val errGroups = finished.filter(_._5.isDefined)
        .groupBy(_._5.get).toSeq
        .map { case (e, fs) => (e, fs.map(_._1).toSeq) }
        .sortBy { case (e, ts) => (-ts.size, e) }
      if (errGroups.nonEmpty) {
        out("errors:")
        errGroups.foreach { case (e, ts) =>
          out(s"  ${ts.size}× $e — ${ts.mkString(", ")}")
        }
      }
      val tally = statuses.toSeq.sortBy(_._1)
        .map { case (s, n) => s"$n $s" }.mkString(", ")
      out(s"${st(if (ok) "succeeded" else "FAILED")} in ${fmt(ms)}" +
        (if (tally.nonEmpty) s" ($tally)" else ""))
  }
}

/** JSONL file log, one event per line (the reference's file logger,
  * sayn/logging/file_logger.py). Append-only; `close()` flushes.
  */
final class FileTracker(path: java.nio.file.Path) extends EventListener {
  import RunEvent._
  java.nio.file.Files.createDirectories(path.getParent)
  private val w = java.nio.file.Files.newBufferedWriter(
    path,
    java.nio.file.StandardOpenOption.CREATE,
    java.nio.file.StandardOpenOption.APPEND)

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def line(fields: (String, Any)*): String =
    fields.map {
      case (k, v: String) => s"${q(k)}: ${q(v)}"
      case (k, v: Boolean) => s"${q(k)}: $v"
      case (k, v) => s"${q(k)}: $v"
    }.mkString("{", ", ", "}")

  override def onEvent(e: RunEvent): Unit = {
    val json = e match {
      case RunStarted(cmd, n, ts) =>
        line("event" -> "run_started", "command" -> cmd, "n_tasks" -> n, "ts" -> ts)
      case TaskStarted(t, i, n, ts) =>
        line("event" -> "task_started", "task" -> t, "index" -> i, "total" -> n, "ts" -> ts)
      case TaskFinished(t, st, ms, err, ts) =>
        line(Seq("event" -> "task_finished", "task" -> t, "status" -> st,
          "duration_ms" -> ms) ++ err.map("error" -> (_: Any)).toSeq :+ ("ts" -> ts): _*)
      case StepStarted(t, s, ts) =>
        line("event" -> "step_started", "task" -> t, "step" -> s, "ts" -> ts)
      case StepFinished(t, s, ok, ms, ts) =>
        line("event" -> "step_finished", "task" -> t, "step" -> s,
          "ok" -> ok, "duration_ms" -> ms, "ts" -> ts)
      case Message(level, task, text, ts) =>
        line(Seq("event" -> "message", "level" -> level) ++
          task.map("task" -> (_: Any)).toSeq ++
          Seq("text" -> text, "ts" -> ts): _*)
      case RunFinished(ok, ms, ts) =>
        line("event" -> "run_finished", "succeeded" -> ok, "duration_ms" -> ms, "ts" -> ts)
    }
    w.write(json)
    w.newLine()
  }

  override def close(): Unit = { w.flush(); w.close() }
}
