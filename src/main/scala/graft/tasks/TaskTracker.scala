package graft.tasks

import graft.app.{RunEvent, Tracker}

/** Per-task step/progress API handed to every task runner and user task —
  * the engine analog of the reference's task tracker
  * (sayn/tasks/python.py:91-114: `self.tracker.start_step`,
  * `finish_current_step`, `set_run_steps`, info/debug messages).
  *
  * Steps nest implicitly in time, not structure: starting a step finishes
  * the current one, mirroring the reference's current-step model. The
  * bracketed [[step]] variant is the Scala-idiomatic form — it finishes
  * (ok or failed) even when the body throws.
  */
final class TaskTracker(val taskName: String, emit: RunEvent => Unit) {

  private var current: Option[(String, Long)] = None

  def startStep(step: String): Unit = {
    finishCurrentStep()
    current = Some((step, Tracker.now()))
    emit(RunEvent.StepStarted(taskName, step, Tracker.now()))
  }

  def finishCurrentStep(ok: Boolean = true): Unit = {
    current.foreach { case (step, t0) =>
      emit(RunEvent.StepFinished(
        taskName, step, ok, Tracker.now() - t0, Tracker.now()))
    }
    current = None
  }

  /** Bracketed step: `tracker.step("load") { ... }`. */
  def step[A](name: String)(body: => A): A = {
    startStep(name)
    try { val r = body; finishCurrentStep(ok = true); r }
    catch { case e: Throwable => finishCurrentStep(ok = false); throw e }
  }

  def info(text: String): Unit =
    emit(RunEvent.Message("info", Some(taskName), text, Tracker.now()))
  def debug(text: String): Unit =
    emit(RunEvent.Message("debug", Some(taskName), text, Tracker.now()))
  def warn(text: String): Unit =
    emit(RunEvent.Message("warn", Some(taskName), text, Tracker.now()))
}

object TaskTracker {
  def noop(taskName: String): TaskTracker = new TaskTracker(taskName, _ => ())
}
