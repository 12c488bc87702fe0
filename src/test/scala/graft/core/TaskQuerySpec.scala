package graft.core

import org.scalatest.funsuite.AnyFunSuite
import TaskQuery.TaskMeta

class TaskQuerySpec extends AnyFunSuite {

  // a -> b -> c, and d alone
  val dag = Map(
    "ta" -> Seq.empty[String],
    "tb" -> Seq("ta"),
    "tc" -> Seq("tb"),
    "td" -> Seq.empty[String])
  val meta = Map(
    "ta" -> TaskMeta("g1", Seq("t1")),
    "tb" -> TaskMeta("g1", Seq.empty),
    "tc" -> TaskMeta("g2", Seq("t1")),
    "td" -> TaskMeta("g2", Seq.empty))

  def run(include: Seq[String], exclude: Seq[String] = Nil): Seq[String] = {
    val Right((inc, exc)) = TaskQuery.getQuery(meta, include, exclude)
    val Right(result) = TaskQuery.apply(dag, inc, exc)
    result
  }

  test("no query selects everything in topo order") {
    assert(run(Nil) == Seq("ta", "td", "tb", "tc"))
  }

  test("plain task name selects just that task") {
    assert(run(Seq("tb")) == Seq("tb"))
  }

  test("+task pulls ancestors") {
    assert(run(Seq("+tc")) == Seq("ta", "tb", "tc"))
  }

  test("task+ pulls descendants") {
    assert(run(Seq("ta+")) == Seq("ta", "tb", "tc"))
  }

  test("+task+ pulls both") {
    assert(run(Seq("+tb+")) == Seq("ta", "tb", "tc"))
  }

  test("group: selector") {
    assert(run(Seq("group:g2")) == Seq("td", "tc"))
  }

  test("tag: selector") {
    assert(run(Seq("tag:t1")) == Seq("ta", "tc"))
  }

  test("exclude subtracts from full set when no includes") {
    assert(run(Nil, Seq("tb+")) == Seq("ta", "td"))
  }

  test("include then exclude") {
    assert(run(Seq("+tc"), Seq("ta")) == Seq("tb", "tc"))
  }

  test("undefined task/group/tag error") {
    assert(TaskQuery.getQuery(meta, Seq("nope"), Nil).isLeft)
    assert(TaskQuery.getQuery(meta, Seq("group:nope"), Nil).isLeft)
    assert(TaskQuery.getQuery(meta, Seq("tag:nope"), Nil).isLeft)
  }

  test("include/exclude overlap errors") {
    assert(TaskQuery.getQuery(meta, Seq("ta"), Seq("ta")).isLeft)
  }

  test("bad syntax errors") {
    assert(TaskQuery.getQuery(meta, Seq("++ta"), Nil).isLeft)
    assert(TaskQuery.getQuery(meta, Seq("group:"), Nil).isLeft)
  }
}
