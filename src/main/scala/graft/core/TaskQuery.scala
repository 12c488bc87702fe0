package graft.core

import graft.core.Result.Result
import scala.util.matching.Regex

/** Include/exclude task-selection language: `[+]task[+]`, `group:g`, `tag:t`.
  *
  * Same grammar and resolution rules as the reference
  * (sayn/utils/task_query.py:9-134, sayn/utils/dag.py:103-142): includes are
  * applied first, then excludes subtract; `+task` pulls ancestors, `task+`
  * pulls descendants; with no include components every task starts selected;
  * result keeps topological order.
  */
object TaskQuery {

  /** A resolved selector: one task plus closure flags. */
  final case class Component(task: String, upstream: Boolean, downstream: Boolean)

  private val TaskRe: Regex =
    "^(\\+?)([a-zA-Z0-9][-_a-zA-Z0-9]+)(\\+?)$".r
  private val GroupRe: Regex = "^group:([a-zA-Z0-9][-_a-zA-Z0-9]+)$".r
  private val TagRe: Regex = "^tag:([a-zA-Z0-9][-_a-zA-Z0-9]+)$".r

  /** Metadata the selectors match against. */
  final case class TaskMeta(group: String, tags: Seq[String])

  /** Expand one query string into components (task_query.py:20-83). */
  def parseComponent(
      tasks: Map[String, TaskMeta], query: String): Result[Seq[Component]] =
    query match {
      case TagRe(tag) =>
        val hits = tasks.collect { case (k, m) if m.tags.contains(tag) => k }
        if (hits.isEmpty) Left(ParseError(s"undefined tag: $tag"))
        else Right(hits.toSeq.sorted.map(Component(_, upstream = false, downstream = false)))
      case GroupRe(group) =>
        val hits = tasks.collect { case (k, m) if m.group == group => k }
        if (hits.isEmpty) Left(ParseError(s"undefined group: $group"))
        else Right(hits.toSeq.sorted.map(Component(_, upstream = false, downstream = false)))
      case TaskRe(up, task, down) =>
        if (!tasks.contains(task)) Left(ParseError(s"undefined task: $task"))
        else Right(Seq(Component(task, up == "+", down == "+")))
      case _ => Left(ParseError(s"incorrect task query syntax: '$query'"))
    }

  /** Parse + merge include/exclude lists; overlapping strings error
    * (task_query.py:86-134). Duplicate tasks merge flags with OR.
    */
  def getQuery(
      tasks: Map[String, TaskMeta],
      include: Seq[String],
      exclude: Seq[String]): Result[(Seq[Component], Seq[Component])] = {
    val overlap = include.toSet.intersect(exclude.toSet)
    if (overlap.nonEmpty)
      return Left(ParseError(s"include/exclude overlap: ${overlap.toSeq.sorted.mkString(", ")}"))

    def resolve(queries: Seq[String]): Result[Seq[Component]] =
      Result.sequence(queries.map(parseComponent(tasks, _))).map { comps =>
        comps.flatten
          .groupBy(_.task)
          .map { case (t, cs) =>
            Component(t, cs.exists(_.upstream), cs.exists(_.downstream))
          }
          .toSeq.sortBy(_.task)
      }

    for {
      inc <- resolve(include)
      exc <- resolve(exclude)
    } yield (inc, exc)
  }

  /** Apply the query to the DAG, preserving topo order (dag.py:103-142).
    * No includes → start from all tasks.
    */
  def apply(
      dag: Map[String, Seq[String]],
      include: Seq[Component],
      exclude: Seq[Component]): Result[Seq[String]] =
    Dag.topoSort(dag).map { topo =>
      if (include.isEmpty && exclude.isEmpty) topo
      else {
        def closure(c: Component): Set[String] = {
          var s = Set(c.task)
          if (c.upstream) s ++= Dag.upstream(dag, c.task)
          if (c.downstream) s ++= Dag.downstream(dag, c.task)
          s
        }
        val selected0: Set[String] =
          if (include.nonEmpty) include.flatMap(closure).toSet
          else topo.toSet
        val selected = exclude.foldLeft(selected0)((acc, c) => acc -- closure(c))
        topo.filter(selected.contains)
      }
    }
}
