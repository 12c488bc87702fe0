package graft.core

import graft.core.Result.Result

/** DAG algebra over a `node -> parents` adjacency map.
  *
  * Same semantics as the reference (sayn/utils/dag.py:6-142): validation of
  * missing parents and cycles, Kahn-style topological sort, and BFS
  * upstream/downstream closures. Pure Scala — the engine DAG is driver-side
  * metadata; Spark never sees it.
  */
object Dag {

  /** Missing-parent check + cycle detection (dag.py:6-58). */
  def validate(dag: Map[String, Seq[String]]): Result[Unit] = {
    val missing = for {
      (node, parents) <- dag.toSeq
      p <- parents if !dag.contains(p)
    } yield s"$node -> $p"
    if (missing.nonEmpty)
      return Left(DagError(s"missing parents: ${missing.sorted.mkString(", ")}"))
    topoSort(dag).map(_ => ())
  }

  /** Kahn-style repeated-scan topological sort (dag.py:62-83).
    * Deterministic: ready nodes are emitted in sorted-name order.
    */
  def topoSort(dag: Map[String, Seq[String]]): Result[Seq[String]] = {
    val out = Vector.newBuilder[String]
    var remaining = dag.view.mapValues(_.toSet).toMap
    var done = Set.empty[String]
    while (remaining.nonEmpty) {
      val ready = remaining.collect {
        case (n, ps) if ps.forall(done.contains) => n
      }.toSeq.sorted
      if (ready.isEmpty)
        return Left(DagError(
          s"cycle detected among: ${remaining.keys.toSeq.sorted.mkString(", ")}"))
      out ++= ready
      done ++= ready
      remaining = remaining.removedAll(ready)
    }
    Right(out.result())
  }

  /** BFS ancestor closure, exclusive of the seed node (dag.py:91-100). */
  def upstream(dag: Map[String, Seq[String]], node: String): Set[String] = {
    var seen = Set.empty[String]
    var frontier = dag.getOrElse(node, Nil).toSet
    while (frontier.nonEmpty) {
      seen ++= frontier
      frontier = frontier.flatMap(n => dag.getOrElse(n, Nil)).diff(seen)
    }
    seen
  }

  /** Descendant closure = upstream of the reversed graph (dag.py:87-89,
    * misc.py:18-29). Exclusive of the seed node.
    */
  def downstream(dag: Map[String, Seq[String]], node: String): Set[String] =
    upstream(reverse(dag), node)

  def reverse(dag: Map[String, Seq[String]]): Map[String, Seq[String]] = {
    val base = dag.keys.map(_ -> Vector.empty[String]).toMap
    dag.foldLeft(base) { case (acc, (node, parents)) =>
      parents.foldLeft(acc) { (a, p) =>
        a.updated(p, a.getOrElse(p, Vector.empty) :+ node)
      }
    }
  }
}
