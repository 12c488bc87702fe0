package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class DagSpec extends AnyFunSuite {

  val diamond = Map(
    "a" -> Seq.empty[String],
    "b" -> Seq("a"),
    "c" -> Seq("a"),
    "d" -> Seq("b", "c"))

  test("topo sort orders parents before children") {
    val Right(order) = Dag.topoSort(diamond)
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("a") < order.indexOf("c"))
    assert(order.indexOf("b") < order.indexOf("d"))
    assert(order.indexOf("c") < order.indexOf("d"))
  }

  test("cycle detection") {
    val cyclic = Map("a" -> Seq("b"), "b" -> Seq("a"))
    assert(Dag.validate(cyclic).isLeft)
    assert(Dag.topoSort(cyclic).isLeft)
  }

  test("missing parent detection") {
    val bad = Map("a" -> Seq("ghost"))
    val Left(e) = Dag.validate(bad)
    assert(e.msg.contains("ghost"))
  }

  test("upstream excludes self, walks transitively") {
    assert(Dag.upstream(diamond, "d") == Set("a", "b", "c"))
    assert(Dag.upstream(diamond, "a") == Set.empty)
  }

  test("downstream is upstream of reversed graph") {
    assert(Dag.downstream(diamond, "a") == Set("b", "c", "d"))
    assert(Dag.downstream(diamond, "d") == Set.empty)
  }

  // property: topo sort of a random DAG (edges only from lower to higher
  // index) emits every node exactly once with parents first
  val genDag: Gen[Map[String, Seq[String]]] = for {
    n <- Gen.choose(1, 30)
    edges <- Gen.listOfN(
      n * 2,
      for {
        a <- Gen.choose(0, n - 1)
        b <- Gen.choose(0, n - 1)
      } yield (math.min(a, b), math.max(a, b)))
  } yield {
    val base = (0 until n).map(i => s"t$i" -> Vector.empty[String]).toMap
    edges.filter { case (a, b) => a != b }.foldLeft(base) { case (acc, (p, c)) =>
      acc.updated(s"t$c", (acc(s"t$c") :+ s"t$p").distinct)
    }
  }

  test("property: topo sort is a valid linearization (100 random DAGs)") {
    val params = Gen.Parameters.default
    (1 to 100).foreach { i =>
      val dag = genDag(params, Seed(i.toLong)).get
      val Right(order) = Dag.topoSort(dag)
      assert(order.sorted == dag.keys.toSeq.sorted, s"seed $i")
      val pos = order.zipWithIndex.toMap
      for ((node, parents) <- dag; p <- parents)
        assert(pos(p) < pos(node), s"seed $i: $p !< $node")
    }
  }
}
