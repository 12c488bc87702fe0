package graft.pipeline

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Random-event-log properties for the behavioral operators: each one is
  * checked against a direct in-memory reference implementation — the
  * distributed plan and the obvious sequential algorithm must agree on
  * arbitrary inputs (the PipelinePropertySpec pattern).
  */
class BehaviorPropertySpec extends SparkSpec {

  import spark.implicits._

  private case class Ev(user: Long, id: Long, typ: String, ts: Long)

  private val genLog: Gen[List[Ev]] = for {
    n <- Gen.chooseNum(1, 60)
    evs <- Gen.listOfN(n, for {
      u <- Gen.chooseNum(1L, 5L)
      t <- Gen.oneOf("a", "b", "c", "d")
      ts <- Gen.chooseNum(0L, 50L)
    } yield (u, t, ts))
  } yield evs.zipWithIndex.map { case ((u, t, ts), i) => Ev(u, i.toLong, t, ts) }

  private def sample(seed: Long): List[Ev] =
    genLog(Gen.Parameters.default, Seed(seed)).get

  private def df(evs: List[Ev]) =
    evs.map(e => (e.user, e.id, e.typ, e.ts))
      .toDF("user_id", "event_id", "event_type", "ts")

  /** Sequential greedy funnel reference. */
  private def refFunnel(
      evs: List[Ev], steps: Seq[String], span: Long): Map[Long, Seq[Option[Long]]] =
    evs.groupBy(_.user).flatMap { case (u, es) =>
      val first = es.filter(_.typ == steps.head).map(_.ts).minOption
      first.map { t1 =>
        val times = steps.tail.scanLeft(Option(t1)) { (prev, st) =>
          prev.flatMap(p => es.filter(e =>
            e.typ == st && e.ts > p && e.ts <= t1 + span).map(_.ts).minOption)
        }
        u -> times.map(identity)
      }
    }

  test("property: funnelUsers equals the sequential greedy reference") {
    val steps = Seq("a", "b", "c")
    (1 to 10).foreach { s =>
      val evs = sample(400L + s)
      val out = Behavior.funnelUsers(df(evs), "user_id", "event_type", "ts",
        steps, maxSpan = 20L)
        .collect().map { r =>
          r.getLong(0) -> (1 to steps.size).map(i =>
            if (r.isNullAt(i)) None else Some(r.getLong(i))).toSeq
        }.toMap
      assert(out == refFunnel(evs, steps, 20L), s"seed $s")
    }
  }

  test("property: transitions equals the sequential pair count") {
    (1 to 10).foreach { s =>
      val evs = sample(500L + s)
      val ref = evs.groupBy(_.user).values.flatMap { es =>
        val sorted = es.sortBy(e => (e.ts, e.id)).map(_.typ)
        sorted.zip(sorted.drop(1))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val out = Behavior.transitions(df(evs), "user_id", "event_type", "ts",
        "event_id")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(out == ref, s"seed $s")
    }
  }

  test("property: streaks partition the period set; lengths sum to |periods|") {
    (1 to 10).foreach { s =>
      val evs = sample(600L + s)
      val out = Behavior.streaks(df(evs), "user_id", "ts", periodLen = 7L)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      evs.groupBy(_.user).foreach { case (u, es) =>
        val periods = es.map(_.ts / 7L).distinct.sorted
        val runs = periods.foldLeft(List.empty[List[Long]]) {
          case (acc @ (run :: rest), p) if run.headOption.contains(p - 1) =>
            (p :: run) :: rest
          case (acc, p) => List(p) :: acc
        }
        val (nStreaks, maxLen) = out(u)
        assert(nStreaks == runs.size, s"seed $s user $u")
        assert(maxLen == runs.map(_.size).max.toLong, s"seed $s user $u")
        assert(runs.map(_.size).sum == periods.size, s"seed $s user $u")
      }
    }
  }
}
