package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Algebraic invariants of the temporal joins over random data
  * (deterministic seeds, the PipelinePropertySpec pattern).
  */
class JoinsPropertySpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  private val pointGen = for {
    n <- Gen.chooseNum(5, 60)
    ps <- Gen.listOfN(n, Gen.chooseNum(0L, 10000L))
  } yield ps

  private val intervalGen = for {
    n <- Gen.chooseNum(2, 15)
    ivs <- Gen.listOfN(n, for {
      s <- Gen.chooseNum(0L, 9000L)
      len <- Gen.chooseNum(0L, 2000L)
    } yield (s, s + len))
  } yield ivs

  test("property: rangeJoin result is bucket-width invariant") {
    (1 to 6).foreach { s =>
      val pts = sample(pointGen, s.toLong).zipWithIndex
        .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
      val ivs = sample(intervalGen, 100L + s).zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("iid", "s", "e")
      // the width is a physical knob: every choice must give the same pairs
      val answers = Seq(37L, 500L, 4096L).map { w =>
        Joins.rangeJoin(pts, ivs, "p", "s", "e", bucketWidth = w)
          .select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      }
      assert(answers.distinct.size == 1, s"seed $s: widths disagree")
      // and it equals the naive inequality join, multiplicity included
      val naive = pts.join(ivs, $"p" >= $"s" && $"p" <= $"e")
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(answers.head == naive, s"seed $s: bucketed != naive")
    }
  }

  test("property: asOf payload is the max build ts at-or-before each probe") {
    (1 to 6).foreach { s =>
      val probe = sample(pointGen, 200L + s).zipWithIndex
        .map { case (t, i) => (i.toLong % 5, t, i.toLong) }.toDF("k", "t", "pid")
      val build = sample(pointGen, 300L + s).distinct.zipWithIndex
        .map { case (t, i) => (i.toLong % 5, t) }.distinct
        .toDF("k", "bt") // unique per (k, bt) by construction
        .withColumn("snap", col("bt") * 10)
      val out = Joins.asOf(probe, build, Seq("k"), "t", "bt")
        .select("pid", "snap").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      val probeRows = probe.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val buildRows = build.collect().map(r => (r.getLong(0), r.getLong(1)))
      probeRows.foreach { case (k, t, pid) =>
        val expected = buildRows.filter(b => b._1 == k && b._2 <= t)
          .sortBy(_._2).lastOption.map(_._2 * 10)
        assert(out(pid) == expected, s"seed $s pid $pid: ${out(pid)} != $expected")
      }
    }
  }
}
