package graft.pipeline

import graft.SparkSpec
import graft.functions.JaroWinkler

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("JaroWinkler kernel matches the classic Winkler reference values") {
    // textbook pairs, cross-checked against DuckDB's implementation
    assert(math.abs(JaroWinkler.of("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(JaroWinkler.of("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(math.abs(JaroWinkler.of("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-15)
    assert(JaroWinkler.of("hello", "hello") == 1.0)
    assert(JaroWinkler.of("abc", "xyz") == 0.0)
    // integer-floored transpositions: the 3-cycle counts as t=1 (17/18)
    assert(math.abs(JaroWinkler.of("abcdxx", "bcadxx") - 0.9444444444444445) < 1e-15)
    // no winkler boost at or below the 0.7 jaro threshold
    assert(JaroWinkler.of("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    // m=0 and empty-string conventions (DuckDB-probed)
    assert(JaroWinkler.of("", "") == 0.0)
    assert(JaroWinkler.of("a", "") == 0.0)
    assert(JaroWinkler.of("ab", "ba") == 0.0)
    // prefix cap at 4
    assert(math.abs(JaroWinkler.of("aaaaaaaaaab", "aaaaaaaaaba") - 0.9818181818181818) < 1e-15)
  }

  test("jaro_winkler registers as a SQL function through GraftExtensions") {
    graft.functions.GraftExtensions.install(spark)
    val v = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS jw")
      .collect().head.getDouble(0)
    assert(math.abs(v - 0.9611111111111111) < 1e-15)
  }

  test("blockedPairs finds in-block near-matches and respects blocking") {
    val recs = Seq(
      (1L, "Acme Widget Co", "US", 1),
      (2L, "acme widgt co", "US", 1),     // near-dup, same block
      (3L, "acme widget co", "DE", 1),    // identical name, other block
      (4L, "Zebra Holdings", "US", 1),    // same block, unrelated name
      (5L, "acme widget co ", "US", 1)    // trim+case-only twin
    ).toDF("id", "name", "country", "tier")
    val out = EntityResolution.blockedPairs(
      recs, "id", "name", Seq("country", "tier"), jwMin = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (1,2) perturbed pair, (1,5)+(2,5) via the normalized twin; 3 is
    // blocked away despite an identical name, 4 scores below the cut
    assert(out.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 5L), (2L, 5L)))
    assert(out.contains((1L, 5L, 0L))) // normalization → edit distance 0
    assert(out.forall(p => p._1 < p._2))
  }

  test("blockSizes reports records and implied pairs, largest first") {
    val recs = Seq(
      (1L, "a", "X"), (2L, "b", "X"), (3L, "c", "X"), (4L, "d", "Y")
    ).toDF("id", "name", "grp")
    val out = EntityResolution.blockSizes(recs, Seq("grp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.head == ("X", 3L, 3L))
    assert(out(1) == ("Y", 1L, 0L))
  }

  test("fellegiSunterEM separates an all-agree mass from an all-disagree " +
      "mass: gamma ordering, weight signs, posterior sanity") {
    // 100 pairs agree on everything (the duplicate mass), 900 agree on
    // nothing, 50 mixed — EM must put gamma(1,1,1) >> gamma(0,0,0) and
    // the F-S weight positive for full agreement, negative for none
    val rows = Seq.fill(100)((true, true, true)) ++
      Seq.fill(900)((false, false, false)) ++
      Seq.fill(50)((true, false, false))
    val out = EntityResolution.fellegiSunterEM(
        rows.toDF("a1", "a2", "a3"), Seq("a1", "a2", "a3"), iters = 8)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r).toMap
    val full = out((1, 1, 1))
    val none = out((0, 0, 0))
    assert(full.getAs[Long]("n_pairs") == 100L)
    assert(full.getAs[Double]("gamma") > 0.9,
      s"full-agreement gamma: ${full.getAs[Double]("gamma")}")
    assert(none.getAs[Double]("gamma") < 0.1)
    assert(full.getAs[Double]("weight") > 0.0)
    assert(none.getAs[Double]("weight") < 0.0)
    assert(out((1, 0, 0)).getAs[Double]("gamma") <
      full.getAs[Double]("gamma"))
  }
}
