package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  import spark.implicits._

  // heavily skewed left: 10k rows of key 1, a few of others
  private lazy val skewed = spark.range(0, 10000)
    .select(when($"id" < 9000, 1L).otherwise($"id" % 50).as("k"), $"id".as("v"))
  private lazy val dim = spark.range(0, 50)
    .select($"id".as("k"), concat(lit("d"), $"id").as("name"))

  test("salted inner join matches the plain join") {
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
    val saltedJ = Joins.salted(skewed, dim, Seq("k")).select("k", "v", "name")
    assert(saltedJ.count() == plain.count())
    assert(saltedJ.except(plain).isEmpty && plain.except(saltedJ).isEmpty)
  }

  test("salted left join keeps unmatched left rows exactly once") {
    val dimMissing = dim.filter($"k" =!= 1L) // hot key unmatched
    val plain = skewed.join(dimMissing, Seq("k"), "left").select("k", "v", "name")
    val saltedJ = Joins.salted(skewed, dimMissing, Seq("k"), "left")
      .select("k", "v", "name")
    assert(saltedJ.count() == plain.count())
    assert(saltedJ.filter($"name".isNull).count() ==
      plain.filter($"name".isNull).count())
    assert(saltedJ.except(plain).isEmpty && plain.except(saltedJ).isEmpty)
  }

  test("salt actually spreads the hot key across sub-keys") {
    val l = skewed.withColumn("_graft_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(16L)).cast("int"))
    val spread = l.filter($"k" === 1L).select("_graft_salt").distinct().count()
    assert(spread > 8, s"hot key only spread over $spread salts")
  }

  test("unsupported join types are rejected") {
    intercept[IllegalArgumentException] {
      Joins.salted(skewed, dim, Seq("k"), "right")
    }
  }

  // ---- asOf --------------------------------------------------------------

  test("asOf picks latest build row at-or-before, null before first") {
    val probe = Seq(
      (1L, 5L, "a"), (1L, 10L, "b"), (1L, 20L, "c"), (1L, 3L, "d"),
      (2L, 7L, "e"), // key with no build rows at all
      (3L, 15L, "f"))
      .toDF("k", "t", "tag")
    val build = Seq(
      (1L, 5L, 100.0), (1L, 12L, 200.0),
      (3L, 15L, 300.0)) // equal-instant match
      .toDF("k", "bt", "price")
    val out = Joins.asOf(probe, build, Seq("k"), "t", "bt")
      .select("k", "t", "tag", "price")
    assert(rows(out) == Set(
      Seq(1L, 3L, "d", null), // before first snapshot
      Seq(1L, 5L, "a", 100.0), // equal instant counts
      Seq(1L, 10L, "b", 100.0),
      Seq(1L, 20L, "c", 200.0),
      Seq(2L, 7L, "e", null), // key absent from build
      Seq(3L, 15L, "f", 300.0)))
  }

  test("asOf equals the per-row subquery answer on random data") {
    val probe = spark.range(0, 2000)
      .select(($"id" % 37).as("k"), pmod(xxhash64($"id"), lit(10000L)).as("t"),
        $"id".as("pid"))
    val build = spark.range(0, 500)
      .select(($"id" % 37).as("k"),
        pmod(xxhash64($"id" + 7), lit(10000L)).as("bt"))
      .distinct()
      .withColumn("payload", $"bt" * 2)
    val out = Joins.asOf(probe, build, Seq("k"), "t", "bt")
      .select("pid", "payload")
    // oracle: max bt <= t per key, via a window-free aggregation join
    val expected = probe.join(build, probe("k") === build("k") && $"bt" <= $"t", "left")
      .groupBy($"pid").agg(max($"bt").as("mbt"))
      .select($"pid", ($"mbt" * 2).as("payload"))
    assert(out.count() == 2000)
    assert(out.except(expected).isEmpty && expected.except(out).isEmpty)
  }

  test("asOf tolerance nulls out stale matches only") {
    val probe = Seq((1L, 10L, "a"), (1L, 30L, "b"), (1L, 100L, "c"))
      .toDF("k", "t", "tag")
    val build = Seq((1L, 8L, 7.0)).toDF("k", "bt", "price")
    val out = Joins.asOf(probe, build, Seq("k"), "t", "bt",
      tolerance = Some(25L)).select("tag", "price")
    assert(rows(out) == Set(
      Seq("a", 7.0), // 2 behind: fresh
      Seq("b", 7.0), // 22 behind: still inside 25
      Seq("c", null))) // 92 behind: stale → null, row kept
    // tolerance = unbounded equals the plain overload
    val unbounded = Joins.asOf(probe, build, Seq("k"), "t", "bt",
      tolerance = Some(Long.MaxValue)).select("tag", "price")
    val plain = Joins.asOf(probe, build, Seq("k"), "t", "bt")
      .select("tag", "price")
    assert(rows(unbounded) == rows(plain))
  }

  test("asOf orders timestamp columns at µs precision, not seconds") {
    import java.sql.Timestamp
    def ts(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000000L * 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }
    // two snapshots 300µs apart inside the same second: a seconds cast
    // would tie them and pick arbitrarily
    val probe = Seq((1L, ts(1000500), "p")).toDF("k", "t", "tag")
    val build = Seq((1L, ts(1000200), 1.0), (1L, ts(1000700), 2.0))
      .toDF("k", "bt", "price")
    val out = Joins.asOf(probe, build, Seq("k"), "t", "bt")
      .select("tag", "price")
    assert(rows(out) == Set(Seq("p", 1.0))) // 200µs snapshot, not 700µs
    // tolerance operates in µs for timestamp columns
    val tight = Joins.asOf(probe, build, Seq("k"), "t", "bt",
      tolerance = Some(100L)).select("tag", "price")
    assert(rows(tight) == Set(Seq("p", null))) // 300µs behind > 100µs
  }

  test("asOf match is row-atomic: matched row's NULL payload stays NULL") {
    // build row at t=20 has a NULL price and a non-null qty; the older
    // row at t=10 has both. A per-column carry would resurrect 1.0 from
    // t=10 for the probe at t=25 — mixing columns from two build rows.
    val probe = Seq((1L, 25L, "p"), (1L, 15L, "q")).toDF("k", "t", "tag")
    val build = Seq(
      (1L, 10L, Some(1.0), Some(11L)),
      (1L, 20L, None: Option[Double], Some(22L)))
      .toDF("k", "bt", "price", "qty")
    val out = Joins.asOf(probe, build, Seq("k"), "t", "bt")
      .select("tag", "price", "qty")
    assert(rows(out) == Set(
      Seq("p", null, 22L), // matched t=20 verbatim: price NULL
      Seq("q", 1.0, 11L))) // matched t=10 verbatim
    // same discipline under a tolerance
    val tol = Joins.asOf(probe, build, Seq("k"), "t", "bt",
      tolerance = Some(100L)).select("tag", "price", "qty")
    assert(rows(tol) == rows(out))
  }

  test("asOf rejects payload/probe column collisions") {
    val probe = Seq((1L, 2L, "x")).toDF("k", "t", "v")
    val build = Seq((1L, 1L, "y")).toDF("k", "bt", "v")
    intercept[IllegalArgumentException] {
      Joins.asOf(probe, build, Seq("k"), "t", "bt")
    }
  }

  // ---- rangeJoin ---------------------------------------------------------

  test("rangeJoin equals the naive inequality join, each pair once") {
    val points = spark.range(0, 3000)
      .select($"id".as("pid"), pmod(xxhash64($"id"), lit(100000L)).as("p"))
    val intervals = spark.range(0, 300)
      .select($"id".as("iid"),
        pmod(xxhash64($"id" + 3), lit(100000L)).as("s"))
      .withColumn("e", $"s" + pmod(xxhash64($"iid"), lit(5000L)))
    val out = Joins.rangeJoin(points, intervals, "p", "s", "e", bucketWidth = 2500L)
      .select("pid", "iid")
    val naive = points.join(intervals, $"p" >= $"s" && $"p" <= $"e")
      .select("pid", "iid")
    val n = naive.count()
    assert(n > 0, "fixture produced no overlapping pairs")
    assert(out.count() == n) // exact-once: counts match INCLUDING multiplicity
    assert(out.except(naive).isEmpty && naive.except(out).isEmpty)
  }

  test("rangeJoin validates inputs") {
    val points = Seq((1L, 2L)).toDF("pid", "p")
    intercept[IllegalArgumentException] {
      Joins.rangeJoin(points, Seq((1L, 2L, 3L)).toDF("iid", "s", "e"),
        "p", "s", "e", bucketWidth = 0L)
    }
    intercept[IllegalArgumentException] { // column collision
      Joins.rangeJoin(points, Seq((1L, 2L, 3L)).toDF("pid", "s", "e"),
        "p", "s", "e", bucketWidth = 10L)
    }
  }
}
