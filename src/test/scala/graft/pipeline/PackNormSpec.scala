package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quantile normalization (Sampling.quantileNormalize, q317) and
  * first-fit-decreasing packing (Sampling.packFirstFit, q318).
  */
class PackNormSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------- quantileNormalize

  test("quantileNormalize equalizes equal-size slice distributions") {
    // slice A = {10,20,30}, slice B = {100,200,300}: rank r maps to the
    // mean of the two r-th order statistics -> {55, 110, 165} in BOTH
    val df = Seq(("A", 1L, 10L), ("A", 2L, 20L), ("A", 3L, 30L),
      ("B", 4L, 100L), ("B", 5L, 200L), ("B", 6L, 300L))
      .toDF("slice", "id", "score")
    val out = Sampling.quantileNormalize(df, "slice", "id", "score")
      .collect()
      .map(r => r.getLong(1) -> r.getAs[Double]("norm_score")).toMap
    assert(out(1) == 55.0 && out(4) == 55.0)
    assert(out(2) == 110.0 && out(5) == 110.0)
    assert(out(3) == 165.0 && out(6) == 165.0)
  }

  test("quantileNormalize handles unequal slice sizes by ceil lookup") {
    // A has 2 rows, B has 4: A's rank 1 of 2 looks up B's rank
    // ceil(1*4/2) = 2
    val df = Seq(("A", 1L, 5L), ("A", 2L, 15L),
      ("B", 3L, 1L), ("B", 4L, 2L), ("B", 5L, 3L), ("B", 6L, 4L))
      .toDF("slice", "id", "score")
    val out = Sampling.quantileNormalize(df, "slice", "id", "score")
      .collect()
      .map(r => r.getLong(1) -> r.getAs[Double]("norm_score")).toMap
    // A rank1: mean(A[1]=5, B[2]=2) = 3.5 ; A rank2: mean(15, B[4]=4) = 9.5
    assert(out(1) == 3.5 && out(2) == 9.5)
    // B rank2 of 4: A rank ceil(2*2/4)=1 -> mean(2, 5) = 3.5
    assert(out(4) == 3.5)
  }

  test("quantileNormalize keeps every row and is partitioning-invariant") {
    val df = (1L to 120L)
      .map(i => (s"s${i % 4}", i, (i * 31) % 97)).toDF("slice", "id", "v")
    val a = Sampling.quantileNormalize(df.coalesce(1), "slice", "id", "v")
    val b = Sampling.quantileNormalize(df.repartition(7), "slice", "id", "v")
    assert(a.count() == 120L)
    assert(rows(a) == rows(b))
  }

  test("quantileNormalize: duplicate ids in a slice normalize " +
    "independently at their own ranks, one output row per input row") {
    // id 1 appears twice in slice A with scores 10 and 30 — each
    // occurrence is its own ranked row (the fan-in aggregate keys on
    // the unique within-slice rank, never the id); an id-keyed merge
    // would emit a single wrong (sum/S) row instead
    val df = Seq(("A", 1L, 10L), ("A", 2L, 20L), ("A", 1L, 30L),
      ("B", 5L, 100L), ("B", 6L, 200L), ("B", 7L, 300L))
      .toDF("slice", "id", "score")
    val out = Sampling.quantileNormalize(df, "slice", "id", "score")
    assert(out.count() == 6L)
    val a = out.filter(col("slice") === "A").collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getAs[Double]("norm_score"))
      .toMap
    // ranks in A: (10,id1)→1, (20,id2)→2, (30,id1)→3; equal sizes, so
    // norm = mean with B's same-rank value
    assert(a((1L, 10L)) == 55.0, a)
    assert(a((2L, 20L)) == 110.0, a)
    assert(a((1L, 30L)) == 165.0, a)
  }

  // ------------------------------------------------------- packFirstFit

  test("packFirstFit: every bin respects capacity; every item appears once") {
    val df = (1L to 200L).map(i => (i, 10L + (i * 37) % 90)).toDF("id", "sz")
    val out = Sampling.packFirstFit(df, "id", "sz", capacity = 150L,
      shards = 4)
    assert(out.count() == 200L)
    assert(out.select(countDistinct(col("id"))).head.getLong(0) == 200L)
    val over = out.groupBy(col("pack_shard"), col("pack_bin"))
      .agg(sum(col("sz")).as("fill"))
      .filter(col("fill") > 150L)
    assert(over.count() == 0L)
    // bin_fill matches the recomputed per-bin total
    val bad = out.groupBy(col("pack_shard"), col("pack_bin"))
      .agg(sum(col("sz")).as("re"), first(col("bin_fill")).as("rep"))
      .filter(col("re") =!= col("rep"))
    assert(bad.count() == 0L)
  }

  test("packFirstFit replays classic FFD on one shard") {
    // sizes 7,6,5,4,3,2,1 into capacity 10 (FFD): bins [7,3],[6,4],[5,2,1]
    val df = Seq(("a", 7L), ("b", 6L), ("c", 5L), ("d", 4L), ("e", 3L),
      ("f", 2L), ("g", 1L)).toDF("id", "sz")
    val out = Sampling.packFirstFit(df, "id", "sz", capacity = 10L,
        shards = 1)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("pack_bin"))
      .toMap
    assert(out("a") == 1L && out("e") == 1L)
    assert(out("b") == 2L && out("d") == 2L)
    assert(out("c") == 3L && out("f") == 3L && out("g") == 3L)
  }

  test("packFirstFit beats contiguous chunk packing on padding") {
    // alternating big/small items: contiguous bins waste, FFD pairs
    // big+small tightly
    val df = (1L to 100L)
      .map(i => (i, if (i % 2 == 0) 60L else 35L)).toDF("id", "sz")
    val ffd = Sampling.packFirstFit(df, "id", "sz", capacity = 100L,
      shards = 1)
    val nBins = ffd.select(countDistinct(col("pack_bin"))).head.getLong(0)
    // total = 50*60 + 50*35 = 4750 -> lower bound 48 bins; FFD pairs
    // 60+35 (95) so ~50 bins; naive one-item-per-bin would be 100
    assert(nBins <= 52L, s"FFD used $nBins bins")
  }

  test("packFirstFit is deterministic across partitionings") {
    val df = (1L to 150L).map(i => (i, 1L + (i * 13) % 50)).toDF("id", "sz")
    val a = Sampling.packFirstFit(df.coalesce(1), "id", "sz", 120L, 4)
    val b = Sampling.packFirstFit(df.repartition(11), "id", "sz", 120L, 4)
    assert(rows(a) == rows(b))
  }

  test("packFirstFit fails loudly on oversize items and oversize shards") {
    val big = Seq(("a", 500L)).toDF("id", "sz")
    val e = intercept[Exception] {
      Sampling.packFirstFit(big, "id", "sz", capacity = 100L).collect()
    }
    assert(e.getMessage.contains("capacity"))
    val many = (1L to 50L).map(i => (i, 1L)).toDF("id", "sz")
    val e2 = intercept[Exception] {
      Sampling.packFirstFit(many, "id", "sz", capacity = 100L,
        shards = 1, maxShardRows = 10).collect()
    }
    assert(e2.getMessage.contains("10"))
  }

  test("neymanAllocation: allocation follows N_h*S_h; zero-variance " +
    "strata get zero; floors under-spend by design") {
    // A {0,10}: sd = sqrt(50) = 7.071068 → w 14.142136
    // B {5,5}:  sd 0 → w 0
    // C {0,20}: sd = sqrt(200) = 14.142136 → w 28.284272
    // shares: 1/3, 0, 2/3; budget 300 → 99 / 0 / 200 (d6 + floor)
    val df = Seq(("A", 0L), ("A", 10L), ("B", 5L), ("B", 5L),
      ("C", 0L), ("C", 20L)).toDF("h", "x")
    val out = Sampling.neymanAllocation(df, "h", "x", budget = 300L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(out("A").getAs[Double]("sd") - 7.071068) < 1e-9)
    assert(out("B").getAs[Double]("sd") == 0.0)
    assert(math.abs(out("A").getAs[Double]("share") - 0.333333) < 1e-9)
    assert(math.abs(out("C").getAs[Double]("share") - 0.666667) < 1e-9)
    assert(out("A").getAs[Long]("n_alloc") == 99L)
    assert(out("B").getAs[Long]("n_alloc") == 0L)
    assert(out("C").getAs[Long]("n_alloc") == 200L)
    assert(out.values.map(_.getAs[Long]("n_alloc")).sum <= 300L)
    // all-degenerate input: shares NULL, allocations 0
    val deg = Seq(("A", 5L), ("A", 5L)).toDF("h", "x")
    val od = Sampling.neymanAllocation(deg, "h", "x", budget = 10L)
      .collect().head
    assert(od.isNullAt(od.fieldIndex("share")))
    assert(od.getAs[Long]("n_alloc") == 0L)
    val e = intercept[IllegalArgumentException] {
      Sampling.neymanAllocation(df, "h", "x", budget = 0L)
    }
    assert(e.getMessage.contains("budget"), e.getMessage)
  }

  test("thresholdSweep: hand survival curve over a 4-point grid; " +
    "duplicate thresholds are rejected") {
    val df = Seq((10L, 1L), (20L, 10L), (30L, 100L))
      .toDF("score", "w")
    val out = Sampling.thresholdSweep(df, "score", "w",
      Seq(0L, 15L, 25L, 100L))
      .collect().map(r => r.getAs[Long]("threshold") -> r).toMap
    assert(out(0L).getAs[Long]("n_kept") == 3L)
    assert(out(0L).getAs[Double]("doc_frac") == 1.0)
    assert(out(0L).getAs[Double]("weight_frac") == 1.0)
    assert(out(15L).getAs[Long]("n_kept") == 2L)
    assert(out(15L).getAs[Long]("w_kept") == 110L)
    assert(math.abs(out(15L).getAs[Double]("weight_frac") - 0.990991)
      < 1e-9)
    assert(math.abs(out(25L).getAs[Double]("doc_frac") - 0.333333)
      < 1e-9)
    assert(out(100L).getAs[Long]("n_kept") == 0L)
    assert(out(100L).getAs[Double]("weight_frac") == 0.0)
    val e = intercept[IllegalArgumentException] {
      Sampling.thresholdSweep(df, "score", "w", Seq(1L, 1L))
    }
    assert(e.getMessage.contains("distinct"), e.getMessage)
  }
}
