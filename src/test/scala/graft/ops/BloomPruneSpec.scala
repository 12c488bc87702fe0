package graft.ops

import graft.SparkSpec
import graft.functions.BloomBitmap
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {

  import spark.implicits._

  test("bloom bitmap has no false negatives; prune+verify == exact semi join") {
    val build = (1L to 200L).filter(_ % 7 == 0).toDF("k")
    val probe = (1L to 2000L).map(i => (i % 400, i)).toDF("pk", "payload")
    val out = BloomPrune.semiJoin(probe, "pk", build, "k", numBits = 1024)
    val exact = probe.join(build, probe("pk") === build("k"), "left_semi")
    assert(rows(out) == rows(exact))
  }

  test("mightContain accepts every inserted key (no false negatives, tiny filter)") {
    // 64-bit filter + 50 keys: heavily saturated, many false positives —
    // but every inserted key MUST still test positive.
    val keys = (1L to 50L).toDF("k")
    val bitmap = BloomPrune.buildBitmap(keys, "k", numBits = 64, numHashes = 3)
    val tested = keys.filter(BloomBitmap.mightContain(col("k"), bitmap, 64, 3))
    assert(tested.count() == 50)
  }

  test("filter selectivity is real: non-member keys are mostly rejected") {
    val build = (1L to 100L).toDF("k")
    val bitmap = BloomPrune.buildBitmap(build, "k", numBits = 1 << 14, numHashes = 5)
    val nonMembers = (10001L to 11000L).toDF("k")
    val passed = nonMembers
      .filter(BloomBitmap.mightContain(col("k"), bitmap, 1 << 14, 5)).count()
    // FPR at n=100, m=16384, k=5 is ~1e-7; allow a generous margin.
    assert(passed <= 5, s"bloom FPR too high: $passed/1000 non-members passed")
  }

  test("empty build side prunes everything") {
    val build = Seq.empty[Long].toDF("k")
    val probe = (1L to 100L).toDF("pk")
    assert(BloomPrune.semiJoin(probe, "pk", build, "k", numBits = 1024).count() == 0)
  }

  test("aggregator validates numBits; positions validates numHashes") {
    intercept[IllegalArgumentException] {
      new graft.functions.BloomBitmapAgg(100) // not a multiple of 64
    }
    intercept[IllegalArgumentException] {
      BloomBitmap.positions(col("k"), 64, 0)
    }
  }
}
