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
}
