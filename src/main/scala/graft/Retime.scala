package graft

import org.apache.spark.sql.SparkSession

/** Standalone median-of-3 re-timer for bench-delta triage (the q339
  * discipline: an in-run spike ≥ 2× must be re-timed in isolation
  * before being believed — position noise inside a 468-entry run is
  * common for streaming entries whose micro-batch machinery contends
  * with neighbors).
  */
object Retime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Retime <entry> [sfDir]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warmup
    val ts = Seq(run(), run(), run()).sorted
    println(f"[retime] $name median=${ts(1)}%.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
