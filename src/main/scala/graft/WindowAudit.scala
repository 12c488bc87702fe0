package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec

/** Round-18 scratch diagnostic (not part of the driver contract):
  * enumerates every unpartitioned WindowExec in every non-mutating
  * entry's pre-AQE physical plan and prints the structural evidence
  * the corpus-wide class-6 law needs — limits below, aggregates below
  * with their grouping column names, and the window's order columns —
  * so the law's sanction conditions are derived from the corpus
  * instead of guessed.
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec, CollectLimitExec}

    def aggsBelow(p: SparkPlan): Seq[BaseAggregateExec] =
      p.collect { case a: BaseAggregateExec => a } ++
        p.collect { case r: ReusedExchangeExec => r }
          .flatMap(r => aggsBelow(r.child))
    def limitsBelow(p: SparkPlan): Seq[String] =
      (p.collect {
        case _: GlobalLimitExec => "GlobalLimit"
        case _: TakeOrderedAndProjectExec => "TakeOrdered"
        case _: CollectLimitExec => "CollectLimit"
      }) ++ p.collect { case r: ReusedExchangeExec => r }
        .flatMap(r => limitsBelow(r.child))

    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.filterNot(SparkEntry.mutating).toSeq.sorted
    names.foreach { n =>
      try {
        val p = SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan
        val plans = p +: p.subqueriesAll
        val wins = plans.flatMap(_.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w })
        wins.foreach { w =>
          val ordNames = w.orderSpec.flatMap(_.child.collect {
            case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a.name })
          val limits = limitsBelow(w.child)
          val aggs = aggsBelow(w.child).map { a =>
            if (a.groupingExpressions.isEmpty) "<scalar>"
            else a.groupingExpressions.map(_.name).mkString("+")
          }
          println(s"AUDIT\t$n\tord=${ordNames.mkString(",")}" +
            s"\tlimits=${limits.mkString(",")}" +
            s"\taggs=${aggs.distinct.mkString(";")}")
        }
      } catch {
        case e: Throwable =>
          println(s"AUDIT\t$n\tFAILED\t${String.valueOf(e.getMessage).take(120)}")
      }
    }
    spark.stop()
  }
}
