package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization over an event stream: a new session starts
  * when the gap to the previous event of the same key exceeds `gap`.
  * One window over (key, time) — a single shuffle on the key — then the
  * running sum of session-start flags labels every event. The batch twin
  * of Structured Streaming's session window; at scale the only cost is the
  * one exchange on the session key (a skewed key serializes within its
  * partition — inherent to the semantics).
  */
object Sessionize {

  /** Label each event with a per-key session id (1-based). `orderCols`
    * breaks timestamp ties deterministically.
    */
  def label(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String = "INTERVAL 30 MINUTES",
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(
      prev.isNull || col(tsCol) > prev + expr(gap), 1).otherwise(0)
    val run = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("session_id", sum(isNew).over(run))
  }
}
