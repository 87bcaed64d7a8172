package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered conversion funnel (SURVEY.md §2B q_funnel, §2E
  * stream_funnel): stage k's timestamp is the user's earliest
  * qualifying event STRICTLY AFTER stage k-1 — computed as a chain of
  * per-user min-reduces stitched by key-sized joins, never a per-user
  * sort of the raw event stream. Events before the previous stage do
  * not convert (a click before signup is not a funnel click).
  *
  * The same operator serves the batch query and the streaming twin:
  * FactStream.ingestFunnel re-runs it per micro-batch over ONLY the
  * users that batch touched (delta-scoped recompute), which is what
  * makes the streamed funnel exact under out-of-order arrival — a
  * late signup legitimately re-qualifies clicks that were already on
  * file, something a forward-only per-user state machine cannot undo.
  */
object Funnel {

  /** `ev`: (user_id, event_type, ts_us). Returns one row per user that
    * reached stage 1, with each stage's timestamp (null = not reached)
    * and the count of stages reached. */
  def stages(ev: DataFrame, stageTypes: Seq[String]): DataFrame = {
    val first = ev.filter(col("event_type") === stageTypes.head)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as(s"${stageTypes.head}_us"))
    val (joined, _) = stageTypes.tail.foldLeft((first, s"${stageTypes.head}_us")) {
      case ((acc, prevCol), typ) =>
        val nxt = ev.filter(col("event_type") === typ)
          .join(acc.select(col("user_id"), col(prevCol)), Seq("user_id"))
          .filter(col("ts_us") > col(prevCol))
          .groupBy(col("user_id")).agg(min(col("ts_us")).as(s"${typ}_us"))
        (acc.join(nxt, Seq("user_id"), "left"), s"${typ}_us")
    }
    val stageCol = stageTypes.tail
      .map(t => when(col(s"${t}_us").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1): Column)(_ + _)
    joined.select(col("user_id") +:
      stageTypes.map(t => col(s"${t}_us")) :+ stageCol.as("stage"): _*)
  }
}
