package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC MERGE / upsert (SURVEY.md §2B q_merge_cdc, §2E stream_cdc):
  * apply a changelog to a keyed base snapshot with last-change-wins
  * semantics — op 'D' deletes the key, anything else upserts its value.
  *
  * Scale design: the changelog reduces to KEY cardinality first
  * ([[latestPerKey]] — a map-side-combinable max_by over the (ord, tie)
  * total order, never a per-key window over the raw stream), so the
  * FULL OUTER merge join ([[applyLatest]]) is key-sized on both sides
  * regardless of changelog volume. The same applyLatest serves the
  * batch query and the streaming twin (FactStream.cdcLatest maintains
  * the latestPerKey relation incrementally), so the two paths cannot
  * drift.
  */
object CdcMerge {

  /** Reduce a raw changelog (key, op, new_bal, ord, tie) to the latest
    * change per key under the (ord, tie) lexicographic order. */
  def latestPerKey(changes: DataFrame, key: String = "user_id",
                   ord: String = "ts_us", tie: String = "event_id"): DataFrame =
    changes.groupBy(col(key))
      .agg(expr(s"""max_by(named_struct('op', op, 'v', new_bal),
                           named_struct('t', $ord, 'e', $tie))""").as("last"))
      .select(col(key), col("last.op").as("op"), col("last.v").as("new_bal"))

  /** MERGE a latest-per-key changelog into a base snapshot
    * (key, bal): deletes drop, upserts replace-or-insert, untouched
    * base rows survive tagged 'kept'. */
  def applyLatest(base: DataFrame, latest: DataFrame,
                  key: String = "user_id"): DataFrame =
    base.join(latest, Seq(key), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col(key),
        round(when(col("op") === "U", col("new_bal")).otherwise(col("bal")), 6)
          .as("bal"),
        when(col("op").isNull, lit("kept"))
          .when(col("bal").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("action"))
}
