package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded time-range join: pair left rows with right rows whose time is
  * within `±radius` of the left time, without a cross product.
  *
  * Both sides are bucketed to `radius`-wide bands; the left side
  * explodes to its bucket ±1 and the join runs equi on (key?, bucket),
  * then the exact |dt| <= radius filter applies. Worst-case work is
  * O(rows_per_band²) per band instead of O(n²) — the standard
  * distributed interval-join pattern (Spark's optimizer can't do this
  * rewrite itself; a raw inequality join degenerates to
  * BroadcastNestedLoopJoin at scale).
  */
object RangeJoin {
  /** @param leftTime/rightTime long columns (e.g. epoch nanos) */
  def within(left: DataFrame, right: DataFrame,
             leftTime: String, rightTime: String, radius: Long): DataFrame = {
    val l = left.withColumn("__bucket",
      explode(array(
        (col(leftTime) / radius).cast("long") - 1,
        (col(leftTime) / radius).cast("long"),
        (col(leftTime) / radius).cast("long") + 1)))
    val r = right.withColumn("__bucket", (col(rightTime) / radius).cast("long"))
    l.join(r, Seq("__bucket"))
      .filter(abs(col(leftTime) - col(rightTime)) <= radius)
      .drop("__bucket")
  }
}
