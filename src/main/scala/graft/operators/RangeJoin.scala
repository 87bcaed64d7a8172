package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  /** Exact integer floor-division bucketing: `t/radius` in DOUBLE loses
    * up to ~256ns above 2^53 (epoch-nano timestamps), which silently
    * shifts a bucket past the ±1 explode and drops matching pairs.
    * `(t - pmod(t, r)) div r` stays in long arithmetic and floors
    * correctly for negative times too. */
  private def bucketOf(time: String, radius: Long): Column =
    expr(s"($time - pmod($time, ${radius}L)) div ${radius}L")

  /** @param leftTime/rightTime long columns (e.g. epoch nanos)
    * @param salts >1 splinters each band into sub-buckets — the hot-band
    *        guard: one busy minute of events otherwise lands every row
    *        of both sides in a single reducer. Right rows hash into a
    *        sub-bucket; left rows replicate across all of them, so the
    *        result is identical and the hot band spreads over `salts`
    *        reducers (on top of AQE's skew-join splitting). */
  def within(left: DataFrame, right: DataFrame,
             leftTime: String, rightTime: String, radius: Long,
             salts: Int = 1): DataFrame = {
    val lb = bucketOf(leftTime, radius)
    val l0 = left.withColumn("__bucket", explode(array(lb - 1, lb, lb + 1)))
    val r0 = right.withColumn("__bucket", bucketOf(rightTime, radius))
    val (l, r, keys) =
      if (salts <= 1) (l0, r0, Seq("__bucket"))
      else (
        l0.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1)))),
        r0.withColumn("__salt", pmod(xxhash64(col(rightTime)), lit(salts)).cast("int")),
        Seq("__bucket", "__salt"))
    l.join(r, keys)
      .filter(abs(col(leftTime) - col(rightTime)) <= radius)
      .drop(keys: _*)
  }
}
