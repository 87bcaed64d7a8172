package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.time <= left.time` within the same key.
  *
  * Implementation is the union+window merge, NOT a join: both sides are
  * tagged and unioned, then one window per key ordered by (time, side)
  * carries the right side's values forward with `last(_, ignoreNulls)`.
  * This costs a single shuffle on the key — no join explosion, no
  * per-row probe — and scales to arbitrarily skewed key/time
  * distributions (the window is a linear scan per key partition).
  * Spark has no native as-of join; this is the standard scale pattern
  * (cf. DuckDB's ASOF JOIN operator, which we use as the oracle).
  */
object AsOfJoin {
  /** @param right must share `key` + `timeCol` names with `left` and
    *              carry `valueCols` (+ `tieBreak`); `valueCols` get
    *              prefixed `asof_` in the output.
    * @param tolerance max staleness (same unit as `timeCol`): a match
    *              older than `left.time - tolerance` is nulled out
    *              (pandas merge_asof tolerance semantics — the left
    *              row survives with NULL asof values). None = match at
    *              any age. Tolerance costs nothing extra: the matched
    *              right TIME rides the same window carry. */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String,
               timeCol: String, valueCols: Seq[String],
               tieBreak: String, tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(Long.MaxValue))
    // __tie is computed BEFORE any drop/rename so tieBreak may itself be
    // one of the value columns (it then survives as asof_<tieBreak>).
    val base = right.select((Seq(col(key), col(timeCol)) ++
        (valueCols :+ tieBreak).distinct.map(col)): _*)
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(tieBreak).cast("long"))
      .withColumn("__rt", col(timeCol))
    val taggedRight = valueCols.foldLeft(
      if (valueCols.contains(tieBreak)) base else base.drop(tieBreak)
    ) { (df, c) => df.withColumnRenamed(c, s"asof_$c") }
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    // Right rows at the same timestamp sort before left rows (side 0 < 1),
    // giving inclusive <= semantics; __tie makes equal-time right rows
    // deterministic.
    val w = Window.partitionBy(col(key))
      .orderBy(col(timeCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried0 = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    val carried = tolerance match {
      case None => carried0
      case Some(tol) =>
        val fresh = col(timeCol) - last(col("__rt"), ignoreNulls = true).over(w) <= tol
        valueCols.foldLeft(carried0) { (df, c) =>
          df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c")))
        }
    }
    carried.filter(col("__side") === 1)
      .select((leftCols ++ valueCols.map(c => s"asof_$c")).map(col): _*)
  }
}
