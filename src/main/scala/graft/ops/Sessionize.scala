package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts whenever the gap to the
  * key's previous event exceeds `gapUs`. The classic two-window pattern —
  * `lag` for the gap, then a running `sum` of new-session flags — over the
  * SAME (key, order) window, so Catalyst plans ONE exchange + one sort and
  * evaluates both window functions in a single `Window` operator. Scale:
  * equality-keyed window, partitions spread by key cardinality; per-key
  * event counts are the only skew axis (same story as any keyed window).
  */
object Sessionize {

  /** Adds `session_no` (1-based per key, in (ts, order) order). */
  def byGap(events: DataFrame, key: String, tsUs: String, order: String,
            gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsUs), col(order))
    val gap = col(tsUs) - lag(col(tsUs), 1).over(w)
    events
      .withColumn("__new_session",
        when(gap.isNull || gap > gapUs, 1L).otherwise(0L))
      .withColumn("session_no",
        sum(col("__new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }
}
