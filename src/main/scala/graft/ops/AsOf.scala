package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — for each left row, the latest right row with the
  * same key and right timestamp <= left timestamp (the temporal-join
  * primitive Spark lacks natively; DuckDB's `ASOF JOIN` is the oracle).
  *
  * Shape chosen for scale: tag both sides, union, and carry the most recent
  * right payload forward with `last(ignoreNulls)` over a per-key window
  * ordered by (ts, side) — ONE hash shuffle on the key, a per-partition
  * sort, no range explosion and no per-row right-side probes. The
  * equality-keyed window means a billion-key corpus spreads evenly; a
  * single pathological hot key is the same skew case as any keyed window
  * (pre-split by time range if one key dominates).
  */
object AsOf {

  /** Left rows plus an `asof` struct of `payload` columns from the matched
    * right row (null when no right row precedes). Ties: a right row whose ts
    * EQUALS the left ts matches (sorted before the left row); right rows must
    * be unique per (key, ts) for a deterministic result — pre-aggregate the
    * right side if they are not.
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    val pSchema = StructType(right.select(payload.map(col): _*).schema.fields)
    val lSchema = StructType(left.schema.fields)
    val lU = left.select(
      col(key).as("__key"), col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(pSchema).as("__p"),
      struct(left.columns.map(col): _*).as("__row"))
    val rU = right.select(
      col(key).as("__key"), col(rightTs).as("__ts"), lit(0).as("__side"),
      struct(payload.map(col): _*).as("__p"),
      lit(null).cast(lSchema).as("__row"))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rU)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.map(c => col(s"__row.$c").as(c)) :+
        col("__asof").as("asof"): _*)
  }
}
