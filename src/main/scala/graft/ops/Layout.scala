package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering so that
  * parquet min-max footer statistics prune files under predicates on SEVERAL
  * columns at once — the Delta `OPTIMIZE ZORDER BY` / Iceberg sort-order
  * story, and at 100 TB the difference between a full scan and touching a
  * few percent of files when queries filter on more than one dimension.
  *
  * Everything is EXACT integer arithmetic so the key is reproducible across
  * engines (the DuckDB oracle restates it verbatim):
  *  - bucket(v) = (v − min) · 2^bits ÷ (max − min + 1), truncating division
  *    over non-negative operands (== floor), from a one-row min/max stats
  *    pass (at corpus scale these come from table metadata);
  *  - zkey = bitwise interleave of the two bucket words, column 1 taking
  *    the odd (higher) bit positions.
  *
  * The KEY is fully deterministic; `clusterBy` then range-partitions on it
  * (RangePartitioner's reservoir sampling only moves FILE BOUNDARIES, never
  * key values) and sorts within partitions, which is what makes every
  * file's (c1, c2) min-max envelope tight. Overflow guard: (v − min) ≤
  * range and range · 2^bits must stay below 2^63 — with the default 16
  * bits that allows column ranges up to ~1.4·10^14.
  */
object Layout {

  /** Bitwise interleave of the low `bits` bits of two non-negative longs:
    * b1's bit i lands at position 2i+1, b2's at 2i. Pure column arithmetic
    * — whole-stage codegen, no UDF.
    */
  def interleaveBits(b1: Column, b2: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(b1, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftrightunsigned(b2, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Append a deterministic `zkey` column interleaving `c1` (odd bits) and
    * `c2` (even bits), each bucketized to `bits` bits against its exact
    * min/max from one stats pass over `df`.
    */
  def zorderKey(df: DataFrame, c1: String, c2: String, bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31] (got $bits)")
    val stats = df.agg(
      min(col(c1)).cast("long"), max(col(c1)).cast("long"),
      min(col(c2)).cast("long"), max(col(c2)).cast("long")).head()
    require(!stats.anyNull, s"$c1/$c2 must be non-null numeric columns")
    val (mn1, mx1, mn2, mx2) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3))
    val nb = 1L << bits
    // BigInt ranges: a Long subtraction here could itself overflow when a
    // column straddles the Long extremes, wrap negative, and slip past the
    // guard — producing silently wrong zkeys instead of a loud require.
    require((BigInt(mx1) - BigInt(mn1)) < BigInt(Long.MaxValue / nb) &&
            (BigInt(mx2) - BigInt(mn2)) < BigInt(Long.MaxValue / nb),
      s"column range too wide for $bits-bit bucketization")
    def bucket(c: String, mn: Long, mx: Long): Column =
      expr(s"((cast($c as bigint) - ${mn}L) * ${nb}L) div (${mx}L - ${mn}L + 1L)")
    df.withColumn("zkey",
      interleaveBits(bucket(c1, mn1, mx1), bucket(c2, mn2, mx2), bits))
  }

  /** Z-order-cluster `df` into `nFiles` range partitions of the zkey, sorted
    * within each — one exchange; writing the result gives every file a tight
    * (c1, c2) min-max envelope for footer-stats skipping on either column.
    */
  def clusterBy(df: DataFrame, c1: String, c2: String, nFiles: Int,
                bits: Int = 16): DataFrame = {
    require(nFiles >= 1, "nFiles >= 1")
    zorderKey(df, c1, c2, bits)
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
  }

  /** Per-file min/max envelopes of `cols` for a written parquet directory —
    * the footer statistics a scan's file-skipping consults, surfaced as a
    * table for layout diagnostics.
    */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fraction of files a `[lo, hi]` predicate on `c` can SKIP given their
    * min-max envelopes (the planner's file-pruning decision restated).
    */
  def prunedFraction(stats: DataFrame, c: String, lo: Long, hi: Long): Double = {
    val total = stats.count()
    require(total > 0, "no files")
    val touched = stats
      .where(col(s"max_$c") >= lo && col(s"min_$c") <= hi).count()
    (total - touched).toDouble / total.toDouble
  }
}
