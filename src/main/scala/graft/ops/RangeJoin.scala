package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join WITHOUT an equality key — the case where a
  * naive plan degenerates to a broadcast-nested-loop over every
  * (point, interval) pair. Binning restores an equi-join: intervals explode
  * to the fixed-width bins they cover, each point hashes to its single bin,
  * and the pair meets on the bin key before an exact containment filter.
  *
  * Scale properties: the shuffle is bin-keyed (time-uniform data spreads
  * evenly; a hot bin is an AQE skew-split case), interval replication is
  * ceil(len / binWidth) + 1 rows, and each qualifying (point, interval) pair
  * meets in EXACTLY one bin — the point's own — so no post-join distinct is
  * needed. Choose binWidth near the typical interval length: wider bins cut
  * replication but widen each bin's candidate set.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bins = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val pts = points.withColumn("__bin",
      floor(col(ptCol) / binWidth).cast("long"))
    pts.join(bins, Seq("__bin"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }
}
