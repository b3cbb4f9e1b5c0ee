package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Scratch stage-timing probe for the phash near-dup family (like
  * [[OpsProbe]] for the text dedup family): asset counts, hash pass,
  * banding volume, and end-to-end cost at r = 1 vs r = 3 on the bench
  * corpus — the numbers behind the BENCH.md phash notes.
  * Usage: runMain graft.PhashProbe [sf]
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val corpus = graft.corpus.Corpus.ensure(spark, sf)
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val media = Multimodal.fromCorpus(spark, corpus)
      val all = media.union(Multimodal.perturbedAssets(media))
      time("asset scan count")(println("  assets=" + all.count()))
      time("asset bytes")(println("  bytes=" +
        all.map(_.content.length.toLong).toDF("n").agg(sum(col("n"))).head().getLong(0)))
      val hashed = all.map(m => (m.media_ref, Multimodal.phash64(m.content)))
        .toDF("ref", "ph").groupBy("ref").agg(min(col("ph")).as("ph"))
      time("hash+dedup pass")(println("  refs=" + hashed.count()))
      time("phashNearDup r=1")(println("  pairs=" +
        Multimodal.phashNearDup(all, maxHamming = 6).count()))
      time("phashNearDup r=3")(println("  pairs=" +
        Multimodal.phashNearDup(all, maxHamming = 6, bandsPerKey = 3).count()))
    }
    spark.stop()
  }
}
