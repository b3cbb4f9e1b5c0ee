package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Temporary stage-level profiler for the dedup ops (not part of the driver
  * contract; used to localize bench time).
  */
object OpsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val sh = Dedup.shingles(docs, 3).cache()
      time("shingles count")(sh.count())
      val sigAgg = udaf(new Dedup.MinHashSigAgg(64), org.apache.spark.sql.Encoders.scalaLong)
      val sigs = sh.groupBy("doc_id").agg(sigAgg(col("shingle")).as("sig"))
      time("minhash sigs (udaf)")(sigs.count())
      val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      time("counts")(counts.count())
      val posting = sh.groupBy("shingle").agg(collect_set(col("doc_id")).as("ds"))
        .where(size(col("ds")).between(2, 1000))
      time("posting lists")(posting.count())
      val pairStream = posting.select(col("ds")).as[Seq[Long]]
        .flatMap { ds =>
          val sorted = ds.sorted
          for (i <- sorted.indices.iterator; j <- (i + 1) until sorted.length)
            yield (sorted(i), sorted(j))
        }
      time("pair stream size")(println("  raw pairs=" + pairStream.count()))
      val mhBuckets = sigs.as[(Long, Array[Long])]
        .flatMap { case (doc, sig) =>
          (0 until 16).iterator.map { b =>
            (b, scala.util.hashing.MurmurHash3.arrayHash(sig.slice(b * 4, (b + 1) * 4)), doc)
          }
        }.toDF("band", "bucket", "doc_id")
      val mhCands = mhBuckets.groupBy("band", "bucket")
        .agg(collect_set(col("doc_id")).as("ds")).where(size(col("ds")) >= 2)
        .select(col("ds")).as[Seq[Long]]
        .flatMap { ds =>
          val sorted = ds.sorted
          for (i <- sorted.indices.iterator; j <- (i + 1) until sorted.length)
            yield (sorted(i), sorted(j))
        }.toDF("a", "b").distinct()
      time("minhash candidates")(println("  mh cands=" + mhCands.count()))
      time("full ngram")(Dedup.ngramJaccardPairs(docs, 3, 200).count())
      time("full minhash")(Dedup.minHashNearDup(docs, 3, minJaccardPm = 200).count())
      sh.unpersist()
    }
    spark.stop()
  }
}
