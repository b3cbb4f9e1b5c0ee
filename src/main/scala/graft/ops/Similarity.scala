package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.util.Random

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`array<float>`).
  *
  * Scale design: the baseline is brute-force cosine against a BROADCAST query
  * set (query count ≪ corpus; corpus side streams, no shuffle of the corpus).
  * The scale path is random-hyperplane LSH bucketing: corpus and queries hash
  * to sign-pattern buckets, candidates meet only within a bucket (shuffle on
  * bucket key), multi-probe raises recall. Dot products run inside codegen'd
  * higher-order functions (`zip_with`/`aggregate`) — no UDF.
  */
object Similarity {

  /** Cosine similarity between two array<float|double> columns, in SQL
    * functions only (codegen-friendly).
    */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Brute-force cosine top-k: for each of the first `nQueries` vectors,
    * the k nearest OTHER vectors. Query side is broadcast.
    */
  def bruteTopK(embs: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val queries = embs.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .where(col("vec_id") < nQueries)
    val scored = embs.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "n_id", "rank", "score")
  }

  /** Deterministic random hyperplanes (seeded). */
  private def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rng = new Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-pattern bucket id of a vector under the hyperplane family. */
  def bucketOf(v: Array[Float], planes: Array[Array[Double]]): Int = {
    var bucket = 0
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      val plane = planes(p)
      var i = 0
      while (i < v.length && i < plane.length) { dot += v(i) * plane(i); i += 1 }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** LSH-bucketed ANN top-k: hyperplane sign buckets with multi-probe
    * (flip each single bit) on the query side; exact cosine within buckets.
    * Returns the same schema as bruteTopK; recall measured in tests.
    */
  def lshTopK(embs: DataFrame, nQueries: Int = 10, k: Int = 5,
              nPlanes: Int = 8, seed: Long = 42): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val dim = embs.select(size(col("embedding"))).first().getInt(0)
    val planes = hyperplanes(dim, nPlanes, seed)
    val bPlanes = spark.sparkContext.broadcast(planes)

    val bucketed = embs.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, bucketOf(v, bPlanes.value)) }
      .toDF("vec_id", "embedding", "bucket")

    // multi-probe query expansion: own bucket + all 1-bit flips
    val queryBuckets = bucketed.where(col("vec_id") < nQueries)
      .as[(Long, Array[Float], Int)]
      .flatMap { case (id, v, b) =>
        (b +: Array.tabulate(nPlanes)(i => b ^ (1 << i))).distinct
          .map(pb => (id, v, pb))
      }
      .toDF("q_id", "q_emb", "bucket")

    val scored = bucketed.join(queryBuckets, Seq("bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("score"))
      .groupBy("q_id", "n_id").agg(max("score").as("score")) // dedupe multi-probe hits
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "n_id", "rank", "score")
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets with 1-bit
    * multi-probe on one side (recall ≈ 1 for true near-dups: a miss needs
    * ≥2 of nPlanes hyperplanes to split a near-parallel pair). Exact cosine
    * verification inside buckets; threshold in per-mille.
    */
  def cosineNearDup(embs: DataFrame, minCosinePm: Int = 990,
                    nPlanes: Int = 10, seed: Long = 42): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val dim = embs.select(size(col("embedding"))).first().getInt(0)
    val bPlanes = spark.sparkContext.broadcast(hyperplanes(dim, nPlanes, seed))
    val bucketed = embs.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, bucketOf(v, bPlanes.value)) }
    val a = bucketed
      .flatMap { case (id, v, bkt) =>
        (bkt +: Array.tabulate(nPlanes)(i => bkt ^ (1 << i))).distinct
          .map(pb => (id, v, pb))
      }
      .toDF("a", "emb_a", "bucket")
    val b = bucketed.toDF("b", "emb_b", "bucket")
    a.join(b, Seq("bucket"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(first(col("emb_a")).as("emb_a"), first(col("emb_b")).as("emb_b"))
      .select(col("a"), col("b"), cosine(col("emb_a"), col("emb_b")).as("score"))
      .where(col("score") * 1000 >= minCosinePm)
      .select("a", "b", "score")
  }

  /** Deterministically perturbed copies of the first `n` vectors (planted
    * near-duplicates for recall measurement; ids offset by 1,000,000).
    */
  def perturbed(embs: DataFrame, n: Int, seed: Long = 7, noise: Float = 0.002f,
                idOffset: Long = 1000000L): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    embs.select(col("vec_id").cast("long"), col("embedding")).as[(Long, Array[Float])]
      .where(col("vec_id") < n)
      .map { case (id, v) =>
        val rng = new Random(seed + id)
        (id + idOffset, v.map(x => x + (rng.nextFloat() - 0.5f) * 2 * noise))
      }
      .toDF("vec_id", "embedding")
  }
}
