package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (O(Q×N) — fine when the
  * query side is small and broadcastable). The LSH (random hyperplane)
  * variant is the scale path: bucket both sides, equi-join on bucket, and
  * rerank candidates exactly — shuffle ∝ bucket collisions, not Q×N.
  *
  * All arithmetic is double-precision Column expressions folded in array
  * order, with cosine rounded to 6 decimals so results are reproducible
  * across engines (the DuckDB oracle mirrors the same math).
  */
object Similarity {

  private def d(c: Column): Column = transform(c, _.cast(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (s, v) => s + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(d(a), x => x * x), lit(0.0), (s, v) => s + v))

  /** Cosine similarity rounded to 6 decimals (cross-engine reproducible). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Exact top-k neighbors for each query vector (brute force; broadcast
    * the query side — it is the small side by construction). */
  def knn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cs").desc, col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cs", cosine(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cs"))
  }

  /** Random-hyperplane LSH bucket id over `planes` hyperplanes of `dims`
    * components, each component a deterministic ±1 drawn from md5 parity
    * of "plane_dim" — reproducible anywhere, no stored model. */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column = {
    val vd = d(vec)
    (0 until planes).map { j =>
      val dotJ = aggregate(sequence(lit(1), lit(dims)), lit(0.0),
        (acc, i) => acc + element_at(vd, i) *
          when(conv(substring(md5(concat(lit(s"${j}_"), i.cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2 === 0, lit(1.0)).otherwise(lit(-1.0)))
      when(dotJ >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Approximate top-k: candidates share an LSH bucket, then exact cosine
    * rerank. Recall < 1 by design; the win is the equi-join shape. */
  def annKnn(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 4, dims: Int = 64): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      lshBucket(col("embedding"), planes, dims).as("bucket")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      lshBucket(col("embedding"), planes, dims).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cs").desc, col("neighbor_id"))
    q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cs", cosine(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cs"))
  }
}
