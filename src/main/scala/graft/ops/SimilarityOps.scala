package graft.ops

import graft.text.TextAlgos
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (Array[Float] column).
  *
  * - bruteTopK: the exact baseline — broadcast the (small) query set,
  *   score every (query, vector) pair with a typed map, take top-k per
  *   query with a window. One scan of the corpus, no corpus-side shuffle
  *   except the final per-query top-k (k rows per query survive the
  *   partial TakeOrdered).
  * - lshTopK: the scale path — sign-bit hyperplane buckets; only same-
  *   bucket pairs are scored. Recall<1, cost ~ corpus/2^planes per query.
  *   (IVF with learned centroids would slot in the same shape: assign ->
  *   equi-join on cell id -> exact score.)
  */
object SimilarityOps {

  import RelationalOps.table

  val DefaultK = 3
  val NQueries = 8

  /** Exact brute-force cosine top-k. Output (query_id, neighbor_id, rank,
    * cosine_x10000), self-matches excluded, ties broken by neighbor id.
    *
    * Pure-DataFrame formulation: broadcast-nested-loop join of the tiny
    * query set against the corpus, scored by the codegen'd
    * `graft_cosine_x10000` expression (graft.functions.CosineX10000) —
    * the whole scan+score stage stays inside WholeStageCodegen with no
    * typed ser/de boundary, and the per-query top-k survives as a
    * partial WindowGroupLimit before the shuffle.
    */
  def bruteTopK(spark: SparkSession, dir: String, k: Int = DefaultK): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val vecs = table(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val queries = vecs
      .filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val scored = vecs
      .crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        expr("graft_cosine_x10000(q_embedding, embedding)").as("cosine_x10000"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_x10000").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine_x10000"))
  }

  /** LSH-bucketed ANN: score only vectors sharing the query's hyperplane
    * bucket. Same output shape as bruteTopK (rank within bucket).
    */
  def lshTopK(spark: SparkSession, dir: String, k: Int = DefaultK, nPlanes: Int = 6): DataFrame = {
    import spark.implicits._
    val vecs = table(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val queries = vecs.filter(_._1 < NQueries).collect()
      .map { case (id, v) => (id, v, TextAlgos.hyperplaneBucket(v, nPlanes)) }
    val scored = vecs.flatMap { case (id, v) =>
      val bucket = TextAlgos.hyperplaneBucket(v, nPlanes)
      queries.iterator
        .filter { case (qid, _, qb) => qid != id && qb == bucket }
        .map { case (qid, qv, _) => (qid, id, math.floor(TextAlgos.cosine(qv, v) * 10000).toLong) }
    }.toDF("query_id", "neighbor_id", "cosine_x10000")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_x10000").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine_x10000"))
  }
}
