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

  /** J4/F16: L2-nearest-neighbor with an accept threshold — the
    * reference's match semantics (best match by Euclidean distance,
    * accepted iff distance <= threshold,
    * ref: src/signature_module/signature_module_main.py:96-110). One
    * corpus scan, broadcast query set, per-query argmin via min_by with
    * a deterministic tiebreak.
    */
  def l2NearestAccept(spark: SparkSession, dir: String, thresholdX10000: Long = 11000L): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val vecs = table(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val queries = vecs
      .filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    vecs
      .crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"), col("vec_id"),
        expr("graft_l2_x10000(q_embedding, embedding)").as("l2_x10000"))
      .groupBy(col("query_id"))
      .agg(
        min_by(col("vec_id"), struct(col("l2_x10000"), col("vec_id"))).as("best_id"),
        min(col("l2_x10000")).as("min_l2_x10000"))
      .withColumn("accepted", col("min_l2_x10000") <= thresholdX10000)
  }

  /** LSH-bucketed ANN: score only vectors sharing the query's hyperplane
    * bucket. Same output shape as bruteTopK (rank within bucket).
    *
    * Pure-DataFrame formulation like bruteTopK — no driver-side collect
    * of the query vectors: buckets come from one narrow typed pass, the
    * (tiny) bucketed query set is broadcast, the bucket equi-join prunes
    * the candidate space to ~corpus/2^planes per query, and scoring is
    * the codegen'd `graft_cosine_x10000` expression.
    */
  def lshTopK(spark: SparkSession, dir: String, k: Int = DefaultK, nPlanes: Int = 6): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val bucketed = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        expr(s"graft_hyperplane_bucket(embedding, $nPlanes)").as("bucket"))
    val queries = bucketed
      .filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"), col("bucket"))
    val scored = bucketed
      .join(broadcast(queries), Seq("bucket"))
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
}
