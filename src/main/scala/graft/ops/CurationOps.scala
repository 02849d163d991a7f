package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline — the operators of this
  * library chained the way a 100 TB corpus run would chain them, in ONE
  * DataFrame plan (one scan of `documents`, no intermediate
  * materialization):
  *
  *   quality gate (q15 semantics) → language ID (q16 semantics) →
  *   exact-dedup keep-set (q20: min doc_id per sha256) →
  *   per-language class balancing (q37: deterministic undersample)
  *
  * Output: the curated (doc_id, predicted_lang) keep-list.
  *
  * Scale shape: one full-column scan; the dedup window shuffles
  * (content_hash, doc_id, predicted_lang) only — 32-byte hashes, not
  * text; the class counts and the min-count bound are tiny broadcasts.
  */
object CurationOps {

  import RelationalOps.table

  def curate(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      // quality metrics (identical expressions to TextOps.qualityScore)
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("mean_wordlen_x100",
        floor(length(regexp_replace(col("text"), "\\s", "")) * 100.0 / col("n_tokens")).cast("long"))
      // language scores (identical to TextOps.langId)
      .withColumn("score_en", size(regexp_extract_all(col("text"), lit("\\b(the|and|of|to|in|is|that|for)\\b"), lit(0))).cast("long"))
      .withColumn("score_fr", size(regexp_extract_all(col("text"), lit("\\b(le|la|les|et|de|un|une|est)\\b"), lit(0))).cast("long"))
      .withColumn("score_es", size(regexp_extract_all(col("text"), lit("\\b(el|la|los|las|y|de|que|es)\\b"), lit(0))).cast("long"))
      .withColumn("score_de", size(regexp_extract_all(col("text"), lit("\\b(der|die|das|und|ist|von|zu|mit)\\b"), lit(0))).cast("long"))
      .withColumn("best_score", greatest(lit(0L), col("score_en"), col("score_fr"), col("score_es"), col("score_de")))
      .withColumn("predicted_lang",
        when(col("score_en") === col("best_score") && col("best_score") > 0, "en")
          .when(col("score_fr") === col("best_score") && col("best_score") > 0, "fr")
          .when(col("score_es") === col("best_score") && col("best_score") > 0, "es")
          .when(col("score_de") === col("best_score") && col("best_score") > 0, "de")
          .otherwise("unknown"))
      .withColumn("content_hash", sha2(col("text"), 256))

    val good = docs.filter(
      col("n_tokens").between(10L, 100000L) &&
        col("mean_wordlen_x100").between(150L, 1200L))

    // exact-dedup keep-set among quality survivors: min doc_id per hash
    val canonical = good
      .withColumn("canon", min(col("doc_id")).over(Window.partitionBy(col("content_hash"))))
      .filter(col("doc_id") === col("canon"))
      .select(col("doc_id"), col("predicted_lang"))

    // deterministic per-language balancing to the min class size
    val minCnt = canonical.groupBy(col("predicted_lang")).agg(count(lit(1)).as("cnt"))
      .agg(min(col("cnt")).as("min_cnt"))
    canonical
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("predicted_lang")).orderBy(col("doc_id"))))
      .crossJoin(broadcast(minCnt))
      .filter(col("rn") <= col("min_cnt"))
      .select(col("doc_id"), col("predicted_lang"))
  }
}
