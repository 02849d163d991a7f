package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline — the operators of this
  * library chained the way a 100 TB corpus run would chain them, in ONE
  * DataFrame plan (one scan of `documents`, no intermediate
  * materialization):
  *
  *   quality gate (the q15 builder) → language ID (the q16 builder) →
  *   drop undetected-language docs → exact-dedup keep-set (q20: min
  *   doc_id per sha256) → per-language class balancing (q37 semantics:
  *   deterministic undersample to the min REAL-language class size —
  *   'unknown' is dropped, not balanced against, so a tiny unknown
  *   bucket cannot decimate the keep-list).
  *
  * Column semantics are shared with the standalone queries via
  * `TextOps.withQualityColumns` / `TextOps.withPredictedLang` — one
  * definition, no copy-paste drift.
  *
  * Output: the curated (doc_id, predicted_lang) keep-list.
  *
  * Scale shape: one full-column scan; the dedup window shuffles
  * (content_hash, doc_id, predicted_lang) only — 32-byte hashes, not
  * text. The final balancing window partitions by predicted_lang (≤4
  * groups), which funnels the keep-set through ≤4 tasks; that is
  * acceptable because its input is the post-dedup projection at ~20
  * bytes/row, but for corpora where even that is too much, swap the
  * exact first-k-by-doc_id rule for hash-threshold sampling (no global
  * order, fully parallel) — kept exact here for oracle verifiability.
  */
object CurationOps {

  import RelationalOps.table

  def curate(spark: SparkSession, dir: String): DataFrame = {
    val docs = TextOps.withPredictedLang(
      TextOps.withQualityColumns(table(spark, dir, "documents")))
      .withColumn("content_hash", sha2(col("text"), 256))

    val good = docs.filter(col("quality_pass") && col("predicted_lang") =!= "unknown")

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
