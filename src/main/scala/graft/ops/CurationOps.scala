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

  /** The funnel AUDIT of the q40 chain (q176): per-stage doc and token
    * counts plus exact integer retention vs raw — the accounting table a
    * 100 TB curation run publishes next to its keep-list (how much each
    * gate costs is a first-class output, not a log line). Stages share
    * the q40 builders, so the funnel can never drift from the keep-list
    * it audits: 1_raw -> 2_quality (q15 bounds) -> 3_lang (known
    * language) -> 4_dedup (exact canon among survivors) -> 5_balanced
    * (per-language undersample to the min class).
    *
    * Scale shape: ONE corpus scan fans into per-row stage flags; the
    * only exchanges are the q40 chain's own (32-byte hash window,
    * per-lang rank over the post-dedup projection); the final rollup is
    * a single-row aggregate exploded into 5 stage rows.
    */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = TextOps.withPredictedLang(
      TextOps.withQualityColumns(table(spark, dir, "documents")))
      .withColumn("content_hash", sha2(col("text"), 256))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("quality_pass"), col("predicted_lang"), col("content_hash"))
      .withColumn("lang_ok", col("quality_pass") && col("predicted_lang") =!= "unknown")
    val flagged = docs
      .withColumn("canon_id",
        min(when(col("lang_ok"), col("doc_id")))
          .over(Window.partitionBy(col("content_hash"))))
      .withColumn("is_canon", col("lang_ok") && col("doc_id") === col("canon_id"))
    val minCnt = flagged.filter(col("is_canon"))
      .groupBy(col("predicted_lang")).agg(count(lit(1)).as("cnt"))
      .agg(min(col("cnt")).as("min_cnt"))
    val ranked = flagged
      .withColumn("rn",
        row_number().over(Window
          .partitionBy(col("predicted_lang"), col("is_canon"))
          .orderBy(col("doc_id"))))
      .crossJoin(broadcast(minCnt))
      .withColumn("is_balanced", col("is_canon") && col("rn") <= col("min_cnt"))
    def stage(flag: org.apache.spark.sql.Column) = (
      sum(when(flag, 1L).otherwise(0L)),
      sum(when(flag, col("n_tokens")).otherwise(0L)))
    val (d2, t2) = stage(col("quality_pass"))
    val (d3, t3) = stage(col("lang_ok"))
    val (d4, t4) = stage(col("is_canon"))
    val (d5, t5) = stage(col("is_balanced"))
    ranked
      .agg(
        count(lit(1)).as("nd1"), coalesce(sum(col("n_tokens")), lit(0L)).as("nt1"),
        d2.as("nd2"), t2.as("nt2"), d3.as("nd3"), t3.as("nt3"),
        d4.as("nd4"), t4.as("nt4"), d5.as("nd5"), t5.as("nt5"))
      .select(explode(array(
        struct(lit("1_raw").as("stage"), col("nd1").as("n_docs"), col("nt1").as("n_tokens")),
        struct(lit("2_quality").as("stage"), col("nd2").as("n_docs"), col("nt2").as("n_tokens")),
        struct(lit("3_lang").as("stage"), col("nd3").as("n_docs"), col("nt3").as("n_tokens")),
        struct(lit("4_dedup").as("stage"), col("nd4").as("n_docs"), col("nt4").as("n_tokens")),
        struct(lit("5_balanced").as("stage"), col("nd5").as("n_docs"), col("nt5").as("n_tokens"))))
        .as("s"), col("nd1"))
      .select(col("s.stage").as("stage"), col("s.n_docs").as("n_docs"),
        col("s.n_tokens").as("n_tokens"),
        expr("(s.n_docs * 10000) div nd1").as("retained_x10000"))
  }
}
