package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic corpus of PLANTED normalization twins for q186: docs
  * 2i and 2i+1 render the SAME content, but the odd twin arrives NFD-
  * decomposed, line-wrap-hyphenated, and with a stray control byte —
  * so RAW exact-dedup sees two distinct texts, and only the normalize
  * chain (NFC -> dehyphenate -> control-strip) collapses them. The
  * demonstration every ingest pipeline needs: normalization is not
  * cosmetics, it is what makes content-hash dedup actually fire.
  */
object NormPairDocs {

  def raw(id: Long): String = {
    val pair = id / 2
    val head = s"norm pair $pair shared body "
    if (id % 2 == 0) head + "caf\u00e9 example end"
    else head + "cafe\u0301 exam-\nple end\u0007"
  }

  /** Distributed raw table: (doc_id, text). */
  def docs(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    spark.range(nDocs).map(id => (id, raw(id))).toDF("doc_id", "text")
  }
}
