package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic corpus with PLANTED Unicode-normalization
  * shapes for the NFC audit (q172) — the ingest-hygiene step between
  * q142's encoding-damage audit (bytes that decode wrong) and tokenizing:
  * the SAME visible text can arrive precomposed (NFC "é" U+00E9) or
  * decomposed (NFD "e" + U+0301), and a pipeline that does not normalize
  * splits its vocabulary/dedup keys across the two forms. Control
  * characters ride along so one pass covers strip + normalize.
  *
  * Five residue-class shapes (the body after the per-doc filler):
  *  - id % 5 == 0 → pure ASCII (already NFC, nothing to strip)
  *  - id % 5 == 1 → precomposed accents (already NFC)
  *  - id % 5 == 2 → the SAME words in NFD combining form (not NFC)
  *  - id % 5 == 3 → ASCII with control chars U+0007 and TAB
  *  - id % 5 == 4 → NFD umlaut/acute plus one control char
  *
  * Only BMP codepoints with stable NFC behavior across Unicode versions
  * (Latin-1 accents), so JDK Normalizer and DuckDB nfc_normalize agree.
  */
object NfcDocs {

  def raw(id: Long): String = {
    val filler = s"doc $id plain body "
    (id % 5) match {
      case 0 => filler + "all clear ascii"
      case 1 => filler + "caf\u00e9 r\u00e9sum\u00e9"
      case 2 => filler + "cafe\u0301 re\u0301sume\u0301"
      case 3 => filler + "bell\u0007and tab\tend"
      case _ => filler + "u\u0308ber e\u0301mix\u0007"
    }
  }

  /** Distributed raw table: (doc_id, raw). */
  def docs(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    spark.range(nDocs).map(id => (id, raw(id))).toDF("doc_id", "raw")
  }
}
