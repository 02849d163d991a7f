package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic corpus with PLANTED line-break hyphenation for the
  * dehyphenation audit (q181) — the classic PDF/column text-extraction
  * cleanup: a word wrapped at a line end leaves "exam-\nple" in the
  * extracted stream and splits the token in two. Shapes (cycled by id):
  *  - 0: no hyphens at all
  *  - 1: one soft-wrapped word ("exam-\nple" -> "example")
  *  - 2: a legitimate inline compound ("re-use") that must SURVIVE
  *  - 3: soft wrap AND inline compound in one doc
  *  - 4: an uppercase acronym break ("USA-\nToday") that must NOT merge
  *       (the lowercase-lowercase rule leaves it)
  */
object HyphenDocs {

  def raw(id: Long): String = {
    val filler = s"doc $id body line "
    (id % 5) match {
      case 0 => filler + "plain words only"
      case 1 => filler + "an exam-\nple of wrapping"
      case 2 => filler + "we re-use the tooling"
      case 3 => filler + "hy-\nphen plus re-use inline"
      case _ => filler + "USA-\nToday stays split"
    }
  }

  /** Distributed raw table: (doc_id, text). */
  def docs(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    spark.range(nDocs).map(id => (id, raw(id))).toDF("doc_id", "text")
  }
}
