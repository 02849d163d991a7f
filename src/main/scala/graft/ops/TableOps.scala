package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML-table structured extraction as a DataFrame surface: the per-cell
  * frame (q133) and its normalization into header-keyed records (q134) —
  * the table analogue of `ShredOps`' record shredding (the reference's
  * core move: documents in, relational rows out, ref:
  * src/processing.py:55-148).
  */
object TableOps {

  /** Extracted per-cell frame over the planted table corpus: a narrow
    * per-doc flatMap of the streaming `HtmlTableExtractor` — zero
    * exchanges, zero joins (plan-asserted), linear scale-out.
    */
  def cells(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    graft.synth.TableDocs.docs(spark, nDocs)
      .as[(Long, String)]
      .flatMap { case (id, html) =>
        graft.extract.HtmlTableExtractor.extract(html).map(c =>
          (id, c.tableIdx.toLong, c.rowIdx.toLong, c.colIdx.toLong,
            c.header, c.text))
      }
      .toDF("doc_id", "table_idx", "row_idx", "col_idx", "is_header",
        "cell_text")
  }

  /** Extracted per-cell frame over the planted MARKDOWN pipe-table corpus
    * (q135): same narrow flatMap shape and same output schema as `cells`,
    * so both markup families feed `tableRecords` unchanged.
    */
  def mdCells(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    graft.synth.MdTableDocs.docs(spark, nDocs)
      .as[(Long, String)]
      .flatMap { case (id, md) =>
        graft.extract.MdTableExtractor.extract(md).map(c =>
          (id, c.tableIdx.toLong, c.rowIdx.toLong, c.colIdx.toLong,
            c.header, c.text))
      }
      .toDF("doc_id", "table_idx", "row_idx", "col_idx", "is_header",
        "cell_text")
  }

  /** Extracted per-link frame over the planted corpus (q136): (doc_id,
    * link_idx, href, anchor) in document order from the streaming
    * `HtmlLinkExtractor` — the outlink/anchor-text surface the host-graph
    * ops (q62/q85/q110/q113) consume once hrefs are host-normalized.
    * Same narrow flatMap shape: zero exchanges, zero joins.
    */
  def links(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    graft.synth.TableDocs.docs(spark, nDocs)
      .as[(Long, String)]
      .flatMap { case (id, html) =>
        graft.extract.HtmlLinkExtractor.extract(html).map(l =>
          (id, l.linkIdx.toLong, l.href, l.anchor))
      }
      .toDF("doc_id", "link_idx", "href", "anchor")
  }

  /** Extracted outline frame over the planted heading corpus (q137/q138):
    * (doc_id, section_idx, level, title, path) in document order from the
    * streaming `OutlineExtractor` — HTML h1-h6 and markdown ATX dispatched
    * per doc kind, breadcrumb paths from the per-doc level stack. Same
    * narrow flatMap shape: zero exchanges, zero joins; at 100 TB the
    * outline is recomputed per doc with no cross-doc state.
    */
  def sections(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    graft.synth.OutlineDocs.docs(spark, nDocs)
      .as[(Long, String, String)]
      .flatMap { case (id, kind, text) =>
        graft.extract.OutlineExtractor.extract(kind, text).map(s =>
          (id, s.sectionIdx.toLong, s.level.toLong, s.title, s.path))
      }
      .toDF("doc_id", "section_idx", "level", "title", "path")
  }

  /** Detected grid cells over the planted positioned-run corpus (q145):
    * the pdfir layout twin of `cells` — OCR word runs with coordinates in,
    * (page, table, row, col, text) out, via the streaming
    * `PdfGridExtractor`. Same narrow flatMap shape: zero exchanges, zero
    * joins, no cross-doc state.
    */
  def pdfGrids(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    graft.synth.PdfGridDocs.docs(spark, nDocs)
      .as[(Long, String)]
      .flatMap { case (id, ir) =>
        graft.extract.PdfGridExtractor.extract(ir).map(c =>
          (id, c.page.toLong, c.tableIdx.toLong, c.rowIdx.toLong,
            c.colIdx.toLong, c.text))
      }
      .toDF("doc_id", "page", "table_idx", "row_idx", "col_idx", "cell_text")
  }

  /** Markdown section bodies with breadcrumb provenance (q150): the
    * outline actually feeding section-scoped chunking — each markdown
    * section carries its breadcrumb path AND the verbatim body lines
    * under it (fence contents included, pre-first-heading preamble
    * dropped). RAG chunks keyed this way retrieve with "where in the
    * document" provenance for free. Same narrow flatMap: zero exchanges.
    */
  def mdSectionBodies(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    graft.synth.OutlineDocs.docs(spark, nDocs)
      .as[(Long, String, String)]
      .flatMap { case (id, kind, text) =>
        if (kind != "markdown") Seq.empty
        else graft.extract.OutlineExtractor.extractMdBodies(text).map(s =>
          (id, s.sectionIdx.toLong, s.path, s.body))
      }
      .toDF("doc_id", "section_idx", "path", "body")
  }

  /** Extracted markdown links over the planted outline corpus (q151):
    * same (doc_id, link_idx, href, anchor) shape as `links`, so the
    * anchor-signal family (q139/q148) consumes both markup families
    * unchanged. Zero exchanges, zero joins.
    */
  def mdLinks(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    graft.synth.OutlineDocs.docs(spark, nDocs)
      .as[(Long, String, String)]
      .flatMap { case (id, kind, text) =>
        if (kind != "markdown") Seq.empty
        else graft.extract.MdLinkExtractor.extract(text).map(l =>
          (id, l.linkIdx.toLong, l.href, l.anchor))
      }
      .toDF("doc_id", "link_idx", "href", "anchor")
  }

  /** Jitter-tolerant grid detection (q155): the q145 operator on the
    * OCR-noise corpus with x-banding at `PdfGridExtractor.JitterTol` —
    * exact-x matching finds NO tables there (every jittered row is a
    * distinct signature); the tolerance path must recover them all.
    */
  def pdfGridsJitter(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    graft.synth.PdfGridDocs.jitterDocs(spark, nDocs)
      .as[(Long, String)]
      .flatMap { case (id, ir) =>
        graft.extract.PdfGridExtractor
          .extract(ir, graft.extract.PdfGridExtractor.JitterTol).map(c =>
            (id, c.page.toLong, c.tableIdx.toLong, c.rowIdx.toLong,
              c.colIdx.toLong, c.text))
      }
      .toDF("doc_id", "page", "table_idx", "row_idx", "col_idx", "cell_text")
  }

  /** Tokens per section chunk for [[sectionChunks]] — corpus policy
    * (section bodies are small by construction; production passes its
    * own size).
    */
  val SectionChunkTokens = 12

  /** q161: section-scoped RAG chunks — each markdown section's body
    * split into fixed-token windows KEYED BY ITS BREADCRUMB, so every
    * chunk retrieves with where-in-the-document provenance (the q150
    * payoff; flat chunkers lose it). Chunks are built INSIDE the row
    * (`transform` over an index sequence + `slice`) and only then
    * exploded — collect_list order never enters, and the plan stays a
    * narrow flatMap + Generate with zero exchanges.
    */
  def sectionChunks(spark: SparkSession, nDocs: Long,
      chunkTokens: Int = SectionChunkTokens): DataFrame = {
    val k = chunkTokens
    mdSectionBodies(spark, nDocs)
      .withColumn("toks", filter(split(col("body"), "\\s+"), x => x =!= ""))
      .withColumn("chunks",
        when(size(col("toks")) === 0, array().cast("array<string>"))
          .otherwise(expr(
            s"transform(sequence(0, (size(toks) - 1) div $k), i -> array_join(slice(toks, i * $k + 1, $k), ' '))")))
      .select(col("doc_id"), col("section_idx"), col("path"),
        posexplode(col("chunks")))
      .select(col("doc_id"), col("section_idx"), col("path"),
        col("pos").cast("long").as("chunk_idx"), col("col").as("chunk_text"))
  }

  /** q146: normalize detected pdf grids into header-keyed records — the
    * q134 move applied to the layout family: row 0 of every grid is its
    * header (OCR tables carry no `<th>` marker; first-row-as-header is
    * the layout convention), data rows join it on (doc, page, table,
    * col). Same scale shape as `tableRecords`: a 4-key equi-join whose
    * build side is one header row per grid column.
    */
  def pdfGridRecords(grids: DataFrame): DataFrame = {
    val headers = grids
      .filter(col("row_idx") === 0L)
      .select(col("doc_id"), col("page"), col("table_idx"), col("col_idx"),
        col("cell_text").as("col_name"))
    grids
      .filter(col("row_idx") > 0L)
      .join(headers, Seq("doc_id", "page", "table_idx", "col_idx"))
      .select(col("doc_id"), col("page"), col("table_idx"), col("row_idx"),
        col("col_name"), col("cell_text").as("value"))
  }

  /** q134: normalize extracted cells into header-keyed records —
    * (doc_id, table_idx, row_idx, col_name, value), one row per data
    * cell of every table WITH a header row (headerless tables drop out
    * of the inner join by construction; they stay reachable as raw cells
    * via q133). The join is a plain 3-key equi-join whose build side is
    * the header subset — one header row per table column, a small
    * fraction of the cell volume — so at 100 TB it shuffles (doc, table,
    * col) keys and short strings only, no fan-out beyond the data cells
    * themselves.
    */
  def tableRecords(cells: DataFrame): DataFrame = {
    val headers = cells
      .filter(col("is_header") && col("row_idx") === 0L)
      .select(col("doc_id"), col("table_idx"), col("col_idx"),
        col("cell_text").as("col_name"))
    cells
      .filter(!col("is_header"))
      .join(headers, Seq("doc_id", "table_idx", "col_idx"))
      .select(col("doc_id"), col("table_idx"), col("row_idx"),
        col("col_name"), col("cell_text").as("value"))
  }
}
