package graft.extract

import graft.model.Extracted

/** Real-container PDF extraction: `PdfContentParser` turns uncompressed
  * PDF bytes into positioned runs (PDF user space, y up), which flip
  * into the top-down run space and flow through the SHARED reading-order
  * core (`PdfIrExtractor.orderRuns`) — columns, (page, col, y, x) order,
  * spans. The pdfir stand-in path and this real-bytes path therefore
  * produce literally identical downstream shapes; only the front end
  * differs (ref: src/processing.py:55-84 — the reference's per-word
  * position stream, here derived from the text operators directly).
  */
object PdfContainerExtractor {

  def extract(pdfLatin1: String): Extracted =
    PdfContentParser.parse(pdfLatin1) match {
      case Left(failure) => Extracted("", Seq.empty, Some(failure))
      case Right(doc)    => order(doc)
    }

  /** Reading-order pass over an already-parsed container (lets callers
    * that also need page/run counts parse once). */
  def order(doc: PdfContentParser.PdfDoc): Extracted =
    if (doc.runs.isEmpty) Extracted("", Seq.empty, Some("pdf_empty"))
    else {
      val runs = doc.runs.map { r =>
        val h = doc.pageHeights.lift(r.page).getOrElse(792)
        PdfIrExtractor.Run(r.page, r.x, h - r.yPdf, r.text)
      }.toArray
      PdfIrExtractor.orderRuns(runs)
    }

  def extractBytes(pdf: Array[Byte]): Extracted =
    extract(new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1))
}
