package graft.extract

import graft.model.{Extracted, Span}
import scala.collection.mutable

/** Positioned-run PDF-IR extractor.
  *
  * Input is our stand-in for the reference's OCR word stream — one
  * positioned text run per line, `p<page> <x> <y> "<run text>"`, mirroring
  * the per-word `(content, confidence)` stream the reference reads from
  * Azure prebuilt-read (ref: src/processing.py:55-84; the reference joins
  * words as `"{content} (Confidence: {conf:.2f})\n"`, processing.py:82).
  *
  * Reconstruction: per page, x-gap clustering splits runs into columns,
  * then reading order is (page asc, column asc, y asc, x asc); runs become
  * lines joined with '\n' (W2 in SURVEY.md §2.5 — THE core ordering
  * invariant). Optional ` (Confidence: 0.97)` word annotations are
  * stripped. Any malformed run line fails the whole turn with a `failure`
  * class, never an exception (swallow-and-continue,
  * agents/sql_agent/utils.py:113-118).
  */
object PdfIrExtractor {

  private final case class Run(page: Int, x: Int, y: Int, text: String)

  /** Minimum horizontal gap between x-clusters to declare two columns. */
  val ColumnGap = 200

  private val confidencePattern = """ \(Confidence: \d\.\d\d\)""".r

  def extract(input: String): Extracted = {
    val runs = mutable.ArrayBuffer.empty[Run]
    val lines = input.split('\n')
    var li = 0
    while (li < lines.length) {
      val line = lines(li)
      if (line.nonEmpty) {
        parseRun(line) match {
          case Some(r) => runs += r
          case None    => return Extracted("", Seq.empty, Some("pdfir_parse"))
        }
      }
      li += 1
    }
    if (runs.isEmpty) return Extracted("", Seq.empty, Some("pdfir_empty"))

    // per-page column split by largest x-gap (two-column detection)
    val byPage = runs.groupBy(_.page)
    val ordered = byPage.keys.toSeq.sorted.flatMap { p =>
      val rs = byPage(p)
      val xs = rs.map(_.x).distinct.sorted
      // find the largest gap between consecutive distinct x positions;
      // declare a column boundary only if it exceeds ColumnGap
      var split = Int.MaxValue
      if (xs.length >= 2) {
        var bestGap = 0; var bestAt = Int.MaxValue
        var i = 1
        while (i < xs.length) {
          val gap = xs(i) - xs(i - 1)
          if (gap > bestGap) { bestGap = gap; bestAt = xs(i) }
          i += 1
        }
        if (bestGap >= ColumnGap) split = bestAt
      }
      rs.map(r => (if (r.x >= split) 1 else 0, r))
        .sortBy { case (col, r) => (col, r.y, r.x) }
        .map(_._2)
    }

    val out = new StringBuilder
    val spans = mutable.ArrayBuffer.empty[Span]
    ordered.foreach { r =>
      if (out.nonEmpty) out.append('\n')
      val s = out.length
      out.append(confidencePattern.replaceAllIn(r.text, ""))
      spans += Span("line", s, out.length)
    }
    Extracted(out.toString, spans.toSeq, None)
  }

  /** Parse `p<page> <x> <y> "<text>"`; None on any malformation. */
  private def parseRun(line: String): Option[Run] = {
    if (line.length < 8 || line.charAt(0) != 'p') return None
    var i = 1
    def readInt(): Int = {
      val start = i
      while (i < line.length && line.charAt(i).isDigit) i += 1
      if (i == start) return -1
      line.substring(start, i).toInt
    }
    val page = readInt(); if (page < 0) return None
    if (i >= line.length || line.charAt(i) != ' ') return None
    i += 1
    val x = readInt(); if (x < 0) return None
    if (i >= line.length || line.charAt(i) != ' ') return None
    i += 1
    val y = readInt(); if (y < 0) return None
    if (i >= line.length || line.charAt(i) != ' ') return None
    i += 1
    if (i >= line.length || line.charAt(i) != '"') return None
    if (line.charAt(line.length - 1) != '"' || line.length - 1 <= i) return None
    Some(Run(page, x, y, line.substring(i + 1, line.length - 1)))
  }
}
