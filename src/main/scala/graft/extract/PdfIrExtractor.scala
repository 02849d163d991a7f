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

  private[extract] final case class Run(page: Int, x: Int, y: Int, text: String)

  /** Minimum horizontal gap between x-clusters to declare two columns. */
  val ColumnGap = 200

  /** Hand-rolled ` \(Confidence: \d\.\d\d\)` strip — the per-run regex
    * replaceAllIn (matcher + buffer per OCR run) was the pdfir path's
    * hottest allocation site. Exact same matches: the literal prefix,
    * then digit '.' digit digit ')'.
    */
  private val ConfPrefix = " (Confidence: "
  private[extract] def stripConfidence(s: String): String = {
    var from = s.indexOf(ConfPrefix)
    if (from < 0) return s
    // java.lang.StringBuilder: the scala one has no (CharSequence, from,
    // until) overload and would auto-tuple the 3-arg append
    val out = new java.lang.StringBuilder(s.length)
    var copied = 0
    while (from >= 0) {
      // regex \d is ASCII [0-9] only — NOT Character.isDigit (Unicode)
      @inline def dig(c: Char) = c >= '0' && c <= '9'
      val d = from + ConfPrefix.length
      val isMatch = d + 4 < s.length &&
        dig(s.charAt(d)) && s.charAt(d + 1) == '.' &&
        dig(s.charAt(d + 2)) && dig(s.charAt(d + 3)) &&
        s.charAt(d + 4) == ')'
      if (isMatch) {
        out.append(s, copied, from)
        copied = d + 5
        from = s.indexOf(ConfPrefix, copied)
      } else {
        from = s.indexOf(ConfPrefix, from + 1)
      }
    }
    out.append(s, copied, s.length)
    out.toString
  }

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
    orderRuns(runs.toArray)
  }

  /** Reading-order reconstruction over positioned runs — THE shared core
    * of the pdfir stand-in path above and the real-container path
    * (`PdfContainerExtractor`): per-page column split by largest x-gap,
    * then (page, column, y, x) order, confidence annotations stripped,
    * one `line` span per run. Callers guarantee `runs` nonempty.
    */
  private[extract] def orderRuns(runsIn: Array[Run]): Extracted = {
    // per-page column split by largest x-gap (two-column detection).
    // Array-based two-sort pipeline (was groupBy + per-page tuple
    // sortBy — the collection/boxing churn dominated the pdfir path):
    // sort by (page, x) once to find each page's largest gap between
    // consecutive DISTINCT x positions, then assign columns and sort by
    // (page, col, y, x).
    val arr = runsIn.clone()
    java.util.Arrays.sort(arr, (a: Run, b: Run) =>
      if (a.page != b.page) Integer.compare(a.page, b.page)
      else Integer.compare(a.x, b.x))
    // per-page split x (runs at x >= split are column 1)
    val splitByPage = new java.util.HashMap[Int, Int]()
    var s0 = 0
    while (s0 < arr.length) {
      val p = arr(s0).page
      var e = s0 + 1
      while (e < arr.length && arr(e).page == p) e += 1
      var bestGap = 0; var bestAt = Int.MaxValue
      var i = s0 + 1
      while (i < e) {
        val gap = arr(i).x - arr(i - 1).x // 0 between equal xs: harmless
        if (gap > bestGap) { bestGap = gap; bestAt = arr(i).x }
        i += 1
      }
      splitByPage.put(p, if (bestGap >= ColumnGap) bestAt else Int.MaxValue)
      s0 = e
    }
    def colOf(r: Run): Int = if (r.x >= splitByPage.get(r.page)) 1 else 0
    java.util.Arrays.sort(arr, (a: Run, b: Run) =>
      if (a.page != b.page) Integer.compare(a.page, b.page)
      else {
        val ca = colOf(a); val cb = colOf(b)
        if (ca != cb) Integer.compare(ca, cb)
        else if (a.y != b.y) Integer.compare(a.y, b.y)
        else Integer.compare(a.x, b.x)
      })

    val out = new java.lang.StringBuilder
    val spans = mutable.ArrayBuffer.empty[Span]
    var ri = 0
    while (ri < arr.length) {
      if (out.length > 0) out.append('\n')
      val s = out.length
      out.append(stripConfidence(arr(ri).text))
      spans += Span("line", s, out.length)
      ri += 1
    }
    Extracted(out.toString, spans.toSeq, None)
  }

  /** Parse `p<page> <x> <y> "<text>"`; None on any malformation. */
  private[extract] def parseRun(line: String): Option[Run] = {
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
