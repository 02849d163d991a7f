package graft.extract

import scala.collection.mutable

/** Markdown (GFM) pipe-table extractor — the markdown twin of
  * `HtmlTableExtractor`, emitting the same per-cell shape so both feed
  * `TableOps.tableRecords` unchanged. Transcripts carry markdown turns
  * natively (the corpus's `markdown` payload kind), and tool output in
  * the wild embeds pipe tables constantly.
  *
  * Single forward pass over lines, O(1) state. Contract (each clause
  * pinned by MdTableSpec):
  *  - A table starts at a line whose trimmed form starts with `|` and
  *    whose NEXT line is a separator (`|---|:--:|…` — only `-`, `:`,
  *    `|`, whitespace, at least one `-`). The first line is the header
  *    row (row 0, header=true); the separator is consumed; data rows
  *    (header=false) continue while lines start with `|`.
  *  - Cells split on UNESCAPED `|`; `\|` unescapes to a literal pipe.
  *    Leading/trailing empty segments from the delimiting pipes are
  *    dropped; each cell trims and collapses internal whitespace; inline
  *    emphasis/code markers (`**`, `*`, `` ` ``) are stripped.
  *  - Ragged rows are emitted as-is (a row may have fewer or more cells
  *    than its header — downstream `tableRecords` inner-joins on
  *    col_idx, so surplus cells drop out there, not here).
  *  - Fenced code blocks (``` or ~~~) are skipped verbatim — a pipe
  *    table LITERAL inside a fence is not a table.
  *  - A `|` line with no separator after it is prose, not a table.
  *    Never throws on any input.
  */
object MdTableExtractor {

  import HtmlTableExtractor.Cell

  private def isSeparator(line: String): Boolean = {
    val t = line.trim
    if (!t.startsWith("|")) false
    else {
      var dash = false
      var ok = true
      var i = 0
      while (i < t.length && ok) {
        val c = t.charAt(i)
        if (c == '-') dash = true
        else if (c != '|' && c != ':' && !Character.isWhitespace(c)) ok = false
        i += 1
      }
      ok && dash
    }
  }

  /** Split a `|`-delimited row on unescaped pipes; unescape `\|`. */
  private def splitRow(line: String): Seq[String] = {
    val t = line.trim
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '\\' && i + 1 < t.length && t.charAt(i + 1) == '|') {
        sb.append('|'); i += 2
      } else if (c == '|') {
        out += sb.toString; sb.setLength(0); i += 1
      } else { sb.append(c); i += 1 }
    }
    out += sb.toString
    // the delimiting pipes produce empty first/last segments — drop them
    val from = if (out.nonEmpty && out.head.trim.isEmpty) 1 else 0
    val until = if (out.length > from && out.last.trim.isEmpty) out.length - 1 else out.length
    out.slice(from, until).toSeq
  }

  /** Strip emphasis/code markers, collapse whitespace, trim. */
  private def cleanCell(s: String): String = {
    val sb = new java.lang.StringBuilder
    var lastWasSpace = true
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '*' || c == '`') i += 1
      else if (Character.isWhitespace(c)) {
        if (!lastWasSpace) { sb.append(' '); lastWasSpace = true }
        i += 1
      } else { sb.append(c); lastWasSpace = false; i += 1 }
    }
    val n = sb.length
    if (n > 0 && sb.charAt(n - 1) == ' ') sb.substring(0, n - 1) else sb.toString
  }

  def extract(md: String): Seq[Cell] = {
    val lines = md.split("\n", -1)
    val out = mutable.ArrayBuffer.empty[Cell]
    var tableIdx = 0
    var inFence = false
    var fenceMark = ""
    var i = 0
    while (i < lines.length) {
      val t = lines(i).trim
      if (inFence) {
        if (t.startsWith(fenceMark)) inFence = false
        i += 1
      } else if (t.startsWith("```") || t.startsWith("~~~")) {
        inFence = true; fenceMark = t.substring(0, 3)
        i += 1
      } else if (t.startsWith("|") && i + 1 < lines.length && isSeparator(lines(i + 1))) {
        // header row
        val header = splitRow(lines(i))
        header.zipWithIndex.foreach { case (h, c) =>
          out += Cell(tableIdx, 0, c, header = true, cleanCell(h))
        }
        i += 2 // consume header + separator
        var row = 1
        while (i < lines.length && !inFence && lines(i).trim.startsWith("|")) {
          splitRow(lines(i)).zipWithIndex.foreach { case (v, c) =>
            out += Cell(tableIdx, row, c, header = false, cleanCell(v))
          }
          row += 1; i += 1
        }
        tableIdx += 1
      } else i += 1
    }
    out.toSeq
  }
}
