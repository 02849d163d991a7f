package graft.extract

import scala.collection.mutable

/** Markdown inline-link extractor — `[anchor](url)` pairs in document
  * order, the markdown twin of `HtmlLinkExtractor` (same output shape, so
  * the anchor-signal family q139/q148 consumes both markup families
  * unchanged).
  *
  * Line scan with O(1) state. Contract (each clause pinned by MdLinkSpec):
  *  - A link is `[anchor](url)` on one line; the url is taken verbatim
  *    (trimmed). A destination containing whitespace is NOT a link (the
  *    GFM rule — it also keeps an unterminated `](` from swallowing the
  *    rest of the line). Images (`![alt](src)`) are not links. `[text]`
  *    without an immediate `(` (reference-style) is not a link.
  *  - `\[` escapes the bracket (no link); escapes inside the anchor
  *    unescape. Anchors strip emphasis/code markers and collapse
  *    whitespace; a NESTED image (`[![alt](src)](url)` — the badge
  *    pattern) anchors as its alt text; empty anchors or urls emit
  *    nothing.
  *  - Inline code spans (single backticks) and fenced code blocks
  *    (``` / ~~~) never produce links; backslashes inside a code span
  *    are inert (CommonMark). Never throws on any input.
  */
object MdLinkExtractor {

  final case class Link(linkIdx: Int, href: String, anchor: String)

  def extract(md: String): Seq[Link] = {
    val out = mutable.ArrayBuffer.empty[Link]
    var inFence = false
    var fenceMark = ""
    md.linesIterator.foreach { line =>
      val t = line.trim
      if (inFence) {
        if (t.startsWith(fenceMark)) inFence = false
      } else if (t.startsWith("```") || t.startsWith("~~~")) {
        inFence = true; fenceMark = t.substring(0, 3)
      } else scanLine(line, out)
    }
    out.toSeq
  }

  private def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
      else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Nested image constructs in anchor text reduce to their alt text —
    * the badge pattern `[![build](/badge.png)](url)` anchors as "build".
    */
  private val NestedImageRe = "!\\[([^\\]]*)\\]\\([^)]*\\)".r

  private def scanLine(line: String, out: mutable.ArrayBuffer[Link]): Unit = {
    val n = line.length
    var i = 0
    var inCode = false
    while (i < n) {
      val c = line.charAt(i)
      // code-span state FIRST: backslash escapes are inert inside code
      // spans (CommonMark), so a `\` in a span must not eat the closing
      // backtick
      if (c == '`') { inCode = !inCode; i += 1 }
      else if (inCode) i += 1
      else if (c == '\\') i += 2
      else if (c == '[') {
        val isImage = i > 0 && line.charAt(i - 1) == '!'
        // depth-aware scan: nested brackets (the image-in-anchor badge
        // shape) close at depth 0, not at the first ']'
        var j = i + 1
        var close = -1
        var depth = 0
        while (j < n && close < 0) {
          val cj = line.charAt(j)
          if (cj == '\\') j += 2
          else if (cj == '[') { depth += 1; j += 1 }
          else if (cj == ']') { if (depth == 0) close = j else { depth -= 1; j += 1 } }
          else j += 1
        }
        if (close >= 0 && close + 1 < n && line.charAt(close + 1) == '(') {
          val paren = line.indexOf(')', close + 2)
          if (paren >= 0) {
            val href = line.substring(close + 2, paren).trim
            if (href.exists(Character.isWhitespace)) i = close + 1 // GFM: not a destination
            else {
              if (!isImage) {
                val inner = NestedImageRe.replaceAllIn(
                  line.substring(i + 1, close), m => m.group(1))
                val anchor = unescape(inner)
                  .replace("*", "").replace("`", "")
                  .trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
                if (href.nonEmpty && anchor.nonEmpty)
                  out += Link(out.length, href, anchor)
              }
              i = paren + 1
            }
          } else i = close + 1
        } else i += 1
      } else i += 1
    }
  }
}
