package graft.extract

import graft.model.{Extracted, Span}
import scala.collection.mutable

/** Markdown / tool-output normalizer with span bookkeeping.
  *
  * Markdown: unwraps fenced code blocks — the exact behavior the reference
  * applies to LLM output (`strip().strip("```").replace("json\n","",1)`,
  * ref: src/processing.py:135, agents/sql_agent/db_init_llm.py:362,
  * schema_helper.py:114) — strips heading markers, trims trailing
  * whitespace, and collapses runs of 3+ newlines to 2. Fence interiors are
  * recorded as `code` spans on the OUTPUT text. An unterminated fence is a
  * per-turn failure (`md_fence`), mirroring error-injected golden variants
  * (uploads/GP 218-errors.pdf analogues).
  *
  * Tool output: unwraps a `[tool:<name> ...]` / `[/tool]` frame and strips
  * ANSI SGR escapes; the unwrapped payload is one `tool` span. A missing
  * closing frame is a `tool_frame` failure.
  */
object MdToolNormalizer {

  private val ansiPattern = "\u001b\\[[0-9;]*m".r
  /** Java-regex `\s` class: [ \t\n\x0B\f\r] — NOT Character.isWhitespace
    * (which adds Unicode separators); the hand-rolled scans below keep
    * the exact class the replaced regexes matched.
    */
  @inline private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' || c == '\r'

  /** `replaceAll("\\s+$", "")` without the per-call Pattern compile +
    * Matcher (one per input LINE — the markdown/plain paths' hottest
    * allocation site). Lines here contain no '\n', so `$` is
    * end-of-input.
    */
  private def trimTrailingWs(s: String): String = {
    var e = s.length
    while (e > 0 && isJavaWs(s.charAt(e - 1))) e -= 1
    if (e == s.length) s else s.substring(0, e)
  }

  /** `"^#{1,6}\\s+".r.replaceFirstIn(line, "")` hand-rolled: with the #s
    * consecutive, a k<=6 match needs char k to be \s, so a 7+-# run can
    * never match (backtracking only ever finds another '#').
    */
  private def stripHeading(line: String): String = {
    var h = 0
    while (h < line.length && line.charAt(h) == '#') h += 1
    if (h < 1 || h > 6 || h >= line.length || !isJavaWs(line.charAt(h))) line
    else {
      var k = h + 1
      while (k < line.length && isJavaWs(line.charAt(k))) k += 1
      line.substring(k)
    }
  }

  def extractMarkdown(input: String): Extracted = {
    val lines = input.split('\n')
    val out = new StringBuilder
    val spans = mutable.ArrayBuffer.empty[Span]
    var inFence = false
    var fenceStart = -1 // offset in `out` where current fence body begins
    var blankRun = 0
    var i = 0
    while (i < lines.length) {
      val raw = lines(i)
      val line = trimTrailingWs(raw)
      if (line.startsWith("```")) {
        if (!inFence) {
          inFence = true
          if (out.nonEmpty && !endsWithNewline(out)) out.append('\n')
          fenceStart = out.length
        } else {
          inFence = false
          // drop trailing newline inside fence body from span
          var e = out.length
          if (e > fenceStart && out.charAt(e - 1) == '\n') e -= 1
          spans += Span("code", fenceStart, e)
          blankRun = 0
        }
      } else if (inFence) {
        out.append(line).append('\n') // fence body verbatim (language tag was on the fence line)
      } else {
        val stripped = stripHeading(line)
        if (stripped.isEmpty) {
          blankRun += 1
          if (blankRun == 1 && out.nonEmpty) out.append('\n')
          // collapse: 2nd+ consecutive blank lines dropped
        } else {
          val s = if (endsWithNewline(out) || out.isEmpty) out.length else { out.append('\n'); out.length }
          out.append(stripped)
          spans += Span("content", s, out.length)
          out.append('\n')
          blankRun = 0
        }
      }
      i += 1
    }
    if (inFence) return Extracted("", Seq.empty, Some("md_fence"))
    // drop single trailing newline
    val text = if (out.nonEmpty && out.charAt(out.length - 1) == '\n') out.substring(0, out.length - 1) else out.toString
    Extracted(text, spans.toSeq, None)
  }

  def extractTool(input: String): Extracted = {
    val firstNl = input.indexOf('\n')
    if (firstNl < 0) return Extracted("", Seq.empty, Some("tool_frame"))
    val header = input.substring(0, firstNl)
    if (!header.startsWith("[tool:") || !header.endsWith("]"))
      return Extracted("", Seq.empty, Some("tool_frame"))
    val closeIdx = input.lastIndexOf("\n[/tool]")
    if (closeIdx < 0) return Extracted("", Seq.empty, Some("tool_frame"))
    val body = input.substring(firstNl + 1, closeIdx)
    // fast path: no ESC byte, no matcher allocation (the common case)
    val cleaned =
      if (body.indexOf(27.toChar) < 0) body else ansiPattern.replaceAllIn(body, "")
    Extracted(cleaned, Seq(Span("tool", 0, cleaned.length)), None)
  }

  /** Plain text: trailing-whitespace trim per line, collapse 3+ newlines. */
  def extractPlain(input: String): Extracted = {
    val lines = input.split('\n')
    val out = new StringBuilder
    var blankRun = 0
    var i = 0
    while (i < lines.length) {
      val line = trimTrailingWs(lines(i))
      if (line.isEmpty) {
        blankRun += 1
        if (blankRun == 1 && out.nonEmpty) out.append('\n')
      } else {
        if (out.nonEmpty) out.append('\n')
        out.append(line)
        blankRun = 0
      }
      i += 1
    }
    val text = out.toString
    Extracted(text, if (text.isEmpty) Seq.empty else Seq(Span("content", 0, text.length)), None)
  }

  private def endsWithNewline(sb: StringBuilder): Boolean =
    sb.nonEmpty && sb.charAt(sb.length - 1) == '\n'
}
