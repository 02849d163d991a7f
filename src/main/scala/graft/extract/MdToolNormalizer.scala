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
  private val headingPattern = "^#{1,6}\\s+".r

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
      val line = raw.replaceAll("\\s+$", "") // trim trailing ws
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
        val stripped = headingPattern.replaceFirstIn(line, "")
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
    val cleaned = ansiPattern.replaceAllIn(body, "")
    Extracted(cleaned, Seq(Span("tool", 0, cleaned.length)), None)
  }

  /** Plain text: trailing-whitespace trim per line, collapse 3+ newlines. */
  def extractPlain(input: String): Extracted = {
    val lines = input.split('\n')
    val out = new StringBuilder
    var blankRun = 0
    var i = 0
    while (i < lines.length) {
      val line = lines(i).replaceAll("\\s+$", "")
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
