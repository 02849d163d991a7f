package graft.extract

import graft.model.{Extracted, ExtractedTurn, Turn}

/** Content-kind sniffer + single fused dispatch — the engine's per-turn
  * extraction function (the deterministic re-creation of the reference's
  * OCR+LLM extraction contract, ref: src/processing.py:87-148; one pure
  * Scala function so the whole pipeline is a single typed map stage).
  */
object Extract {

  private val pdfirHead = """^p\d+ \d+ \d+ """".r

  /** Classify the payload kind of a turn's text. */
  def sniff(text: String): String = {
    if (text == null || text.isEmpty) "plain"
    else if (text.startsWith("[tool:")) "tool"
    else {
      val t = firstNonWs(text)
      if (t == '<') "html"
      else if (pdfirHead.findPrefixOf(firstLine(text)).isDefined) "pdfir"
      else if (text.contains("```") || text.startsWith("# ") || text.contains("\n# ")) "markdown"
      else "plain"
    }
  }

  /** Total function: never throws; failures land in `Extracted.failure`
    * (swallow-and-continue, ref: agents/sql_agent/utils.py:113-118).
    */
  def one(text: String): (String, Extracted) = {
    val kind = sniff(text)
    val res =
      try kind match {
        case "html"     => HtmlExtractor.extract(text)
        case "pdfir"    => PdfIrExtractor.extract(text)
        case "markdown" => MdToolNormalizer.extractMarkdown(text)
        case "tool"     => MdToolNormalizer.extractTool(text)
        case _          => MdToolNormalizer.extractPlain(if (text == null) "" else text)
      } catch {
        case e: Exception => Extracted("", Seq.empty, Some(s"extract_error:${e.getClass.getSimpleName}"))
      }
    (kind, res)
  }

  def turn(t: Turn): ExtractedTurn = {
    val (kind, res) = one(t.text)
    ExtractedTurn(
      conv_id = t.conv_id,
      turn_idx = t.turn_idx,
      role = t.role,
      kind = kind,
      extracted_text = res.text,
      spans = res.spans,
      failure = res.failure,
      n_chars_in = if (t.text == null) 0 else t.text.length
    )
  }

  private def firstNonWs(s: String): Char = {
    var i = 0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i < s.length) s.charAt(i) else ' '
  }

  private def firstLine(s: String): String = {
    val i = s.indexOf('\n')
    if (i < 0) s else s.substring(0, i)
  }
}
