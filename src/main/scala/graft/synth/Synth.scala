package graft.synth

import graft.model.Turn
import java.sql.Timestamp

/** Deterministic synthetic transcript corpus (FIXTURES.md §1).
  *
  * Every value is a pure function of (Seed, convIdx, turnIdx) via a
  * splitmix64 mixer — identical across machines, partitionings, and
  * parallelism levels (required for the local[8]-vs-local[32] scaling
  * evidence and for golden equality). NO external data.
  *
  * Each turn's payload embeds a known expected main content, so the golden
  * extraction output is known by construction — the analogue of the
  * reference's golden corpus (ref: agents/knowledge_base <doc>_processed.json
  * paired with uploads <doc>.pdf, incl. error-injected variants
  * `GP 218-edited-incorrect.pdf` / `GP 218-errors.pdf`).
  */
object Synth {

  val Seed = 42L

  /** A turn plus the golden expectation the generator embedded. */
  final case class GoldenTurn(
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: String,
      ts: Timestamp,
      kind: String,
      expected_text: String,
      expected_failure: Option[String],
      expected_spans: Seq[graft.model.Span]
  ) {
    def turn: Turn = Turn(conv_id, turn_idx, role, text, tool, ts)
  }

  // --- deterministic randomness -------------------------------------------

  /** splitmix64 finalizer (public-domain mixing constants). */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def rng(conv: Long, turn: Long, tag: Long): Long =
    mix(mix(Seed ^ mix(conv * 0x632be59bd9b4e019L)) ^ mix(turn * 0x9e3779b97f4a7c15L) ^ tag)

  /** Non-negative bounded draw. */
  def draw(conv: Long, turn: Long, tag: Long, bound: Int): Int =
    math.floorMod(rng(conv, turn, tag), bound.toLong).toInt

  // --- corpus shape --------------------------------------------------------

  /** Zipf-skewed conversation lengths: most convs are short, every 101st is
    * 400-1600 turns long (exercises salted repartitioning; FIXTURES.md §1).
    */
  def convLen(convIdx: Long): Int =
    if (convIdx % 101 == 0) 400 + draw(convIdx, -1, 0x7e7, 1200)
    else 1 + draw(convIdx, -1, 0x1e1, 20)

  private val vocab = Array(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "signal", "vector",
    "matrix", "kernel", "stream", "buffer")

  private def sentence(conv: Long, turn: Long, tag: Long, nWords: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < nWords) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(draw(conv, turn, tag + 31 * i, vocab.length)))
      i += 1
    }
    sb.toString
  }

  // --- payload builders ----------------------------------------------------
  // Each returns (raw, expected_text, expected_failure).

  private def htmlPayload(c: Long, t: Long): (String, String, Option[String]) = {
    val nPara = 2 + draw(c, t, 0xa1, 4)
    val paras = (0 until nPara).map { p =>
      val base = sentence(c, t, 0xb0 + 97 * p, 8 + draw(c, t, 0xb1 + p, 8))
      // occasionally include a decoded entity and inline markup
      if (draw(c, t, 0xb2 + p, 3) == 0) base + " & more" else base
    }
    val rawParas = paras.zipWithIndex.map { case (p, i) =>
      val withEntity = p.replace(" & ", " &amp; ")
      val inline =
        if (draw(c, t, 0xb3 + i, 4) == 0) {
          val sp = withEntity.indexOf(' ')
          if (sp > 0) s"<b>${withEntity.substring(0, sp)}</b>${withEntity.substring(sp)}" else withEntity
        } else withEntity
      s"<p>$inline</p>"
    }
    val navLinks = (0 until 4).map(i => s"""<li><a href="/x$i">${vocab(draw(c, t, 0xc0 + i, vocab.length))}</a></li>""").mkString
    val malformed = draw(c, t, 0xd0, 50) == 0 // unclosed <b>: text unaffected
    val body = rawParas.mkString("\n  ")
    val bodyMaybeBroken = if (malformed) body.replaceFirst("</b>", "") else body
    val raw =
      s"""<html><head><title>${sentence(c, t, 0xe0, 3)}</title><style>.x{color:red}</style><script>var q=1;</script></head>
<body>
<nav><ul>$navLinks</ul></nav>
<header><h1>${sentence(c, t, 0xe1, 4)}</h1></header>
<div class="content">
  $bodyMaybeBroken
</div>
<aside><a href="/ad">${vocab(draw(c, t, 0xe2, vocab.length))}</a></aside>
<footer><a href="/about">about</a> <a href="/contact">contact</a></footer>
</body></html>"""
    (raw, paras.mkString("\n\n"), None)
  }

  private def pdfirPayload(c: Long, t: Long): (String, String, Option[String]) = {
    val nPages = 1 + draw(c, t, 0xf0, 2)
    val lines = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, String)] // page,x,y,text
    val expected = scala.collection.mutable.ArrayBuffer.empty[String]
    var pg = 1
    while (pg <= nPages) {
      val twoCol = draw(c, t, 0xf1 + pg, 2) == 0
      val nCols = if (twoCol) 2 else 1
      var col = 0
      while (col < nCols) {
        val nLines = 3 + draw(c, t, 0xf2 + pg * 7 + col, 4)
        val xBase = if (col == 0) 80 else 420
        var li = 0
        while (li < nLines) {
          val txt = sentence(c, t, 0x100 + pg * 131 + col * 17 + li, 4 + draw(c, t, 0x101 + li, 4))
          val annotated =
            if (draw(c, t, 0x102 + li + pg, 5) == 0)
              txt + f" (Confidence: 0.${90 + draw(c, t, 0x103 + li, 10)}%2d)"
            else txt
          lines += ((pg, xBase + draw(c, t, 0x104 + li + col, 40), 100 + li * 20, annotated))
          expected += txt
          li += 1
        }
        col += 1
      }
      pg += 1
    }
    // deterministic shuffle: emit in mixed order so the extractor must sort
    val shuffled = lines.zipWithIndex.sortBy { case (_, i) => mix(rng(c, t, 0x110) + i) }.map(_._1)
    val corrupt = draw(c, t, 0x111, 60) == 0
    val rawLines = shuffled.map { case (p, x, y, txt) => s"""p$p $x $y "$txt"""" }
    val raw =
      if (corrupt && rawLines.length > 1) (rawLines.take(1) ++ Seq("p3 17") ++ rawLines.drop(1)).mkString("\n")
      else rawLines.mkString("\n")
    if (corrupt && rawLines.length > 1) (raw, "", Some("pdfir_parse"))
    else (raw, expected.mkString("\n"), None)
  }

  private def mdPayload(c: Long, t: Long): (String, String, Option[String]) = {
    val title = sentence(c, t, 0x120, 3 + draw(c, t, 0x121, 3))
    val p1 = sentence(c, t, 0x122, 10 + draw(c, t, 0x123, 6))
    val p2 = sentence(c, t, 0x124, 8 + draw(c, t, 0x125, 6))
    val fenceLines = (0 until 2 + draw(c, t, 0x126, 3))
      .map(i => s"""  "${vocab(draw(c, t, 0x127 + i, vocab.length))}": ${draw(c, t, 0x128 + i, 100)},""")
    val fenceBody = ("{" +: fenceLines :+ "}").mkString("\n")
    val unterminated = draw(c, t, 0x129, 55) == 0
    val raw =
      if (unterminated) s"# $title\n\n$p1\n\n```json\n$fenceBody\n"
      else s"# $title\n\n$p1\n\n```json\n$fenceBody\n```\n\n$p2"
    if (unterminated) (raw, "", Some("md_fence"))
    else (raw, s"$title\n\n$p1\n\n$fenceBody\n\n$p2", None)
  }

  private val Esc = 27.toChar.toString
  private val toolNames = Array("browser", "pdf_reader", "shell")
  private val kindNames = Array("html", "pdfir", "markdown", "tool")

  private def toolPayload(c: Long, t: Long): (String, String, Option[String]) = {
    val toolName = toolNames.apply(draw(c, t, 0x130, 3))
    val n = 2 + draw(c, t, 0x131, 4)
    val bodyLines = (0 until n).map { i =>
      val txt = sentence(c, t, 0x132 + i, 5 + draw(c, t, 0x133 + i, 5))
      if (draw(c, t, 0x134 + i, 3) == 0) Esc + "[32m" + txt + Esc + "[0m" else txt
    }
    val expected = bodyLines.map(_.replaceAll(Esc + "\\[[0-9;]*m", "")).mkString("\n")
    val unclosed = draw(c, t, 0x135, 70) == 0
    val raw =
      if (unclosed) s"[tool:$toolName status=ok]\n${bodyLines.mkString("\n")}"
      else s"[tool:$toolName status=ok]\n${bodyLines.mkString("\n")}\n[/tool]"
    if (unclosed) (raw, "", Some("tool_frame")) else (raw, expected, None)
  }

  private def plainPayload(c: Long, t: Long): (String, String, Option[String]) = {
    val s1 = sentence(c, t, 0x140, 8 + draw(c, t, 0x141, 8))
    val s2 = sentence(c, t, 0x142, 6 + draw(c, t, 0x143, 6))
    (s"$s1\n$s2", s"$s1\n$s2", None)
  }

  // --- assembly -------------------------------------------------------------

  /** Expected character-span offsets (north rule: spans recomputed per
    * turn), derived from the BUILDER's layout knowledge — every payload
    * kind composes `expected_text` with a fixed separator discipline, so
    * the generator can place span boundaries without ever consulting the
    * extractor: html = content blocks joined "\n\n"; pdfir = one "line"
    * span per reading-order line; markdown = [title, p1, fence, p2]
    * joined "\n\n" with block 2 the `code` fence interior (fence bodies
    * never contain blank lines by construction); tool/plain = one span
    * over the whole output. Failures extract to nothing, so no spans.
    */
  def expectedSpans(kind: String, expected: String,
      failure: Option[String]): Seq[graft.model.Span] = {
    import graft.model.Span
    def joined(blocks: Seq[String], sep: Int, kindAt: Int => String): Seq[Span] = {
      var cur = 0
      blocks.zipWithIndex.map { case (b, i) =>
        val s = cur; cur += b.length + sep
        Span(kindAt(i), s, s + b.length)
      }
    }
    if (failure.isDefined || expected.isEmpty) Seq.empty
    else kind match {
      case "tool"     => Seq(Span("tool", 0, expected.length))
      case "pdfir"    => joined(expected.split('\n').toIndexedSeq, 1, _ => "line")
      case "html"     => joined(expected.split("\n\n").toIndexedSeq, 2, _ => "content")
      case "markdown" => joined(expected.split("\n\n").toIndexedSeq, 2,
        i => if (i == 2) "code" else "content")
      case _          => Seq(Span("content", 0, expected.length))
    }
  }

  def goldenTurn(convIdx: Long, turnIdx: Int): GoldenTurn = {
    val kind =
      if (draw(convIdx, turnIdx, 0x01, 17) == 0) "plain"
      else kindNames.apply(draw(convIdx, turnIdx, 0x02, 4))
    val (raw, expected, failure) = kind match {
      case "html"     => htmlPayload(convIdx, turnIdx)
      case "pdfir"    => pdfirPayload(convIdx, turnIdx)
      case "markdown" => mdPayload(convIdx, turnIdx)
      case "tool"     => toolPayload(convIdx, turnIdx)
      case _          => plainPayload(convIdx, turnIdx)
    }
    val (role, tool) =
      if (kind == "tool") ("tool", toolNames.apply(draw(convIdx, turnIdx, 0x130, 3)))
      else (if (turnIdx % 2 == 0) "user" else "assistant", null)
    GoldenTurn(
      conv_id = f"conv-$convIdx%06d",
      turn_idx = turnIdx,
      role = role,
      text = raw,
      tool = tool,
      ts = new Timestamp(1735689600000L + convIdx * 1000000L + turnIdx * 7000L),
      kind = kind,
      expected_text = expected,
      expected_failure = failure,
      expected_spans = expectedSpans(kind, expected, failure)
    )
  }

  /** All golden turns of one conversation. */
  def convTurns(convIdx: Long): IndexedSeq[GoldenTurn] =
    (0 until convLen(convIdx)).map(ti => goldenTurn(convIdx, ti))

  /** Local (driver-side) corpus for unit tests. */
  def localCorpus(nConvs: Int): IndexedSeq[GoldenTurn] =
    (0L until nConvs.toLong).flatMap(convTurns)
}
