package graft

import graft.extract.HtmlExtractor
import org.scalatest.funsuite.AnyFunSuite

/** Regression tests for malformed-HTML recovery paths (code-review
  * findings): self-closed raw-text/drop elements and mis-nested closes
  * must not poison the remainder of the document.
  */
class HtmlEdgeSpec extends AnyFunSuite {

  private val para = "<p>twenty-five-plus characters of real article body text here</p>"
  private val expected = "twenty-five-plus characters of real article body text here"

  test("self-closed <script/> does not swallow the rest of the document") {
    val r = HtmlExtractor.extract(s"""<script src="x.js"/>$para""")
    assert(r.text == expected)
  }

  test("self-closed drop tag (<nav/>) does not open a drop scope") {
    val r = HtmlExtractor.extract(s"""<nav/>$para""")
    assert(r.text == expected)
  }

  test("unclosed <a> terminated by an ancestor close recovers link accounting") {
    val r = HtmlExtractor.extract(
      s"""<div><a href="/x">home</div>$para""")
    assert(r.text == expected, "post-</div> text must not count as link chars")
  }

  test("mis-nested close of a drop tag restores dropDepth") {
    val r = HtmlExtractor.extract(
      s"""<div><aside>sidebar junk</div>$para""")
    assert(r.text.contains(expected.take(30)),
      s"text after recovered drop scope must survive, got: '${r.text}'")
  }

  test("stray close tags are no-ops") {
    val r = HtmlExtractor.extract(s"""</nav></a></div>$para""")
    assert(r.text == expected)
  }

  test("unterminated real <script> still drops its payload") {
    val r = HtmlExtractor.extract(s"""$para<script>var x = 1;""")
    assert(r.text == expected)
  }

  test("DOCTYPE, XML prolog and comments are consumed, not emitted") {
    val r = HtmlExtractor.extract(
      s"""<!DOCTYPE html><?xml version="1.0"?><!-- header comment with <p>tags</p> -->$para""")
    assert(r.text == expected)
  }

  test("processing instruction with '>' inside quoted data is fully consumed") {
    val r = HtmlExtractor.extract(
      s"""<?xml-stylesheet href="a>b.css" type="text/css"?>$para<?php if (1 > 0) ?>""")
    assert(r.text == expected, s"PI data leaked: '${r.text}'")
  }

  test("unterminated PI ends at the first '>' (bogus-comment semantics), not end-of-input") {
    val r = HtmlExtractor.extract(s"""<?php broken short tag >$para""")
    assert(r.text == expected, s"text after a stray '<?' must survive: '${r.text}'")
    // no '>' at all after the stray '<?': nothing to recover, consume silently
    val r2 = HtmlExtractor.extract(s"""$para<?php tail with no close""")
    assert(r2.text == expected)
  }

  test("numeric entity overflow and malformed entities degrade to literal text") {
    // &#x110000; is above Character.MAX_CODE_POINT; &#zz; is unparseable;
    // a '&' with no ';' within 10 chars is plain text — none may throw
    val r = HtmlExtractor.extract(
      "<p>a &#x110000; b &#zz; c & plain ampersand and body text padding</p>")
    assert(r.text.contains("a &") && r.text.contains("c & plain ampersand"))
    assert(r.failure.isEmpty)
  }

  test("'>' inside a quoted attribute value does not terminate the tag") {
    val r = HtmlExtractor.extract(
      s"""<div data-x="a > b" title='1 > 0'>$para</div>""")
    assert(r.text == expected, s"got: '${r.text}'")
  }

  test("unterminated comment drops the remainder without throwing") {
    val r = HtmlExtractor.extract(s"""$para<!-- never closed $para""")
    assert(r.text == expected)
  }

  test("truncation mid-tag consumes the fragment silently") {
    val r = HtmlExtractor.extract(s"""$para<div class="cut""")
    assert(r.text == expected)
  }

  test("multi-MB turn: single pass, O(depth) state, linear-ish time") {
    // north star: "streaming DOM tokenizer" must handle multi-MB turns
    // without materializing a DOM. 4 MB document, 50k paragraphs.
    val sb = new StringBuilder("<html><body>")
    (0 until 50000).foreach { i =>
      sb.append(s"<div><p>paragraph $i with enough characters to clear the minimum block length</p></div>")
    }
    sb.append("</body></html>")
    val html = sb.toString
    assert(html.length > 4_000_000)
    val t0 = System.nanoTime()
    val r = HtmlExtractor.extract(html)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(r.spans.length == 50000)
    assert(r.text.startsWith("paragraph 0 with"))
    assert(sec < 10.0, f"4MB doc took $sec%.1f s — not streaming-linear")
  }

  test("pathological nesting depth does not blow the stack") {
    val depth = 200000
    val html = "<div>" * depth + "<p>deep but fine: enough characters to keep this block</p>"
    val r = HtmlExtractor.extract(html)
    assert(r.text.contains("deep but fine"))
  }
}
