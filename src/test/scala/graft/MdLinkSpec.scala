package graft

import graft.extract.MdLinkExtractor
import graft.extract.MdLinkExtractor.Link
import graft.synth.OutlineDocs
import org.scalatest.funsuite.AnyFunSuite

/** Local truths for the markdown inline-link extractor: per-clause pins,
  * then full golden equality against the generator's by-construction
  * links with planted-shape coverage asserts.
  */
class MdLinkSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  test("inline links extract; emphasis strips; urls stay verbatim") {
    val got = MdLinkExtractor.extract(
      "see [**bold** name](https://a.example/p?x=1) and [plain](/rel)")
    assert(got == Seq(
      Link(0, "https://a.example/p?x=1", "bold name"),
      Link(1, "/rel", "plain")))
  }

  test("images, reference-style, and escaped brackets are not links") {
    assert(MdLinkExtractor.extract(
      "![alt](/img.png) then [ref][1] then \\[esc](https://no.example)") == Seq())
  }

  test("badge pattern: image nested in an anchor links to the OUTER url, alt as anchor") {
    val got = MdLinkExtractor.extract(
      "[![build status](/badge.png)](https://ci.example/run) and [x](/p)")
    assert(got == Seq(
      Link(0, "https://ci.example/run", "build status"),
      Link(1, "/p", "x")))
  }

  test("backslash inside a code span is inert; links after the span survive") {
    val got = MdLinkExtractor.extract("code `\\` then [docs](/ok)")
    assert(got == Seq(Link(0, "/ok", "docs")))
  }

  test("inline code and fenced blocks never produce links") {
    val got = MdLinkExtractor.extract(
      "code `[no](https://skip)` then [yes](/ok)\n```\n[fenced](https://no)\n```\n[after](/b)")
    assert(got == Seq(Link(0, "/ok", "yes"), Link(1, "/b", "after")))
  }

  test("unterminated constructs and empty anchors/urls emit nothing; never throws") {
    assert(MdLinkExtractor.extract("[open](no-close and [x] alone and [y]()") == Seq())
    // whitespace in the destination is not a link (GFM); a clean one after it is
    assert(MdLinkExtractor.extract("[a](two words) then [b](/ok)") ==
      Seq(Link(0, "/ok", "b")))
    assert(MdLinkExtractor.extract("[](url) and [ ](url)") == Seq())
    for (id <- Seq(1L, 3L, 9L, 7L, 11L, 15L)) {
      val (_, text, _) = OutlineDocs.build(id)
      for (cut <- 0 to text.length by 5) MdLinkExtractor.extract(text.take(cut))
    }
  }

  test("extractor equals the generator's by-construction links on the full corpus") {
    var sawCode = false; var sawEscaped = false
    (1L until 240L by 2).foreach { id =>
      val (_, text, _) = OutlineDocs.build(id)
      val got = MdLinkExtractor.extract(text).map(l =>
        OutlineDocs.GoldenMdLink(id, l.linkIdx, l.href, l.anchor))
      assert(got == OutlineDocs.buildLinks(id), s"doc $id")
      if (id % 6 == 3) sawCode = true
      if (id % 6 == 1) sawEscaped = true
    }
    assert(sawCode && sawEscaped)
  }

  test("q151 Spark path equals the distributed golden links") {
    import spark.implicits._
    val got = graft.ops.TableOps.mdLinks(spark, SparkEntry.VerifyOutlineDocs)
      .as[(Long, Long, String, String)].collect().sorted
    val want = OutlineDocs.goldenMdLinks(spark, SparkEntry.VerifyOutlineDocs)
      .as[OutlineDocs.GoldenMdLink].collect()
      .map(g => (g.doc_id, g.link_idx.toLong, g.href, g.anchor)).sorted
    assert(got.toSeq == want.toSeq)
  }
}
