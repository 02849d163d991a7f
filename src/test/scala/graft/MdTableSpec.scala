package graft

import graft.extract.HtmlTableExtractor.Cell
import graft.extract.MdTableExtractor
import graft.synth.MdTableDocs
import org.scalatest.funsuite.AnyFunSuite

/** Local truths for the GFM pipe-table extractor: each contract clause
  * pinned in isolation, then full golden equality against the generator's
  * by-construction cells with planted-shape coverage asserts.
  */
class MdTableSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  test("header + separator + data rows; alignment colons accepted") {
    val cells = MdTableExtractor.extract(
      "| a | b |\n|:---:|---|\n| c | d |\n| e | f |\n")
    assert(cells == Seq(
      Cell(0, 0, 0, header = true, "a"), Cell(0, 0, 1, header = true, "b"),
      Cell(0, 1, 0, header = false, "c"), Cell(0, 1, 1, header = false, "d"),
      Cell(0, 2, 0, header = false, "e"), Cell(0, 2, 1, header = false, "f")))
  }

  test("escaped pipes, emphasis and code markers inside cells") {
    val cells = MdTableExtractor.extract(
      "| h1 | h2 | h3 |\n|---|---|---|\n| a\\|b | **c** d | `e` |\n")
    assert(cells.filter(!_.header).map(_.text) == Seq("a|b", "c d", "e"))
  }

  test("fenced code blocks are skipped; | line with no separator is prose") {
    val cells = MdTableExtractor.extract(
      "```\n| fake | t |\n|---|---|\n| x | y |\n```\n" +
        "| not a table\nprose\n" +
        "~~~\n| also | fake |\n|---|---|\n~~~\n" +
        "| real |\n|---|\n| v |\n")
    assert(cells == Seq(
      Cell(0, 0, 0, header = true, "real"),
      Cell(0, 1, 0, header = false, "v")))
  }

  test("ragged rows emit what they carry; tables count in document order") {
    val cells = MdTableExtractor.extract(
      "| a | b |\n|---|---|\n| only |\n\n| x |\n|---|\n| y |\n")
    assert(cells == Seq(
      Cell(0, 0, 0, header = true, "a"), Cell(0, 0, 1, header = true, "b"),
      Cell(0, 1, 0, header = false, "only"),
      Cell(1, 0, 0, header = true, "x"),
      Cell(1, 1, 0, header = false, "y")))
  }

  test("malformed input never throws: truncation anywhere, stray fences") {
    val doc = MdTableDocs.build(6L)._1
    for (cut <- 0 to doc.length by 3) MdTableExtractor.extract(doc.take(cut))
    assert(MdTableExtractor.extract("| a |\n|---|") // header, no data rows
      == Seq(Cell(0, 0, 0, header = true, "a")))
    assert(MdTableExtractor.extract("```\n| a |\n|---|\n| b |") == Seq())
  }

  test("extractor equals the generator's by-construction cells on the full corpus") {
    val n = 200L
    var sawRagged = false; var sawEscaped = false; var sawMarkers = false
    var sawSecond = false
    (0L until n).foreach { id =>
      val (md, golden) = MdTableDocs.build(id)
      val got = MdTableExtractor.extract(md).map(c =>
        graft.synth.TableDocs.GoldenCell(id, c.tableIdx, c.rowIdx, c.colIdx, c.header, c.text))
      assert(got.sortBy(c => (c.table_idx, c.row_idx, c.col_idx)) ==
        golden.sortBy(c => (c.table_idx, c.row_idx, c.col_idx)), s"doc $id")
      if (id % 3 == 0) sawRagged = true
      sawEscaped = sawEscaped || golden.exists(_.cell_text.contains("|"))
      sawMarkers = sawMarkers || md.contains("**")
      sawSecond = sawSecond || golden.exists(_.table_idx == 1)
    }
    assert(sawRagged && sawEscaped && sawMarkers && sawSecond,
      "planted corpus must exercise ragged/escaped/marker/second-table shapes")
  }

  test("q135 Spark path equals the distributed golden cells; records compose") {
    import spark.implicits._
    val n = SparkEntry.VerifyMdTableDocs
    val got = graft.ops.TableOps.mdCells(spark, n)
      .as[(Long, Long, Long, Long, Boolean, String)].collect().sorted
    val want = MdTableDocs.goldenCells(spark, n)
      .as[graft.synth.TableDocs.GoldenCell].collect()
      .map(c => (c.doc_id, c.table_idx.toLong, c.row_idx.toLong, c.col_idx.toLong,
        c.is_header, c.cell_text)).sorted
    assert(got.length == want.length && got.sameElements(want))
    // the shared normalizer composes over the markdown family too:
    // ragged rows' surplus-column cells drop out in the inner join
    val recs = graft.ops.TableOps.tableRecords(graft.ops.TableOps.mdCells(spark, n))
      .as[(Long, Long, Long, String, String)].collect()
    val dataCells = want.count(!_._5)
    assert(recs.length == dataCells, "md tables all carry headers, so every data cell pivots")
  }
}
