package graft

import graft.extract.PdfGridExtractor
import graft.extract.PdfGridExtractor.GridCell
import graft.synth.PdfGridDocs
import org.scalatest.funsuite.AnyFunSuite

/** Local truths for the pdfir grid detector: each contract clause pinned
  * in isolation, then full golden equality against the generator's
  * by-construction cells with planted-shape coverage asserts.
  */
class PdfGridSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  test("a 2x2 aligned block is a table; confidence annotations strip") {
    val got = PdfGridExtractor.extract(
      "p0 100 10 \"a (Confidence: 0.97)\"\np0 300 10 \"b\"\n" +
        "p0 100 70 \"c\"\np0 300 70 \"d\"")
    assert(got == Seq(
      GridCell(0, 0, 0, 0, "a"), GridCell(0, 0, 0, 1, "b"),
      GridCell(0, 0, 1, 0, "c"), GridCell(0, 0, 1, 1, "d")))
  }

  test("one aligned row is not a table; single-run lines never are") {
    assert(PdfGridExtractor.extract(
      "p0 100 10 \"a\"\np0 300 10 \"b\"\np0 100 200 \"prose\"") == Seq())
  }

  test("a prose line mid-block splits the grid; fragments re-qualify") {
    val rows = (0 until 5).flatMap(r =>
      Seq(s"""p0 100 ${100 + 60 * r} "L$r"""", s"""p0 300 ${100 + 60 * r} "R$r""""))
    val withProse = (rows.take(6) :+ "p0 50 250 \"prose\"") ++ rows.drop(6)
    val got = PdfGridExtractor.extract(withProse.mkString("\n"))
    assert(got.map(_.tableIdx).distinct == Seq(0, 1))
    assert(got.count(_.tableIdx == 0) == 6 && got.count(_.tableIdx == 1) == 4)
    // the 2-row fragment re-indexes rows from 0
    assert(got.filter(_.tableIdx == 1).map(_.rowIdx).distinct == Seq(0, 1))
  }

  test("adjacent grids with different x-signatures are two tables") {
    val g = Seq(
      "p0 100 10 \"a\"", "p0 300 10 \"b\"",
      "p0 100 70 \"c\"", "p0 300 70 \"d\"",
      "p0 120 130 \"e\"", "p0 320 130 \"f\"",
      "p0 120 190 \"g\"", "p0 320 190 \"h\"")
    val got = PdfGridExtractor.extract(g.mkString("\n"))
    assert(got.map(_.tableIdx).distinct == Seq(0, 1))
    assert(got.filter(_.tableIdx == 1).map(_.text) == Seq("e", "f", "g", "h"))
  }

  test("a duplicated (y, x-band) resolves to the (x, text)-least run, deterministically") {
    val got = PdfGridExtractor.extract(
      "p0 100 10 \"zebra\"\np0 100 10 \"apple\"\np0 300 10 \"b\"\n" +
        "p0 100 70 \"c\"\np0 300 70 \"d\"")
    assert(got.find(c => c.rowIdx == 0 && c.colIdx == 0).map(_.text).contains("apple"))
  }

  test("malformed run lines are skipped, never thrown") {
    val got = PdfGridExtractor.extract(
      "garbage\np0 100 10 \"a\"\np0 300 10 \"b\"\npx y\n" +
        "p0 100 70 \"c\"\np0 300 70 \"d\"\np0 5")
    assert(got.length == 4)
    for (id <- Seq(0L, 12L, 20L, 30L, 60L, 5L)) {
      val (ir, _) = PdfGridDocs.build(id)
      for (cut <- 0 to ir.length by 7) PdfGridExtractor.extract(ir.take(cut))
    }
  }

  test("extractor equals the generator's by-construction cells on the full corpus") {
    val n = 180L
    var sawSplit = false; var sawAdjacent = false; var sawOneRow = false
    (0L until n).foreach { id =>
      val (ir, golden) = PdfGridDocs.build(id)
      val got = PdfGridExtractor.extract(ir).map(c =>
        PdfGridDocs.GoldenGridCell(id, c.page, c.tableIdx, c.rowIdx, c.colIdx, c.text))
      assert(got == golden, s"doc $id")
      if (id % 3 == 0) { sawSplit = true
        assert(golden.count(_.page == 1) == 10, s"doc $id split cells") }
      if (id % 5 == 0) { sawAdjacent = true
        assert(golden.filter(_.page == 2).map(_.table_idx).distinct.size == 2) }
      if (id % 4 == 0) sawOneRow = true
    }
    assert(sawSplit && sawAdjacent && sawOneRow)
  }

  test("jitter tolerance: bands recover noisy columns; exact matching finds nothing") {
    val noisy =
      "p0 299 10 \"a\"\np0 521 10 \"b\"\n" +
        "p0 301 70 \"c\"\np0 519 70 \"d\"\n" +
        "p0 300 130 \"e\"\np0 520 130 \"f\""
    assert(PdfGridExtractor.extract(noisy) == Seq()) // tol=0: 6 signatures
    val got = PdfGridExtractor.extract(noisy, tol = 3)
    assert(got.map(c => (c.rowIdx, c.colIdx, c.text)) == Seq(
      (0, 0, "a"), (0, 1, "b"), (1, 0, "c"), (1, 1, "d"), (2, 0, "e"), (2, 1, "f")))
    // a 5-px gap exceeds tol=3: two separate columns, not one band
    val narrow = "p0 200 10 \"l\"\np0 205 10 \"r\"\np0 200 70 \"l2\"\np0 205 70 \"r2\""
    assert(PdfGridExtractor.extract(narrow, tol = 3).map(_.colIdx).distinct == Seq(0, 1))
  }

  test("jittered corpus: tolerant path equals goldens; exact path finds no tables") {
    val n = 120L
    (0L until n).foreach { id =>
      val (ir, golden) = PdfGridDocs.buildJitter(id)
      val got = PdfGridExtractor.extract(ir, PdfGridExtractor.JitterTol).map(c =>
        PdfGridDocs.GoldenGridCell(id, c.page, c.tableIdx, c.rowIdx, c.colIdx, c.text))
      assert(got == golden, s"doc $id")
      // page-0 xs are genuinely jittered: exact matching loses the table
      assert(!PdfGridExtractor.extract(ir).exists(_.page == 0) ||
        PdfGridExtractor.extract(ir).count(_.page == 0) < golden.count(_.page == 0),
        s"doc $id: jitter must defeat exact matching")
      for (cut <- 0 to ir.length by 19)
        PdfGridExtractor.extract(ir.take(cut), PdfGridExtractor.JitterTol)
    }
  }

  test("pdfGridRecords: first-row-header pivot matches a driver recompute") {
    import spark.implicits._
    val n = 60L
    val want = (0L until n).flatMap { id =>
      val cells = PdfGridDocs.build(id)._2
      val headers = cells.filter(_.row_idx == 0)
        .map(c => (c.page, c.table_idx, c.col_idx) -> c.cell_text).toMap
      cells.filter(_.row_idx > 0).flatMap { c =>
        headers.get((c.page, c.table_idx, c.col_idx)).map(h =>
          (id, c.page.toLong, c.table_idx.toLong, c.row_idx.toLong, h, c.cell_text))
      }
    }.sorted
    val got = graft.ops.TableOps.pdfGridRecords(graft.ops.TableOps.pdfGrids(spark, n))
      .as[(Long, Long, Long, Long, String, String)].collect().sorted
    assert(got.toSeq == want)
    assert(want.nonEmpty)
  }

  test("q145 Spark path equals the distributed golden cells") {
    import spark.implicits._
    val got = graft.ops.TableOps.pdfGrids(spark, SparkEntry.VerifyPdfGridDocs)
      .as[(Long, Long, Long, Long, Long, String)].collect().sorted
    val want = PdfGridDocs.goldenCells(spark, SparkEntry.VerifyPdfGridDocs)
      .as[PdfGridDocs.GoldenGridCell].collect()
      .map(g => (g.doc_id, g.page.toLong, g.table_idx.toLong, g.row_idx.toLong,
        g.col_idx.toLong, g.cell_text))
      .sorted
    assert(got.toSeq == want.toSeq)
  }
}
