package graft.extract

import scala.collection.mutable

/** Table/grid detection over the positioned PDF-IR word stream — the
  * layout-analysis move of a Document-AI system: OCR gives words with
  * coordinates; rows of words sharing the SAME column x-positions across
  * consecutive lines are a table (ref: src/processing.py:55-84 reads the
  * positioned word stream; the reference flattens it — grid recovery is
  * the structured upgrade, the pdfir twin of q133's HTML cells).
  *
  * Input is the `p<page> <x> <y> "<text>"` run format `PdfIrExtractor`
  * reads. Contract (each clause pinned by PdfGridSpec):
  *  - Runs group by (page, y) into candidate rows; a row's SIGNATURE is
  *    its sorted distinct x-vector. Maximal blocks of CONSECUTIVE ys (in
  *    the page's sorted y order) with an IDENTICAL signature of ≥ 2
  *    columns and ≥ 2 rows are tables.
  *  - A prose line between table rows breaks consecutiveness: each
  *    fragment must re-qualify (≥ 2 rows) on its own. Two adjacent grids
  *    with different x-signatures are separate tables.
  *  - Tables index per doc in (page, first y) order; rows by y, columns
  *    by x. Cell text strips ` (Confidence: d.dd)` annotations; a
  *    duplicated (y, x-band) resolves to the (x, text)-least run — a
  *    deterministic tiebreak, NOT stream order.
  *  - Malformed run lines are SKIPPED (detection is lenient where
  *    whole-turn extraction fails the turn — a layout pass on a noisy
  *    stream must keep what it can). Never throws.
  */
object PdfGridExtractor {

  final case class GridCell(
      page: Int, tableIdx: Int, rowIdx: Int, colIdx: Int, text: String)

  /** x-jitter tolerance for the OCR-noise path (q155): distinct x
    * positions within `JitterTol` px cluster into one column band.
    */
  val JitterTol = 3

  /** `tol` = 0 is the exact path (each distinct x is its own column);
    * `tol` > 0 clusters a page's sorted distinct xs greedily — a gap
    * > tol starts a new band — so ±1-2 px OCR jitter lands in one
    * column. Banding is page-global: an adversarial run BETWEEN two
    * columns (within tol of both) would bridge them — acceptable for
    * layout detection, documented rather than hidden.
    */
  def extract(input: String, tol: Int = 0): Seq[GridCell] = {
    val runs = mutable.ArrayBuffer.empty[PdfIrExtractor.Run]
    input.split('\n').foreach { line =>
      if (line.nonEmpty) PdfIrExtractor.parseRun(line).foreach(runs += _)
    }
    if (runs.isEmpty) return Seq.empty

    val out = mutable.ArrayBuffer.empty[GridCell]
    var tableIdx = 0
    // rows per (page, y): a duplicated (y, x-band) resolves to the
    // (x, text)-least run (deterministic under any partitioning)
    val byPage = runs.groupBy(_.page).toSeq.sortBy(_._1)
    byPage.foreach { case (page, pageRuns) =>
      // page-global x banding (identity when tol == 0)
      val band = mutable.HashMap.empty[Int, Int]
      var c = -1
      var prev = Int.MinValue
      pageRuns.map(_.x).distinct.sorted.foreach { x =>
        if (c < 0 || x - prev > tol) c += 1
        band(x) = c
        prev = x
      }
      val rows: Seq[(Int, Map[Int, String])] = pageRuns.groupBy(_.y).toSeq
        .map { case (y, rs) =>
          val cells = mutable.LinkedHashMap.empty[Int, String]
          rs.sortBy(r => (r.x, r.text)).foreach { r =>
            val b = band(r.x)
            if (!cells.contains(b)) cells(b) = r.text
          }
          (y, cells.toMap)
        }
        .sortBy(_._1)
      // walk sorted ys, slicing maximal equal-signature blocks
      var i = 0
      while (i < rows.length) {
        val sig = rows(i)._2.keys.toSeq.sorted
        var j = i + 1
        while (j < rows.length && rows(j)._2.keys.toSeq.sorted == sig) j += 1
        if (sig.length >= 2 && j - i >= 2) {
          var r = 0
          while (i + r < j) {
            val (_, cells) = rows(i + r)
            var c = 0
            while (c < sig.length) {
              out += GridCell(page, tableIdx, r, c,
                PdfIrExtractor.stripConfidence(cells(sig(c))))
              c += 1
            }
            r += 1
          }
          tableIdx += 1
        }
        i = j
      }
    }
    out.toSeq
  }
}
