package graft.extract

import graft.text.TextAlgos.mix64

/** From-scratch page rasterizer over REALLY-PARSED PDF runs — the S2/S3
  * "PDF → page images" path (the reference rasterizes at dpi 600 for
  * the UI and dpi 300 for the signature module; ref: app.py:271,
  * src/signature_module/signature_extraction.py:85). No renderer or
  * font jar exists in this sandbox, so the GLYPHS are a deterministic
  * synthetic 5×7 bitmap font (one 35-bit mask per printable ASCII
  * char — a constant table, interpolated verbatim into the DuckDB
  * oracle like any other shared constant); everything else is real
  * rasterization: glyph placement in page point space, exact floor-div
  * dpi scaling, page-bound clipping, compositing into a byte raster —
  * and the query path closes with a REAL PNG encode→decode round trip,
  * computing every statistic from the DECODED raster.
  *
  * Exact pixel math (reproducible in SQL without a raster): char `ci`
  * of a run occupies the `CellW`×`CellH` pt cell at (x + CellW·ci,
  * yTop) where yTop = pageH − yPdf; glyph bit (bx,by) covers the point
  * (x + CellW·ci + bx, yTop + by); a point p spans pixels
  * [floor(p·dpi/72), floor((p+1)·dpi/72)) per axis — integral for ANY
  * dpi including 600 and 300. Points outside the page clip in POINT
  * space (so at dpi 72, point == pixel and the oracle's bounds match
  * literally).
  */
object PdfRasterizer {

  val PageWPt = 612
  val CellW = 6; val CellH = 8 // pt per char cell
  val GlyphW = 5; val GlyphH = 7

  /** 35-bit glyph masks for '!'..'~' (index = code − 33); space and any
    * non-printable draw nothing. Deterministic splitmix64 draws — a
    * synthetic font with realistic ~50% ink density, constant across
    * engines.
    */
  val glyphBits: Array[Long] =
    (33 to 126).map(c => mix64(0xF0107L * c + 0x9e37L) & ((1L << 35) - 1)).toArray

  final case class PageBitmap(page: Int, width: Int, height: Int, pixels: Array[Byte])

  @inline private def lo(pt: Int, dpi: Int): Int = pt * dpi / 72
  @inline private def hi(pt: Int, dpi: Int): Int = (pt + 1) * dpi / 72

  /** Rasterize every page of a parsed doc at `dpi` (0 background,
    * 255 ink). Out-of-page glyph points clip; pages without runs come
    * back blank, so page count always equals the container's.
    */
  def rasterize(doc: PdfContentParser.PdfDoc, dpi: Int): Seq[PageBitmap] =
    doc.pageHeights.zipWithIndex.map { case (hPt, page) =>
      val w = math.max(1, lo(PageWPt, dpi))
      val h = math.max(1, lo(hPt, dpi))
      val img = new Array[Byte](w * h)
      doc.runs.iterator.filter(_.page == page).foreach { r =>
        val yTop = hPt - r.yPdf
        var ci = 0
        while (ci < r.text.length) {
          val code = r.text.charAt(ci).toInt
          if (code >= 33 && code <= 126) {
            val bits = glyphBits(code - 33)
            var b = 0
            while (b < GlyphW * GlyphH) {
              if (((bits >> b) & 1L) == 1L) {
                val ptx = r.x + CellW * ci + b % GlyphW
                val pty = yTop + b / GlyphW
                if (ptx >= 0 && ptx < PageWPt && pty >= 0 && pty < hPt) {
                  var py = lo(pty, dpi)
                  val pyEnd = hi(pty, dpi)
                  while (py < pyEnd) {
                    var px = lo(ptx, dpi)
                    val pxEnd = hi(ptx, dpi)
                    while (px < pxEnd) { img(py * w + px) = -1; px += 1 }
                    py += 1
                  }
                }
              }
              b += 1
            }
          }
          ci += 1
        }
      }
      PageBitmap(page, w, h, img)
    }

  /** Ink statistics of a bitmap: (ink pixel count, Σ (px + py·width)) —
    * the order-insensitive placement checksum the oracle re-derives.
    */
  def inkStats(pb: PageBitmap): (Long, Long) = {
    var ink = 0L; var pos = 0L; var i = 0
    while (i < pb.pixels.length) {
      if (pb.pixels(i) != 0) { ink += 1; pos += i }
      i += 1
    }
    (ink, pos)
  }
}
