package graft

import graft.extract.Extract
import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file equality — the primary correctness gate (SURVEY.md §5.2.1):
  * per-turn text equality between the extractor output and the expectation
  * the generator embedded, over a deterministic corpus including
  * error-injected turns.
  */
class GoldenExtractionSpec extends AnyFunSuite {

  private val corpus = Synth.localCorpus(120) // includes one long conv (conv 0 and 101)

  test("corpus is non-trivial and covers all kinds incl. failures") {
    val kinds = corpus.groupBy(_.kind).view.mapValues(_.size).toMap
    assert(corpus.size > 2000, s"corpus too small: ${corpus.size}")
    Seq("html", "pdfir", "markdown", "tool", "plain").foreach { k =>
      assert(kinds.getOrElse(k, 0) > 20, s"kind $k underrepresented: $kinds")
    }
    val failures = corpus.count(_.expected_failure.isDefined)
    assert(failures > 10, s"too few error-injected turns: $failures")
    assert(failures.toDouble / corpus.size < 0.10, "failure rate too high")
  }

  test("sniffer classifies every synthetic turn correctly") {
    corpus.foreach { g =>
      val got = Extract.sniff(g.text)
      assert(got == g.kind, s"(${g.conv_id},${g.turn_idx}) sniffed $got expected ${g.kind}\n--- text:\n${g.text.take(300)}")
    }
  }

  test("per-turn text equality vs golden, all kinds") {
    var checked = 0
    corpus.foreach { g =>
      val (_, res) = Extract.one(g.text)
      assert(
        res.failure == g.expected_failure,
        s"(${g.conv_id},${g.turn_idx}) kind=${g.kind} failure=${res.failure} expected=${g.expected_failure}\n--- text:\n${g.text.take(400)}")
      assert(
        res.text == g.expected_text,
        s"(${g.conv_id},${g.turn_idx}) kind=${g.kind}\n--- got:\n${res.text}\n--- expected:\n${g.expected_text}\n--- input:\n${g.text.take(600)}")
      checked += 1
    }
    info(s"checked $checked turns")
  }

  test("spans are in-bounds, monotone, non-overlapping") {
    corpus.foreach { g =>
      val (_, res) = Extract.one(g.text)
      var prevEnd = 0
      res.spans.foreach { sp =>
        assert(sp.start >= prevEnd && sp.end >= sp.start && sp.end <= res.text.length,
          s"(${g.conv_id},${g.turn_idx}) bad span $sp in len=${res.text.length}")
        prevEnd = sp.start // spans may touch but not overlap
        assert(sp.end >= sp.start)
        prevEnd = sp.end
      }
    }
  }

  test("per-turn SPAN equality vs the builder's by-construction layout") {
    var multi = 0; var code = 0; var line = 0
    corpus.foreach { g =>
      val (_, res) = Extract.one(g.text)
      assert(res.spans == g.expected_spans,
        s"(${g.conv_id},${g.turn_idx}) kind=${g.kind}\n--- got:\n${res.spans}\n--- expected:\n${g.expected_spans}\n--- text:\n${res.text.take(400)}")
      if (res.spans.length > 1) multi += 1
      code += res.spans.count(_.kind == "code")
      line += res.spans.count(_.kind == "line")
    }
    // the equality must be exercised on real structure, not all-singletons
    assert(multi > 100, s"too few multi-span turns: $multi")
    assert(code > 20, s"too few code spans: $code")
    assert(line > 100, s"too few line spans: $line")
  }

  test("extraction is total: never throws on mutated inputs") {
    // mutate corpus texts: truncate at arbitrary points, inject garbage
    corpus.take(500).zipWithIndex.foreach { case (g, i) =>
      val t = g.text
      val cut = if (t.isEmpty) 0 else math.floorMod(Synth.mix(i.toLong), t.length.toLong).toInt
      val mutated = Seq(
        t.substring(0, cut),
        t.substring(0, cut) + "<<<&&&" + t.substring(cut),
        t.reverse
      )
      mutated.foreach { m =>
        val (_, res) = Extract.one(m) // must not throw
        assert(res.text != null)
      }
    }
  }

  test("plain text is a fixpoint after canonicalization") {
    corpus.filter(_.kind == "plain").foreach { g =>
      val (_, res) = Extract.one(g.expected_text)
      assert(res.text == g.expected_text)
    }
  }

  test("pdf reading order is reconstructed from coordinates: run-stream order is irrelevant") {
    // the north-star W2 invariant stated as a property: the OCR word
    // stream arrives in arbitrary order at scale (parallel page workers),
    // so extraction must be a pure function of the run COORDINATES —
    // shuffling the input lines may not change the output
    val pdfTurns = corpus.filter(g => g.kind == "pdfir" && g.expected_failure.isEmpty)
    assert(pdfTurns.size > 20)
    pdfTurns.foreach { g =>
      val lines = g.text.split('\n').toSeq
      // deterministic shuffle: sort by splitmix of (index, conv) — a
      // fixed permutation unrelated to the original order
      val shuffled = lines.zipWithIndex
        .sortBy { case (_, i) => graft.text.TextAlgos.mix64(i * 7919L + g.conv_id.hashCode) }
        .map(_._1).mkString("\n")
      val (_, a) = Extract.one(g.text)
      val (_, b) = Extract.one(shuffled)
      assert(b.text == a.text,
        s"(${g.conv_id},${g.turn_idx}) extraction depends on run-stream order")
    }
  }

  test("generator is deterministic (same seed, same corpus)") {
    val again = Synth.localCorpus(120)
    assert(again == corpus)
  }
}
