package graft

import graft.extract.Extract
import graft.text.TextAlgos
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based guarantees (SURVEY.md §5.2.3) over arbitrary inputs —
  * pure-Scala level, no SparkSession needed.
  */
object TextProperties extends Properties("graft.text") {

  // strings that exercise the extractors: plain words, markup fragments,
  // entities, fences, unicode, and pathological nesting
  private val fragment: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.oneOf("<div>", "</div>", "<p>", "<a href='/x'>", "</a>", "<script>",
      "</script>", "&amp;", "&#65;", "&bogus;", "<", ">", "&", "```",
      "```scala", "# ", "[tool:bash]", "p1 10 20 \"", "\n", "\t", " ",
      "<!-- c -->", "<b", "eé中😀"),
    Gen.listOf(Gen.oneOf('a', 'b', ' ', '<', '>', '&', ';', '#', '`', '\n'))
      .map(_.mkString))
  private val anyDoc: Gen[String] =
    Gen.listOf(fragment).map(_.mkString(" ")).map(_.take(4000))

  property("extraction is total and deterministic") = forAll(anyDoc) { s =>
    val (k1, r1) = Extract.one(s)
    val (k2, r2) = Extract.one(s)
    k1 == k2 && r1 == r2
  }

  property("spans are in-bounds, monotone, non-overlapping") = forAll(anyDoc) { s =>
    val (_, r) = Extract.one(s)
    val n = r.text.length
    val inBounds = r.spans.forall(sp => sp.start >= 0 && sp.start <= sp.end && sp.end <= n)
    val monotone = r.spans.sliding(2).forall {
      case Seq(a, b) => a.end <= b.start
      case _         => true
    }
    inBounds && monotone
  }

  private val plainWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
  private val plainText: Gen[String] =
    Gen.nonEmptyListOf(plainWord).map(_.mkString(" "))

  property("plain text is a fixpoint") = forAll(plainText) { s =>
    // generator yields single-space-joined words with no markup: the
    // plain normalizer must pass it through unchanged
    val (kind, r) = Extract.one(s)
    (kind == "plain" || kind == "markdown") ==> Prop(r.text.nonEmpty && r.failure.isEmpty &&
      (kind != "plain" || r.text == s))
  }

  private val tokensGen: Gen[Array[String]] =
    Gen.listOf(plainWord).map(_.toArray)

  property("jaccard is bounded and symmetric; self-jaccard is 1000") =
    forAll(tokensGen, tokensGen) { (a, b) =>
      val sa = TextAlgos.shingleHashes(a, 3)
      val sb = TextAlgos.shingleHashes(b, 3)
      val j1 = TextAlgos.jaccardX1000(sa, sb)
      val j2 = TextAlgos.jaccardX1000(sb, sa)
      j1 == j2 && j1 >= 0 && j1 <= 1000 && TextAlgos.jaccardX1000(sa, sa) == 1000
    }

  property("minhash: equal sets give equal signatures; length is k") =
    forAll(tokensGen) { toks =>
      val sh = TextAlgos.shingleHashes(toks, 3)
      val s1 = TextAlgos.minhash(sh, 64)
      val s2 = TextAlgos.minhash(sh.reverse, 64) // order-independent
      s1.length == 64 && s1.sameElements(s2)
    }

  property("simhash: deterministic; hamming(self)=0; bounded by 64") =
    forAll(tokensGen, tokensGen) { (a, b) =>
      val ha = TextAlgos.simhash(a)
      val hb = TextAlgos.simhash(b)
      TextAlgos.hamming(ha, ha) == 0 &&
      TextAlgos.hamming(ha, hb) >= 0 && TextAlgos.hamming(ha, hb) <= 64 &&
      ha == TextAlgos.simhash(a)
    }

  property("winnowing fingerprints are a subset of all k-gram hashes") =
    forAll(tokensGen) { toks =>
      val fps = TextAlgos.winnow(toks, k = 5, w = 4).toSet
      // recompute all ordered 5-gram rolling hashes via winnow with w=1
      // (window of one = every gram survives)
      val all = TextAlgos.winnow(toks, k = 5, w = 1).toSet
      fps.subsetOf(all)
    }

  // uniform bit patterns cover every exponent/mantissa regime, including
  // subnormals and the 16/17-digit values where JDK-4511638 over-prints
  private val anyDouble: Gen[Double] =
    Gen.choose(Long.MinValue, Long.MaxValue).map(java.lang.Double.longBitsToDouble)

  property("canonDouble: round-trips and is the SHORTEST correctly-rounded form") =
    forAll(anyDouble) { d =>
      (!d.isNaN && !d.isInfinite && d != 0.0) ==> {
        val s = TextAlgos.canonDouble(d)
        val roundTrips = java.lang.Double.parseDouble(s) == d
        // minimality guards the >=16-digit shortening gate: if any value
        // BELOW the gate could be written shorter, this fails
        val nDigits = new java.math.BigDecimal(s).stripTrailingZeros.precision
        val minimal = nDigits <= 1 || {
          val shorter = new java.math.BigDecimal(math.abs(d))
            .round(new java.math.MathContext(nDigits - 1, java.math.RoundingMode.HALF_EVEN))
          java.lang.Double.parseDouble(shorter.toString) != math.abs(d)
        }
        roundTrips && minimal
      }
    }
}
