package graft

import graft.text.TextAlgos._
import org.scalatest.funsuite.AnyFunSuite

class TextAlgosSpec extends AnyFunSuite {

  private def words(s: String) = tokenize(s)

  test("jaccard: identical=1000, disjoint=0, partial in between") {
    val a = shingleHashes(words("a b c d e f g h"), 3)
    val b = shingleHashes(words("a b c d e f g h"), 3)
    val c = shingleHashes(words("x y z w v u t s"), 3)
    assert(jaccardX1000(a, b) == 1000)
    assert(jaccardX1000(a, c) == 0)
    val d = shingleHashes(words("a b c d e f g x"), 3)
    val j = jaccardX1000(a, d)
    assert(j > 300 && j < 1000, s"partial jaccard $j")
  }

  test("minhash+LSH: near-identical docs share a band key, unrelated don't") {
    val base = (1 to 200).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 200).map(i => if (i == 77) "CHANGED" else s"w$i").mkString(" ")
    val unrelated = (1 to 200).map(i => s"z$i").mkString(" ")
    def bands(t: String) =
      bandKeys(minhash(shingleHashes(words(t), 3), 64), 16).toSet
    assert(bands(base).intersect(bands(nearDup)).nonEmpty, "near-dup must collide in >=1 band")
    assert(bands(base).intersect(bands(unrelated)).isEmpty, "unrelated must not collide")
  }

  test("simhash: hamming small for near-dups, large for unrelated") {
    val base = (1 to 300).map(i => s"w$i").mkString(" ")
    val nearDup = base + " extra"
    val unrelated = (1 to 300).map(i => s"q$i").mkString(" ")
    val h1 = simhash(words(base))
    val h2 = simhash(words(nearDup))
    val h3 = simhash(words(unrelated))
    assert(hamming(h1, h2) <= 6, s"near-dup hamming ${hamming(h1, h2)}")
    assert(hamming(h1, h3) >= 15, s"unrelated hamming ${hamming(h1, h3)}")
  }

  test("winnowing: deterministic, subset of gram space, detects containment") {
    val doc = (1 to 100).map(i => s"tok$i").mkString(" ")
    val f1 = winnow(words(doc), 5, 4)
    val f2 = winnow(words(doc), 5, 4)
    assert(f1.sameElements(f2))
    assert(f1.nonEmpty)
    // a document containing the same passage shares fingerprints
    val containing = "prefix words here " + doc + " suffix words"
    val f3 = winnow(words(containing), 5, 4).toSet
    val shared = f1.count(f3.contains)
    assert(shared.toDouble / f1.length > 0.8, s"containment recall $shared/${f1.length}")
  }

  test("cosine: identity=1, orthogonal=0, deterministic bucket") {
    val v = Array(1.0f, 2.0f, 3.0f)
    assert(math.abs(cosine(v, v) - 1.0) < 1e-12)
    assert(math.abs(cosine(Array(1f, 0f), Array(0f, 1f))) < 1e-12)
    val b1 = hyperplaneBucket(v, 8)
    val b2 = hyperplaneBucket(v, 8)
    assert(b1 == b2 && b1 >= 0 && b1 < 256)
  }

  test("hashString: stable across calls and not Scala hashCode") {
    assert(hashString("abc") == hashString("abc"))
    assert(hashString("abc") != "abc".hashCode.toLong)
    assert(hashString("abc") != hashString("abd"))
  }
}
