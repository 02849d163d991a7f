package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.BpeOps

/** Local truth for the BPE family: an independent naive reference BPE
  * (symbol LISTS, explicit leftmost-first non-overlapping merge scan —
  * not the engine's packed-string replace trick) must agree with the
  * engine on merges, final symbolizations, and encodes. Planted odd
  * same-symbol runs pin the leftmost semantics the packed representation
  * claims to preserve.
  */
class BpeOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  private def sha(s: String): String = java.security.MessageDigest.getInstance("SHA-256")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** True-BPE reference over a word histogram. `floor` mirrors the
    * engine's MinWordCount: pair statistics come only from words at or
    * above the floor, but learned merges apply to EVERY word (the
    * mapping stays total — the engine's encodeWord contract).
    */
  private def refBpe(hist: Map[String, Long], nMerges: Int, floor: Long = 1L)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    def mergeLeftmost(s: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += (l + r); i += 2 }
        else { out += s(i); i += 1 }
      }
      out.toSeq
    }
    var syms: Map[String, Seq[String]] = hist.keys.map(w => w -> w.map(_.toString)).toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((w, c) <- hist if c >= floor; pair <- syms(w).sliding(2) if pair.length == 2)
        counts((pair(0), pair(1))) += c
      if (counts.isEmpty) done = true
      else {
        val ((l, rr), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((r, l, rr, c))
        syms = syms.map { case (w, s) => w -> mergeLeftmost(s, l, rr) }
        r += 1
      }
    }
    (merges.toSeq, syms)
  }

  /** Docs with planted odd/even same-symbol runs and shared stems. */
  private def corpus: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "aaaaa abab ababab banana"),
      (1L, "banana bandana banana scan scanner"),
      (2L, "aaaa aa a scan plan planner"),
      (3L, "window window windowing sort sorted sort"),
      (4L, "abab aaab baaa banana plan")
    ).toDF("doc_id", "text")
  }

  private def localHist: Map[String, Long] =
    Seq("aaaaa", "abab", "ababab", "banana", "banana", "bandana", "banana",
      "scan", "scanner", "aaaa", "aa", "a", "scan", "plan", "planner",
      "window", "window", "windowing", "sort", "sorted", "sort",
      "abab", "aaab", "baaa", "banana", "plan")
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  test("train matches the naive leftmost-first reference on merges and symbolizations") {
    val n = 10
    val (refMerges, refSyms) = refBpe(localHist, n)
    val (gotMerges, gotMap) = BpeOps.train(corpus, n, minCount = 1L)
    assert(gotMerges == refMerges, "merge tables differ")
    assert(refMerges.size == n, "corpus must sustain all rounds")
    val gotSyms = gotMap.toMap
    assert(gotSyms.keySet == refSyms.keySet)
    refSyms.foreach { case (w, s) =>
      assert(gotSyms(w) == s.mkString("  "), s"word '$w'")
    }
    // the planted runs force the leftmost split: after merging ('a','a'),
    // "aaaaa" must symbolize as aa aa a (never aa a aa or a aa aa)
    val aaRank = refMerges.find(m => m._2 == "a" && m._3 == "a")
    assert(aaRank.nonEmpty, "corpus must merge (a,a)")
  }

  test("64-round training matches the naive reference (deep merge chain, no exhaustion)") {
    import spark.implicits._
    // deterministic corpus with enough symbol diversity to sustain 64
    // merges — the scale-relevant round count the driver queries now use
    val words = (0 until 400).map { i =>
      val base = "abcdefgh"(i % 8).toString
      base * (1 + i % 4) + "xyzw"((i / 8) % 4).toString + ("qrst"((i / 32) % 4).toString * (1 + i % 3))
    }
    val docs = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
    val hist = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val (refMerges, refSyms) = refBpe(hist, 64)
    assert(refMerges.size == 64, s"corpus exhausted at ${refMerges.size} rounds")
    val (gotMerges, gotMap) = BpeOps.train(docs, 64, minCount = 1L)
    assert(gotMerges == refMerges, "64-round merge tables differ")
    val gotSyms = gotMap.toMap
    refSyms.foreach { case (w, s) =>
      assert(gotSyms(w) == s.mkString("  "), s"word '$w'")
    }
  }

  test("early exhaustion: training stops when no pair remains, encode still covers every word") {
    import spark.implicits._
    // one two-char word: exactly one merge possible, then nothing left
    val tiny = Seq((0L, "ab ab a")).toDF("doc_id", "text")
    val (merges, mapping) = BpeOps.train(tiny, 5, minCount = 1L)
    assert(merges == Seq((1, "a", "b", 2L)))
    assert(mapping.toMap == Map("ab" -> "ab", "a" -> "a"))
  }

  test("training floor: singleton words carry no merge signal but still encode totally") {
    import spark.implicits._
    // unfloored, (z,z) would win round 1 (9 weighted pairs from the
    // singleton run vs 3 for (q,q)); the MinWordCount floor must exclude
    // the singleton from TRAINING while the learned merges still apply
    // to it at encode time
    val docs = Seq((0L, "qq qq qq zzzzzzzzzz qqq")).toDF("doc_id", "text")
    val hist = Map("qq" -> 3L, "zzzzzzzzzz" -> 1L, "qqq" -> 1L)
    val (unflooredMerges, _) = refBpe(hist, 1, 1L)
    assert(unflooredMerges.head._2 == "z" && unflooredMerges.head._3 == "z",
      "plant must make (z,z) the unfloored argmax")
    val (merges, mapping) = BpeOps.train(docs, 5) // default MinWordCount floor
    assert(merges == Seq((1, "q", "q", 3L)), s"floored merges: $merges")
    assert(mapping.toMap == Map("qq" -> "qq"), "mapping covers floored words only")
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-floor").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val enc = BpeOps.encode(spark, dir, 5).as[(Long, Int, Long, String)].collect()
    // qq->1 token (x3), zzzzzzzzzz->10 chars untouched, qqq->leftmost (qq, q)
    assert(enc.toSeq == Seq((0L, 5, 3L * 1 + 10 + 2,
      sha(Seq("qq", "qq", "qq",
        "z  z  z  z  z  z  z  z  z  z", "qq  q").mkString(" | ")))))
  }

  test("fertility matches the reference per-lang byte/token rollup") {
    import spark.implicits._
    val n = BpeOps.DefaultMerges
    val (_, refSyms) = refBpe(localHist, n, BpeOps.MinWordCount)
    val docWords = Map(
      0L -> Seq("aaaaa", "abab", "ababab", "banana"),
      1L -> Seq("banana", "bandana", "banana", "scan", "scanner"),
      2L -> Seq("aaaa", "aa", "a", "scan", "plan", "planner"),
      3L -> Seq("window", "window", "windowing", "sort", "sorted", "sort"),
      4L -> Seq("abab", "aaab", "baaa", "banana", "plan"))
    val langOf = Map(0L -> "en", 1L -> "en", 2L -> "de", 3L -> "de", 4L -> "fr")
    val want = langOf.groupBy(_._2).map { case (lang, m) =>
      val ids = m.keys.toSeq
      val ws = ids.flatMap(docWords)
      val words = ws.size.toLong
      val bytes = ws.map(_.getBytes("UTF-8").length.toLong).sum
      val toks = ws.map(w => refSyms(w).size.toLong).sum
      lang -> ((ids.size.toLong, words, bytes, toks,
        bytes * 100 / math.max(toks, 1), toks * 100 / math.max(words, 1)))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-fert").toString
    corpus.withColumn("lang",
      org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.typedLit(langOf), $"doc_id"))
      .write.parquet(s"$dir/documents.parquet")
    val got = BpeOps.fertility(spark, dir, n)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got == want)
    assert(got.keySet == Set("en", "de", "fr"))
  }

  test("encode matches the reference symbol counts and bytes; pair counts match") {
    import spark.implicits._
    val n = BpeOps.DefaultMerges
    val (_, refSyms) = refBpe(localHist, n, BpeOps.MinWordCount)
    val docWords = Map(
      0L -> Seq("aaaaa", "abab", "ababab", "banana"),
      1L -> Seq("banana", "bandana", "banana", "scan", "scanner"),
      2L -> Seq("aaaa", "aa", "a", "scan", "plan", "planner"),
      3L -> Seq("window", "window", "windowing", "sort", "sorted", "sort"),
      4L -> Seq("abab", "aaab", "baaa", "banana", "plan"))
    val want = docWords.map { case (id, ws) =>
      id -> ((ws.size,
        ws.map(w => refSyms(w).size.toLong).sum,
        sha(ws.map(w => refSyms(w).mkString("  ")).mkString(" | "))))
    }
    val got = {
      // encode() reads from an sf dir; drive the same logic on the local
      // corpus by round-tripping through a temp parquet table dir
      val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
      corpus.write.parquet(s"$dir/documents.parquet")
      BpeOps.encode(spark, dir, n)
        .as[(Long, Int, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    }
    assert(got == want)
    // round-1 pair counts: engine top-k equals reference counts
    val refCounts = {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((w, c) <- localHist if c >= BpeOps.MinWordCount;
           pair <- w.map(_.toString).sliding(2) if pair.length == 2)
        counts((pair(0), pair(1))) += c
      counts.toMap
    }
    val dir2 = java.nio.file.Files.createTempDirectory("graft-bpe2").toString
    corpus.write.parquet(s"$dir2/documents.parquet")
    val gotPairs = BpeOps.topPairs(spark, dir2, 1000)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(gotPairs == refCounts)
  }
}
