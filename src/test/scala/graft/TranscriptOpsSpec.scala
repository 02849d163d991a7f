package graft

import graft.ops.TranscriptOps
import graft.synth.{RetryCorpus, Synth, SynthDataset}
import org.scalatest.funsuite.AnyFunSuite

/** Local truths for the transcript-protocol audits: a driver-side
  * recompute over the golden corpus must match the engine's windowed /
  * aggregated answers exactly, and the corpus must actually exercise
  * every anomaly counter (unclosed frames, alternation breaks,
  * tool-after-user) so green means the predicates fired, not that the
  * counts were all zero.
  */
class TranscriptOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  private val NConvs = 60
  private lazy val corpus = Synth.localCorpus(NConvs).map(_.turn)

  test("toolCallStats matches a driver-side recompute and exercises unclosed frames") {
    import spark.implicits._
    val want = corpus.filter(_.role == "tool").groupBy(_.tool).map { case (tool, ts) =>
      tool -> ((
        ts.size.toLong,
        ts.map(_.conv_id).distinct.size.toLong,
        ts.count(t => !t.text.endsWith("[/tool]")).toLong,
        ts.map(_.text.length.toLong).sum,
        ts.map(_.turn_idx.toLong).sum * 10000L / ts.size))
    }
    val got = TranscriptOps.toolCallStats(SynthDataset.turns(spark, NConvs.toLong))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got.keySet == Set("browser", "pdf_reader", "shell"))
    assert(got == want)
    assert(got.values.map(_._3).sum > 0, "corpus must contain unclosed tool frames")
  }

  test("transitionMatrix matches a driver recompute; probabilities row-normalize") {
    import spark.implicits._
    def state(t: graft.model.Turn): String =
      if (t.role == "tool") s"tool:${t.tool}" else t.role
    val trans = corpus.groupBy(_.conv_id).toSeq.flatMap { case (_, ts) =>
      val s = ts.sortBy(_.turn_idx).map(state)
      s.zip(s.drop(1))
    }
    val want = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTotals = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = TranscriptOps.transitionMatrix(SynthDataset.turns(spark, NConvs.toLong))
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.view.mapValues(_._1).toMap == want)
    got.foreach { case ((from, _), (n, p)) =>
      assert(p == n * 10000L / fromTotals(from), s"$from p_x10000")
    }
    // every from-state's probabilities must sum to ~1 (floor rounding)
    got.keys.map(_._1).toSet.foreach { f: String =>
      val s = got.collect { case ((`f`, _), (_, p)) => p }.sum
      assert(s > 10000L - got.size && s <= 10000L, s"$f row sum $s")
    }
    assert(got.keys.exists(_._1.startsWith("tool:")), "tool states must appear")
  }

  test("contextPrune keeps first + last-K; long convs actually drop turns") {
    import spark.implicits._
    val k = TranscriptOps.ContextKeepTail
    val want = corpus.groupBy(_.conv_id).toSeq.flatMap { case (cid, ts) =>
      val mn = ts.map(_.turn_idx).min; val mx = ts.map(_.turn_idx).max
      ts.filter(t => t.turn_idx == mn || t.turn_idx > mx - k)
        .map(t => (cid, t.turn_idx, t.role,
          if (t.turn_idx == mn) "first" else "tail"))
    }.sorted
    val got = TranscriptOps.contextPrune(SynthDataset.turns(spark, NConvs.toLong))
      .as[(String, Int, String, String)].collect().sorted
    assert(got.toSeq == want)
    val dropped = corpus.size - got.length
    assert(dropped > 0, "the Zipf corpus must contain convs longer than 1+K")
    assert(corpus.groupBy(_.conv_id).exists(_._2.size <= k + 1),
      "short convs must also occur (kept whole)")
  }

  test("roleAudit matches a driver-side recompute and exercises every anomaly counter") {
    import spark.implicits._
    val want = corpus.groupBy(_.conv_id).map { case (conv, ts) =>
      val s = ts.sortBy(_.turn_idx)
      val roles = s.map(_.role)
      val nonToolPrev = roles.scanLeft(Option.empty[String]) {
        case (prev, r) => if (r != "tool") Some(r) else prev
      }
      val altBreaks = roles.zip(nonToolPrev).count {
        case (r, Some(p)) => r != "tool" && r == p
        case _            => false
      }
      val adj = roles.zip(roles.drop(1))
      conv -> ((
        s.size.toLong,
        roles.count(_ == "tool").toLong,
        adj.count { case (a, b) => a == b }.toLong,
        altBreaks.toLong,
        adj.count { case (a, b) => a == "user" && b == "tool" }.toLong,
        s.map(_.ts.getTime).zip(s.map(_.ts.getTime).drop(1)).count { case (a, b) => b < a }.toLong,
        roles.head,
        roles.last))
    }
    val got = TranscriptOps.roleAudit(SynthDataset.turns(spark, NConvs.toLong))
      .as[(String, Long, Long, Long, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(v == want(k), s"conv $k") }
    assert(got.values.map(_._3).sum > 0, "corpus must contain same-role adjacency")
    assert(got.values.map(_._4).sum > 0, "corpus must contain alternation breaks")
    assert(got.values.map(_._5).sum > 0, "corpus must contain tool-after-user")
    assert(got.values.map(_._6).sum == 0, "synth timestamps are strictly increasing")
  }

  // --- retry/loop corpus family (q116-q118) --------------------------------

  private val NBase = 48
  private lazy val retryCorpus = RetryCorpus.localCorpus(NBase)

  private def sha256hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("convNearDup: exact df-capped Jaccard equals a driver recompute; retries found") {
    import spark.implicits._
    val shaSets = retryCorpus.groupBy(_.conv_id)
      .map { case (c, ts) => c -> ts.map(t => sha256hex(t.text)).toSet }
    val df = shaSets.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    val rareSets = shaSets.map { case (c, s) => c -> s.filter(df(_) <= 4) }
    val convs = rareSets.keys.toSeq.sorted
    val want = (for {
      ai <- convs.indices; bi <- (ai + 1) until convs.length
      a = convs(ai); b = convs(bi)
      inter = (rareSets(a) & rareSets(b)).size.toLong if inter > 0
      union = rareSets(a).size + rareSets(b).size - inter
      jac = inter * 10000L / union if jac >= 5000L
    } yield (a, b) -> ((inter, rareSets(a).size.toLong, rareSets(b).size.toLong, jac))).toMap
    val got = TranscriptOps.convNearDup(RetryCorpus.turns(spark, NBase.toLong))
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got == want)
    assert(got.nonEmpty, "planted retry twins must surface as near-dup pairs")
    assert(got.values.exists(_._4 < 10000L), "perturbed retries must score below 1.0")
    assert(got.keys.forall { case (a, b) => a < b }, "pair ordering must be strict")
  }

  test("loopRuns equals a driver recompute; planted loops spike max_run_len") {
    import spark.implicits._
    val want = retryCorpus.groupBy(_.conv_id).map { case (c, ts) =>
      val s = ts.sortBy(_.turn_idx).map(t => (t.role, t.text))
      val runLens = s.foldLeft(List.empty[((String, String), Long)]) {
        case (acc, cur) => acc match {
          case (h, n) :: rest if h == cur => (h, n + 1L) :: rest
          case _                          => (cur, 1L) :: acc
        }
      }.map(_._2)
      c -> ((runLens.size.toLong, s.size.toLong, runLens.max,
        runLens.filter(_ > 1L).map(_ - 1L).sum))
    }
    val got = TranscriptOps.loopRuns(RetryCorpus.turns(spark, NBase.toLong))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == want)
    assert(got.values.exists(_._3 >= 3L), "planted stuck loops must produce runs >= 3")
    assert(got.values.count(_._3 == 1L) > 0, "loop-free convs must stay at run length 1")
  }

  test("convDedupClusters equals a driver union-find; twins cluster, canonical is min") {
    import spark.implicits._
    // re-derive q116's pairs brute-force, then close them with union-find
    val shaSets = retryCorpus.groupBy(_.conv_id)
      .map { case (c, ts) => c -> ts.map(t => sha256hex(t.text)).toSet }
    val df = shaSets.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    val rareSets = shaSets.map { case (c, s) => c -> s.filter(df(_) <= 4) }
    val convs = rareSets.keys.toSeq.sorted
    val parent = scala.collection.mutable.Map(convs.map(c => c -> c): _*)
    def find(c: String): String =
      if (parent(c) == c) c else { val r = find(parent(c)); parent(c) = r; r }
    for {
      ai <- convs.indices; bi <- (ai + 1) until convs.length
      a = convs(ai); b = convs(bi)
      inter = (rareSets(a) & rareSets(b)).size.toLong if inter > 0
      union = rareSets(a).size + rareSets(b).size - inter
      if inter * 10000L / union >= 5000L
    } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    val want = convs.map { c =>
      val members = convs.filter(find(_) == find(c))
      c -> ((members.min, c == members.min))
    }.toMap
    val got = TranscriptOps.convDedupClusters(RetryCorpus.turns(spark, NBase.toLong))
      .as[(String, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want)
    assert(got.exists { case (c, (canon, _)) => c != canon },
      "planted retry twins must form multi-conv clusters")
    assert(got.count { case (c, (canon, _)) => c == canon } < got.size,
      "at least one non-canonical member must exist")
    // a retry twin always clusters under its base conv (rc- sorts below rr-)
    got.collect { case (c, (canon, _)) if c.startsWith("rr-") && canon != c =>
      assert(canon == c.replace("rr-", "rc-"), s"$c clustered under $canon")
    }
  }

  test("convSegments matches a driver fold; the corpus genuinely splits") {
    import spark.implicits._
    val gap = TranscriptOps.SegmentGapUs
    val want = retryCorpus.groupBy(_.conv_id).toSeq.flatMap { case (cid, ts) =>
      val sorted = ts.sortBy(_.turn_idx)
      var seg = 0L
      var prevUs = Long.MinValue
      val tagged = sorted.map { t =>
        val us = t.ts.getTime * 1000L
        if (prevUs != Long.MinValue && us - prevUs > gap) seg += 1
        prevUs = us
        (seg, t.turn_idx, us)
      }
      tagged.groupBy(_._1).map { case (s, g) =>
        (cid, s, g.size.toLong, g.map(_._2).min, g.map(_._2).max,
          g.map(_._3).max - g.map(_._3).min)
      }
    }.sorted
    val got = TranscriptOps.convSegments(RetryCorpus.turns(spark, NBase.toLong))
      .as[(String, Long, Long, Int, Int, Long)].collect().sorted
    assert(got.toSeq == want)
    assert(want.exists(_._2 > 0L), "corpus must contain multi-segment convs")
    assert(want.groupBy(_._1).exists(_._2.size == 1) ||
      want.exists(_._2 == 0L), "segment 0 must exist")
  }

  test("toolLatency equals a driver recompute with exact rank quantiles") {
    import spark.implicits._
    val lats = retryCorpus.groupBy(_.conv_id).toSeq.flatMap { case (_, ts) =>
      val s = ts.sortBy(_.turn_idx)
      s.zip(s.drop(1)).collect {
        case (prev, cur) if cur.role == "tool" =>
          cur.tool -> (cur.ts.getTime - prev.ts.getTime) * 1000L
      }
    }
    val want = lats.groupBy(_._1).map { case (tool, xs) =>
      val v = xs.map(_._2).sorted
      val n = v.size.toLong
      def atRank(p: Long) = v(((n * p + 99L) / 100L - 1L).toInt)
      tool -> ((n, v.min, v.max, v.map(BigInt(_)).sum * 10000 / n, atRank(50), atRank(99)))
    }
    val got = TranscriptOps.toolLatency(RetryCorpus.turns(spark, NBase.toLong))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, BigInt(r._5), r._6, r._7))).toMap
    assert(got == want)
    assert(got.size >= 2, "corpus must exercise more than one tool")
    got.values.foreach { case (_, mn, mx, _, p50, p99) =>
      assert(mn < mx, "jittered gaps must produce real spread")
      assert(p50 <= p99 && mn <= p50 && p99 <= mx)
    }
  }

  test("convFingerprintDups: exact replays collapse; perturbed twins do not") {
    import spark.implicits._
    val fps = retryCorpus.groupBy(_.conv_id).map { case (c, ts) =>
      val joined = ts.sortBy(_.turn_idx).map(t => sha256hex(t.text)).mkString
      c -> sha256hex(joined)
    }
    val want = fps.groupBy(_._2).collect {
      case (fp, members) if members.size >= 2 =>
        fp -> ((members.size.toLong, members.map(_._1).min))
    }.toMap
    val got = TranscriptOps.convFingerprintDups(RetryCorpus.turns(spark, NBase.toLong))
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want)
    assert(got.nonEmpty, "some retry twins must replay unperturbed (exact dups)")
    // every exact-dup group really is turn-for-turn identical text
    val textByConv = retryCorpus.groupBy(_.conv_id)
      .view.mapValues(_.sortBy(_.turn_idx).map(_.text)).toMap
    fps.groupBy(_._2).values.filter(_.size >= 2).foreach { members =>
      val texts = members.map(m => textByConv(m._1)).toSeq
      assert(texts.distinct.size == 1, "fingerprint collision on differing convs")
    }
    // and perturbed twins stay OUT of the exact groups (near-dup's job)
    val exactConvs = fps.groupBy(_._2).values.filter(_.size >= 2).flatten.map(_._1).toSet
    val perturbedTwin = retryCorpus.map(_.conv_id).distinct
      .filter(c => c.startsWith("rr-") && !exactConvs.contains(c))
    assert(perturbedTwin.nonEmpty, "corpus must also contain perturbed (non-exact) twins")
  }

  test("toolOutcomes equals a driver recompute; stuck loops end their convs in err") {
    import spark.implicits._
    val frames = retryCorpus.filter(_.role == "tool").map { t =>
      val status =
        if (t.text.startsWith(s"[tool:${t.tool} status=err]")) "err"
        else if (t.text.startsWith(s"[tool:${t.tool} status=ok]")) "ok"
        else "unknown"
      (t.conv_id, t.turn_idx, t.tool, status)
    }
    val want = frames.groupBy(_._3).map { case (tool, fs) =>
      val nOk = fs.count(_._4 == "ok").toLong
      val nErr = fs.count(_._4 == "err").toLong
      val byConv = fs.groupBy(_._1)
      val endErr = byConv.values.count(_.maxBy(_._2)._4 == "err").toLong
      tool -> ((fs.size.toLong, nOk, nErr, nErr * 10000L / fs.size,
        byConv.size.toLong, endErr))
    }
    val got = TranscriptOps.toolOutcomes(RetryCorpus.turns(spark, NBase.toLong))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got == want)
    // every frame parsed: the prefix test must never fall through
    assert(frames.forall(_._4 != "unknown"), "corpus frames must all parse")
    // the planted terminal loops are shell errors — only shell has them
    assert(got("shell")._6 > 0L, "stuck-loop convs must end shell in err")
    assert(got("browser")._3 == 0L && got("pdf_reader")._3 == 0L,
      "only the loop tool errors in this corpus")
  }

  test("retryEditStats equals a driver recompute with exact prefix Levenshtein") {
    import spark.implicits._
    // q116's candidate pairs, re-derived brute force (same as above)
    val shaSets = retryCorpus.groupBy(_.conv_id)
      .map { case (c, ts) => c -> ts.map(t => sha256hex(t.text)).toSet }
    val df = shaSets.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    val rareSets = shaSets.map { case (c, s) => c -> s.filter(df(_) <= 4) }
    val convs = rareSets.keys.toSeq.sorted
    val cand = for {
      ai <- convs.indices; bi <- (ai + 1) until convs.length
      a = convs(ai); b = convs(bi)
      inter = (rareSets(a) & rareSets(b)).size.toLong if inter > 0
      union = rareSets(a).size + rareSets(b).size - inter
      if inter * 10000L / union >= 5000L
    } yield (a, b)
    def lev(a: String, b: String): Long = {
      val d = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = d(0); d(0) = i
        for (j <- 1 to b.length) {
          val cur = d(j)
          d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      d(b.length).toLong
    }
    val byConv = retryCorpus.groupBy(_.conv_id)
      .map { case (c, ts) => c -> ts.map(t => t.turn_idx -> t.text.take(256)).toMap }
    val want = cand.map { case (a, b) =>
      val (ta, tb) = (byConv(a), byConv(b))
      val dists = ta.keys.toSeq.filter(tb.contains).map(i => lev(ta(i), tb(i)))
      (a, b) -> ((dists.size.toLong, dists.count(_ == 0L).toLong,
        dists.count(_ > 0L).toLong, dists.sum, dists.max))
    }.toMap
    val got = TranscriptOps.retryEditStats(RetryCorpus.turns(spark, NBase.toLong))
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got == want)
    assert(got.values.exists(_._3 > 0L), "planted perturbations must register edits")
    assert(got.values.forall(v => v._2 + v._3 == v._1), "identical+perturbed == aligned")
    assert(got.values.exists(v => v._2 > 0L && v._3 > 0L),
      "twins mix replayed and perturbed turns")
  }

  test("gramNovelty equals a driver recompute; the retry wave collapses novelty") {
    import spark.implicits._
    val grams = retryCorpus.flatMap { t =>
      val ws = t.text.trim.split("\\s+").filter(_.nonEmpty)
      val day = t.ts.getTime / 86400000L
      ws.sliding(3).filter(_.length == 3).map(g => (day, g.mkString(" ")))
    }
    val perDayGram = grams.groupBy(identity).map { case ((d, g), o) => (d, g, o.size.toLong) }
    val perDay = perDayGram.groupBy(_._1)
      .map { case (d, rs) => d -> ((rs.size.toLong, rs.map(_._3).sum)) }
    val firstSeen = perDayGram.groupBy(_._2).map { case (g, rs) => g -> rs.map(_._1).min }
    val newPerDay = firstSeen.values.groupBy(identity).map { case (d, o) => d -> o.size.toLong }
    val want = perDay.map { case (d, (nd, no)) =>
      val nn = newPerDay.getOrElse(d, 0L)
      d -> ((no, nd, nn, nn * 10000L / nd))
    }
    val got = TranscriptOps.gramNovelty(RetryCorpus.turns(spark, NBase.toLong))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == want)
    assert(got.size >= 2, "corpus must span several days")
    val ordered = got.toSeq.sortBy(_._1).map(_._2._4)
    assert(ordered.last < ordered.head,
      "replayed retry twins must collapse later-day novelty below day 0's")
  }

  test("boilerplateTurns surfaces exactly the shared system preambles") {
    import spark.implicits._
    val got = TranscriptOps.boilerplateTurns(RetryCorpus.turns(spark, NBase.toLong))
      .as[(String, Long, Long, String, Long, Long)].collect()
    val preShas = RetryCorpus.Preambles.map(sha256hex).toSet
    assert(got.map(_._1).toSet == preShas,
      "only the planted preambles cross the min-convs bar")
    assert(got.forall(_._4 == "system"))
    // every conversation carries exactly one preamble occurrence
    assert(got.map(_._3).sum == retryCorpus.map(_.conv_id).distinct.size.toLong)
    got.foreach { r =>
      assert(r._6 == (r._2 - 1L) * r._5, s"savings arithmetic for ${r._1}")
    }
  }

  test("vocabDrift: exact deltas/ratios over a handcrafted change-set") {
    import spark.implicits._
    val prev = Seq("a a b c", "d d d").toDF("text")
    val next = Seq("a b b e", "d").toDF("text")
    val got = graft.ops.TranscriptOps.vocabDrift(prev, next)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("d", 3L, 1L, -2L, 3333L),
      ("a", 2L, 1L, -1L, 5000L),
      ("b", 1L, 2L, 1L, 20000L),
      ("c", 1L, 0L, -1L, 0L),
      ("e", 0L, 1L, 1L, 10000L)), s"got $got")
  }
}
