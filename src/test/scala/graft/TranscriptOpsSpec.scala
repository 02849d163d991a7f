package graft

import graft.ops.TranscriptOps
import graft.synth.{Synth, SynthDataset}
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
}
