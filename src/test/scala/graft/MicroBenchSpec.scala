package graft

import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

/** Ad-hoc microbenchmark (single-threaded, JIT-warmed): where does
  * per-turn time go — synthesis vs extraction, and per payload kind.
  * Tagged as a regular test but assertion-free on timing; prints a
  * breakdown for optimization work. Runs in ~10 s.
  */
class MicroBenchSpec extends AnyFunSuite {

  test("per-turn cost breakdown (informational)") {
    val convs = 0L until 8000L
    // warm both paths
    convs.take(2000).foreach(c => Synth.convTurns(c).foreach(g => graft.extract.Extract.one(g.turn.text)))

    var genNs = 0L
    var extNs = 0L
    var n = 0L
    val byKind = scala.collection.mutable.Map.empty[String, (Long, Long)] // kind -> (ns, count)
    convs.foreach { c =>
      val t0 = System.nanoTime()
      val turns = Synth.convTurns(c)
      val t1 = System.nanoTime()
      genNs += t1 - t0
      turns.foreach { g =>
        val s = System.nanoTime()
        val (kind, _) = graft.extract.Extract.one(g.turn.text)
        val e = System.nanoTime()
        extNs += e - s
        val (accNs, accN) = byKind.getOrElse(kind, (0L, 0L))
        byKind(kind) = (accNs + (e - s), accN + 1)
        n += 1
      }
    }
    info(f"turns=$n gen=${genNs / 1e9}%.2f s (${genNs / n}%d ns/turn) extract=${extNs / 1e9}%.2f s (${extNs / n}%d ns/turn)")
    byKind.toSeq.sortBy(-_._2._1).foreach { case (k, (ns, cnt)) =>
      info(f"  $k%-9s ${ns / 1e9}%6.2f s  ${ns / math.max(cnt, 1)}%8d ns/turn  ($cnt turns)")
    }
    assert(n > 0)
  }
}
