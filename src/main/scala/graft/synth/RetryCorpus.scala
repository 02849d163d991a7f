package graft.synth

import graft.model.Turn
import java.sql.Timestamp

/** Planted retry/loop transcript corpus for the conversation-level dedup
  * family (q116-q118). Real agent traffic contains three redundancy modes
  * the document corpus can't exhibit:
  *
  *   1. RETRIED conversations — a run is re-submitted after a transient
  *      failure, replaying most turns verbatim with a few perturbed
  *      (the conversation-level analogue of the reference's error-injected
  *      golden variants, ref: uploads/ `GP 218-edited-incorrect.pdf` /
  *      `GP 218-errors.pdf` — same document, a few planted differences);
  *   2. AGENT LOOPS — a stuck tool loop repeats an identical turn;
  *   3. BOILERPLATE — a handful of system preambles shared by a large
  *      fraction of all conversations.
  *
  * Like `Synth`, every value is a pure function of the base-conversation
  * index via splitmix64, so the corpus is identical at any parallelism.
  * Base conv `rc-i` gets: one shared system preamble (turn 0), `convLen(i)`
  * content turns reusing `Synth.goldenTurn` payloads under a disjoint rng
  * namespace, and (for i % 5 == 2) a terminal stuck-tool loop of 3-6
  * identical turns. Every third base conv also emits a retry twin `rr-i`:
  * the same turns one day later, each content turn independently perturbed
  * with probability 1/8 (text suffixed, so the sha changes) and the last
  * content turn dropped for every fourth retry.
  */
object RetryCorpus {

  import Synth.draw

  /** Disjoint rng namespace: retry-corpus payloads never collide with the
    * base corpus's conv indices (VerifyConvs is tiny by comparison).
    */
  private val NS = 0x52435000L

  val Preambles: IndexedSeq[String] = IndexedSeq(
    "You are a careful assistant. Use tools through the sandbox and cite extracted content.",
    "System: follow the routing policy; never fabricate tool output; answer concisely.",
    "System: prefer document-grounded answers with page citations; escalate on low confidence.")

  /** Content turns per base conv (loop burst and preamble excluded). */
  def convLen(i: Long): Int = 4 + draw(NS + i, -2L, 0x21, 12)

  /** Identical-text stuck-tool loop length; 0 when the conv has no loop. */
  def loopLen(i: Long): Int =
    if (i % 5 == 2) 3 + draw(NS + i, -4L, 0x23, 4) else 0

  def hasRetry(i: Long): Boolean = i % 3 == 0

  /** Retry twin drops the last content turn for every fourth retried conv. */
  def retryDropsLast(i: Long): Boolean = hasRetry(i) && draw(NS + i, -5L, 0x24, 4) == 0

  /** Per-turn inter-arrival gap in ms, 1.5-16.5 s — varied so latency
    * profiles (q120) have real spread; conv spacing (900 s) still exceeds
    * the max conversation span (~22 turns × 16.5 s).
    */
  def gapMs(i: Long, ti: Int): Long = 1500L + draw(NS + i, 4096L + ti, 0x31, 15000)

  private def ts(i: Long, ti: Int, retry: Boolean): Timestamp =
    new Timestamp(1738368000000L + i * 900000L +
      (1 to ti).map(gapMs(i, _)).sum +
      (if (retry) 86400000L else 0L))

  private def loopText(i: Long): String =
    s"[tool:shell status=err]\nexit 1: command timed out, retrying (job-${draw(NS + i, -7L, 0x25, 100000)})\n[/tool]"

  /** All turns of base conv `rc-i` in turn order. */
  def baseTurns(i: Long): IndexedSeq[Turn] = {
    val id = f"rc-$i%05d"
    val n = convLen(i)
    val pre = Turn(id, 0, "system", Preambles(draw(NS + i, -3L, 0x22, Preambles.length)),
      null, ts(i, 0, retry = false))
    val content = (1 to n).map { ti =>
      val gt = Synth.goldenTurn(NS + i, ti)
      Turn(id, ti, gt.role, gt.text, gt.tool, ts(i, ti, retry = false))
    }
    val loops = (0 until loopLen(i)).map { k =>
      Turn(id, n + 1 + k, "tool", loopText(i), "shell", ts(i, n + 1 + k, retry = false))
    }
    (pre +: content) ++ loops
  }

  /** Per-turn perturbation decision for the retry twin (content turns only). */
  def retryMutates(i: Long, ti: Int): Boolean = draw(NS + i, ti.toLong, 0x77, 8) == 0

  /** The retry twin `rr-i` (only defined when hasRetry(i)). */
  def retryTurns(i: Long): IndexedSeq[Turn] = {
    val id = f"rr-$i%05d"
    val n = convLen(i)
    val keep = baseTurns(i).filter(t => !(retryDropsLast(i) && t.turn_idx == n))
    keep.map { t =>
      val mutated =
        if (t.turn_idx >= 1 && t.turn_idx <= n && retryMutates(i, t.turn_idx))
          t.text + "\n[retry attempt 2]"
        else t.text
      Turn(id, t.turn_idx, t.role, mutated, t.tool, ts(i, t.turn_idx, retry = true))
    }
  }

  /** Base conv + (when planted) its retry twin. */
  def convFamily(i: Long): IndexedSeq[Turn] =
    if (hasRetry(i)) baseTurns(i) ++ retryTurns(i) else baseTurns(i)

  /** Distributed corpus: one range row per BASE conversation. */
  def turns(spark: org.apache.spark.sql.SparkSession, nBaseConvs: Long): org.apache.spark.sql.Dataset[Turn] = {
    import spark.implicits._
    spark.range(nBaseConvs).flatMap(i => convFamily(i))
  }

  /** Driver-side corpus for unit tests. */
  def localCorpus(nBaseConvs: Int): IndexedSeq[Turn] =
    (0L until nBaseConvs.toLong).flatMap(convFamily)
}
