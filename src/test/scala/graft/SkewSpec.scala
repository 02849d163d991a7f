package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.WebOps
import graft.synth.WebDocs

/** Adversarial-skew evidence for the host-graph family (q85/q110/q139):
  * a planted Zipf mega-host that EVERY document links to must neither
  * change results (the exact integer fixed points are
  * partial-agg-order independent) nor blow up cost (every host-keyed
  * reduce rides map-side partial aggregation, so the hot key reaches
  * its reducer pre-combined per task — the skew crosses the exchange as
  * at most one combined row per map task, never as |edges| raw rows).
  *
  * The wall-time guard is deliberately loose (3x) so the suite stays
  * deterministic on a noisy shared VM; quiet-window skew/uniform cost
  * ratios are recorded in BASELINE.md.
  */
/** Skewed corpus builder — a top-level object so the row closure stays
  * serializable (a suite-member method would capture the suite).
  */
private[graft] object SkewCorpus {
  val Mega = "mega-hub.example.com"

  /** WebDocs corpus with the mega-host appended to EVERY doc: each doc
    * that already carries a URL gains an edge (its first host → mega),
    * so mega's in-degree ≈ |linking docs| while every other host keeps
    * the uniform WebDocs spectrum — a 10⁸-host crawl with one viral hub,
    * scaled down.
    */
  def megaText(id: Long): String =
    WebDocs.text(id) + s" hub https://$Mega/x/$id"

  def skewed(spark: org.apache.spark.sql.SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map(id => (id, megaText(id))).toDF("doc_id", "text")
  }
}

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import SkewCorpus.{Mega, megaText}
  private def skewed(n: Long): DataFrame = SkewCorpus.skewed(spark, n)

  /** The WebOpsSpec naive integer PageRank, parameterized by corpus. */
  private def naiveRank(nDocs: Long, text: Long => String): Map[String, Long] = {
    val urlRe = new scala.util.matching.Regex(WebOps.UrlRe)
    val hostRe = new scala.util.matching.Regex(WebOps.HostRe)
    val edges = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    (0L until nDocs).foreach { id =>
      val hosts = urlRe.findAllIn(text(id)).toSeq
        .map(u => hostRe.findFirstMatchIn(u).get.group(1)
          .toLowerCase.replaceFirst("^www\\.", ""))
      if (hosts.size >= 2) {
        val src = hosts.head
        hosts.tail.distinct.foreach(d => if (d != src) edges += ((src, d)))
      }
    }
    val nodes = edges.flatMap { case (s, d) => Seq(s, d) }.toSet
    val deg = edges.toSeq.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = WebOps.RankScale / nodes.size
    var rank = nodes.map(_ -> base).toMap
    (1 to WebOps.RankIters).foreach { _ =>
      val contrib = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) => contrib(d) += rank(s) / deg(s) }
      rank = nodes.map(v => v -> (base * 15L / 100L + 85L * contrib(v) / 100L)).toMap
    }
    rank
  }

  test("planted mega-host: the skew is genuine and PageRank stays exact under it") {
    val nDocs = 240L
    val want = naiveRank(nDocs, megaText)
    val got = WebOps.hostRank(skewed(nDocs))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
    // the plant is a real Zipf head over the RAW link mentions — the rows
    // the edge-dedup's map-side combine actually absorbs. (The DISTINCT
    // host graph itself bounds any in-degree by |hosts|, which is the
    // other half of why the reduce never melts: raw skew dies at the
    // partial aggregate, and what crosses the exchange is host-pair
    // bounded.)
    val urlRe = new scala.util.matching.Regex(WebOps.UrlRe)
    val hostRe = new scala.util.matching.Regex(WebOps.HostRe)
    val rawDst = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    (0L until nDocs).foreach { id =>
      val hosts = urlRe.findAllIn(megaText(id)).toSeq
        .map(u => hostRe.findFirstMatchIn(u).get.group(1)
          .toLowerCase.replaceFirst("^www\\.", ""))
      if (hosts.size >= 2)
        hosts.tail.distinct.foreach(d => if (d != hosts.head) rawDst(d) += 1)
    }
    val others = rawDst.collect { case (h, d) if h != Mega => d }
    assert(rawDst(Mega) >= 5 * others.max,
      s"mega raw mentions ${rawDst(Mega)} vs max other ${others.max}")
    // and mega wins the rank fixed point (sanity: the skew reaches the result)
    assert(got.maxBy(_._2)._1 == Mega)
  }

  test("host-keyed reduces over the mega-host combine map-side") {
    // the skewed reduce keys: edge-dedup distinct and the in-degree sum —
    // both must show partial aggregation BEFORE the host exchange, so the
    // hot key crosses the wire pre-combined
    val edges = WebOps.hostEdges(skewed(200L))
    val pEdges = edges.queryExecution.executedPlan.toString
    // a distinct's map-side combine prints as a second HashAggregate
    // below the exchange (functions=[] so no partial_ label)
    assert("HashAggregate".r.findAllIn(pEdges).size >= 2
        && pEdges.contains("Exchange hashpartitioning"),
      s"edge distinct must partial-aggregate map-side:\n$pEdges")
    val pDeg = edges.groupBy(col("dst")).agg(count(lit(1)).as("d"))
      .queryExecution.executedPlan.toString
    assert(pDeg.contains("partial_count"),
      s"in-degree sum must partial-aggregate map-side:\n$pDeg")
    // q139's (host, term) reduce under a mega-host link frame
    import spark.implicits._
    val links = spark.range(4000)
      .select(col("id").as("doc_id"),
        concat(lit(s"https://$Mega/p/"), col("id")).as("href"),
        concat(lit("click here page "), (col("id") % 7).cast("string")).as("anchor"))
    val pAnchor = WebOps.anchorTerms(links).queryExecution.executedPlan.toString
    assert(pAnchor.contains("partial_count"),
      s"anchor-term reduce must partial-aggregate map-side:\n$pAnchor")
  }

  test("wall-time absorbs the mega-host (loose 3x guard; quiet ratios in BASELINE.md)") {
    val n = 3000L
    def time[A](f: => A): Long = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000L
    }
    // warm both paths once so codegen/JIT don't bill the measured runs
    WebOps.hostRank(WebDocs.docs(spark, 200L)).count()
    WebOps.hostRank(skewed(200L)).count()
    val uniformMs = time(WebOps.hostRank(WebDocs.docs(spark, n)).count())
    val skewMs = time(WebOps.hostRank(skewed(n)).count())
    info(s"hostRank n=$n uniform=${uniformMs}ms skewed=${skewMs}ms")
    assert(skewMs <= 3 * math.max(uniformMs, 500L),
      s"skewed PageRank ${skewMs}ms vs uniform ${uniformMs}ms")
    val uniformHitsMs = time(WebOps.hostHits(WebDocs.docs(spark, n)).count())
    val skewHitsMs = time(WebOps.hostHits(skewed(n)).count())
    info(s"hostHits n=$n uniform=${uniformHitsMs}ms skewed=${skewHitsMs}ms")
    assert(skewHitsMs <= 3 * math.max(uniformHitsMs, 500L),
      s"skewed HITS ${skewHitsMs}ms vs uniform ${uniformHitsMs}ms")
  }
}
