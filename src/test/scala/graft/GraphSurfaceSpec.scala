package graft

import graft.ops.{GraphOps, GraphSurface, ShredOps}
import org.scalatest.funsuite.AnyFunSuite

/** Local truths for the graph query surface: view registration, the node
  * property model (string-valued — the reason the reference's Cypher
  * needs toFloat), and the flagship range query's contract (bounded HAS
  * reachability from the doc roots, strict in-range predicate, top_k 50
  * under a total order).
  */
class GraphSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("graph views resolve; node props carry canonical string scalars") {
    val recs = ShredOps.structuredRecords(spark, 30).toDF()
    GraphSurface.registerViews(recs)
    GraphSurface.Views.foreach { v =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $v").as[Long].head() > 0,
        s"view $v is empty or unresolvable")
    }
    // props dedup by signature: one props row per vertex
    val nVerts = spark.sql("SELECT count(*) FROM graph_vertices").as[Long].head()
    val nProps = spark.sql("SELECT count(*) FROM graph_node_props").as[Long].head()
    assert(nVerts == nProps, s"props ($nProps) must be 1:1 with vertices ($nVerts)")
    // property values are strings in canonical double form
    val sample = spark.sql(
      """SELECT element_at(props, 'actual_quantity') FROM graph_node_props
         WHERE label = 'main_table_material_usage_rows' LIMIT 5""")
      .as[String].collect()
    assert(sample.nonEmpty && sample.forall(s => s.toDouble.toString == s),
      s"props must round-trip as shortest-repr double strings: ${sample.toSeq}")
  }

  test("range query: exactly the in-range material nodes reachable from the roots, capped at 50") {
    val recs = ShredOps.structuredRecords(spark, 60).toDF()
    val got = GraphSurface.rangeQuery(spark, recs)
      .as[(String, String, String, String, String)].collect()
    assert(got.length == 50, s"top_k 50 must truncate (got ${got.length})")
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq, "signature order")
    // local recompute: distinct in-range material nodes (strict bounds),
    // all of which are 1 HAS hop from their root — reachability holds by
    // construction, so the filter is the whole contract
    got.foreach { case (_, _, aq, lo, hi) =>
      assert(aq.toDouble > lo.toDouble && aq.toDouble < hi.toDouble,
        s"out-of-range row leaked: $aq not in ($lo, $hi)")
    }
    val expected = ShredOps.shredMaterialUsage(recs)
      .select("actual_quantity", "allowed_range_min", "allowed_range_max")
      .as[(Double, Double, Double)].collect()
      .filter { case (a, l, h) => a > l && a < h }
    assert(expected.length >= 50, "synth corpus must have >50 in-range materials")
    // engine rows must be a subset of the locally recomputed in-range set
    val expSet = expected.map { case (a, l, h) =>
      (a.toString, l.toString, h.toString) }.toSet
    got.foreach { case (_, _, aq, lo, hi) =>
      assert(expSet.contains((aq, lo, hi)), s"unexpected node ($aq, $lo, $hi)")
    }
  }

  test("out-of-range and unreachable nodes are excluded") {
    import graft.model._
    def rec(conv: String, actual: Double) = StructuredRecord(
      conv_id = conv,
      batch_details = BatchDetails("p", s"B-$conv",
        new java.sql.Timestamp(1735689600000L), new java.sql.Timestamp(1735693200000L)),
      material_usage_rows = Seq(MaterialUsageRow("m", 100.0, 95.0, 105.0, actual, "a", "b")),
      steps = Seq.empty,
      equipment_no = Seq("EQ-1"))
    val recs = Seq(rec("conv-a", 100.0), rec("conv-b", 200.0), rec("conv-c", 95.0)).toDF()
    val got = GraphSurface.rangeQuery(spark, recs)
      .select("actual_quantity").as[String].collect().toSeq
    // 100.0 in (95,105); 200.0 out; 95.0 violates the STRICT lower bound
    assert(got == Seq("100.0"), s"got $got")
  }

  test("subtree rollup: per-root distinct label counts; merged child counts once per reaching root") {
    import graft.model._
    val ts = new java.sql.Timestamp(1735689600000L)
    def m(name: String) = MaterialUsageRow(name, 100.0, 95.0, 105.0, 100.0, "a", "b")
    val recA = StructuredRecord("conv-a",
      BatchDetails("p", "B-A", ts, ts),
      Seq(m("m1"), m("m2")),
      Seq(ProcedureStep(1, "mix", Seq(
        TemperatureRecord("t0", 20.0), TemperatureRecord("t1", 21.0)))),
      Seq("EQ-A"))
    // conv-b shares material m1 with conv-a: the node MERGEs on content
    // signature and must count once under EACH reaching root
    val recB = StructuredRecord("conv-b",
      BatchDetails("p", "B-B", ts, ts),
      Seq(m("m1")), Seq.empty, Seq("EQ-B"))
    val recs = Seq(recA, recB).toDF()
    val got = GraphSurface.subtreeRollup(spark, recs)
      .as[(String, String, Long)].collect()
    val roots = GraphOps.graph(recs)._1
      .filter("label = 'main_table'").select("signature")
      .as[String].collect().sorted.toSeq
    assert(roots.size == 2)
    val byRoot = got.groupBy(_._1).map { case (r, rows) =>
      r -> rows.map(t => t._2 -> t._3).toMap }
    // which root is conv-a's? the one with steps in its rollup
    val (rootA, rootB) =
      if (byRoot(roots(0)).contains("main_table_steps")) (roots(0), roots(1))
      else (roots(1), roots(0))
    assert(byRoot(rootA) == Map(
      "main_table_batch_details" -> 1L,
      "main_table_material_usage_rows" -> 2L,
      "main_table_steps" -> 1L,
      "main_table_steps_temperature_records" -> 2L), s"rootA: ${byRoot(rootA)}")
    assert(byRoot(rootB) == Map(
      "main_table_batch_details" -> 1L,
      "main_table_material_usage_rows" -> 1L), s"rootB: ${byRoot(rootB)}")
  }
}
