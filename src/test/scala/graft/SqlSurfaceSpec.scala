package graft

import graft.ops.{ShredOps, SqlSurface}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Local truths for the ad-hoc SQL surface: view registration, arbitrary
  * SQL execution, and the policy query's contract (registry join, per-doc
  * grouping, deterministic top-50).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("registered views resolve and answer arbitrary ad-hoc SQL") {
    val recs = ShredOps.structuredRecords(spark, 40).toDF()
    SqlSurface.registerViews(recs)
    SqlSurface.Views.foreach { v =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $v").as[Long].head() > 0,
        s"view $v is empty or unresolvable")
    }
    val viaSql = SqlSurface.adHoc(spark,
      """SELECT m.conv_id, count(*) AS n
         FROM material_usage m JOIN doc_info d ON m.conv_id = d.conv_id
         GROUP BY m.conv_id""")
      .as[(String, Long)].collect().toMap
    val viaDf = ShredOps.shredMaterialUsage(recs)
      .groupBy("conv_id").count().as[(String, Long)].collect().toMap
    assert(viaSql == viaDf)
  }

  test("engine views: every output family resolves; cross-family query joins them") {
    val dir = "/root/testdata/sf0.001"
    val recs = ShredOps.structuredRecords(spark, 60).toDF()
    val turns = graft.synth.SynthDataset.turns(spark, 40)
    SqlSurface.registerEngineViews(spark, dir, turns, recs)
    (SqlSurface.Views ++ SqlSurface.EngineViews).foreach { v =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $v").as[Long].head() > 0,
        s"view $v is empty or unresolvable")
    }
    val rows = SqlSurface.adHoc(spark, SqlSurface.CrossFamilySql).collect()
    assert(rows.length == 40, "40 turn-convs join 60 record-convs -> 40 rows")
    // local recompute: per-conv failures from the pipeline, violations
    // from the shred — every returned row must agree with both families
    val failures = graft.pipeline.Pipeline.run(spark, turns)
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n"), sum(when(col("failure").isNotNull, 1L).otherwise(0L)).as("f"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val violations = ShredOps.shredMaterialUsage(recs)
      .filter(!col("quantity_within_range"))
      .groupBy("conv_id").count()
      .as[(String, Long)].collect().toMap
    rows.foreach { r =>
      val conv = r.getString(r.fieldIndex("conv_id"))
      assert(r.getLong(r.fieldIndex("n_turns")) == failures(conv)._1, s"$conv turns")
      assert(r.getLong(r.fieldIndex("n_failures")) == failures(conv)._2, s"$conv failures")
      assert(r.getLong(r.fieldIndex("n_violations")) == violations.getOrElse(conv, 0L), s"$conv violations")
    }
    val ordered = rows.map(r => (r.getLong(r.fieldIndex("n_failures")),
      r.getLong(r.fieldIndex("n_violations")), r.getString(r.fieldIndex("conv_id"))))
    assert(ordered.sameElements(ordered.sortBy { case (f, v, c) => (-f, -v, c) }),
      "output must be ordered by n_failures DESC, n_violations DESC, conv_id ASC")
  }

  test("extraction views: per-family summary equals golden-derived counts") {
    import graft.synth.{OutlineDocs, PdfGridDocs, TableDocs}
    val (nT, nO, nG) = (60L, 60L, 60L)
    val got = graft.ops.SqlSurface.extractionSummary(spark, nT, nO, nG)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val htmlCells = (0L until nT).flatMap(id => TableDocs.build(id)._2)
    val htmlLinks = (0L until nT).flatMap(id => TableDocs.build(id)._3)
    val mdCells = (0L until nT).flatMap(id => graft.synth.MdTableDocs.build(id)._2)
    val mdLinks = (0L until nO).flatMap(id => OutlineDocs.buildLinks(id))
    val sections = (0L until nO).flatMap(id => OutlineDocs.build(id)._3)
    val grids = (0L until nG).flatMap(id => PdfGridDocs.build(id)._2)
    assert(got("html") == ((
      htmlCells.map(c => (c.doc_id, c.table_idx)).distinct.size.toLong,
      htmlCells.size.toLong, htmlLinks.size.toLong,
      sections.count(_.doc_id % 2 == 0).toLong)))
    assert(got("markdown") == ((
      mdCells.map(c => (c.doc_id, c.table_idx)).distinct.size.toLong,
      mdCells.size.toLong, mdLinks.size.toLong,
      sections.count(_.doc_id % 2 == 1).toLong)))
    assert(got("pdfir") == ((
      grids.map(c => (c.doc_id, c.table_idx)).distinct.size.toLong,
      grids.size.toLong, 0L, 0L)))
  }

  test("analytics views: corpus-health summary equals component-frame recompute") {
    import graft.ops.{CurationOps, SimilarityOps, TranscriptOps, WebOps}
    val dir = "/root/testdata/sf0.001"
    val web = graft.synth.WebDocs.docs(spark, 40L)
    val prev = graft.synth.SynthDataset.turns(spark, 30).toDF()
    val next = prev.withColumn("text",
      when($"turn_idx" === 0, concat($"text", lit(" drift"))).otherwise($"text"))
    val got = SqlSurface.corpusHealth(spark, dir, web, prev, next)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set("1_funnel", "2_scorecard", "3_vocab_drift", "4_cell_drift"))
    // recompute each family's summary from the component frame directly —
    // the frames themselves are oracled by q176/q178/q179/q188
    val f = CurationOps.curationFunnel(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(got("1_funnel") == ((f.size.toLong, f("1_raw")._1, f("5_balanced")._2)))
    val sc = WebOps.hostScorecard(web).collect()
      .map(r => (r.getBoolean(r.fieldIndex("reputable")),
        r.getLong(r.fieldIndex("rank_x1e12"))))
    assert(got("2_scorecard") == ((sc.length.toLong, sc.count(_._1).toLong,
      (0L +: sc.map(_._2)).max)))
    val vd = TranscriptOps.vocabDrift(prev, next).collect()
      .map(r => math.abs(r.getLong(r.fieldIndex("delta"))))
    assert(got("3_vocab_drift") == ((vd.length.toLong, vd.sum, (0L +: vd).max)))
    val cd = SimilarityOps.ivfCellDrift(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("n_appended")),
        r.getLong(r.fieldIndex("appended_ratio_x10000"))))
    assert(got("4_cell_drift") == ((cd.length.toLong, cd.map(_._1).sum,
      (0L +: cd.map(_._2)).max)))
  }

  test("policy query: per-doc rollup, top-50 by violations with stable tiebreak") {
    val recs = ShredOps.structuredRecords(spark, 80).toDF()
    val rows = SqlSurface.policySummary(spark, recs).collect()
    assert(rows.length == 50, "top_k 50 policy must truncate the 80-doc corpus")
    val ordered = rows.map(r =>
      (r.getLong(r.fieldIndex("n_violations")), r.getString(r.fieldIndex("conv_id"))))
    assert(ordered.sameElements(ordered.sortBy { case (v, c) => (-v, c) }),
      "output must be ordered by n_violations DESC, conv_id ASC")
    // local recompute of the per-doc rollup for every returned doc
    val shredded = ShredOps.shredMaterialUsage(recs)
      .select($"conv_id", $"quantity_within_range")
      .as[(String, Boolean)].collect().groupBy(_._1)
    rows.foreach { r =>
      val conv = r.getString(r.fieldIndex("conv_id"))
      val mats = shredded(conv)
      assert(r.getLong(r.fieldIndex("n_materials")) == mats.size.toLong, conv)
      assert(r.getLong(r.fieldIndex("n_violations")) == mats.count(!_._2).toLong, conv)
    }
  }
}
