package graft

import graft.ops.SchemaOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  test("mergeBatches unions drifted batches by name with null fill") {
    import spark.implicits._
    val a = Seq(("c1", 10)).toDF("conv_id", "n_materials")
    val b = Seq(("c2", 3)).toDF("conv_id", "n_steps")
    val m = SchemaOps.mergeBatches(Seq(a, b))
    assert(m.columns.toSeq == Seq("conv_id", "n_materials", "n_steps"))
    val rows = m.orderBy("conv_id")
      .as[(String, Option[Int], Option[Int])].collect().toSeq
    assert(rows == Seq(("c1", Some(10), None), ("c2", None, Some(3))))
  }

  test("foldSchemas merges nested structs, widens numerics, rejects conflicts") {
    val s1 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("a", IntegerType),
        StructField("b", StringType))), nullable = false),
      StructField("xs", ArrayType(IntegerType))))
    val s2 = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("a", DoubleType),
        StructField("c", StringType)))),
      StructField("extra", StringType)))
    val m = SchemaOps.foldSchemas(Seq(s1, s2))
    assert(m("id").dataType == LongType)
    val meta = m("meta").dataType.asInstanceOf[StructType]
    assert(meta("a").dataType == DoubleType)
    assert(meta.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(meta("b").nullable && meta("c").nullable)
    assert(m("xs").nullable && m("extra").nullable)
    val bad = StructType(Seq(StructField("id", StringType)))
    val e = intercept[IllegalArgumentException](SchemaOps.foldSchemas(Seq(s1, bad)))
    assert(e.getMessage.contains(".id"))
  }

  test("ensureColumns adds missing target columns as typed nulls, keeps data") {
    import spark.implicits._
    val df = Seq(("c1", 5)).toDF("conv_id", "n")
    val target = StructType(Seq(
      StructField("conv_id", StringType),
      StructField("n", IntegerType),
      StructField("added_at", TimestampType),
      StructField("score", DoubleType)))
    val out = SchemaOps.ensureColumns(df, target)
    assert(out.columns.toSeq == Seq("conv_id", "n", "added_at", "score"))
    assert(out.schema("added_at").dataType == TimestampType)
    assert(out.schema("score").dataType == DoubleType)
    val row = out.collect()(0)
    assert(row.getString(0) == "c1" && row.getInt(1) == 5)
    assert(row.isNullAt(2) && row.isNullAt(3))
  }

  test("drifted-batch ingest: every conv present once, drift columns null-filled per batch") {
    import spark.implicits._
    val recs = graft.ops.ShredOps.structuredRecords(spark, 120)
    val local = recs.collect()
    val merged = SchemaOps.schemaEvolutionQuery(recs.toDF())
      .as[(String, String, Option[Int], Option[Int])].collect()
      .map { case (c, p, nm, ns) => c -> ((p, nm, ns)) }.toMap
    assert(merged.size == local.length)
    local.foreach { r =>
      val (p, nm, ns) = merged(r.conv_id)
      assert(p == r.batch_details.product_name)
      if (r.conv_id < "conv-000100") {
        assert(nm.contains(r.material_usage_rows.size) && ns.isEmpty, r.conv_id)
      } else {
        assert(nm.isEmpty && ns.contains(r.steps.size), r.conv_id)
      }
    }
  }
}
