package graft

import graft.functions.GraftFunctions
import graft.text.TextAlgos
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expression `graft_simhash64`: bit-identical to the
  * pure-Scala path, null-safe, and actually inside WholeStageCodegen.
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  test("graft_simhash64 equals TextAlgos.simhash on documents; null -> null") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val viaExpr = docs.select($"doc_id", expr("graft_simhash64(text)").as("sh"))
      .as[(Long, Long)].collect().toMap
    val viaScala = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> TextAlgos.simhash(TextAlgos.tokenize(t)) }.toMap
    assert(viaExpr == viaScala)

    val withNull = Seq((1L, "hello world"), (2L, null)).toDF("id", "text")
    val rows = withNull.select(expr("graft_simhash64(text)").as("sh")).collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }

  test("expression participates in whole-stage codegen (no ser/de boundary)") {
    GraftFunctions.register(spark)
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "graft_simhash64(text) AS sh")
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen spans in the short plan form
    assert(plan.contains("*(1) Project"), s"expected codegen'd Project in:\n$plan")
    assert(!plan.contains("SerializeFromObject"), "typed-map boundary crept back in")
  }

  test("graft_cosine_x10000 equals the typed cosine path; null-safe; codegen'd") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val sample = vecs.limit(20).as[(Long, Array[Float])].collect()
    val viaExpr = vecs.as("a").crossJoin(vecs.as("b"))
      .filter($"a.vec_id" < 20 && $"b.vec_id" < 20)
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        expr("graft_cosine_x10000(a.embedding, b.embedding)").as("c"))
      .as[(Long, Long, Long)].collect()
      .map { case (ia, ib, c) => (ia, ib) -> c }.toMap
    val byId = sample.toMap
    viaExpr.foreach { case ((ia, ib), c) =>
      assert(c == math.floor(TextAlgos.cosine(byId(ia), byId(ib)) * 10000).toLong)
    }
    val rows = Seq((Array(1f, 0f), null: Array[Float])).toDF("a", "b")
      .select(expr("graft_cosine_x10000(a, b)")).collect()
    assert(rows(0).isNullAt(0))
    val plan = vecs.as("a").crossJoin(vecs.as("b"))
      .select(expr("graft_cosine_x10000(a.embedding, b.embedding)"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject"))
  }

  test("graft_l2_x10000 equals the typed L2 path; null-safe") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val byId = vecs.limit(20).as[(Long, Array[Float])].collect().toMap
    val viaExpr = vecs.as("a").crossJoin(vecs.as("b"))
      .filter($"a.vec_id" < 20 && $"b.vec_id" < 20)
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        expr("graft_l2_x10000(a.embedding, b.embedding)").as("d"))
      .as[(Long, Long, Long)].collect()
    viaExpr.foreach { case (ia, ib, d) =>
      assert(d == math.floor(TextAlgos.l2(byId(ia), byId(ib)) * 10000).toLong)
    }
    val rows = Seq((Array(1f, 0f), null: Array[Float])).toDF("a", "b")
      .select(expr("graft_l2_x10000(a, b)")).collect()
    assert(rows(0).isNullAt(0))
  }

  test("graft_hyperplane_bucket equals the scala bucketing; codegen'd; null-safe") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val viaExpr = vecs.selectExpr("vec_id", "graft_hyperplane_bucket(embedding, 6) AS b")
      .as[(Long, Int)].collect().toMap
    val viaScala = vecs.as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> TextAlgos.hyperplaneBucket(v, 6) }.toMap
    assert(viaExpr == viaScala)
    val rows = Seq((1L, null: Array[Float])).toDF("id", "v")
      .selectExpr("graft_hyperplane_bucket(v, 4)").collect()
    assert(rows(0).isNullAt(0))
    val plan = vecs.selectExpr("graft_hyperplane_bucket(embedding, 6)")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject"), "bucketing fell out of codegen")
  }

  test("graft_canon_double: pinned str(float)-format edges; expression matches scala path") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // pinned against DuckDB CAST(double AS VARCHAR) / Python repr(float)
    val pinned = Seq(
      0.0 -> "0.0", 1.0 -> "1.0", -1.0 -> "-1.0", 1.5 -> "1.5",
      100.0 -> "100.0", 0.1 -> "0.1", 12345.6789 -> "12345.6789",
      1e15 -> "1000000000000000.0", 1e16 -> "1e+16", 1.23e16 -> "1.23e+16",
      1e-4 -> "0.0001", 1e-5 -> "1e-05", 0.00012345 -> "0.00012345",
      1.2345678901234568e17 -> "1.2345678901234568e+17",
      2.5 -> "2.5", -42.75 -> "-42.75", 99.95 -> "99.95", 3.0e7 -> "30000000.0",
      Double.MaxValue -> "1.7976931348623157e+308",
      Double.MinPositiveValue -> "5e-324",
      Double.NaN -> "nan",
      Double.PositiveInfinity -> "inf", Double.NegativeInfinity -> "-inf",
      // JDK17 Double.toString emits an extra digit for these; the
      // shortening step must strip it (JDK-4511638 class of values)
      7.573002978091994e16 -> "7.573002978091994e+16")
    pinned.foreach { case (d, want) =>
      assert(TextAlgos.canonDouble(d) == want, s"canonDouble($d)")
    }
    val viaExpr = Seq(12345.6789, 1e16, -0.0)
      .toDF("x").select(expr("graft_canon_double(x)").as("s")).as[String].collect()
    assert(viaExpr.toSeq == Seq("12345.6789", "1e+16", TextAlgos.canonDouble(-0.0)))
  }

  test("GraftExtensions injects the function via spark.sql.extensions") {
    // separate session sharing the context, extensions applied
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    // the shared-context session may reuse the fixture's session state;
    // assert the function resolves through SQL either way
    val r = s2.sql("SELECT graft_simhash64('a b c a b') AS sh").collect()(0).getLong(0)
    assert(r == TextAlgos.simhash(TextAlgos.tokenize("a b c a b")))
  }
}
