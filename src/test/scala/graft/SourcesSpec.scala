package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Non-parquet sources (SURVEY.md §2.1 S5-S7): multiline-JSON golden
  * scan, YOLO label text scan with split/cast + bbox denormalization,
  * headerless schema-explicit CSV.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  test("goldenJson: multiline JSON files with provenance column") {
    val dir = Files.createTempDirectory("graft-json")
    Files.writeString(dir.resolve("a_processed.json"),
      """{
        |  "doc": "a",
        |  "pages": [{"idx": 1, "text": "p1"}, {"idx": 2, "text": "p2"}]
        |}""".stripMargin)
    Files.writeString(dir.resolve("b_processed.json"),
      """{"doc": "b", "pages": [{"idx": 1, "text": "q1"}]}""")
    val schema = StructType(Seq(
      StructField("doc", StringType),
      StructField("pages", ArrayType(StructType(Seq(
        StructField("idx", IntegerType), StructField("text", StringType)))))))
    val df = Sources.goldenJson(spark, dir.toString, schema)
    assert(df.count() == 2)
    val a = df.filter(col("doc") === "a").collect()(0)
    assert(a.getAs[String]("source_file") == "a_processed.json")
    // shred check: explode pages like the relational sink does
    val pages = df.select(col("doc"), explode(col("pages")).as("p"))
    assert(pages.count() == 3)
  }

  test("yoloLabels + denormalizeBoxes: split/cast projection and corner coords") {
    val dir = Files.createTempDirectory("graft-yolo")
    Files.writeString(dir.resolve("page1.txt"), "0 0.5 0.5 0.2 0.1\n1 0.25 0.75 0.1 0.5\n")
    Files.writeString(dir.resolve("page2.txt"), "0 0.1 0.1 0.05 0.05\n\n")
    val labels = Sources.yoloLabels(spark, dir.toString)
    assert(labels.count() == 3)
    assert(labels.schema.fieldNames.toSeq == Seq("page", "cls", "cx", "cy", "w", "h"))
    val boxes = Sources.denormalizeBoxes(labels, imgW = 1000, imgH = 800)
      .filter(col("page") === "page1" && col("cls") === 0).collect()(0)
    assert(boxes.getAs[Int]("x1") == 400 && boxes.getAs[Int]("y1") == 360)
    assert(boxes.getAs[Int]("x2") == 600 && boxes.getAs[Int]("y2") == 440)
  }

  test("pairCsv: headerless explicit schema") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(dir.resolve("pairs.csv"), "s1.png,s2.png,1\ns1.png,x9.png,0\n")
    val df = Sources.pairCsv(spark, dir.toString)
    assert(df.count() == 2)
    assert(df.schema.fieldNames.toSeq == Sources.PairCsvSchema.fieldNames.toSeq)
    assert(df.schema.fields.map(_.dataType).toSeq ==
      Sources.PairCsvSchema.fields.map(_.dataType).toSeq)
    assert(df.filter(col("label") === 1).count() == 1)
  }

  test("turn table round-trips through ORC with identical extraction results") {
    // source-format agnosticism: the pipeline is a function of Dataset[Turn],
    // not of the storage format — ORC (columnar, non-parquet) must yield
    // byte-identical extraction
    import spark.implicits._
    val base = Files.createTempDirectory("graft-orc").toString
    val turns = graft.synth.SynthDataset.turns(spark, 30L)
    turns.write.orc(s"$base/turns.orc")
    val viaOrc = graft.pipeline.Pipeline
      .run(spark, spark.read.orc(s"$base/turns.orc").as[graft.model.Turn])
      .select("conv_id", "turn_idx", "extracted_text")
      .collect().map(_.toSeq).toSet
    val direct = graft.pipeline.Pipeline.run(spark, turns)
      .select("conv_id", "turn_idx", "extracted_text")
      .collect().map(_.toSeq).toSet
    assert(viaOrc == direct && viaOrc.nonEmpty)
  }
}
