package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-parquet sources from the reference's ingest surface (SURVEY.md
  * §2.1), as schema-explicit Spark readers. Explicit schemas everywhere:
  * schema inference re-reads the input and cannot be trusted at 100 TB.
  */
object Sources {

  /** Golden knowledge-base scan (ref: agents/sql_agent/db_init_llm.py:
    * 409-412 — iterate `*_processed.json`): multiline JSON documents, one
    * file per processed record, filename carried as provenance.
    */
  def goldenJson(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read
      .option("multiLine", true)
      .schema(schema)
      .json(s"$dir/*.json")
      .withColumn("source_file", regexp_extract(input_file_name(), "([^/]+)$", 1))

  val YoloLabelSchema: StructType = StructType(Seq(
    StructField("cls", IntegerType, nullable = false),
    StructField("cx", DoubleType, nullable = false),
    StructField("cy", DoubleType, nullable = false),
    StructField("w", DoubleType, nullable = false),
    StructField("h", DoubleType, nullable = false)))

  /** YOLO bbox label scan (ref: src/signature_module/signature_extraction
    * .py:31-65 — per-page txt, `cls cx cy w h` rows, normalized coords):
    * `spark.read.text` + split/cast projection, page id from the filename.
    */
  def yoloLabels(spark: SparkSession, dir: String): DataFrame = {
    val parts = split(trim(col("value")), "\\s+")
    spark.read.text(s"$dir/*.txt")
      .filter(length(trim(col("value"))) > 0)
      .select(
        regexp_extract(input_file_name(), "([^/]+)\\.txt$", 1).as("page"),
        parts.getItem(0).cast(IntegerType).as("cls"),
        parts.getItem(1).cast(DoubleType).as("cx"),
        parts.getItem(2).cast(DoubleType).as("cy"),
        parts.getItem(3).cast(DoubleType).as("w"),
        parts.getItem(4).cast(DoubleType).as("h"))
  }

  /** bbox denormalization (ref: signature_extraction.py:52-65): center/
    * size normalized coords × image dims → integer corner coords.
    */
  def denormalizeBoxes(labels: DataFrame, imgW: Int, imgH: Int): DataFrame =
    labels
      .withColumn("x1", ((col("cx") - col("w") / 2) * imgW).cast(IntegerType))
      .withColumn("y1", ((col("cy") - col("h") / 2) * imgH).cast(IntegerType))
      .withColumn("x2", ((col("cx") + col("w") / 2) * imgW).cast(IntegerType))
      .withColumn("y2", ((col("cy") + col("h") / 2) * imgH).cast(IntegerType))

  val PairCsvSchema: StructType = StructType(Seq(
    StructField("img_a", StringType, nullable = false),
    StructField("img_b", StringType, nullable = false),
    StructField("label", IntegerType, nullable = false)))

  /** Headerless CSV pair list (ref: src/signature_module/
    * signature_model_dataloader.py:10-36): explicit schema, no inference.
    */
  def pairCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(PairCsvSchema).csv(path)
}
