package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * processed in batched partition-local stages.
  *
  * The real decoders (image/audio libs) are not available in this
  * container, so the decode step is a STUB — a deterministic fake feature
  * extractor over the raw bytes (clearly marked below). Everything
  * Spark-side is real and tested: binary column construction, metadata
  * struct schema, batch shape (mapPartitions with fixed-size internal
  * batches, mirroring the reference's BATCH_SIZE=32 inference batching,
  * ref: src/signature_module/signature_module_main.py:18), and the
  * downstream relational handling of the features.
  */
object MultimodalOps {

  import RelationalOps.table

  val BatchSize = 32

  final case class MediaFeature(
      doc_id: Long,
      n_bytes: Int,
      top_byte: Int,
      byte_sum: Long,
      batch_size_seen: Int)

  /** STUB decoder: deterministic byte-level "features" standing in for an
    * image/audio decode. Replace with a real codec when available — the
    * signature (Array[Byte] => features) and the batching shape stay.
    * The summary statistic is a plain byte SUM (not a wrapping product
    * hash) so the output is expressible in overflow-checked engines and
    * the DuckDB oracle can recompute it.
    */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Long) = {
    val hist = new Array[Int](256)
    var byteSum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      hist(b) += 1
      byteSum += b
      i += 1
    }
    var top = 0
    var ti = 0
    var b = 0
    while (b < 256) { if (hist(b) > top) { top = hist(b); ti = b }; b += 1 }
    (payload.length, ti, byteSum)
  }

  /** Build a binary media column (payload = utf-8 bytes of text — the
    * container has no real media; the column TYPE and flow are the point)
    * plus a typed metadata struct, then feature-extract in batches.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = table(spark, dir, "documents")
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          col("source").as("container"),
          col("n_chars").as("declared_size"),
          lit("application/octet-stream").as("mime")).as("meta"))

    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batched processing: the decode stub is called per element, but
        // batch boundaries are real (a vectorized codec would consume the
        // whole batch at once)
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val (n, top, sum) = fakeDecode(payload)
            MediaFeature(id, n, top, sum, batch.size)
          }
        }
      }
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("top_byte"), col("byte_sum"))
  }

  final case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int, checksum: Long)

  /** Frame sampling over an opaque binary "video" payload: fixed-size
    * windows at a stride, each "decoded" (STUB: checksum) — the
    * partition-local fan-out shape of real frame extraction (one input
    * row → k frame rows, no shuffle). `resizeTo` then downsamples each
    * frame payload by integer striding — the stand-in for an image
    * resize kernel with the same signature (bytes → smaller bytes).
    */
  def frameSample(
      spark: SparkSession,
      dir: String,
      frameBytes: Int = 64,
      stride: Int = 48): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val n = payload.length
          // windows start every `stride` bytes until the payload is
          // exhausted — the final (possibly partial) frame covers the
          // tail, so every byte lands in at least one frame
          val starts = 0 until math.max(1, n) by stride
          starts.iterator.zipWithIndex.map { case (s, fi) =>
            val end = math.min(n, s + frameBytes)
            var ck = 0L
            var i = s
            while (i < end) { ck = ck * 131 + (payload(i) & 0xff); i += 1 }
            Frame(id, fi, end - s, ck)
          }
        }
      }
      .toDF()
  }

  /** F8: base64 transport encoding of a binary payload column — the
    * reference ships page images base64-encoded (ref: app.py:273-279).
    * Spark's `base64` emits RFC 2045 MIME chunking (CRLF every 76 chars)
    * for long payloads; transport format here is single-line RFC 4648,
    * so the line breaks are stripped. Round-trip (`fromBase64Transport`)
    * is asserted in OpsSpec.
    */
  def toBase64Transport(df: DataFrame, binCol: String): DataFrame =
    df.withColumn(s"${binCol}_b64",
      regexp_replace(base64(col(binCol)), "[\\r\\n]", ""))

  def fromBase64Transport(df: DataFrame, b64Col: String, outCol: String): DataFrame =
    df.withColumn(outCol, unbase64(col(b64Col)))

  /** STUB resize: keep every `factor`-th byte (real kernel would be a
    * codec call; the Spark-side contract — binary in, binary out, same
    * row — is the point).
    */
  def resizeTo(payloads: DataFrame, factor: Int): DataFrame = {
    val resize = udf { (b: Array[Byte]) =>
      if (b == null) null
      else Array.tabulate(b.length / factor)(i => b(i * factor))
    }
    payloads.withColumn("payload", resize(col("payload")))
  }
}
