package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, posexplode}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries whose input is the deterministic synthetic corpus (extraction,
  * shredding, registry, rules) have no sf-dir table DuckDB could read, so
  * this main ALSO materializes those inputs — the golden turn table (raw
  * payload + by-construction expected extraction) and the nested
  * structured records — to `<outDir>/_synth/`, and rewrites the
  * `__SYNTH__` placeholder in `SparkEntry.oracleSql` to that absolute
  * path before dumping oracle_sql.json. The expectations come from the
  * generator (Synth embeds the expected main content when it builds each
  * payload), NOT from running the extractor, so the DuckDB compare is an
  * independent check of the Spark pipeline output.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (local
    // iteration only — the driver always runs the full surface)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val synthDir = Paths.get(outDir).toAbsolutePath.normalize.toString + "/_synth"
    // One try per synth table so a single failed write is attributed to
    // the queries it feeds, instead of surfacing later as an opaque
    // missing-file error in the DuckDB compare.
    def synthWrite(label: String, affects: String)(body: => Unit): Unit =
      try body catch { case e: Throwable =>
        System.err.println(s"[verify] synth $label failed (affects $affects): ${e.getMessage}")
      }
    {
      import spark.implicits._
      synthWrite("golden_turns", "extraction-family oracles") {
        synth.SynthDataset.golden(spark, SparkEntry.VerifyConvs)
          .toDF().coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/golden_turns.parquet")
      }
      synthWrite("records", "shred-family oracles") {
        ops.ShredOps.structuredRecords(spark, SparkEntry.VerifyRecords)
          .toDF().coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/records.parquet")
      }
      synthWrite("web_docs", "q61/q62/q67") {
        synth.WebDocs.docs(spark, SparkEntry.VerifyWebDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/web_docs.parquet")
      }
      synthWrite("golden_spans", "q121 span-offset oracle (exploded from the generator's by-construction span layout)") {
        synth.SynthDataset.golden(spark, SparkEntry.VerifyConvs)
          .toDF()
          .select(col("conv_id"), col("turn_idx"), posexplode(col("expected_spans")))
          .select(col("conv_id"), col("turn_idx"),
            col("pos").cast("int").as("span_idx"),
            col("col").getField("kind").as("span_kind"),
            col("col").getField("start").as("span_start"),
            col("col").getField("end").as("span_end"))
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/golden_spans.parquet")
      }
      synthWrite("retry_turns", "q116-q118 conversation-redundancy oracles") {
        synth.RetryCorpus.turns(spark, SparkEntry.VerifyRetryConvs)
          .toDF().coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/retry_turns.parquet")
      }
      synthWrite("domain_docs", "q132 DSIR-selection oracle") {
        synth.DomainDocs.docs(spark, SparkEntry.VerifyDomainDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/domain_docs.parquet")
      }
      synthWrite("golden_cells", "q133 table-extraction oracle (generator's by-construction cells)") {
        synth.TableDocs.goldenCells(spark, SparkEntry.VerifyTableDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/golden_cells.parquet")
      }
      synthWrite("golden_links", "q136 link-extraction oracle (generator's by-construction links)") {
        synth.TableDocs.goldenLinks(spark, SparkEntry.VerifyTableDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/golden_links.parquet")
      }
      synthWrite("golden_sections", "q137/q138 outline oracle (generator's by-construction sections)") {
        synth.OutlineDocs.goldenSections(spark, SparkEntry.VerifyOutlineDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/golden_sections.parquet")
      }
      synthWrite("md_golden_cells", "q135 markdown-table oracle (generator's by-construction cells)") {
        synth.MdTableDocs.goldenCells(spark, SparkEntry.VerifyMdTableDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/md_golden_cells.parquet")
      }
      synthWrite("golden_md_links", "q151 markdown-link oracle (generator's by-construction links)") {
        synth.OutlineDocs.goldenMdLinks(spark, SparkEntry.VerifyOutlineDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/golden_md_links.parquet")
      }
      synthWrite("golden_section_bodies", "q150 markdown section-body oracle (generator's by-construction bodies)") {
        synth.OutlineDocs.goldenBodies(spark, SparkEntry.VerifyOutlineDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/golden_section_bodies.parquet")
      }
      synthWrite("golden_grid_cells", "q145 pdfir grid oracle (generator's by-construction cells)") {
        synth.PdfGridDocs.goldenCells(spark, SparkEntry.VerifyPdfGridDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/golden_grid_cells.parquet")
      }
      synthWrite("golden_jitter_cells", "q155 jittered-grid oracle (generator's by-construction cells)") {
        synth.PdfGridDocs.goldenJitterCells(spark, SparkEntry.VerifyPdfGridDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/golden_jitter_cells.parquet")
      }
      synthWrite("noisy_docs", "q142 encoding-audit oracle (planted encoding damage)") {
        synth.NoisyDocs.docs(spark, SparkEntry.VerifyNoisyDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/noisy_docs.parquet")
      }
      synthWrite("nfc_docs", "q172 NFC-audit oracle (planted normalization forms)") {
        synth.NfcDocs.docs(spark, SparkEntry.VerifyNfcDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/nfc_docs.parquet")
      }
      synthWrite("hyphen_docs", "q181 dehyphenation oracle (planted line-break wraps)") {
        synth.HyphenDocs.docs(spark, SparkEntry.VerifyNfcDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/hyphen_docs.parquet")
      }
      synthWrite("norm_pair_docs", "q186 normalization-dedup oracle (planted twins)") {
        synth.NormPairDocs.docs(spark, SparkEntry.VerifyNfcDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/norm_pair_docs.parquet")
      }
      synthWrite("pdf_golden", "q192 real-PDF container oracle (generator's by-construction reading order)") {
        synth.PdfDocs.golden(spark, SparkEntry.VerifyPdfDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/pdf_golden.parquet")
      }
      synthWrite("pdf_golden_runs", "q195 rasterization oracle (the layout plan's positioned runs)") {
        synth.PdfDocs.goldenRuns(spark, SparkEntry.VerifyPdfDocs)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/pdf_golden_runs.parquet")
      }
      synthWrite("conv_buckets", "q194 time-travel oracle (the store's conv->bucket assignment; xxhash64 has no DuckDB equivalent, so the map materializes and the oracle verifies the DOWNSTREAM snapshot algebra — the q18/q22/q36 pattern)") {
        synth.SynthDataset.turns(spark, SparkEntry.VerifyConvs)
          .select(col("conv_id")).distinct()
          .select(col("conv_id"),
            org.apache.spark.sql.functions.pmod(
              org.apache.spark.sql.functions.xxhash64(col("conv_id")),
              org.apache.spark.sql.functions.lit(SparkEntry.TtBuckets.toLong)).cast("int").as("bucket"))
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/conv_buckets.parquet")
      }
      synthWrite("json_records", "q69") {
        synth.JsonRecords.docs(spark, SparkEntry.VerifyJsonRecords)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$synthDir/json_records.parquet")
      }
    }
    // sf-dir-dependent intermediates: the engine's minhash pair list,
    // simhash values and ordered winnow grams. Their inner hash
    // (splitmix64) has no DuckDB equivalent, so the oracles for
    // q18/q22/q36 verify the DOWNSTREAM algorithms (winnow window-min,
    // Hamming blocking, connected components) over these materialized
    // values instead; the hash production itself is covered by
    // local-truth ScalaTests (OpsSpec/TextAlgosSpec/FunctionsSpec).
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      ops.DedupOps.minhashPairs(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$synthDir/minhash_pairs.parquet")
      // per-doc MinHash band keys: the q23 oracle must apply the SAME
      // band-agreement predicate as the engine's candidate generation —
      // an exact all-(lang,bucket)-pairs oracle would list pairs the
      // (one-sided-probabilistic) prefilter is allowed to miss
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, t) =>
          val sh = text.TextAlgos.shingleHashes(
            text.TextAlgos.tokenize(t), ops.DedupOps.ShingleW)
          if (sh.isEmpty) Iterator.empty
          else text.TextAlgos.bandKeys(
            text.TextAlgos.minhash(sh, ops.DedupOps.MinhashK), ops.DedupOps.LshBands)
            .iterator.map(bk => (id, bk))
        }
        .toDF("doc_id", "band_key").coalesce(1)
        .write.mode("overwrite").parquet(s"$synthDir/bands.parquet")
      ops.TextOps.simhashDf(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$synthDir/simhash.parquet")
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, t) =>
          (id, text.TextAlgos.shingleHashesOrdered(
            text.TextAlgos.tokenize(t), ops.TextOps.WinnowK))
        }
        .toDF("doc_id", "grams").coalesce(1)
        .write.mode("overwrite").parquet(s"$synthDir/grams.parquet")
      // IVF coarse centroids for the q54 oracle: exact fixed-point Lloyd
      // training is bit-deterministic at any parallelism, so this
      // materialization equals the centroids q54 recomputes in-query;
      // DuckDB independently recomputes assignment + probe + search.
      ops.SimilarityOps.ivfCentroids(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$synthDir/centroids.parquet")
      // frozen BASE-subset centroids for the q187 append-path oracle
      ops.SimilarityOps.ivfCentroidsOf(
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
          .filter(col("vec_id") < ops.SimilarityOps.IvfAppendBase)).coalesce(1)
        .write.mode("overwrite").parquet(s"$synthDir/centroids_base.parquet")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] intermediate materialization failed: ${e.getMessage}")
    }
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__SYNTH__", synthDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
