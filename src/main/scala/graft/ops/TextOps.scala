package graft.ops

import graft.text.TextAlgos
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline toolkit (language-ID, quality scoring, token
  * counting, fingerprinting). Heuristic ops are codegen'd column
  * expressions; per-doc algorithmic ops (simhash, winnowing) are narrow
  * typed maps — no shuffle, linear scale-out.
  */
object TextOps {

  import RelationalOps.table

  /** Token-count statistics per language (whitespace tokenization —
    * deterministic and oracle-expressible; a BPE-ish regex variant is
    * `tokenCountBpe` below).
    */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("sum_tokens"),
        max(col("n_tokens")).cast("long").as("max_tokens"),
        min(col("n_tokens")).cast("long").as("min_tokens"))

  /** Shared quality-metric column builder — the ONE definition of the
    * gate; `qualityScore` (q15) and `CurationOps.curate` (q40) both use
    * it, so the composed pipeline can never drift from the standalone
    * query's semantics.
    */
  def withQualityColumns(df: DataFrame): DataFrame =
    df
      .withColumn("n_chars_m", length(col("text")).cast("long"))
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("n_punct", (length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))).cast("long"))
      .withColumn("n_letter_chars", length(regexp_replace(col("text"), "\\s", "")))
      .withColumn("mean_wordlen_x100", floor(col("n_letter_chars") * 100.0 / col("n_tokens")).cast("long"))
      .withColumn("n_stopwords",
        size(regexp_extract_all(col("text"), lit("\\b(the|and|of|to|in|is|that|for)\\b"), lit(0))).cast("long"))
      .withColumn("stopword_x1000",
        floor(col("n_stopwords") * 1000.0 / col("n_tokens")).cast("long"))
      .withColumn(
        "quality_pass",
        col("n_tokens").between(10, 100000) &&
          col("mean_wordlen_x100").between(150L, 1200L))

  /** Per-document quality metrics, all integer (engine-independent):
    * char count, token count, punctuation count, mean word length x100,
    * stopword ratio, and a pass/fail quality gate (length + word-shape
    * heuristics in the spirit of Gopher/C4 quality rules).
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    withQualityColumns(table(spark, dir, "documents"))
      .select(col("doc_id"), col("n_chars_m"), col("n_tokens"), col("n_punct"),
        col("mean_wordlen_x100"), col("stopword_x1000"), col("quality_pass"))

  /** Fixed integer weights of the linear quality model (FEATURE ORDER:
    * n_tokens, mean_wordlen_x100, stopword_x1000, n_punct) plus the accept
    * threshold. The WEIGHTS are corpus policy (a stand-in for a trained
    * fastText/logreg quality filter); the OPERATOR is the dataflow: model
    * application is a pure integer dot product per row, so the score is
    * bit-identical in any engine and at any parallelism (no float
    * accumulation order, no sigmoid boundary jitter).
    */
  val QualityLogitWeights: Seq[Long] = Seq(2L, 3L, 5L, -40L)
  val QualityLogitThreshold = 1475L // ~corpus median logit: a real split

  /** Linear quality-model application — the shape of every learned
    * document-quality filter at 100 TB: per-row feature vector (already
    * integer, from `withQualityColumns`) dotted with broadcast-constant
    * weights; filter on the logit. Narrow scan -> project -> filter.
    * (Monotone in the sigmoid, so thresholding the logit IS thresholding
    * the probability; skipping exp() keeps the oracle exact.)
    */
  /** Quality features + the integer logit on ANY text frame — the one
    * definition q66, q141 and the host-reputation family (q157/q158)
    * share.
    */
  def withLogit(df: DataFrame): DataFrame = {
    val Seq(wTok, wLen, wStop, wPunct) = QualityLogitWeights
    withQualityColumns(df)
      .withColumn(
        "logit",
        col("n_tokens") * wTok + col("mean_wordlen_x100") * wLen +
          col("stopword_x1000") * wStop + col("n_punct") * wPunct)
  }

  def qualityLogit(spark: SparkSession, dir: String): DataFrame = {
    withLogit(table(spark, dir, "documents"))
      .select(
        col("doc_id"), col("n_tokens"), col("mean_wordlen_x100"),
        col("stopword_x1000"), col("n_punct"), col("logit"),
        (col("logit") >= QualityLogitThreshold).as("model_pass"))
  }

  /** q141: cross-source quality calibration — each document's quality
    * logit converted to a per-SOURCE percentile, `pct_x10000 =
    * (rank - 1) * 10000 div (n_source - 1)` (ties share a rank, so the
    * result is order-independent and engine-exact). Mixing crawl +
    * curated sources on RAW logits over-prunes whichever source runs
    * low; per-source percentiles are the comparable currency
    * source-mixture policies (q92/q126) act on.
    *
    * Scale shape: one source-keyed Exchange that BOTH window frames
    * (rank sort, count) reuse. The in-window sort is per source — the
    * exact-percentile cost at 10^12 docs; the sketch alternative (q107/
    * q108 histogram read-off, ≤2x relative error) is the documented
    * approximate path when a full per-source sort is too much.
    */
  def qualityCalibrated(spark: SparkSession, dir: String): DataFrame = {
    val wRank = Window.partitionBy(col("source")).orderBy(col("logit"))
    val wCnt = Window.partitionBy(col("source"))
    withLogit(table(spark, dir, "documents"))
      .select(col("doc_id"), col("source"), col("logit"))
      .withColumn("rk", rank().over(wRank))
      .withColumn("cnt", count(lit(1)).over(wCnt))
      // bigint before the multiply: int rank * 10000 wraps past ~214k
      // docs per source (the q86 lesson)
      .withColumn("pct_x10000",
        expr("((cast(rk as bigint) - 1) * 10000) div greatest(cnt - 1, 1)"))
      .drop("rk", "cnt")
  }

  /** q142: encoding-quality audit — the crawl-hygiene gate that catches
    * double-decode damage (U+FFFD replacement chars), stray C0
    * control/DEL bytes, and invisible copy-paste junk (NBSP, zero-width
    * space/joiners, BOM) BEFORE a corpus trains a tokenizer on them.
    * Counts are codepoint-exact (all audited classes are BMP, so UTF-16
    * vs UTF-8 length semantics agree); `n_non_ascii` is the informational
    * superset (accented letters are non-ASCII but CLEAN — the flag only
    * fires on the damage classes). Pure narrow projection: codegen'd
    * regexp counts, zero exchanges at any scale.
    */
  def encodingAudit(docs: DataFrame): DataFrame = {
    def classCount(re: String) =
      (length(col("text")) - length(regexp_replace(col("text"), re, ""))).cast("long")
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      classCount("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]").as("n_control"),
      classCount("\\x{FFFD}").as("n_replacement"),
      classCount("[\\x{00A0}\\x{200B}-\\x{200D}\\x{FEFF}]").as("n_invisible"),
      classCount("[^\\x00-\\x7F]").as("n_non_ascii"))
      .withColumn("clean",
        col("n_control") === 0L && col("n_replacement") === 0L &&
          col("n_invisible") === 0L)
  }

  /** LM vocabulary size for the surprise filter — deliberately below the
    * verify corpus' 31-token vocabulary so OOV tokens genuinely occur
    * (same reasoning as `TrainingOps.EncodeVocabSize`); top-20 covers
    * ~68% of token mass, so per-doc OOV mix drives real score variance.
    */
  val LmVocabSize = 20

  /** Accept threshold for mean surprise (x100) — set between the verify
    * corpus' score modes so the gate genuinely splits at sf0.001 and
    * sf0.01 (distribution pinned in OpsSpec).
    */
  val LmSurpriseThresholdX100 = 700L

  /** CCNet-style LM quality filter in EXACT integer arithmetic: a unigram
    * LM is trained on the clean subset (docs passing the q15 quality
    * gate — CCNet trains on Wikipedia and scores the crawl; the composed
    * gate is this engine's analogue), then every doc is scored by its
    * mean per-token surprise. Surprise of token t is measured in whole
    * bits: bits(N) - bits(cnt_t) where bits(x) = floor(log2 x) =
    * length-1 of the minimal binary string — `conv(x, 10, 2)` here,
    * `bin(x)` in DuckDB, both unpadded, so the oracle is bit-exact with
    * no float log anywhere. OOV tokens cost bits(N) (count-1 smoothing).
    *
    * Scale shape: the LM is top-V by construction (V rows), collapsed to
    * ONE map column of PRE-COMPUTED per-token surprises and broadcast;
    * scoring is a pure per-row lookup + fold — no explode, no shuffle of
    * token rows (the explode+join alternative would shuffle one row per
    * corpus token). The only shuffles are the train-side count agg.
    */
  def lmSurprise(
      spark: SparkSession,
      dir: String,
      vocabSize: Int = LmVocabSize,
      thresholdX100: Long = LmSurpriseThresholdX100,
      carry: Seq[String] = Nil): DataFrame = {
    val docs = table(spark, dir, "documents")
    def bits(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (length(conv(c, 10, 2)) - 1).cast("long")
    val counts = withQualityColumns(docs)
      .filter(col("quality_pass"))
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(coalesce(sum(col("cnt")), lit(0L)).as("n_total"))
    val smap = counts
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(vocabSize)
      .crossJoin(broadcast(total))
      .select(col("token"), (bits(col("n_total")) - bits(col("cnt"))).as("surprise"))
      .agg(map_from_entries(collect_list(struct(col("token"), col("surprise")))).as("smap"))
    val carryCols = carry.map(col)
    docs
      .select(col("doc_id") +: carryCols :+
        filter(split(trim(col("text")), "\\s+"), t => t =!= "").as("words"): _*)
      .crossJoin(broadcast(smap))
      .crossJoin(broadcast(total.select(bits(col("n_total")).as("oov_surprise"))))
      .select(col("doc_id") +: carryCols :+
        size(col("words")).cast("long").as("n_tokens") :+
        aggregate(
          transform(col("words"), w => coalesce(element_at(col("smap"), w), col("oov_surprise"))),
          lit(0L), (a, x) => a + x).as("surprise_bits"): _*)
      .select(col("doc_id") +: carryCols :+ col("n_tokens") :+ col("surprise_bits") :+
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr("surprise_bits * 100 div n_tokens")).as("mean_surprise_x100"): _*)
      .withColumn(
        "lm_pass",
        col("n_tokens") > 0L && col("mean_surprise_x100") <= thresholdX100)
  }

  /** CCNet's head/middle/tail split: per-language perplexity terciles of
    * the q75 surprise score (CCNet buckets the crawl by Wikipedia-LM
    * perplexity thirds and trains preferentially on the head). Buckets
    * are assigned by VALUE thresholds — t_head = smallest surprise v with
    * cum(v)*3 >= n, t_middle likewise at 2n/3 — so tied scores always
    * share a bucket and the assignment is engine-order-independent
    * (bucket sizes are exact thirds only up to ties, documented here).
    *
    * Scale shape: no corpus-wide window anywhere — the corpus collapses
    * to a (lang, surprise) histogram first (bounded by langs x the small
    * integer surprise domain, NOT by rows); the cumulative threshold scan
    * runs on that histogram; thresholds broadcast back onto the scored
    * frame. A per-lang rank window would put whole languages on single
    * partitions at 100 TB; the histogram path shuffles only counts.
    */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    // carry lang through the scoring projection — a post-hoc doc_id join
    // back to `documents` would be a corpus-wide shuffle for one column
    val scored = lmSurprise(spark, dir, carry = Seq("lang"))
      .select(col("doc_id"), col("lang"), col("mean_surprise_x100"))
    val hist = scored
      .groupBy(col("lang"), col("mean_surprise_x100"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("lang"))
      .orderBy(col("mean_surprise_x100").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val th = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("lang"))))
      .groupBy(col("lang"))
      .agg(
        min(when(col("cum") * 3 >= col("n"), col("mean_surprise_x100")))
          .as("head_max_x100"),
        min(when(col("cum") * 3 >= col("n") * 2, col("mean_surprise_x100")))
          .as("middle_max_x100"))
    scored
      .join(broadcast(th), Seq("lang"))
      .select(
        col("doc_id"), col("lang"), col("mean_surprise_x100"),
        col("head_max_x100"), col("middle_max_x100"),
        when(col("mean_surprise_x100") <= col("head_max_x100"), lit("head"))
          .when(col("mean_surprise_x100") <= col("middle_max_x100"), lit("middle"))
          .otherwise(lit("tail")).as("ccnet_bucket"))
  }

  /** Unicode-normalization + control-strip audit (q172): NFC-normalize
    * (JDK Normalizer — the engine twin of DuckDB's nfc_normalize; both
    * implement UAX#15, and the planted corpus sticks to Latin-1 accents
    * whose NFC behavior is stable across Unicode versions), then strip
    * control characters (Java \\p{Cntrl} == [\\x00-\\x1f\\x7f] == the
    * oracle's regex class). The ingest step between q142's byte-damage
    * audit and tokenization: without it the same visible text arrives
    * under two codepoint sequences and splits vocab/dedup keys.
    *
    * Scale shape: one narrow typed map per doc (the simhash/winnowing
    * discipline) — no shuffle, no join; lengths/shas are computed by
    * codegen'd column functions on the map output (Spark `length` counts
    * codepoints, matching DuckDB's).
    */
  def nfcAudit(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("raw")).as[(Long, String)]
      .map { case (id, raw) =>
        val nfc = java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC)
        (id, raw, nfc, nfc.replaceAll("\\p{Cntrl}", ""))
      }
      .toDF("doc_id", "raw", "nfc", "clean")
      .select(
        col("doc_id"),
        (col("nfc") === col("raw")).as("was_nfc"),
        length(col("raw")).as("n_chars_raw"),
        length(col("clean")).as("n_chars_clean"),
        (length(col("nfc")) - length(col("clean"))).as("n_control"),
        sha2(col("clean"), 256).as("clean_sha"))
  }

  /** Line-break dehyphenation (q181) — the classic PDF/column
    * extraction repair: a word wrapped at a line end ("exam-\nple")
    * merges back iff BOTH sides are lowercase letters (the conservative
    * rule: inline compounds like "re-use" and uppercase breaks like
    * "USA-\nToday" survive untouched; a compound wrapped at its own
    * hyphen merges too — the ambiguity every dehyphenator accepts,
    * documented here). Counts come from pure arithmetic, not lookahead
    * regex (RE2 on the oracle side has no lookahead): each merge removes
    * exactly the 2 chars '-\n'.
    *
    * Scale shape: one narrow codegen'd projection per doc — no shuffle,
    * no join, no typed boundary.
    */
  def dehyphenate(docs: DataFrame): DataFrame =
    docs
      .withColumn("clean",
        regexp_replace(col("text"), "([a-z])-\\n([a-z])", "$1$2"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("-\\n"), lit(0)))
          .as("n_linebreak_hyphens"),
        ((length(col("text")) - length(col("clean"))) / 2).cast("int").as("n_merged"),
        sha2(col("clean"), 256).as("clean_sha"))

  /** Normalization-unlocked dedup (q186) — the composition capstone of
    * q172 + q181 + q20: the SAME content arriving NFD-decomposed,
    * line-wrap-hyphenated, or control-littered hashes to a DIFFERENT
    * raw sha, so raw exact-dedup misses it; after the normalize chain
    * (NFC -> dehyphenate -> control-strip, in that order — dehyphenate
    * needs the newline the control-strip would eat) the twins collapse.
    * Output per doc: the cleaned sha and the dup-group sizes under BOTH
    * keys, so the delta (raw 1 -> clean 2 on the planted twins) IS the
    * measured value of normalizing before hashing.
    *
    * Scale shape: one narrow typed map, then two hash-keyed aggs
    * joined back on 32-byte keys — text never shuffles.
    */
  def normalizedDedup(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val cleaned = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, raw) =>
        val nfc = java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC)
        val deh = nfc.replaceAll("([a-z])-\\n([a-z])", "$1$2")
        (id, raw, deh.replaceAll("\\p{Cntrl}", ""))
      }
      .toDF("doc_id", "raw", "clean")
      .select(col("doc_id"),
        sha2(col("raw"), 256).as("raw_sha"),
        sha2(col("clean"), 256).as("clean_sha"))
    val rawCnt = cleaned.groupBy(col("raw_sha"))
      .agg(count(lit(1)).as("raw_dup_count"))
    val cleanCnt = cleaned.groupBy(col("clean_sha"))
      .agg(count(lit(1)).as("clean_dup_count"))
    cleaned
      .join(rawCnt, "raw_sha")
      .join(cleanCnt, "clean_sha")
      .select(col("doc_id"), col("clean_sha"),
        col("raw_dup_count"), col("clean_dup_count"))
  }

  private val langStopwords: Seq[(String, String)] = Seq(
    // (lang, regex of high-frequency function words)
    ("en", "\\b(the|and|of|to|in|is|that|for)\\b"),
    ("fr", "\\b(le|la|les|et|de|un|une|est)\\b"),
    ("es", "\\b(el|la|los|las|y|de|que|es)\\b"),
    ("de", "\\b(der|die|das|und|ist|von|zu|mit)\\b"))

  /** Shared language-ID column builder (adds score_* and predicted_lang)
    * — the ONE definition used by `langId` (q16) and `CurationOps.curate`
    * (q40). Argmax with a deterministic tie order (en > fr > es > de >
    * unknown). Integer scores — oracle-expressible.
    */
  def withPredictedLang(df0: DataFrame): DataFrame = {
    val base = langStopwords.foldLeft(df0) {
      case (df, (lang, re)) =>
        df.withColumn(s"score_$lang", size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long"))
    }
    val best = langStopwords.map(_._1).foldLeft(lit(0)) { (acc, lang) =>
      greatest(acc, col(s"score_$lang"))
    }
    val predicted = langStopwords.reverse.foldLeft(lit("unknown")) {
      case (acc, (lang, _)) => when(col(s"score_$lang") === col("best_score") && col("best_score") > 0, lang).otherwise(acc)
    }
    base
      .withColumn("best_score", best)
      .withColumn("predicted_lang", predicted)
  }

  /** Language identification by stopword-profile scoring (q16). */
  def langId(spark: SparkSession, dir: String): DataFrame =
    withPredictedLang(table(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"),
        col("score_en"), col("score_fr"), col("score_es"), col("score_de"),
        col("predicted_lang"))

  /** A4: accuracy as mean-of-equality — per-language accuracy of the
    * language-ID heuristic against the corpus label, integer-scaled
    * (the reference reports train/val/test accuracies as mean equality,
    * ref: src/signature_module/signature_module_main.py:87-89).
    */
  def langAccuracy(spark: SparkSession, dir: String): DataFrame =
    withPredictedLang(table(spark, dir, "documents"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("predicted_lang") === col("lang"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy_x10000",
        floor(col("n_correct") * 10000.0 / col("n_docs")).cast("long"))

  /** Language-ID confusion matrix (q174): the eval artifact behind q48's
    * scalar accuracy — per (true lang, predicted lang) counts and exact
    * integer row percentages, the table that says WHICH languages the
    * heuristic confuses (fr/es share 'de'/'la' stopwords) rather than
    * just how often it is right.
    *
    * Scale shape: one map-side-combining agg to a <= |langs|² frame; the
    * row-total window runs on that aggregated frame, never the corpus.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame =
    withPredictedLang(table(spark, dir, "documents"))
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("row_total", sum(col("n_docs")).over(Window.partitionBy(col("lang"))))
      .withColumn("pct_x10000", expr("(n_docs * 10000) div row_total"))
      .drop("row_total")

  /** A3: mean of the per-field confidence annotations planted in the raw
    * pdf-IR payloads ("(Confidence: 0.NN)", F10) — surfaced per
    * conversation without running extraction (the reference averages
    * per-field OCR confidences).
    */
  def confidenceStats(turns: DataFrame): DataFrame =
    turns
      .select(
        col("conv_id"),
        explode(regexp_extract_all(
          col("text"), lit("\\(Confidence: 0\\.([0-9]{2})\\)"), lit(1))).as("c"))
      .withColumn("c", col("c").cast("long"))
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_annotations"), sum(col("c")).as("sum_conf_x100"))
      .withColumn("mean_conf_x100",
        floor(col("sum_conf_x100") * 1.0 / col("n_annotations")).cast("long"))

  /** BPE-ish token counting: alternation of word pieces, numbers and
    * punctuation runs (a deterministic regex stand-in for a subword
    * tokenizer; real BPE would be a broadcast vocab + typed map).
    */
  def tokenCountBpe(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn(
        "n_bpe_tokens",
        size(regexp_extract_all(col("text"), lit("[A-Za-z]{1,6}|[0-9]{1,3}|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))
      .select(col("doc_id"), col("n_bpe_tokens"))

  /** Winnowing parameters, shared by [[fingerprint]], the grams
    * materialization in `graft.Verify` and the q18 oracle SQL (which
    * interpolates WinnowW) — one source of truth so changing k/w cannot
    * silently desynchronize the engine from its oracle.
    */
  val WinnowK = 5
  val WinnowW = 4

  /** Document fingerprinting via winnowing (rolling k-gram hashes, min per
    * window) — near-duplicate detection primitive. Typed map, no shuffle.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val fps = TextAlgos.winnow(TextAlgos.tokenize(text), k = WinnowK, w = WinnowW)
        (id, fps.length, if (fps.isEmpty) 0L else fps.min, if (fps.isEmpty) 0L else fps.reduce(_ ^ _))
      }
      .toDF("doc_id", "n_fingerprints", "min_fingerprint", "xor_fingerprint")
  }

  /** 64-bit SimHash per document via the native `graft_simhash64`
    * Catalyst expression (graft.functions.SimHash64): stays inside
    * WholeStageCodegen — only the text column is converted, no typed
    * ser/de boundary (vs the previous `Dataset.map` version).
    */
  def simhashDf(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    table(spark, dir, "documents")
      .select(col("doc_id"), expr("graft_simhash64(text)").as("simhash"))
  }

  /** Percentiles reported by [[tokenQuantiles]]. */
  val QuantilePcts: Seq[Int] = Seq(50, 90, 99)

  /** Exact per-language token-count quantiles (discrete, no
    * interpolation): the p-th percentile is the value at 1-based rank
    * `ceil(p/100 · n)` of the sorted counts — pure integer rank math
    * (`(n·p + 99) div 100`), so engine and oracle agree bit-for-bit with
    * no float percentile semantics to reconcile. Ties in the sort are
    * harmless: the VALUE at a rank of a sorted multiset is deterministic.
    * One lang-partitioned window pass (row_number + count share the
    * partitioning) — a single shuffle of (lang, n_tokens) pairs.
    */
  /** Keywords per document for [[tfidfKeywords]]. */
  val KeywordK = 3

  /** TF-IDF keyword extraction with EXACT integer scoring: idf is the
    * whole-bit log2 of the scaled inverse document frequency —
    * bits(N·10⁴ div df) via the unpadded-binary trick (`conv(x,10,2)`
    * length == DuckDB `bin(x)` length, the q75 recipe) — so score =
    * tf · idf_bits is bit-identical across engines with no float log.
    * Shape: one (doc, word) tf aggregation, a vocab-sized df aggregate
    * broadcast back onto it, and a doc-partitioned top-k window
    * (deterministic tie-break score DESC, word ASC).
    */
  def tfidfKeywords(spark: SparkSession, dir: String, k: Int = KeywordK): DataFrame = {
    val docs = table(spark, dir, "documents")
    val nDocs = docs.count()
    val w = docs.select(col("doc_id"),
      explode(filter(split(trim(col("text")), "\\s+"), x => x =!= "")).as("word"))
    val tf = w.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = w.groupBy(col("word")).agg(countDistinct(col("doc_id")).as("df"))
    val scored = tf.join(broadcast(df), "word")
      .withColumn("score",
        col("tf") * expr(s"cast(length(conv((${nDocs}L * 10000L) div df, 10, 2)) - 1 as bigint)"))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word").asc)
    scored
      .withColumn("rank", row_number().over(byDoc))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("word"), col("tf"), col("score"), col("rank"))
  }

  /** Inverted index: one row per term with document frequency, corpus
    * term frequency, and the posting list serialized as
    * `doc:tf,doc:tf,…` in doc_id order (search-engine index layout).
    * Deterministic: collect_list order is erased by the struct
    * array_sort before serialization.
    *
    * Scale shape: one (doc, word) tf aggregation, one word-keyed
    * aggregation — both map-side combined. A posting list is inherently
    * per-term data-sized (a stopword's postings ARE the corpus); at
    * 100 TB an index build range-shards postings into blocks per term —
    * same dataflow, the per-term agg becomes (term, doc-range) — which
    * changes keys, not shape.
    */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val w = table(spark, dir, "documents")
      .select(col("doc_id"),
        explode(filter(split(trim(col("text")), "\\s+"), x => x =!= "")).as("word"))
    w.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      .groupBy(col("word"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("tf")))),
            e => concat(e.getField("doc_id").cast("string"), lit(":"),
              e.getField("tf").cast("string"))),
          ",").as("postings"))
  }

  /** BM25 constants: k1 = 1.2, b = 0.75 in x100 fixed point, exact
    * integer arithmetic throughout (the q86 whole-bit idf recipe), so
    * the ranking is bit-identical in any engine.
    */
  val Bm25K1X100 = 120L
  val Bm25BX100 = 75L
  val Bm25K = 10
  val Bm25DefaultTerms: Seq[String] = Seq("spark", "merge", "window")

  /** BM25 top-k document retrieval for a literal query-term set, in
    * EXACT integers: idf_bits = bitlength(N·10⁴ div df) (whole-bit
    * log2), length norm and tf saturation in x100/x10⁴ fixed point:
    * `norm_x100 = (100-b) + (b·dl·100) div avgdl_x100`,
    * `tfpart_x10000 = tf·(k1+100)·10⁴ div (tf·100 + (k1·norm_x100) div 100)`,
    * `score = Σ idf_bits · tfpart_x10000`. No float log, no float
    * division — engine/oracle agree bit-for-bit.
    *
    * Scale shape: the explode filters to the query terms immediately
    * (candidate postings only — never the full index); df is a
    * term-cardinality aggregate broadcast back; doc length joins on
    * doc_id; final top-k is TakeOrderedAndProject. Driver holds two
    * scalars (N, avgdl) — the q86 nDocs precedent.
    */
  def bm25TopK(
      spark: SparkSession, dir: String,
      terms: Seq[String] = Bm25DefaultTerms, k: Int = Bm25K): DataFrame = {
    val docs = table(spark, dir, "documents")
    val dl = docs.select(col("doc_id"),
      size(filter(split(trim(col("text")), "\\s+"), x => x =!= "")).cast("long").as("dl"))
    val Array(nDocs, totalTokens) =
      dl.agg(count(lit(1)), sum(col("dl"))).collect()(0) match {
        case r => Array(r.getLong(0), r.getLong(1))
      }
    val avgdlX100 = totalTokens * 100L / nDocs
    val w = docs
      .select(col("doc_id"),
        explode(filter(split(trim(col("text")), "\\s+"), x => x =!= "")).as("word"))
      .filter(col("word").isin(terms: _*))
    val tf = w.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = w.groupBy(col("word")).agg(countDistinct(col("doc_id")).as("df"))
    tf.join(broadcast(df), "word")
      .join(dl, "doc_id")
      .withColumn("idf_bits",
        expr(s"cast(length(conv((${nDocs}L * 10000L) div df, 10, 2)) - 1 as bigint)"))
      .withColumn("norm_x100",
        expr(s"(100L - ${Bm25BX100}L) + (${Bm25BX100}L * dl * 100L) div ${avgdlX100}L"))
      .withColumn("tfpart_x10000",
        expr(s"(tf * (${Bm25K1X100}L + 100L) * 10000L) div (tf * 100L + (${Bm25K1X100}L * norm_x100) div 100L)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("idf_bits") * col("tfpart_x10000")).as("score"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("n_terms_matched"), col("score"))
  }

  def tokenQuantiles(spark: SparkSession, dir: String,
      pcts: Seq[Int] = QuantilePcts): DataFrame = {
    val byLang = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    table(spark, dir, "documents")
      .select(col("lang"),
        size(filter(split(trim(col("text")), "\\s+"), x => x =!= "")).cast("long").as("n_tokens"))
      .withColumn("rn", row_number().over(byLang.orderBy(col("n_tokens"))))
      .withColumn("n", count(lit(1)).over(byLang))
      .select(col("lang"), col("n_tokens"), col("rn"), col("n"),
        explode(typedLit(pcts)).as("pct"))
      .filter(col("rn") === expr("(n * pct + 99) div 100"))
      .select(col("lang"), col("pct"), col("n_tokens").as("token_count"),
        col("n").as("n_docs"))
  }

  /** Minimum bigram count for a collocation candidate (noise floor). */
  val CollocMinPair = 3L
  val CollocK = 50

  /** Collocation mining: adjacent whitespace-token bigrams ranked by
    * exact-integer lift, `lift_x10000 = (c_ab · N · 10⁴) div (c_a · c_b)`
    * — the PMI ratio without the log, so the score stays in integer
    * arithmetic an oracle reproduces bit-for-bit (phrase-mining shape:
    * "new york" scores high because its parts rarely appear apart).
    * The product is computed in DECIMAL(38,0): at a 10¹²-token corpus
    * `c_ab·10⁴·N` overflows BIGINT, the same latent trap the round-3
    * advisor flagged in tfidfKeywords.
    *
    * Scale shape: bigrams come from one codegen'd `transform` over the
    * token array (no self-join); both count tables are map-side-combining
    * aggs that shuffle (token, count) pairs only; the unigram table is
    * vocab-bounded, so BOTH dictionary joins are explicit broadcasts; the
    * top-k is a TakeOrderedAndProject (plan-asserted). The only driver
    * scalar is the 1-row corpus token total (the q86 nDocs precedent).
    */
  def collocations(
      spark: SparkSession, dir: String,
      k: Int = CollocK, minPair: Long = CollocMinPair): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(filter(split(trim(col("text")), "\\s+"), x => x =!= "").as("toks"))
    val uni = toks.select(explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val nTokens: Long = toks
      .agg(coalesce(sum(size(col("toks")).cast("long")), lit(0L))).head.getLong(0)
    toks
      .select(explode(expr(
        "transform(slice(toks, 1, greatest(size(toks) - 1, 0)), " +
          "(x, i) -> named_struct('w1', x, 'w2', element_at(toks, i + 2)))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minPair)
      .join(broadcast(uni.select(col("token").as("w1"), col("cnt").as("c_a"))), "w1")
      .join(broadcast(uni.select(col("token").as("w2"), col("cnt").as("c_b"))), "w2")
      .withColumn("lift_x10000",
        expr(s"(CAST(c_ab AS DECIMAL(38,0)) * 10000 * ${nTokens}L) div " +
          "(CAST(c_a AS DECIMAL(38,0)) * c_b)"))
      .orderBy(col("lift_x10000").desc, col("w1").asc, col("w2").asc)
      .limit(k)
      .select(col("w1"), col("w2"), col("c_ab"), col("lift_x10000"))
  }

  /** Power-of-two token-count histogram per language — the mergeable
    * distribution sketch: `bucket = bitlength(n_tokens)` (0 for empty
    * docs), so each bucket covers `[2^(b-1), 2^b)`, counts sum across
    * partials/partitions, and — unlike a t-digest — every cell is a
    * deterministic exact integer the oracle recomputes.
    *
    * Scale shape: one narrow projection + one map-side-combining agg on
    * (lang, bucket) — the shuffle carries at most `langs × 64` rows.
    */
  def tokenHistogram(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("lang"),
        size(filter(split(trim(col("text")), "\\s+"), x => x =!= "")).cast("long").as("n_tokens"))
      .withColumn("bucket",
        when(col("n_tokens") === 0L, lit(0))
          .otherwise(length(bin(col("n_tokens")))).cast("int"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("bucket_hi",
        call_function("shiftleft", lit(1L), col("bucket")) - lit(1L))
      .select(col("lang"), col("bucket"), col("bucket_hi"), col("n_docs"))

  /** Sketch-side quantile estimates read off the [[tokenHistogram]]: for
    * each percentile, the upper bound (`bucket_hi`) of the first bucket
    * whose cumulative count reaches `ceil(n·pct/100)` — a ≤2× relative
    * error bound by construction, vs the exact ranks of q83. Same
    * integer-rank math as [[tokenQuantiles]]; the windows run over the
    * bucket-sized histogram, not the corpus.
    */
  def histogramQuantiles(spark: SparkSession, dir: String,
      pcts: Seq[Int] = Seq(50, 90)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cumW = Window.partitionBy(col("lang")).orderBy(col("bucket").asc)
    val allW = Window.partitionBy(col("lang"))
    tokenHistogram(spark, dir)
      .withColumn("cum", sum(col("n_docs")).over(cumW))
      .withColumn("n", sum(col("n_docs")).over(allW))
      .select(col("lang"), col("bucket"), col("bucket_hi"), col("n_docs"),
        col("cum"), col("n"), explode(typedLit(pcts)).as("pct"))
      .withColumn("target", expr("(n * pct + 99) div 100"))
      .filter(col("cum") >= col("target") && col("cum") - col("n_docs") < col("target"))
      .select(col("lang"), col("pct"), col("bucket"),
        col("bucket_hi").as("est_token_count_hi"), col("n").as("n_docs"))
  }

  /** Default phrase for [[phraseQuery]] — present at both verify scales
    * (~45 occurrences across ~45 docs each).
    */
  val PhraseDefaultTerms: Seq[String] = Seq("part", "filter")
  val PhraseK = 50

  /** Exact phrase search over a POSITIONAL index: documents containing
    * the query terms as adjacent tokens, ranked by occurrence count —
    * the positional extension of the q101 inverted index (the reference's
    * NL→SQL agent answers "which documents mention X" lookups over the
    * shredded text columns, ref: agents/sql_agent/langchain_sql_agent.py:36-44;
    * a phrase predicate is the exact-match version of that lookup).
    *
    * Scale shape: a `text.contains(term)` conjunction prunes candidate
    * documents BEFORE the positional explode (substring containment is a
    * superset of token-adjacency, so no match is lost), then only the
    * query terms' postings survive the explode — the adjacency check is a
    * per-term chain of (doc_id, pos+i) EQUI-joins over those postings,
    * never a scan of the full index. Shuffled bytes are (doc_id, pos)
    * pairs of matched terms only; occurrences of a phrase with repeated
    * tokens overlap correctly (positions, not token consumption). Ranking
    * is a TakeOrderedAndProject (count desc, doc_id asc), so only k rows
    * reach the driver.
    */
  def phraseQuery(
      spark: SparkSession, dir: String,
      phrase: Seq[String] = PhraseDefaultTerms, k: Int = PhraseK): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val pruned = table(spark, dir, "documents")
      .filter(phrase.distinct.map(t => col("text").contains(t)).reduce(_ && _))
    // 1-based positions (matches DuckDB generate_subscripts)
    val toks = pruned
      .select(col("doc_id"),
        posexplode(filter(split(trim(col("text")), "\\s+"), x => x =!= "")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("word"))
      .filter(col("word").isin(phrase.distinct: _*))
    val base = toks.filter(col("word") === phrase.head)
      .select(col("doc_id"), col("pos").as("start"))
    val matched = phrase.zipWithIndex.tail.foldLeft(base) { case (acc, (t, i)) =>
      val nxt = toks.filter(col("word") === t)
        .select(col("doc_id").as(s"d_$i"), col("pos").as(s"p_$i"))
      acc.join(nxt,
        acc("doc_id") === nxt(s"d_$i") && nxt(s"p_$i") === acc("start") + i)
        .select(col("doc_id"), col("start"))
    }
    matched
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("start")).cast("long").as("first_pos"))
      .orderBy(col("n_matches").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Gopher-rule bounds (Rae et al. 2021 §A1.1.2 shape, bounds tuned to
    * this corpus's single-line word-soup): word-count window, mean word
    * length 3-10 chars, ≥2 stopword occurrences, most-frequent word ≤20%
    * of tokens. Line-based rules (bullet/ellipsis fractions) are omitted
    * because the corpus is newline-free — documented, not forgotten.
    */
  val GopherMinWords = 20L
  val GopherMaxWords = 100000L
  val GopherMinMeanLenX100 = 300L
  val GopherMaxMeanLenX100 = 1000L
  val GopherMinStopwords = 2L
  val GopherMaxTopWordX10000 = 2000L
  val GopherStopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in")

  /** q131: Gopher-style document quality gate — per-document rule flags
    * (0/1 longs, so the oracle hashes exact integers) plus the composed
    * `pass` gate. All rules derive from ONE (doc_id, word) aggregation
    * chain: explode → groupBy(doc_id, word) → groupBy(doc_id), carrying
    * counts and summed lengths only — two map-side-combinable exchanges
    * whose second reuses nothing wider than (doc_id, small ints); text
    * never crosses a shuffle. Every ratio is exact fixed-point, so the
    * gate is bit-identical at any parallelism.
    */
  def gopherGate(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        explode(filter(split(trim(col("text")), "\\s+"), x => x =!= "")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"), max(length(col("word"))).cast("long").as("wlen"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("cnt")).as("top_word_cnt"),
        sum(col("cnt") * col("wlen")).as("n_word_chars"),
        sum(when(col("word").isin(GopherStopwords: _*), col("cnt")).otherwise(0L))
          .as("n_stopwords"))
      .withColumn("mean_wordlen_x100", expr("n_word_chars * 100L div n_words"))
      .withColumn("top_word_x10000", expr("top_word_cnt * 10000L div n_words"))
      .withColumn("flag_words",
        when(col("n_words") >= GopherMinWords && col("n_words") <= GopherMaxWords, 1L)
          .otherwise(0L))
      .withColumn("flag_wordlen",
        when(col("mean_wordlen_x100") >= GopherMinMeanLenX100
          && col("mean_wordlen_x100") <= GopherMaxMeanLenX100, 1L).otherwise(0L))
      .withColumn("flag_stopwords",
        when(col("n_stopwords") >= GopherMinStopwords, 1L).otherwise(0L))
      .withColumn("flag_topword",
        when(col("top_word_x10000") <= GopherMaxTopWordX10000, 1L).otherwise(0L))
      .withColumn("pass",
        col("flag_words") * col("flag_wordlen") * col("flag_stopwords") * col("flag_topword"))
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        col("mean_wordlen_x100"), col("n_stopwords"), col("top_word_x10000"),
        col("flag_words"), col("flag_wordlen"), col("flag_stopwords"),
        col("flag_topword"), col("pass"))

  /** Importance-weight vocabulary cap (q132). The planted corpus has 32
    * distinct tokens, so 64 keeps the map total; at 100 TB the cap is the
    * scale contract — the broadcast λ map is vocab-sized, never data.
    */
  val DsirVocabSize = 64

  /** floor(4·log2 x) in EXACT integer arithmetic at any magnitude
    * ("quarter-bits"): truncate x to a 15-bit mantissa (s = max(bitlen-15,
    * 0), xr = x >> s — exact for x < 2^15), then bitlen(xr^4) - 1 + 4s.
    * xr^4 < 2^60 always fits a BIGINT, so both engines evaluate the same
    * recipe without floats; floor-log2 alone (the q75 `bits`) is too
    * coarse for likelihood RATIOS, where sub-1-bit differences carry the
    * signal. Recipe mirrored verbatim by the q132 DuckDB oracle and pinned
    * bit-exact against a driver recompute in FunctionsSpec.
    */
  def qbits(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def bitlen(x: org.apache.spark.sql.Column) =
      length(conv(x, 10, 2)).cast("long")
    val s = greatest(bitlen(c) - 15L, lit(0L))
    val xr = call_function("shiftright", c.cast("long"), s.cast("int"))
    val m = xr * xr * xr * xr
    bitlen(m) - 1L + lit(4L) * s
  }

  /** q132: DSIR-shaped importance selection (Xie et al. 2023 shape, exact
    * integers): score every doc by the summed log-likelihood ratio of its
    * tokens under a target-domain unigram LM vs the raw-corpus unigram LM,
    * λ(w) = qb(c_t(w)+1) - qb(c_r(w)) + qb(n_r) - qb(n_t) quarter-bits
    * (add-one smoothing on the target side only — a vocab token absent
    * from the target corpus must still score, and the raw side has
    * c_r ≥ 1 for every vocab token by construction). `selected` =
    * positive total: the doc looks more target-like than the raw average.
    *
    * Scale shape (the q75 lmSurprise contract): both LMs are token-count
    * aggregations (map-side combinable, shuffling (token, count) pairs
    * only); the λ map is vocab-capped and broadcast as ONE map row; the
    * scorer is a per-doc fold — the corpus never crosses an exchange, and
    * out-of-vocabulary tokens score 0 (λ unknown ⇒ neutral), keeping the
    * broadcast bounded regardless of tail vocabulary. No division
    * anywhere: `dsir_qbits` may be negative, and `div` semantics differ
    * across engines on negatives, so the output carries the raw sum.
    */
  def dsirSelect(docs: DataFrame, vocabSize: Int = DsirVocabSize): DataFrame = {
    val words = docs.select(col("doc_id"), col("domain"),
      filter(split(trim(col("text")), "\\s+"), t => t =!= "").as("words"))
    val tok = words.select(col("domain"), explode(col("words")).as("token"))
    val cr = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt_r"))
    val ct = tok.filter(col("domain") === "target")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt_t"))
    val nr = cr.agg(coalesce(sum(col("cnt_r")), lit(0L)).as("n_r"))
    val nt = ct.agg(coalesce(sum(col("cnt_t")), lit(0L)).as("n_t"))
    val lmap = cr
      .orderBy(col("cnt_r").desc, col("token").asc)
      .limit(vocabSize)
      .join(ct, Seq("token"), "left")
      .crossJoin(broadcast(nr))
      .crossJoin(broadcast(nt))
      .select(col("token"),
        (qbits(coalesce(col("cnt_t"), lit(0L)) + 1L) - qbits(col("cnt_r"))
          + qbits(col("n_r")) - qbits(col("n_t"))).as("lam"))
      .agg(map_from_entries(collect_list(struct(col("token"), col("lam"))))
        .as("lmap"))
    words
      .crossJoin(broadcast(lmap))
      .select(
        col("doc_id"), col("domain"),
        size(col("words")).cast("long").as("n_tokens"),
        aggregate(
          transform(col("words"), w => coalesce(element_at(col("lmap"), w), lit(0L))),
          lit(0L), (a, x) => a + x).as("dsir_qbits"))
      .withColumn("selected", col("dsir_qbits") > 0L)
  }
}
