package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training over the document corpus.
  *
  * The reference ships a fixed tokenizer; training one from the corpus is
  * the missing upstream of the engine's vocab/encode family (q57/q63) and
  * a standard large-scale pipeline step, so it is built here as a
  * first-class operator (beyond-reference, like the dedup/ANN families).
  *
  * Scale design: all iterative state lives on the WORD HISTOGRAM — the
  * corpus is aggregated once to (word, cnt) and never touched again, so a
  * 100 TB corpus costs one word-keyed shuffle total. The TRAINING
  * histogram is frequency-floored (`MinWordCount`, standard BPE practice:
  * singleton word types — URLs, typos, code tokens — grow unboundedly
  * with corpus size and carry no merge signal) and guarded by a fail-fast
  * row-count check (`MaxHistWords`) BEFORE it is collected, so the
  * driver-resident state is provably bounded: the floored histogram plus
  * the merge table, never the raw vocabulary. Encoding needs NO
  * vocab-sized driver state at all: the learned merges are re-applied
  * engine-side per word (`encodeWord`, a fold of literal replaces), total
  * over any word including those below the training floor.
  *
  * Exactness: a word's symbol state is a packed string with DOUBLE-space
  * separators (` a  b  c `). A merge of pair (l, r) is then one plain
  * left-to-right non-overlapping `replace(packed, " l  r ", " lr ")`:
  * each match consumes one boundary space from either side, leaving the
  * neighbour's separator intact, so back-to-back merges in one scan are
  * exactly BPE's leftmost-first non-overlapping semantics (including odd
  * runs: `a a a` -> `aa a`), with no regex, no fold, and byte-identical
  * behavior in Spark and DuckDB `replace`. Argmax ties break
  * (count DESC, lhs ASC, rhs ASC) — byte-lexicographic in both engines.
  */
object BpeOps {

  /** Merge rounds for the driver-facing queries (vocab is synthetic and
    * small; real corpora would use thousands — the loop shape is the
    * same: one corpus pass, then driver-local rounds over the vocab-sized
    * histogram, each costing only the words containing the merged pair).
    */
  val DefaultMerges = 64

  /** Top-k for the pair-count query (q79). */
  val PairTopK = 20

  /** Frequency floor for the TRAINING histogram: a word type must occur
    * at least this many times to contribute pair statistics. Merges are
    * still applied to every word at encode time (`encodeWord`), so the
    * floor changes what is LEARNED, never what is encodable. At web
    * scale the word-type count is dominated by singletons; the floor
    * bounds the driver-resident histogram to the heavy types.
    */
  val MinWordCount = 2L

  /** Fail-fast ceiling on the floored training histogram's row count,
    * checked distributedly (a `count` over the cached histogram) BEFORE
    * the driver `collect` — training aborts with instructions to raise
    * the floor instead of silently OOM-ing the driver. 20M rows of
    * short words ≈ low-GB driver heap, the intended budget.
    */
  val MaxHistWords = 20000000L

  /** Whitespace words of `text`, empties dropped (split parity with
    * DuckDB `regexp_split_to_array(trim(text), '\s+')` + filter).
    * NULL text coalesces to no words (split/size would otherwise poison
    * downstream counts with nulls / -1).
    */
  private def words(text: Column): Column =
    filter(split(trim(coalesce(text, lit(""))), "\\s+"), w => w =!= "")

  /** (word, cnt) histogram of the corpus — the ONLY corpus-wide pass. */
  def wordHistogram(docs: DataFrame): DataFrame =
    docs.select(explode(words(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** The frequency-floored TRAINING histogram (see `MinWordCount`). */
  def trainHistogram(docs: DataFrame, minCount: Long): DataFrame =
    wordHistogram(docs).filter(col("cnt") >= minCount)

  /** ` a  b  c ` packed form: every char its own symbol, double-space
    * separators, single-space ends.
    */
  private def pack(word: Column): Column =
    concat(lit(" "), rtrim(regexp_replace(word, "(.)", "$1  ")), lit(" "))

  /** Encoded (trimmed packed) form of one word column: pack, then apply
    * every learned merge in rank order as the same leftmost-first
    * non-overlapping literal replace the trainer uses per round — a
    * replace is the identity when the pair is absent, so the fold equals
    * the trainer's final per-word state exactly. Total over ANY word:
    * rare words below the training floor encode through the learned
    * merges with no lookup, and the only driver-resident state is the
    * merge table itself (nMerges rows), never a vocab-sized map — the
    * previous broadcast word→symbolization literal grew with corpus
    * vocabulary, the same unbounded growth the training floor fixes.
    */
  private def encodeWord(word: Column, merges: Seq[(Int, String, String, Long)]): Column =
    trim(merges.foldLeft(pack(word)) { case (c, (_, l, r, _)) =>
      replace(c, lit(s" $l  $r "), lit(s" $l$r "))
    })

  /** Weighted adjacent-pair counts of the current symbolization:
    * (lhs, rhs, pair_count). Shuffles pair keys of the histogram only.
    */
  def pairCounts(packedHist: DataFrame): DataFrame =
    packedHist
      .select(col("cnt"), split(trim(col("packed")), "  ").as("s"))
      .filter(size(col("s")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(s) - 1), i -> struct(s[i-1] AS lhs, s[i] AS rhs))")).as("pr"))
      .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("pair_count"))

  /** q79: the distributed kernel of one training round — top-k weighted
    * adjacent symbol pairs of the initial (character) symbolization of
    * the floored training histogram (the exact frame `train` argmaxes).
    */
  def topPairs(spark: SparkSession, dir: String, k: Int = PairTopK,
      minCount: Long = MinWordCount): DataFrame =
    pairCounts(
      trainHistogram(RelationalOps.table(spark, dir, "documents"), minCount)
        .withColumn("packed", pack(col("word"))))
      .orderBy(col("pair_count").desc, col("lhs").asc, col("rhs").asc)
      .limit(k)

  /** Training is deterministic in (corpus dir, nMerges); q80 and q81 both
    * need the identical result, so cache it per process instead of paying
    * the iterative loop twice per Verify/Bench pass. Vocab-sized values.
    */
  private val trainCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Int, Long), (Seq[(Int, String, String, Long)], Seq[(String, String)])]

  /** Content fingerprint of the corpus dir (file name/size/mtime of every
    * part file) so a rewrite of documents.parquet in the same JVM — long
    * sessions, re-ingest, tests reusing a path — invalidates the cache
    * instead of silently serving stale merges.
    */
  private def corpusFingerprint(dir: String): String = {
    val root = new java.io.File(s"$dir/documents.parquet")
    val files =
      if (root.isDirectory) root.listFiles().sortBy(_.getName)
      else Array(root)
    files.iterator
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|")
  }

  private def trainCached(spark: SparkSession, dir: String, nMerges: Int,
      minCount: Long = MinWordCount)
      : (Seq[(Int, String, String, Long)], Seq[(String, String)]) =
    trainCache.getOrElseUpdate((dir, corpusFingerprint(dir), nMerges, minCount),
      train(RelationalOps.table(spark, dir, "documents"), nMerges, minCount))

  /** Space-only trim — the driver-local loop must match DuckDB's
    * `trim`/`rtrim` (spaces only), NOT Java's `String.trim` (all chars
    * <= U+0020): a word carrying a control character would otherwise
    * lose it to the sentinel-space strip engine-side only.
    */
  private def trimSpaces(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** UTF-8 unsigned byte comparison — DuckDB's ORDER BY collation. Java
    * `compareTo` (UTF-16 code units) disagrees for supplementary
    * codepoints vs [U+E000, U+FFFF].
    */
  private def utf8Compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Adjacent symbol pairs of one packed word, overlaps included — the
    * same per-occurrence counting `pairCounts` and the DuckDB CTEs use.
    */
  private def symPairs(packed: String): Array[(String, String)] = {
    val s = trimSpaces(packed).split("  ")
    if (s.length < 2) Array.empty
    else Array.tabulate(s.length - 1)(i => (s(i), s(i + 1)))
  }

  /** Train `nMerges` merges over the `minCount`-floored histogram.
    * Returns (merge table rows (rank, lhs, rhs, pair_count), final
    * floored word -> trimmed-packed mapping). Stops early if no pair
    * remains.
    *
    * ONE corpus-wide Spark pass (the word-keyed histogram shuffle); the
    * FLOORED histogram (see `MinWordCount`) is then size-guarded with a
    * distributed `count` over the cached frame (`MaxHistWords` fail-fast
    * — an over-budget vocabulary aborts with instructions to raise the
    * floor, it never OOMs the driver), collected once, and the merge
    * loop runs driver-local with INCREMENTAL pair counts — zero
    * per-round Spark jobs. (The previous shape paid one distributed
    * aggregation + one-row collect per merge: data-scale-safe, but
    * linear in rounds — a real 32k-merge tokenizer would pay 32k driver
    * round-trips over data that already fits in driver memory.) Each
    * round costs one argmax scan over the live pair set plus a re-pack
    * of only the words containing the merged pair; merge semantics are
    * the identical leftmost-first non-overlapping literal replace on the
    * packed form, and counts stay per-occurrence (overlaps included),
    * matching the DuckDB retrain CTEs byte-for-byte.
    */
  def train(docs: DataFrame, nMerges: Int, minCount: Long = MinWordCount)
      : (Seq[(Int, String, String, Long)], Seq[(String, String)]) = {
    val floored = trainHistogram(docs, minCount).persist()
    val hist =
      try {
        val nTypes = floored.count()
        require(nTypes <= MaxHistWords,
          s"BPE training histogram has $nTypes word types above the cnt >= $minCount floor " +
            s"(budget $MaxHistWords) — raise the floor before training")
        floored.collect()
          .map(r => (r.getString(0), r.getLong(1)))
          .sortBy(_._1) // deterministic word order for the mapping output
      } finally floored.unpersist() // incl. the fail-fast path — no pinned blocks
    val words = hist.map(_._1)
    val cnts = hist.map(_._2)
    // rtrim spaces only (DuckDB rtrim parity), not stripTrailing
    val packed = words.map(w =>
      " " + trimSpaces(w.replaceAll("(.)", "$1  ")) + " ")

    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val byPair = scala.collection.mutable.HashMap.empty[(String, String), scala.collection.mutable.Set[Int]]
    def add(i: Int, sign: Long): Unit =
      symPairs(packed(i)).foreach { p =>
        val n = counts.getOrElse(p, 0L) + sign * cnts(i)
        if (n == 0L) counts.remove(p) else counts(p) = n
        if (sign > 0) byPair.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += i
        else byPair.get(p).foreach(_ -= i)
      }
    words.indices.foreach(add(_, 1L))

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    while (r <= nMerges && counts.nonEmpty) {
      // argmax with the engines' shared tie-break: count DESC, lhs ASC, rhs ASC
      var best: ((String, String), Long) = null
      counts.foreach { e =>
        if (best == null) best = e
        else {
          val c = java.lang.Long.compare(e._2, best._2)
          val lc = if (c == 0) utf8Compare(e._1._1, best._1._1) else 0
          if (c > 0 || (c == 0 && (lc < 0 || (lc == 0 && utf8Compare(e._1._2, best._1._2) < 0))))
            best = e
        }
      }
      val ((l, rr), c) = best
      merges += ((r, l, rr, c))
      val affected = byPair.getOrElse((l, rr), scala.collection.mutable.Set.empty).toArray
      affected.foreach { i =>
        add(i, -1L)
        packed(i) = packed(i).replace(s" $l  $rr ", s" $l$rr ")
        add(i, 1L)
      }
      r += 1
    }
    (merges.toSeq, words.zip(packed).map { case (w, p) => (w, trimSpaces(p)) }.toSeq)
  }

  /** q80: the learned merge table (merge_rank, lhs, rhs, pair_count). */
  def mergeTable(spark: SparkSession, dir: String, nMerges: Int = DefaultMerges): DataFrame = {
    val (merges, _) = trainCached(spark, dir, nMerges)
    spark.createDataFrame(merges).toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** q81: encode the corpus with the learned merges, applied per word as
    * the `encodeWord` replace fold — narrow projection, ZERO corpus
    * shuffles, and driver/executor state bounded by the merge table
    * (never the vocabulary). Output re-pins the full symbolization bytes
    * per document (enc_sha over ` | `-joined per-word encodings).
    */
  def encode(spark: SparkSession, dir: String, nMerges: Int = DefaultMerges): DataFrame = {
    val docs = RelationalOps.table(spark, dir, "documents")
    val (merges, _) = trainCached(spark, dir, nMerges)
    docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).as("n_words"),
        transform(col("ws"), w => encodeWord(w, merges)).as("es"))
      .select(
        col("doc_id"),
        col("n_words"),
        aggregate(
          transform(col("es"), e => size(split(e, "  ")).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_bpe_tokens"),
        sha2(array_join(col("es"), " | "), 256).as("enc_sha"))
  }

  /** q143: tokenizer-fertility audit — per-language bytes/token and
    * tokens/word of the trained BPE, the efficiency signal that decides
    * whether a tokenizer is fit for a corpus (a vocabulary trained on one
    * register fragments another: fertility spikes). Exact integers:
    * UTF-8 bytes via octet_length, token counts from the memoized merge
    * map, x100 fixed-point ratios with `div`.
    *
    * Scale shape: encoding is the `encodeWord` merge fold in-row (the
    * q81 contract — no join, nothing vocab-sized anywhere); per-doc
    * byte/token sums fold inside the row; the only exchange is the
    * |langs|-keyed aggregation with map-side partials.
    */
  def fertility(spark: SparkSession, dir: String, nMerges: Int = DefaultMerges): DataFrame = {
    val docs = RelationalOps.table(spark, dir, "documents")
    val (merges, _) = trainCached(spark, dir, nMerges)
    docs
      .select(col("doc_id"), col("lang"), words(col("text")).as("ws"))
      .select(
        col("lang"),
        size(col("ws")).cast("long").as("d_words"),
        aggregate(
          transform(col("ws"), w => octet_length(w).cast("long")),
          lit(0L), (acc, x) => acc + x).as("d_bytes"),
        aggregate(
          transform(col("ws"), w => size(split(encodeWord(w, merges), "  ")).cast("long")),
          lit(0L), (acc, x) => acc + x).as("d_tokens"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("d_words")).as("n_words"),
        sum(col("d_bytes")).as("n_bytes"),
        sum(col("d_tokens")).as("n_tokens"))
      .withColumn("bytes_per_token_x100",
        expr("(n_bytes * 100) div greatest(n_tokens, 1)"))
      .withColumn("tokens_per_word_x100",
        expr("(n_tokens * 100) div greatest(n_words, 1)"))
  }

  /** DuckDB CTE chain replicating `train` exactly: u0 is the full packed
    * histogram, w0 its `MinWordCount`-floored TRAINING view; each round r
    * computes pair counts (p_r), the argmax merge (m_r, same tie-break),
    * and the merged histogram (w_r) via the same double-space `replace`.
    * Interpolated into the q79/q80/q81 oracles so DuckDB independently
    * retrains — floor included — rather than trusting engine output.
    */
  def duckdbTrainCtes(nMerges: Int): String = {
    val b = new StringBuilder
    // exhaustion-safe rounds: if p_r is empty (nothing left to merge),
    // m_r is empty and the LEFT JOIN keeps w_{r-1} unchanged — matching
    // the engine's early stop — instead of emptying the histogram
    b ++= s"""u0 AS MATERIALIZED (SELECT word, ' ' || rtrim(regexp_replace(word, '(.)', '\\1  ', 'g')) || ' ' AS packed, cnt FROM (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
          SELECT unnest(list_filter(regexp_split_to_array(trim(coalesce(text, '')), '\\s+'), x -> x <> '')) AS word
          FROM documents) u GROUP BY word)),
      w0 AS MATERIALIZED (SELECT * FROM u0 WHERE cnt >= $MinWordCount)"""
    for (r <- 1 to nMerges) b ++= s""",
      p$r AS MATERIALIZED (SELECT pr.l AS lhs, pr.r AS rhs, CAST(SUM(cnt) AS BIGINT) AS pair_count FROM (
          SELECT unnest([{'l': s[i], 'r': s[i+1]} for i in range(1, len(s))]) AS pr, cnt FROM (
            SELECT str_split(trim(packed), '  ') AS s, cnt FROM w${r - 1}) z) e
          GROUP BY pr.l, pr.r),
      m$r AS MATERIALIZED (SELECT lhs, rhs, pair_count FROM p$r ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1),
      w$r AS MATERIALIZED (SELECT word, coalesce(replace(packed, ' ' || m.lhs || '  ' || m.rhs || ' ', ' ' || m.lhs || m.rhs || ' '), packed) AS packed, cnt
              FROM w${r - 1} LEFT JOIN m$r m ON TRUE)"""
    b.toString
  }

  /** DuckDB mapping chain mirroring `encodeWord`: v0 is the UNFLOORED
    * word set (every corpus word, packed), and each v_r applies merge
    * m_r from the floored training chain — so rare words below the
    * training floor encode exactly as the engine encodes them. Appended
    * after `duckdbTrainCtes(nMerges)` by the q81/q143 oracles; v_nMerges
    * is the total word → trimmed-packed encoding.
    */
  def duckdbMapCtes(nMerges: Int): String = {
    val b = new StringBuilder
    b ++= """, v0 AS MATERIALIZED (SELECT word, packed FROM u0)"""
    for (r <- 1 to nMerges) b ++= s""",
      v$r AS MATERIALIZED (SELECT word, coalesce(replace(packed, ' ' || m.lhs || '  ' || m.rhs || ' ', ' ' || m.lhs || m.rhs || ' '), packed) AS packed
              FROM v${r - 1} LEFT JOIN m$r m ON TRUE)"""
    b.toString
  }
}
