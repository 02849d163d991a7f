package graft.ops

import graft.text.TextAlgos
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — exact and
  * near-duplicate, each designed for 100 TB scale:
  *
  *  - exact: groupBy on a 256-bit content hash, NOT on the full text, so
  *    the shuffle carries 32 bytes + ids per row instead of documents
  *    (the reference's content-signature MERGE dedup,
  *    ref: agents/knowledge_graph_agent/utils.py:66-91,175-185).
  *  - MinHash+LSH: signature + band keys computed in ONE narrow map pass;
  *    only (band_key, doc_id, signature) shuffles; candidate pairs from
  *    equi-self-join on band key; exact Jaccard verification re-derives
  *    shingles from the two candidate texts only.
  *  - SimHash: 64-bit fingerprint; Hamming<=3 found exactly via the
  *    4-segment pigeonhole blocking (any pair within distance 3 shares at
  *    least one intact 16-bit segment).
  *  - n-gram Jaccard: blocked by (lang, token-count bucket) to avoid the
  *    quadratic cross join.
  *  - embedding cosine: multi-table (OR-amplified) hyperplane-LSH bucket
  *    join + exact cosine verify.
  */
object DedupOps {

  import RelationalOps.table

  /** Exact dedup on sha256(text): one row per distinct content, keeping
    * the smallest doc_id as representative (deterministic winner).
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("dup_count"))

  /** Exact-before-near composition guard: the documents table reduced to
    * one representative row per distinct content (min doc_id per
    * sha256(text) — the same winner rule as [[exactDedup]]). Feeding the
    * near-dup family from THIS frame is what keeps an m-copy exact-dup
    * clique from producing O(m²) near-dup candidates: the clique
    * collapses to one canonical before any banding happens.
    *
    * Scale shape: the keep-set aggregation shuffles (32-byte hash,
    * doc_id) pairs with map-side partial min; the semi join back shuffles
    * ids — document text never crosses an exchange.
    */
  def canonicalDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val keep = docs
      .select(col("doc_id"), sha2(col("text"), 256).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    docs.join(keep, Seq("doc_id"), "left_semi")
  }

  val MinhashK = 64
  val LshBands = 16
  val ShingleW = 3

  /** MinHash+LSH near-dup pairs over the sf-dir documents table — see
    * [[minhashPairsOf]]. Prefer [[nearDupPairsCanonical]], which enforces
    * the exact-before-near composition.
    */
  def minhashPairs(spark: SparkSession, dir: String, thresholdX1000: Int = 700): DataFrame =
    minhashPairsOf(
      table(spark, dir, "documents").select(col("doc_id"), col("text")), thresholdX1000)

  /** The enforced composition: exact dedup first (canonical
    * representatives), MinHash+LSH near-dup pairs over the canonicals
    * only. This is the production near-dup entry point — identical-copy
    * cliques (the common web-mirror case) are exactDedup's job and never
    * reach the quadratic pair listing.
    */
  def nearDupPairsCanonical(
      spark: SparkSession, dir: String, thresholdX1000: Int = 700): DataFrame =
    minhashPairsOf(
      canonicalDocs(spark, dir).select(col("doc_id"), col("text")), thresholdX1000)

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification over any
    * (doc_id, text) frame. Output: (doc_a, doc_b, jaccard_x1000) for
    * verified pairs (jaccard >= threshold/1000), doc_a < doc_b.
    */
  def minhashPairsOf(input: DataFrame, thresholdX1000: Int = 700): DataFrame = {
    val spark = input.sparkSession
    import spark.implicits._
    val docs = input.select(col("doc_id"), col("text"))

    // one narrow pass: doc -> band keys. Docs with fewer tokens than one
    // shingle (empty shingle set) are EXCLUDED: their minhash signature is
    // the degenerate all-MaxValue vector, so every short doc would share
    // every band key — a quadratic candidate explosion in one skewed
    // band group, with every pair "verifying" at jaccard 1000. Identical
    // short docs are exactDedup's job, not near-dup detection's.
    val bands = docs.as[(Long, String)].flatMap { case (id, text) =>
      val sh = TextAlgos.shingleHashes(TextAlgos.tokenize(text), ShingleW)
      if (sh.isEmpty) Iterator.empty
      else {
        val sig = TextAlgos.minhash(sh, MinhashK)
        TextAlgos.bandKeys(sig, LshBands).iterator.map(bk => (bk, id))
      }
    }.toDF("band_key", "doc_id")

    val a = bands.as("a")
    val b = bands.as("b")
    val candidates = a.join(b, col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    // verify: join texts back (two broadcast-friendly equi joins at small
    // scale; at 100 TB candidates are a tiny fraction so these joins are
    // shuffle-on-candidates, not on the corpus). Explicit select before
    // the typed map: using-column joins REORDER columns (the second join
    // yields (doc_b, doc_a, ...)), and a positional .as[tuple] would bind
    // doc_a/doc_b swapped.
    val verified = candidates
      .join(docs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("text", "text_a"), "doc_a")
      .join(docs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("text", "text_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("text_a"), col("text_b"))
      .as[(Long, Long, String, String)]
      .map { case (ia, ib, ta, tb) =>
        val sa = TextAlgos.shingleHashes(TextAlgos.tokenize(ta), ShingleW)
        val sb = TextAlgos.shingleHashes(TextAlgos.tokenize(tb), ShingleW)
        (ia, ib, TextAlgos.jaccardX1000(sa, sb))
      }
      .toDF("doc_a", "doc_b", "jaccard_x1000")
    verified.filter(col("jaccard_x1000") >= thresholdX1000)
  }

  /** SimHash near-dup pairs: exact Hamming<=maxDist via segment blocking. */
  def simhashPairs(spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    import spark.implicits._
    val sims = TextOps.simhashDf(spark, dir).as[(Long, Long)]
    // 4 x 16-bit segments; distance<=3 implies >=1 equal segment
    val segs = sims.flatMap { case (id, sh) =>
      (0 until 4).map(s => (s, (sh >>> (s * 16)) & 0xffffL, id, sh))
    }.toDF("seg_idx", "seg_val", "doc_id", "simhash")
    val a = segs.as("a")
    val b = segs.as("b")
    a.join(b,
        col("a.seg_idx") === col("b.seg_idx") &&
          col("a.seg_val") === col("b.seg_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** n-gram Jaccard near-dup pairs: MinHash-band candidate generation +
    * (lang, token-bucket) agreement + EXACT Jaccard verification.
    *
    * Scale design: candidate pairs come from the LSH band equi-join
    * (content-derived keys), NOT from a (lang, length-bucket) block
    * self-join — a popular (lang, bucket) group is unbounded at web
    * scale and its within-block all-pairs is quadratic in the biggest
    * block (this was the round-1 formulation's hazard). Band blocking
    * bounds candidates by signature agreement: dissimilar docs share a
    * band with probability 1-(1-s^4)^16 (~1e-5 at s=0.2), so candidate
    * count stays near-linear on real corpora.
    *
    * The prefilter is one-sided-probabilistic: a pair at EXACTLY the 0.6
    * threshold is banded with p=0.89, rising to 0.9998 at s=0.7 and
    * ~1-1e-12 at s=0.95 (the regime near-dup detection targets); every
    * emitted pair is still exact-verified, so there are no false
    * positives. Docs with no shingles (<3 tokens) are excluded — their
    * pairing is exactDedup's job (see minhashPairs).
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String, thresholdX1000: Int = 600): DataFrame = {
    import spark.implicits._
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("lang"), col("text"))

    // one narrow pass: doc -> (band_key, lang, token bucket)
    val keyed = docs.as[(Long, String, String)].flatMap { case (id, lang, text) =>
      val toks = TextAlgos.tokenize(text)
      val sh = TextAlgos.shingleHashes(toks, ShingleW)
      if (sh.isEmpty) Iterator.empty
      else {
        val bands = TextAlgos.bandKeys(TextAlgos.minhash(sh, MinhashK), LshBands)
        bands.iterator.map(bk => (bk, id, lang, toks.length / 16))
      }
    }.toDF("band_key", "doc_id", "lang", "bucket")

    val a = keyed.as("a")
    val b = keyed.as("b")
    val candidates = a.join(b,
        col("a.band_key") === col("b.band_key") &&
          col("a.lang") === col("b.lang") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    // exact verification re-derives shingles from the two candidate
    // texts only (candidates are a tiny fraction of the corpus, so these
    // are shuffles on candidates, not on the corpus; carrying shingle
    // arrays through the 16-way band explosion would cost 16x the data)
    candidates
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("text_a"), col("text_b"))
      .as[(Long, Long, String, String)]
      .map { case (ia, ib, ta, tb) =>
        val sa = TextAlgos.shingleHashes(TextAlgos.tokenize(ta), ShingleW)
        val sb = TextAlgos.shingleHashes(TextAlgos.tokenize(tb), ShingleW)
        (ia, ib, TextAlgos.jaccardX1000(sa, sb))
      }
      .toDF("doc_a", "doc_b", "jaccard_x1000")
      .filter(col("jaccard_x1000") >= thresholdX1000)
  }

  /** Near-duplicate cluster assignment: connected components over the
    * MinHash-verified pair graph, by iterative min-label propagation.
    * Output: (doc_id, cluster_id, is_canonical) for EVERY document —
    * singletons get their own id; `is_canonical` marks the one kept row
    * per cluster (min doc_id), i.e. the "keep" set of a dedup pass.
    *
    * Scale notes: one propagation round moves a label one hop; the path-
    * shortcutting round after it (replace each label by its label's
    * label — labels are doc_ids, so it's a self equi-join) doubles the
    * effective distance per iteration, giving O(log diameter) rounds
    * instead of O(diameter). Near-dup CHAINS (A≈B≈C≈…, the typical shape
    * of drifting template edits) are exactly the deep-diameter case that
    * made pure propagation hit `maxIters`; with shortcutting the default
    * 20 rounds covers diameters up to ~2^20. Each round shuffles only
    * (doc_id, label) pairs plus the edge list — never document text.
    * `localCheckpoint` truncates the logical plan each round so the plan
    * doesn't grow linearly with iterations (the classic iterative-Spark
    * pitfall).
    */
  def dedupClusters(
      spark: SparkSession,
      dir: String,
      thresholdX1000: Int = 700,
      maxIters: Int = 20): DataFrame = {
    val docs = table(spark, dir, "documents").select(col("doc_id"))
    val edges = minhashPairs(spark, dir, thresholdX1000)
      .select(col("doc_a"), col("doc_b"))
    clusterEdges(docs, edges, maxIters)
  }

  /** Connected components of an arbitrary (doc_a, doc_b) edge list over
    * `docs` — the algorithm behind [[dedupClusters]], factored out so any
    * near-dup pair generator (minhash, simhash, embedding) can feed it.
    */
  def clusterEdges(docs: DataFrame, edges: DataFrame, maxIters: Int = 20): DataFrame = {
    // restrict edges to the given vertex set: a caller clustering a doc
    // SUBSET with an unfiltered pair list must not get labels (or output
    // rows) for out-of-scope ids. Two semi joins on the edge list only —
    // edges are small relative to the corpus, so this shuffles pairs of
    // ids, never documents.
    // fresh unique column names on the id side: edges and docs usually
    // derive from the SAME source relation, and a using-column self-join
    // can mis-resolve the shared attribute (observed: silently dropped
    // edges at one scale factor) — an explicit condition on uniquely
    // named columns cannot
    val idsA = docs.select(col("doc_id").as("__vtx_a"))
    val idsB = docs.select(col("doc_id").as("__vtx_b"))
    val within = edges
      .join(idsA, col("doc_a") === col("__vtx_a"), "left_semi")
      .join(idsB, col("doc_b") === col("__vtx_b"), "left_semi")
    // symmetric, deduped edge list; small relative to the corpus
    // repartition by the per-round join key + persist — NOT checkpoint:
    // localCheckpoint's LogicalRDD discards outputPartitioning (measured,
    // Spark 4.1), but InMemoryTableScan preserves it, so every round's
    // (sym ⋈ labels) reads the cached edges pre-partitioned and only
    // sorts — the edge list shuffles ONCE for the whole iteration instead
    // of once per round. sym's lineage is static across rounds, so the
    // checkpoint's lineage-truncation role is not needed here (labels,
    // which DO grow a lineage per round, keep their checkpoints).
    val sym = within
      .union(within.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .distinct()
      .repartition(col("doc_a"))
      .persist()

    var labels = docs.select(col("doc_id")).withColumn("label", col("doc_id")).localCheckpoint()
    // Convergence detection WITHOUT a per-round join: labels only ever
    // decrease (min-propagation), so the label sum strictly decreases iff
    // ANY label changed — equal consecutive sums ⟺ fixed point. One
    // decimal(38,0) aggregate per round (exact at any corpus size; a
    // long sum could wrap at 10^12 ids) replaces the round-2 design's
    // full self-join + limit(1).count() action.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val d = df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    try while (!converged && iter < maxIters) {
      // each node offers its label to every neighbor; keep the min of
      // (own label, offered labels)
      val offered = sym
        .join(labels, sym("doc_a") === labels("doc_id"))
        .select(col("doc_b").as("doc_id"), col("label"))
      val propagated = labels.select(col("doc_id"), col("label"))
        .union(offered)
        .groupBy(col("doc_id"))
        .agg(min(col("label")).as("label"))
        .localCheckpoint()
      // path shortcutting: label := label(label). Every label is itself a
      // doc_id, and labels only decrease, so label(label) <= label; the
      // left join always matches (label domain ⊆ doc_id domain) but
      // coalesce keeps a missing lookup from nulling the column.
      val lookup = propagated
        .select(col("doc_id").as("lbl_id"), col("label").as("lbl_label"))
      val next = propagated
        .join(lookup, propagated("label") === lookup("lbl_id"), "left")
        .select(
          propagated("doc_id"),
          coalesce(col("lbl_label"), propagated("label")).as("label"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    // labels are checkpointed RDDs with no reference back to sym — the
    // cache can go regardless of convergence outcome; finally, because a
    // failed round in a long-lived session (Verify/Bench swallow per-query
    // errors) must not strand the cached edge list
    finally sym.unpersist(blocking = false)
    // silent truncation would split a >maxIters-diameter chain into
    // multiple clusters with no signal — surface it loudly instead
    if (!converged)
      throw new IllegalStateException(
        s"clusterEdges: label propagation did not converge in $maxIters rounds " +
          "(with shortcutting that means a component of diameter > ~2^maxIters, " +
          "or maxIters was lowered); raise maxIters")

    val canonical = labels
      .groupBy(col("label"))
      .agg(min(col("doc_id")).as("canonical_doc"))
    labels
      .join(canonical, "label")
      .select(
        col("doc_id"),
        col("label").as("cluster_id"),
        (col("doc_id") === col("canonical_doc")).as("is_canonical"))
  }

  /** Embedding near-dup pairs: multi-table hyperplane-LSH bucketing +
    * exact cosine verification (cosine scaled to integer x10000 for
    * engine-independent output).
    *
    * Why multi-table: one b-plane table finds a near-dup at angle θ with
    * probability (1-θ/π)^b — at the 0.95-cosine regime (θ≈18°) that is
    * only ~0.43 for b=8, i.e. a single table MISSES most true near-dups.
    * L tables over disjoint plane families (OR-amplification, table t =
    * planes [t·b, (t+1)·b)) lift recall to 1-(1-p)^L ≈ 0.9 at L=4 while
    * candidates stay ~L·n²/2^b per table in expectation.
    *
    * 100 TB knobs: b grows with log2(corpus/targetBucketRows) so expected
    * bucket size stays bounded (hash-accident collisions of dissimilar
    * vectors split under deeper planes); L then restores recall. A bucket
    * that stays large under deep planes holds genuinely near-identical
    * vectors — its quadratic pair OUTPUT is the answer, not overhead.
    */
  def embeddingDupPairs(
      spark: SparkSession, dir: String, thresholdX10000: Int = 9500,
      nPlanes: Int = 8, nTables: Int = EmbDupNTables): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // Candidate generation stays NARROW: the bucket projection computes
    // all tables' buckets in one codegen'd pass but emits only
    // (vec_id, t, bucket) — the self-join shuffles L small int-triples
    // per vector, never the embedding (shuffling embeddings through a
    // (t,bucket) exchange would carry the widest column L× per side).
    val buckets = graft.functions.GraftFunctions.tableBuckets("embedding", nPlanes, nTables)
    val emb = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val bucketed = emb.select(col("vec_id"), posexplode(buckets).as(Seq("t", "bucket")))
    val a = bucketed.as("a")
    val b = bucketed.as("b")
    // dedup pairs BEFORE fetching embeddings: a pair colliding in m
    // tables surfaces m times here, but is scored exactly once below
    val cand = a
      .join(b, col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket")
        && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    // fetch each side's embedding once per pair and verify exactly —
    // embeddings cross one exchange per side, independent of L
    cand
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        expr("graft_cosine_x10000(emb_a, emb_b)").as("cosine_x10000"))
      .filter(col("cosine_x10000") >= thresholdX10000)
      // uniqueness guarantee even under (out-of-contract) duplicate
      // vec_id input rows — those fan out through the two fetch joins;
      // deduping POST-threshold shuffles only the accepted pairs
      .dropDuplicates("vec_a", "vec_b")
  }

  val EmbDupNTables = 4

  /** q24 verify-scale configuration — ONE definition feeding both the
    * engine call and the DuckDB oracle (the driver's embeddings are
    * near-random, max pairwise cosine ~0.51, so the verify threshold
    * sits where the data has pairs; the 0.95 regime is covered by the
    * planted-near-dup ScalaTest).
    */
  val VerifyEmbDupThresholdX10000 = 4500
  val VerifyEmbDupPlanes = 6

  /** Cross-source duplicate leakage (q184): for every source pair, how
    * many DISTINCT texts appear verbatim in both — the
    * provenance/licensing matrix a corpus audit publishes (a text shared
    * between a permissive and a restricted source is a compliance
    * question; between two crawls it is mirror detection). Pure
    * hash-shape: the corpus collapses to DISTINCT (sha256, source)
    * before the self-join, so the join carries 32-byte hashes keyed by
    * hash — the q20 discipline, never text.
    */
  def crossSourceDups(docs: DataFrame): DataFrame = {
    val perHS = docs
      .select(sha2(col("text"), 256).as("h"), col("source"))
      .groupBy(col("h"), col("source")).agg(count(lit(1)).as("k"))
    // diagonal: texts duplicated WITHIN a source (re-crawl signal);
    // cross cells: texts shared verbatim ACROSS sources (mirrors)
    val diag = perHS.filter(col("k") >= 2)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_shared_texts"))
      .select(col("source").as("source_a"), col("source").as("source_b"),
        col("n_shared_texts"))
    val d = perHS.select(col("h"), col("source"))
    val cross = d.as("a")
      .join(d.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_texts"))
    diag.unionByName(cross)
  }

  /** SemDeDup (Abbas et al. 2023): semantic dedup inside the IVF coarse
    * cells — k-means-cluster the embeddings, score pairwise cosine ONLY
    * within a cluster, and among semantic duplicates keep the vector
    * FARTHEST from its centroid (the paper's keep-low-centroid-similarity
    * rule: cluster-typical text is the redundant kind). One pass, exact:
    * v is pruned iff some same-cell u with cos(u,v) >= tau precedes it in
    * the (cent_cos asc, vec_id asc) keep order. Chains longer than one
    * hop are NOT followed (u prunes v even if u is itself pruned) — the
    * documented one-pass variant; the q70 exact-before-near composition
    * is the place transitive collapse happens.
    *
    * Scale shape: reuses the q54 learned centroids (broadcast, nList
    * rows); the only corpus-wide exchanges are the cell equi-join's two
    * sides — within-cell pairing is the SemDeDup contract itself, and
    * cell count grows with the corpus so cell width stays bounded (the
    * paper runs 50k clusters at web scale). The verdict join back onto
    * the corpus carries (vec_id, two small ints), never embeddings.
    */
  def semDedup(
      spark: SparkSession, dir: String,
      tauX10000: Long = VerifyEmbDupThresholdX10000.toLong): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val vecs = table(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val centroids = SimilarityOps.ivfCentroids(spark, dir)
    val withCent = SimilarityOps.assignCells(vecs, centroids)
      .join(vecs, "vec_id")
      .join(broadcast(centroids), Seq("cell"))
      .select(col("vec_id"), col("cell"), col("embedding"),
        expr("graft_cosine_x10000(embedding, centroid)").as("cent_cos_x10000"))
    val other = withCent.select(col("cell"), col("vec_id").as("o_id"),
      col("embedding").as("o_emb"), col("cent_cos_x10000").as("o_cc"))
    val dupEdges = withCent
      .join(other, Seq("cell"))
      .filter(col("vec_id") =!= col("o_id"))
      .withColumn("cos_x10000", expr("graft_cosine_x10000(embedding, o_emb)"))
      .filter(col("cos_x10000") >= tauX10000)
    val verdict = dupEdges
      .groupBy(col("vec_id"))
      .agg(
        count(lit(1)).as("n_dups"),
        max(when(col("o_cc") < col("cent_cos_x10000")
          || (col("o_cc") === col("cent_cos_x10000") && col("o_id") < col("vec_id")),
          1L).otherwise(0L)).as("dominated"))
    withCent
      .select(col("vec_id"), col("cell"), col("cent_cos_x10000"))
      .join(verdict, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("cent_cos_x10000"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        (coalesce(col("dominated"), lit(0L)) === 0L).as("kept"))
  }
}
