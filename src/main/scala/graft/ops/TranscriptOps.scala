package graft.ops

import graft.model.Turn
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transcript-native audit operators over the raw turn table — the
  * conversation-protocol analogues of the reference's per-document task
  * accounting (ref: app.py:172-186 polls one async task per document and
  * classifies its state) and its implicit (doc, page_idx) row identity
  * (ref: schema_helper.py:134-155 — ordered `page_{idx}` fields).
  *
  * Both operators are single-pass over the turn table:
  *   - `toolCallStats` is one groupBy over a 3-value key (tool name) —
  *     map-side partial aggregation collapses 10^12 turns to
  *     (#tools × #partitions) partial rows before the only exchange; the
  *     distinct-conversation count rides the same two-phase plan via
  *     Spark's Expand rewrite keyed by (tool, conv_id).
  *   - `roleAudit` is ONE conv-keyed window (lag/last-ignore-nulls) whose
  *     hash partitioning the follow-up groupBy(conv_id) reuses — a single
  *     Exchange at any scale, same shape as `RelationalOps.sessionize`.
  */
object TranscriptOps {

  /** q114: per-tool call statistics. A "call" is a turn with
    * role = 'tool'; `tool` carries the tool name (null on other roles,
    * so the filter also prunes nulls). `n_unclosed` counts frames whose
    * payload lost the `[/tool]` terminator — the raw-signal twin of the
    * extractor's `tool_frame` failure. The mean call position is exact
    * fixed-point x10000 (`div` == DuckDB `//` on non-negative operands).
    */
  def toolCallStats(turns: Dataset[Turn]): DataFrame =
    turns
      .filter(col("role") === "tool")
      .groupBy(col("tool"))
      .agg(
        count(lit(1)).as("n_calls"),
        count_distinct(col("conv_id")).as("n_convs"),
        sum(when(col("text").endsWith("[/tool]"), 0L).otherwise(1L)).as("n_unclosed"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        expr("(sum(cast(turn_idx as bigint)) * 10000L) div count(1)")
          .as("avg_turn_idx_x10000"))

  /** q116: conversation-level near-duplicate pairs by df-capped turn-sha
    * Jaccard — the transcript analogue of document near-dup, catching
    * RETRIED runs that replay most turns verbatim. The feature set of a
    * conversation is its DISTINCT turn-text sha set restricted to shas
    * seen in at most `dfCap` conversations: high-df features (shared
    * system preambles, canned tool banners) are boilerplate, carry no
    * identity signal, and — critically at 10^12 turns — would fan a
    * single sha out to O(df²) candidate pairs. The df cap makes the
    * candidate self-join's per-key fan-out a constant, so the pair
    * stream is linear in the rare-feature postings, never quadratic in
    * conversations (the same rare-feature trick as q23's band prefilter).
    * Jaccard is exact over the rare sets, fixed-point x10000.
    */
  def convNearDup(turns: Dataset[Turn], dfCap: Int = 4,
      minJaccardX10000: Long = 5000L): DataFrame = {
    val shas = turns
      .select(col("conv_id"), sha2(col("text"), 256).as("sha"))
      .distinct()
    // df via a sha-partitioned window COUNT so the cap filter rides the
    // same exchange that the candidate self-join needs anyway
    val rare = shas
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sha"))))
      .filter(col("df") <= dfCap)
      .drop("df")
    val sizes = rare.groupBy(col("conv_id")).agg(count(lit(1)).as("n"))
    val pairs = rare.select(col("sha"), col("conv_id").as("conv_a"))
      .join(rare.select(col("sha"), col("conv_id").as("conv_b")), "sha")
      .filter(col("conv_a") < col("conv_b"))
      .groupBy(col("conv_a"), col("conv_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.select(col("conv_id").as("conv_a"), col("n").as("n_a")), "conv_a")
      .join(sizes.select(col("conv_id").as("conv_b"), col("n").as("n_b")), "conv_b")
      .withColumn("jaccard_x10000",
        expr("n_shared * 10000L div (n_a + n_b - n_shared)"))
      .filter(col("jaccard_x10000") >= minJaccardX10000)
      .select("conv_a", "conv_b", "n_shared", "n_a", "n_b", "jaccard_x10000")
  }

  /** q117: agent-loop detection — per conversation, the run-length
    * structure of identical adjacent (role, text) turns. A stuck tool
    * loop repeats one turn verbatim, so `max_run_len` spikes and
    * `n_looped_turns` (turns that merely repeat their predecessor) is the
    * exact char-free redundancy count. One conv-keyed window computes the
    * change marker and the running run-id; both rollups are
    * subset-clustered by the same hash partitioning — a single Exchange
    * at any scale (the q115 shape).
    */
  def loopRuns(turns: Dataset[Turn]): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val marked = turns
      .select(col("conv_id"), col("turn_idx"), col("role"),
        sha2(col("text"), 256).as("sha"))
      .withColumn("chg",
        when(lag(col("sha"), 1).over(w).isNull
          || lag(col("sha"), 1).over(w) =!= col("sha")
          || lag(col("role"), 1).over(w) =!= col("role"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(w))
    marked
      .groupBy(col("conv_id"), col("run_id"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_runs"),
        sum(col("run_len")).as("n_turns"),
        max(col("run_len")).as("max_run_len"),
        sum(when(col("run_len") > 1L, col("run_len") - 1L).otherwise(0L))
          .as("n_looped_turns"))
  }

  /** q118: boilerplate-turn mining — turn texts repeated across at least
    * `minConvs` distinct conversations (shared system preambles, canned
    * banners). The inverse of q116's df cap: the HIGH-df shas q116
    * discards are exactly the dedup-savings opportunity here. One sha
    * groupBy; the distinct-conv count rides Spark's Expand rewrite, so
    * both aggregates stay map-side partial.
    */
  def boilerplateTurns(turns: Dataset[Turn], minConvs: Long = 10L): DataFrame =
    turns
      .select(col("conv_id"), col("role"), sha2(col("text"), 256).as("sha"),
        length(col("text")).cast("long").as("len"))
      .groupBy(col("sha"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        count_distinct(col("conv_id")).as("n_convs"),
        max(col("role")).as("role"),
        max(col("len")).as("n_chars"),
        expr("(count(1) - 1) * max(len)").as("dedup_savings_chars"))
      .filter(col("n_convs") >= minConvs)

  /** q119: conversation dedup clusters — q116's near-dup pairs closed
    * into connected components with a canonical keeper per cluster (the
    * conversation-level twin of q36/q70's pairs→clusters→keep-set
    * composition). `DedupOps.clusterEdges` needs numeric vertex ids (its
    * convergence check sums labels as decimal), so conversations first
    * get dense longs from `ShredOps.registry`'s two-phase global rank —
    * and because that rank follows conv_id order, the component's min id
    * IS the lexicographically smallest conv_id, which an oracle can
    * recompute without ever seeing the engine's id assignment. Every
    * join here shuffles (id, conv_id) pairs or pair edges only, never
    * turn text.
    */
  def convDedupClusters(turns: Dataset[Turn], dfCap: Int = 4,
      minJaccardX10000: Long = 5000L): DataFrame = {
    val pairs = convNearDup(turns, dfCap, minJaccardX10000)
      .select(col("conv_a"), col("conv_b"))
    val ids = ShredOps.registry(turns.toDF())
    val edges = pairs
      .join(ids.select(col("conv_id").as("conv_a"), col("reg_id").as("doc_a")), "conv_a")
      .join(ids.select(col("conv_id").as("conv_b"), col("reg_id").as("doc_b")), "conv_b")
      .select(col("doc_a"), col("doc_b"))
    DedupOps.clusterEdges(ids.select(col("reg_id").as("doc_id")), edges)
      .join(ids.select(col("reg_id").as("doc_id"), col("conv_id")), "doc_id")
      .join(ids.select(col("reg_id").as("cluster_id"),
        col("conv_id").as("canonical_conv")), "cluster_id")
      .select(col("conv_id"), col("canonical_conv"), col("is_canonical"))
  }

  /** q120: per-tool response-latency profile. Latency of a tool turn is
    * the exact-µs gap to the turn before it (the turn that issued the
    * call); tool→tool adjacency (retry bursts) counts too — that IS the
    * retry cadence. Quantiles use the q83 integer rank recipe (value at
    * 1-based rank `(n·p+99) div 100` of the sorted latencies) so there is
    * no float-percentile semantics to reconcile; the mean rides
    * decimal(38,0) before the x10000 scale because a per-tool µs sum
    * overflows BIGINT at 10^12 turns. Two exchanges total: the conv-keyed
    * lag window, then the tool-keyed rank window whose hash partitioning
    * the rollup reuses (tools are a small set, and only (tool, latency)
    * pairs cross the exchange — the q83 shape).
    */
  def toolLatency(turns: Dataset[Turn]): DataFrame = {
    val wConv = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val lat = turns
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(wConv))
      .filter(col("role") === "tool" && col("prev_us").isNotNull)
      .select(col("tool"), (col("us") - col("prev_us")).as("latency_us"))
    val byTool = Window.partitionBy(col("tool"))
    lat
      .withColumn("rn", row_number().over(byTool.orderBy(col("latency_us"))))
      .withColumn("n", count(lit(1)).over(byTool))
      .groupBy(col("tool"))
      .agg(
        count(lit(1)).as("n_calls"),
        min(col("latency_us")).as("min_us"),
        max(col("latency_us")).as("max_us"),
        expr("cast((sum(cast(latency_us as decimal(38,0))) * 10000) div count(1) as bigint)")
          .as("mean_us_x10000"),
        max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("latency_us")))
          .as("p50_us"),
        max(when(col("rn") === expr("(n * 99 + 99) div 100"), col("latency_us")))
          .as("p99_us"))
  }

  /** q122: exact conversation-level dedup — the exact-before-near twin of
    * q116/q119. A conversation's fingerprint is sha256 over its per-turn
    * text shas concatenated in turn order (order-SENSITIVE: the same
    * turns replayed in a different order are a different conversation),
    * so an unperturbed retry replay collapses exactly, leaving only the
    * perturbed twins for the near-dup pass — the q70 composition at the
    * conversation level. One conv-keyed aggregation carrying 32-byte shas
    * (never text), then a fingerprint-keyed rollup of dup groups; both
    * exchanges move (id, sha) pairs only.
    */
  def convFingerprintDups(turns: Dataset[Turn], minConvs: Long = 2L): DataFrame =
    turns
      .select(col("conv_id"), col("turn_idx"), sha2(col("text"), 256).as("sha"))
      .groupBy(col("conv_id"))
      .agg(sha2(array_join(transform(
        array_sort(collect_list(struct(col("turn_idx"), col("sha")))),
        x => x.getField("sha")), ""), 256).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(
        count(lit(1)).as("n_convs"),
        min(col("conv_id")).as("canonical_conv"))
      .filter(col("n_convs") >= minConvs)

  /** q125: per-tool outcome audit — ok/err status parsed from the frame
    * header (exact prefix test against the turn's own tool name, no
    * regex), error rate in fixed point, and the STUCK signal: how many
    * conversations' LAST call to the tool was an error (an unresolved
    * failure — the conversation never saw that tool succeed again; the
    * reference's terminal FAILURE task state, ref: app.py:172-186).
    *
    * Scale shape: two count-carrying aggregations — a (conv_id, tool)
    * rollup (carrying counts + the arg-max status, never text) feeding a
    * tool-keyed final; no join, no window. At 10^12 turns the first
    * exchange moves one row per (conversation, tool) pair, the second one
    * row per tool.
    */
  def toolOutcomes(turns: Dataset[Turn]): DataFrame = {
    val frames = turns
      .filter(col("role") === "tool")
      .select(col("conv_id"), col("turn_idx"), col("tool"),
        when(expr("startswith(text, concat('[tool:', tool, ' status=err]'))"), lit("err"))
          .when(expr("startswith(text, concat('[tool:', tool, ' status=ok]'))"), lit("ok"))
          .otherwise(lit("unknown")).as("status"))
    frames
      .groupBy(col("conv_id"), col("tool"))
      .agg(
        count(lit(1)).as("n_calls"),
        sum(when(col("status") === "ok", 1L).otherwise(0L)).as("n_ok"),
        sum(when(col("status") === "err", 1L).otherwise(0L)).as("n_err"),
        max_by(col("status"), col("turn_idx")).as("last_status"))
      .groupBy(col("tool"))
      .agg(
        sum(col("n_calls")).as("n_calls"),
        sum(col("n_ok")).as("n_ok"),
        sum(col("n_err")).as("n_err"),
        expr("(sum(n_err) * 10000L) div sum(n_calls)").as("err_rate_x10000"),
        count(lit(1)).as("n_convs"),
        sum(when(col("last_status") === "err", 1L).otherwise(0L))
          .as("n_convs_ending_err"))
  }

  /** q127: exact edit-distance verification of the near-dup candidate
    * pairs — the stage AFTER q116's candidate generation, quantifying HOW
    * the retry twin differs from its base run. For each candidate pair the
    * turns are aligned on `turn_idx` and compared by Levenshtein distance
    * over a bounded prefix (`prefixLen`): the cap makes the per-turn cost
    * a constant (O(prefixLen²) worst case) instead of O(len²) on an
    * unbounded payload, which is the difference between "bounded CPU per
    * pair" and "one 1 MB turn stalls an executor core" at 10^12 turns. The
    * corpus never fans out: the turn table is filtered to candidate
    * conversations by two conv-keyed joins against the (df-capped, hence
    * bounded) pair list, so only candidate-pair turns carry text prefixes
    * across an exchange. Distances are exact integers; `n_identical` /
    * `n_perturbed` split the aligned turns, and unaligned turns (a twin
    * that DROPPED a turn) surface as `n_a`/`n_b` minus `n_aligned` via
    * q116's sizes — here as the conservative inner-join count.
    */
  def retryEditStats(turns: Dataset[Turn], dfCap: Int = 4,
      minJaccardX10000: Long = 5000L, prefixLen: Int = 256): DataFrame = {
    val pairs = convNearDup(turns, dfCap, minJaccardX10000)
      .select(col("conv_a"), col("conv_b"))
    val t = turns.select(col("conv_id"), col("turn_idx"),
      substring(col("text"), 1, prefixLen).as("txt"))
    pairs
      .join(t.select(col("conv_id").as("conv_a"), col("turn_idx"),
        col("txt").as("txt_a")), Seq("conv_a"))
      .join(t.select(col("conv_id").as("conv_b"), col("turn_idx"),
        col("txt").as("txt_b")), Seq("conv_b", "turn_idx"))
      .withColumn("dist", levenshtein(col("txt_a"), col("txt_b")).cast("long"))
      .groupBy(col("conv_a"), col("conv_b"))
      .agg(
        count(lit(1)).as("n_aligned"),
        sum(when(col("dist") === 0L, 1L).otherwise(0L)).as("n_identical"),
        sum(when(col("dist") > 0L, 1L).otherwise(0L)).as("n_perturbed"),
        sum(col("dist")).as("total_edit"),
        max(col("dist")).as("max_edit"))
  }

  /** q128: per-day first-seen n-gram novelty — how much of each day's
    * text is NEW versus replayed from earlier days. Over the retry corpus
    * this is the corpus-freshness counter that catches the planted retry
    * wave: twins replay a day later, so day N+1's novelty collapses. Each
    * turn's word 3-grams are hashed to sha256 immediately, so every
    * exchange moves 32-byte digests, never gram text; `groupBy(day, sha)`
    * then `groupBy(sha)` are the only corpus-sized shuffles and both are
    * map-side combinable. Novelty is exact fixed-point x10000.
    */
  def gramNovelty(turns: Dataset[Turn], n: Int = 3): DataFrame = {
    val grams = turns
      .select(
        expr("unix_micros(ts) div 86400000000L").as("day"),
        filter(split(trim(col("text")), "\\s+"), w => w =!= "").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("day"), explode(
        expr(s"transform(sequence(0, size(w) - $n), " +
          s"i -> concat_ws(' ', ${(0 until n).map(j => s"w[i + $j]").mkString(", ")}))"))
        .as("gram"))
      .select(col("day"), sha2(col("gram"), 256).as("sha"))
    val perDayGram = grams
      .groupBy(col("day"), col("sha"))
      .agg(count(lit(1)).as("occ"))
    val perDay = perDayGram
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_distinct_grams"),
        sum(col("occ")).as("n_gram_occurrences"))
    val firstSeen = perDayGram
      .groupBy(col("sha"))
      .agg(min(col("day")).as("first_day"))
      .groupBy(col("first_day"))
      .agg(count(lit(1)).as("n_new_grams"))
    perDay
      .join(firstSeen, perDay("day") === firstSeen("first_day"), "left")
      .select(col("day"), col("n_gram_occurrences"), col("n_distinct_grams"),
        coalesce(col("n_new_grams"), lit(0L)).as("n_new_grams"))
      .withColumn("novelty_x10000",
        expr("n_new_grams * 10000L div n_distinct_grams"))
  }

  /** q115: role-alternation audit per conversation. One window pass
    * computes, per turn, the previous role, the previous NON-tool role
    * (last-ignore-nulls over the preceding frame), and the previous
    * timestamp; the rollup then counts protocol anomalies:
    *   - `n_same_adjacent`: adjacent turns with the same role (incl.
    *     tool→tool bursts);
    *   - `n_alt_breaks`: a non-tool turn whose previous non-tool role is
    *     the same — the user/assistant alternation broke even after
    *     skipping interleaved tool turns;
    *   - `n_tool_after_user`: a tool result directly after a user turn
    *     (tools answer assistant calls, never the user);
    *   - `n_ts_regressions`: timestamp went backwards (exact integer µs).
    */
  def roleAudit(turns: Dataset[Turn]): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    turns
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("prev_nontool_role",
        last(when(col("role") =!= "tool", col("role")), ignoreNulls = true).over(prior))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "tool", 1L).otherwise(0L)).as("n_tool_turns"),
        sum(when(col("prev_role") === col("role"), 1L).otherwise(0L)).as("n_same_adjacent"),
        sum(when(col("role") =!= "tool" && col("prev_nontool_role") === col("role"), 1L)
          .otherwise(0L)).as("n_alt_breaks"),
        sum(when(col("prev_role") === "user" && col("role") === "tool", 1L)
          .otherwise(0L)).as("n_tool_after_user"),
        sum(when(col("us") < col("prev_us"), 1L).otherwise(0L)).as("n_ts_regressions"),
        min_by(col("role"), col("turn_idx")).as("first_role"),
        max_by(col("role"), col("turn_idx")).as("last_role"))
  }

  /** Intra-conversation segment gap for [[convSegments]] (µs). The
    * OPERATOR is the segmentation; the constant is corpus policy — set
    * where the retry corpus' 1.5-16.5 s inter-turn gaps actually split
    * (the quality-threshold precedent; production would pass 30 min).
    */
  val SegmentGapUs = 10000000L // 10 s

  /** q153: conversation segmentation — the q82 sessionize move INSIDE a
    * conversation: a gap of more than [[SegmentGapUs]] between
    * consecutive turns starts a new segment (an agent picking work back
    * up later is a new work episode; context assembly and
    * redundancy mining both want episode boundaries, not raw convs).
    * Output: one row per (conv, segment) with its bounds and exact-µs
    * span.
    *
    * Scale shape: one conv-keyed window (lag + running sum of
    * gap-break flags — the q82 recipe) whose hash partitioning the
    * (conv, segment) rollup reuses: a single Exchange at 10^12 turns.
    */
  def convSegments(turns: Dataset[Turn], gapUs: Long = SegmentGapUs): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("gap_break",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("segment", sum(col("gap_break")).over(run))
      .groupBy(col("conv_id"), col("segment"))
      .agg(
        count(lit(1)).as("n_turns"),
        min(col("turn_idx")).as("first_turn"),
        max(col("turn_idx")).as("last_turn"),
        (max(col("us")) - min(col("us"))).as("span_us"))
  }

  /** Tail turns kept by [[contextPrune]]. */
  val ContextKeepTail = 8

  /** q147: context-window pruning — the truncation policy every agent
    * framework applies before a model call: keep each conversation's
    * FIRST turn (the system/anchor message) and its last
    * [[ContextKeepTail]] turns; everything between drops. Emits the kept
    * turns tagged with why they survived ('first' wins when a turn is
    * both). Small conversations pass through whole.
    *
    * Scale shape: one conv-keyed Exchange; both min/max ride the SAME
    * whole-partition window frame (no sort needed), and the filter is
    * evaluated per row — 10^12 turns cross exactly one shuffle and
    * nothing is collected.
    */
  def contextPrune(turns: Dataset[Turn], keepTail: Int = ContextKeepTail): DataFrame = {
    val w = Window.partitionBy(col("conv_id"))
    turns
      .select(col("conv_id"), col("turn_idx"), col("role"))
      .withColumn("mx", max(col("turn_idx")).over(w))
      .withColumn("mn", min(col("turn_idx")).over(w))
      .filter(col("turn_idx") === col("mn") ||
        col("turn_idx") > col("mx") - keepTail)
      .withColumn("keep_reason",
        when(col("turn_idx") === col("mn"), "first").otherwise("tail"))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("keep_reason"))
  }

  /** q140: conversation-flow transition matrix — counts and exact
    * fixed-point probabilities of each (state → next state) step, where a
    * turn's state is its role, refined to `tool:<name>` for tool turns.
    * The agent-protocol analogue of a Markov flow audit: which tool
    * follows which, how often the assistant yields to the user, where
    * conversations stall.
    *
    * Scale shape: ONE conv-keyed window (lead) — the same single
    * conv-partitioned Exchange as `roleAudit` — then a (from, to) groupBy
    * with map-side partials. The probability normalization windows over
    * the AGGREGATED matrix (|states|² rows, a constant), never the turn
    * table, so 10^12 turns cross exactly two data-sized exchanges.
    */
  def transitionMatrix(turns: Dataset[Turn]): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val wFrom = Window.partitionBy(col("from_state"))
    turns
      .select(col("conv_id"), col("turn_idx"),
        when(col("role") === "tool", concat(lit("tool:"), col("tool")))
          .otherwise(col("role")).as("state"))
      .withColumn("next_state", lead(col("state"), 1).over(w))
      .filter(col("next_state").isNotNull)
      .groupBy(col("state").as("from_state"), col("next_state").as("to_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("from_total", sum(col("n")).over(wFrom))
      .withColumn("p_x10000", expr("(n * 10000) div from_total"))
      .drop("from_total")
  }

  /** Top-mover vocabulary drift between two turn snapshots (q179) — the
    * corpus-monitoring artifact a recurring crawl publishes per refresh:
    * which tokens appeared, vanished, or changed mass between snapshot A
    * and snapshot B. Exact integers: per-token counts on each side, the
    * signed delta, and ratio_x10000 = next·10⁴ div max(prev, 1); top-K
    * movers by (|delta| desc, token asc) — a total order, so the K-set
    * is deterministic.
    *
    * Scale shape: each side collapses to a vocab-bounded (token, count)
    * frame with map-side combine before the full-outer join; the top-K
    * compiles to TakeOrderedAndProject (plan-asserted), never a global
    * sort of the vocabulary.
    */
  val DriftTopK = 50

  def vocabDrift(prev: DataFrame, next: DataFrame, k: Int = DriftTopK): DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.select(explode(filter(split(trim(col("text")), "\\s+"), x => x =!= "")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as(as))
    counts(prev, "cnt_prev")
      .join(counts(next, "cnt_next"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("cnt_prev"), lit(0L)).as("cnt_prev"),
        coalesce(col("cnt_next"), lit(0L)).as("cnt_next"))
      .withColumn("delta", col("cnt_next") - col("cnt_prev"))
      .filter(col("delta") =!= 0L)
      .withColumn("ratio_x10000", expr("(cnt_next * 10000) div greatest(cnt_prev, 1L)"))
      .orderBy(abs(col("delta")).desc, col("token").asc)
      .limit(k)
  }
}
