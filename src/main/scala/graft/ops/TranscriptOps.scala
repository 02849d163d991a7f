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
}
