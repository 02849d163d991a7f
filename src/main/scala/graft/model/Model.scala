package graft.model

import java.sql.Timestamp

/** Core data model of the extraction engine.
  *
  * `Turn` matches BASELINE.json `input_hint` exactly:
  * (conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  * ts:timestamp). A Turn is the analogue of one page of one document in the
  * reference (ref: schema_helper.py:134-155 `page_{idx}` fields keyed by an
  * ordered integer index inside a document).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // null when not a tool turn
    ts: Timestamp
)

/** A character-offset span into `extracted_text`.
  * kinds: content | code | tool | line
  */
final case class Span(kind: String, start: Int, end: Int)

/** Result of per-turn main-content extraction.
  *
  * `failure` mirrors the reference's swallow-and-continue semantics
  * (ref: agents/sql_agent/utils.py:113-118 — per-row errors are recorded,
  * the job never aborts).
  */
final case class ExtractedTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    kind: String, // html | pdfir | markdown | tool | plain
    extracted_text: String,
    spans: Seq[Span],
    failure: Option[String],
    n_chars_in: Int
)

/** Pure-Scala extraction output, pre-keying. */
final case class Extracted(text: String, spans: Seq[Span], failure: Option[String])

/** Per-partition lineage/metrics row (north rule: partition id, input
  * snapshot, turn count, extraction-failure count, bytes processed).
  */
final case class LineageRow(
    partition_id: Int,
    input_snapshot: String,
    turn_count: Long,
    failure_count: Long,
    bytes_processed: Long
)

/** Structured record mirroring the reference's InspectionForm shapes at
  * reduced width (ref: schemas/inspection_form.py:332-405) — used by the
  * shredding path (nested -> flat child tables).
  */
final case class TemperatureRecord(time_point: String, temperature_c: Double)
final case class ProcedureStep(
    step_no: Int,
    description: String,
    temperature_records: Seq[TemperatureRecord]
)
final case class MaterialUsageRow(
    material_name: String,
    standard_quantity: Double,
    allowed_range_min: Double,
    allowed_range_max: Double,
    actual_quantity: Double,
    performed_by: String,
    checked_by: String
)
final case class BatchDetails(
    product_name: String,
    batch_no: String,
    batch_started_on: Timestamp,
    batch_completed_on: Timestamp
)
final case class StructuredRecord(
    conv_id: String,
    batch_details: BatchDetails,
    material_usage_rows: Seq[MaterialUsageRow],
    steps: Seq[ProcedureStep],
    equipment_no: Seq[String]
)
