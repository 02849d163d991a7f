package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Wire-format sinks for the external relational/graph stores the
  * reference writes to, WITHOUT driver jars: the engine emits the target
  * system's own statement stream as distributed text — SQLite-dialect DDL
  * + `INSERT OR IGNORE` rows (ref: agents/sql_agent/json_to_db.py:25-83 —
  * per-nested-path CREATE TABLE, idempotent inserts) and Cypher
  * `MERGE`s keyed on the content signature (ref:
  * agents/knowledge_graph_agent/utils.py:137-236 — node MERGE on
  * signature, HAS-edge MERGE). Parquet remains the engine-native store
  * (S8/S9); these dumps are the interchange format a DBA loads with
  * `sqlite3 < dump.sql` / `cypher-shell < dump.cypher`.
  *
  * Scale shape: statement rendering is a pure per-row projection (string
  * concat of already-shredded columns) — narrow, zero shuffles, written
  * with the text sink one file per partition; the only driver-side write
  * is the constant-size DDL header. Statement order within a table is
  * therefore partition-order, which is exactly why every statement is
  * IDEMPOTENT (OR IGNORE / MERGE): replay order cannot change the loaded
  * state, the same contract the reference leans on
  * (json_to_db.py:38).
  */
object WireSinks {

  /** SQLite column type for a Spark type (SQLite's affinity model:
    * integer-ish -> INTEGER, floating -> REAL, everything else TEXT —
    * the same collapse the reference's schema gatherer performs).
    */
  private def sqliteType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType => "INTEGER"
    case FloatType | DoubleType => "REAL"
    case _ => "TEXT"
  }

  /** CREATE TABLE IF NOT EXISTS — one line, deterministic field order
    * (the schema's own order, which ShredOps emits deterministically).
    * When the table carries the engine's `row_key` (unique by
    * construction), it is declared PRIMARY KEY: `INSERT OR IGNORE` is
    * only idempotent against a uniqueness constraint, and replay
    * idempotency is the whole contract of this dump format (the same
    * key the reference upserts on, json_to_db.py:38).
    */
  def createTableSql(name: String, schema: StructType): String = {
    val cols = schema.fields.map(f => s"${f.name} ${sqliteType(f.dataType)}")
    val pk =
      if (schema.fieldNames.contains("row_key")) Seq("PRIMARY KEY (row_key)")
      else Seq.empty
    (cols ++ pk).mkString(s"CREATE TABLE IF NOT EXISTS $name (", ", ", ");")
  }

  /** SQL-literal rendering of one column: strings quoted with ''-doubling,
    * booleans as 1/0, doubles through the canonical shortest-repr
    * formatter (so a dump is byte-deterministic across partitionings),
    * NULL as the keyword. Embedded newlines are spliced out as
    * `'||char(10)||'` (standard SQL has no \n escape) — the dump's
    * one-statement-per-line contract must survive multi-line values,
    * or the text sink splits a statement across physical lines and the
    * load breaks.
    */
  private def sqlLit(df: DataFrame, c: String): Column = {
    val rendered = df.schema(c).dataType match {
      case BooleanType => when(col(c), lit("1")).when(!col(c), lit("0"))
      case DoubleType | FloatType =>
        expr(s"graft_canon_double(cast(`$c` as double))")
      case ByteType | ShortType | IntegerType | LongType => col(c).cast("string")
      case _ =>
        val quoted = regexp_replace(col(c).cast("string"), "'", "''")
        val noCr = regexp_replace(quoted, "\r", "' || char(13) || '")
        val noNl = regexp_replace(noCr, "\n", "' || char(10) || '")
        concat(lit("'"), noNl, lit("'"))
    }
    coalesce(rendered, lit("NULL"))
  }

  /** One `INSERT OR IGNORE` statement per row, as a single-column
    * DataFrame of statement text — narrow projection, no shuffle.
    */
  def insertStatements(name: String, df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val cols = df.columns.toSeq
    val vals = cols.map(c => sqlLit(df, c))
    df.select(concat(
      lit(s"INSERT OR IGNORE INTO $name (${cols.mkString(", ")}) VALUES ("),
      concat_ws(", ", vals: _*),
      lit(");")).as("stmt"))
  }

  /** Dump a shredded table family as loadable SQL: `<out>/<table>/ddl.sql`
    * (driver-written, constant size) + `<out>/<table>/rows/` (distributed
    * text, one INSERT per line).
    */
  def writeSqlDump(tables: Seq[(String, DataFrame)], outDir: String): Unit =
    tables.foreach { case (name, df) =>
      val dir = java.nio.file.Paths.get(outDir, name)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(
        dir.resolve("ddl.sql"), createTableSql(name, df.schema) + "\n")
      insertStatements(name, df)
        .write.mode("overwrite").text(dir.resolve("rows").toString)
    }

  /** Cypher string literal: backslash, then quote, then newline escaping
    * (Cypher DOES define \n/\r escapes — applied after backslash doubling
    * so the inserted escapes survive; keeps statements one physical line).
    */
  private def cypherLit(c: Column): Column = {
    val esc = regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "'", "\\\\'")
    val noCr = regexp_replace(esc, "\r", "\\\\r")
    val noNl = regexp_replace(noCr, "\n", "\\\\n")
    concat(lit("'"), noNl, lit("'"))
  }

  /** Node MERGE statements from the props table (signature, label,
    * props map): MERGE on the signature — the reference's cross-document
    * unification key — with the scalar members as ON CREATE properties
    * in sorted-key order (the map is built from sorted columns, so
    * map_entries preserves that order deterministically).
    */
  def cypherNodeStatements(props: DataFrame): DataFrame =
    props.select(concat(
      lit("MERGE (n:"), col("label"),
      lit(" {signature: "), cypherLit(col("signature")), lit("}) ON CREATE SET "),
      array_join(transform(map_entries(col("props")), e =>
        concat(lit("n."), e.getField("key"), lit(" = "),
          cypherLit(e.getField("value")))), ", "),
      lit(";")).as("stmt"))

  /** HAS-edge MERGE statements (MATCH both endpoints by signature, MERGE
    * the relationship — idempotent like the reference's edge writes).
    */
  def cypherEdgeStatements(edges: DataFrame): DataFrame =
    edges.select(concat(
      lit("MATCH (a {signature: "), cypherLit(col("parent_sig")),
      lit("}), (b {signature: "), cypherLit(col("child_sig")),
      lit("}) MERGE (a)-[:"), col("edge_label"), lit("]->(b);")).as("stmt"))

  /** Dump the property graph as loadable Cypher: `<out>/nodes/` +
    * `<out>/edges/` distributed text. Nodes must load before edges (the
    * edge MATCH finds them) — the same two-phase order the reference uses.
    */
  def writeCypherDump(records: DataFrame, outDir: String): Unit = {
    val (_, edges, props) = GraphOps.graphWithProps(records)
    writeCypherDump(edges, props, outDir)
  }

  /** [[writeCypherDump]] over already-built (edges, props) frames — use
    * this when the caller holds the graph (e.g. persisted), so the dump
    * never re-runs the graph build.
    */
  def writeCypherDump(edges: DataFrame, props: DataFrame, outDir: String): Unit = {
    cypherNodeStatements(props)
      .write.mode("overwrite").text(s"$outDir/nodes")
    cypherEdgeStatements(edges)
      .write.mode("overwrite").text(s"$outDir/edges")
  }
}
