package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Property-graph sink form (S9): vertex/edge DataFrames derived from the
  * shredded table family, with cross-document node unification on a
  * content signature (ref: agents/knowledge_graph_agent/utils.py:150-236
  * builds a node tree with HAS edges and MERGEs nodes on a sha256
  * signature of the scalar members, so identical subtrees from different
  * documents become ONE node).
  *
  * Signature = sha256 over (label | k=v | k=v ...) with field names
  * sorted, nulls spelled 'null', and doubles through the canonical
  * formatter (`graft_canon_double`) — the cross-system numeric
  * canonicalization the reference gets from `str(float(val))`
  * (utils.py:49-63). Structural keys (conv_id, row_key, parent_key, pos
  * and `*_key` pointers) are EXCLUDED, so merging is by content, not
  * position or provenance.
  *
  * Scale shape: node construction is a projection per shredded table (no
  * shuffle beyond the shreds themselves); unification is a groupBy on the
  * 32-byte signature; edges join (row_key → signature) maps — all
  * shuffles carry hashes + labels, never payload rows.
  */
object GraphOps {

  private val structuralCols = Set("conv_id", "row_key", "parent_key", "pos")

  private def isKeyCol(c: String): Boolean =
    structuralCols.contains(c) || c.endsWith("_key")

  /** Canonical string form of one scalar column — the recipe both the
    * signature hash and the node property map use (doubles through the
    * shortest-roundtrip formatter, everything else a plain cast).
    */
  private def canonVal(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case DoubleType => expr(s"graft_canon_double(`$c`)")
      case _          => col(c).cast("string")
    }

  /** (row_key, signature, label) rows for one shredded table. */
  private def nodeRows(label: String, df: DataFrame): DataFrame = {
    val scalarCols = df.columns.filterNot(isKeyCol).sorted
    val parts: Seq[Column] = scalarCols.toSeq.map { c =>
      concat(lit(c + "="), coalesce(canonVal(df, c), lit("null")))
    }
    df.select(
      col("row_key"),
      sha2(concat_ws("|", (lit(label) +: parts): _*), 256).as("signature"),
      lit(label).as("label"))
  }

  /** (signature, label, props) rows for one shredded table — the scalar
    * members as a string→canonical-string property map. The reference
    * stores scalar members as string node properties (which is exactly why
    * its generated Cypher needs `toFloat` casts; ref:
    * agents/knowledge_graph_agent/utils.py:17-22,190-213), so the engine
    * keeps the same string-typed property model.
    */
  private def propRows(label: String, df: DataFrame): DataFrame = {
    val scalarCols = df.columns.filterNot(isKeyCol).sorted
    val parts: Seq[Column] = scalarCols.toSeq.map { c =>
      concat(lit(c + "="), coalesce(canonVal(df, c), lit("null")))
    }
    val kvs: Seq[Column] = scalarCols.toSeq.flatMap { c =>
      Seq(lit(c), coalesce(canonVal(df, c), lit("null")))
    }
    df.select(
      sha2(concat_ws("|", (lit(label) +: parts): _*), 256).as("signature"),
      lit(label).as("label"),
      map(kvs: _*).as("props"))
  }

  /** Build (vertices, edges) from a nested-record table.
    *
    * vertices: (signature, label, n_merged) — one row per distinct
    * content node; `n_merged` counts how many source rows (across ALL
    * documents) unified into it.
    * edges: (parent_sig, child_sig, edge_label='HAS'), deduplicated —
    * the containment tree after unification.
    */
  def graph(records: DataFrame, rootName: String = "main_table"): (DataFrame, DataFrame) = {
    val (v, e, _) = graphWithProps(records, rootName)
    (v, e)
  }

  /** [[graph]] plus the node property table, built in ONE shred pass:
    * props: (signature, label, props map<string,string>) — one row per
    * distinct content node carrying its scalar members as canonical
    * strings (signature determines props, so dedup keys on signature
    * alone). Shuffle shape unchanged: dedup groups 32-byte signatures;
    * the map values ride exactly one exchange.
    */
  def graphWithProps(records: DataFrame, rootName: String = "main_table")
      : (DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(records.sparkSession)
    val tables = ShredOps.shredAll(records, rootName)
    val allNodes = tables.map { case (name, df) => nodeRows(name, df) }
      .reduce(_ unionByName _)

    val vertices = allNodes
      .groupBy(col("signature"), col("label"))
      .agg(count(lit(1)).as("n_merged"))

    // containment links as (src row_key, dst row_key):
    //  - array-element children carry parent_key themselves
    //  - struct children are pointed at by the parent's `{field}_key`
    val linkPairs = tables.flatMap { case (_, df) =>
      val cols = df.columns
      val fromParent =
        if (cols.contains("parent_key"))
          Seq(df.select(col("parent_key").as("src_key"), col("row_key").as("dst_key")))
        else Seq.empty
      val structLinks = cols.toSeq
        .filter(c => c.endsWith("_key") && c != "row_key" && c != "parent_key")
        .map(c => df.select(col("row_key").as("src_key"), col(c).as("dst_key")))
      fromParent ++ structLinks
    }

    val keymap = allNodes.select(col("row_key"), col("signature"))
    val edges = linkPairs.reduce(_ union _)
      .join(keymap.toDF("src_key", "parent_sig"), "src_key")
      .join(keymap.toDF("dst_key", "child_sig"), "dst_key")
      .select(col("parent_sig"), col("child_sig"), lit("HAS").as("edge_label"))
      .distinct()

    val props = tables.map { case (name, df) => propRows(name, df) }
      .reduce(_ unionByName _)
      .dropDuplicates("signature")

    (vertices, edges, props)
  }
}
