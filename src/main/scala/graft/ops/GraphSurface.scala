package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Graph query surface — the engine analogue of the reference's
  * knowledge-graph branch of the chat entry point: NL questions are
  * compiled to Cypher over the Neo4j property graph and executed with
  * `top_k=50` (ref: agents/controller_agent/langgraph_components/
  * nodes.py:165-168 routes to the KG agent;
  * agents/knowledge_graph_agent/langchain_graph_agent.py:39-53 builds the
  * GraphCypherQAChain with top_k 50).
  *
  * The engine's property graph ([[GraphOps.graphWithProps]]) registers as
  * three temp views; arbitrary graph-shaped SQL runs through `spark.sql`;
  * and the reference's WORKED Cypher example ships as the flagship query
  * (ref: agents/knowledge_graph_agent/utils.py:17-22 — `MATCH (j:JsonNode)
  * WHERE toFloat(j.actual_quantity) > toFloat(j.allowed_range_min) AND
  * toFloat(j.actual_quantity) < toFloat(j.allowed_range_max) RETURN ...`),
  * scoped the way the reference's graph is actually wired: every document
  * root reaches its descendants over `HAS` edges
  * (utils.py:137-147 `MATCH (root)-[:HAS*]->(child)`), so the engine
  * expresses the `HAS*` reachability as a DEPTH-BOUNDED iterative
  * self-join on the edge table (the shred tree is statically ≤2 HAS hops
  * deep from the root).
  *
  * Scale shape: the traversal joins carry 32-byte signatures only (never
  * property maps or payload rows); each hop is one equi-join on
  * `parent_sig`; `DISTINCT` groups signatures; the final property lookup
  * is a semi-join of the props table against the reached set; and
  * `ORDER BY … LIMIT 50` compiles to TakeOrderedAndProject (per-partition
  * top-k, no global sort) — pinned by PlanShapeSpec.
  */
object GraphSurface {

  /** Views registered by [[registerViews]]. */
  val Views: Seq[String] = Seq("graph_vertices", "graph_edges", "graph_node_props")

  /** The currently-registered materialized graph frames (unpersisted on
    * the next registration), keyed by the input plan's semantic hash +
    * session so a re-registration of the SAME records is a no-op —
    * inputs are immutable per the repo contract, so equal plans mean an
    * equal graph.
    */
  private var materialized: Seq[DataFrame] = Nil
  private var materializedKey: Option[(SparkSession, AnyRef)] = None

  /** Register the engine's property graph as session temp views so any
    * SQL client of the session can traverse it by name.
    *
    * The frames are MATERIALIZED (persist MEMORY_AND_DISK), not lazy
    * views: a traversal references `graph_edges` once per hop and
    * `graph_vertices` at both ends, and a lazy view would re-execute the
    * whole shred+dedup graph build for every reference — at 100 TB that
    * is 4 rebuilds per query. The reference's analogue is a materialized
    * store too (the graph lives in Neo4j, written once, queried many
    * times); a cluster deployment would write vertices/edges/props to
    * parquet and register the re-read, which is what MEMORY_AND_DISK
    * approximates in-session (spills beyond memory, never recomputes).
    */
  def registerViews(records: DataFrame): Unit = synchronized {
    // identity of the ANALYZED plan, not semanticHash: typed-map stages
    // embed fresh closure objects per pipeline construction, so two
    // semantically identical builds never hash equal — callers that want
    // the no-op path pass the same DataFrame instance (see
    // SparkEntry.verifyRecords)
    val key: (SparkSession, AnyRef) =
      (records.sparkSession, records.queryExecution.analyzed)
    if (!materializedKey.exists(k => (k._1 eq key._1) && (k._2 eq key._2))) {
      System.err.println(
        s"[graft.GraphSurface] materializing graph views (input plan ${System.identityHashCode(key._2)})")
      materialized.foreach(_.unpersist(blocking = false))
      val (vertices, edges, props) = GraphOps.graphWithProps(records)
      val frames = Seq(vertices, edges, props)
        .map(_.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      Views.zip(frames).foreach { case (name, df) => df.createOrReplaceTempView(name) }
      materialized = frames
      materializedKey = Some(key)
    }
  }

  /** Run arbitrary graph-shaped SQL against the registered views (the
    * NL→Cypher agent's execution step; text-to-query itself is out of
    * engine scope, as with [[SqlSurface.adHoc]]).
    */
  def adHoc(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)

  /** The reference's worked Cypher example, expressed once as SQL over the
    * graph views: nodes within 2 HAS hops of any document root whose
    * string properties, float-cast (the reference's `toFloat` — node
    * properties are strings), satisfy the in-range predicate; top_k 50
    * under a total deterministic order.
    */
  val RangeQuerySql: String =
    """WITH roots AS (
         SELECT signature AS sig FROM graph_vertices WHERE label = 'main_table'),
       hop1 AS (
         SELECT e.child_sig AS sig FROM roots r
         JOIN graph_edges e ON e.parent_sig = r.sig),
       hop2 AS (
         SELECT e.child_sig AS sig FROM hop1
         JOIN graph_edges e ON e.parent_sig = hop1.sig),
       reached AS (
         SELECT DISTINCT sig FROM (SELECT sig FROM hop1 UNION ALL SELECT sig FROM hop2)),
       j AS (
         SELECT p.signature,
                element_at(p.props, 'material_name') AS material_name,
                element_at(p.props, 'actual_quantity') AS actual_quantity,
                element_at(p.props, 'allowed_range_min') AS allowed_range_min,
                element_at(p.props, 'allowed_range_max') AS allowed_range_max
         FROM graph_node_props p
         WHERE p.label = 'main_table_material_usage_rows'
           AND p.signature IN (SELECT sig FROM reached))
       SELECT signature, material_name, actual_quantity, allowed_range_min, allowed_range_max
       FROM j
       WHERE CAST(actual_quantity AS DOUBLE) > CAST(allowed_range_min AS DOUBLE)
         AND CAST(actual_quantity AS DOUBLE) < CAST(allowed_range_max AS DOUBLE)
       ORDER BY signature ASC
       LIMIT 50"""

  /** Flagship graph query (q87): register views, run the range query. */
  def rangeQuery(spark: SparkSession, records: DataFrame): DataFrame = {
    registerViews(records)
    adHoc(spark, RangeQuerySql)
  }

  /** Per-root reachable-subtree rollup (q91): for every document root,
    * the count of distinct nodes reachable within 2 HAS hops, by label —
    * the graph-shaped "what does this document contain" summary the
    * reference's QA chain surfaces per document. Because nodes unify
    * across documents, a merged child counts once per ROOT that reaches
    * it (per-root DISTINCT), which is exactly the per-document answer.
    * Traversal joins carry signatures; the rollup groups
    * (root, label) — still 32-byte keys.
    */
  val SubtreeRollupSql: String =
    """WITH roots AS (
         SELECT signature AS root_sig FROM graph_vertices WHERE label = 'main_table'),
       hop1 AS (
         SELECT r.root_sig, e.child_sig AS sig FROM roots r
         JOIN graph_edges e ON e.parent_sig = r.root_sig),
       hop2 AS (
         SELECT h.root_sig, e.child_sig AS sig FROM hop1 h
         JOIN graph_edges e ON e.parent_sig = h.sig),
       reached AS (
         SELECT DISTINCT root_sig, sig
         FROM (SELECT root_sig, sig FROM hop1 UNION ALL SELECT root_sig, sig FROM hop2)),
       labeled AS (
         SELECT r.root_sig, v.label, r.sig
         FROM reached r JOIN graph_vertices v ON v.signature = r.sig)
       SELECT root_sig, label, count(*) AS n_nodes
       FROM labeled
       GROUP BY root_sig, label"""

  /** q91: register views, run the subtree rollup. */
  def subtreeRollup(spark: SparkSession, records: DataFrame): DataFrame = {
    registerViews(records)
    adHoc(spark, SubtreeRollupSql)
  }
}
