package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Wire-format dump main: writes the shredded relational family as a
  * SQLite-loadable SQL dump and the property graph as a Cypher dump
  * (see [[graft.ops.WireSinks]]), plus a `manifest.json` of expected
  * per-table row counts so an external loader can assert the load.
  *
  * Usage: runMain graft.WireDump <outDir> [nConvs]
  * Proof harness: tools/wire_load_check.py loads the SQL dump into a
  * REAL sqlite3, replays it (idempotency via the row_key primary key),
  * and compares counts against the manifest.
  */
object WireDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_wire")
    val nConvs = args.lift(1).map(_.toLong).getOrElse(SparkEntry.VerifyRecords)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val records = ops.ShredOps.structuredRecords(spark, nConvs).toDF()
    val tables = ops.ShredOps.shredAll(records)
    ops.WireSinks.writeSqlDump(tables, s"$outDir/sql")
    ops.WireSinks.writeCypherDump(records, s"$outDir/cypher")

    val (vertices, edges, _) = ops.GraphOps.graphWithProps(records)
    val counts =
      tables.map { case (name, df) => s""""$name": ${df.count()}""" } ++
        Seq(s""""_cypher_nodes": ${vertices.count()}""",
          s""""_cypher_edges": ${edges.count()}""")
    Files.writeString(
      Paths.get(outDir, "manifest.json"),
      counts.mkString("{", ", ", "}"))
    spark.stop()
  }
}
