package graft

import org.apache.spark.sql.SparkSession

/** Scratch: min-of-K timings for the iterative clustering queries (the
  * two slowest bench queries) in isolation — for clusterEdges tuning.
  * Findings so far (Spark 4.1, this host): dropping the intermediate
  * `propagated` localCheckpoint does NOT help (no ReusedExchange across
  * the shortcut-join sides), and pre-partitioning the edge list cannot
  * survive localCheckpoint (LogicalRDD discards outputPartitioning).
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // (the partitioning-preservation probe this file once carried is now
    // a PlanShapeSpec regression test — "persisted repartition
    // partitioning survives into a join")
    // warm
    SparkEntry.queries("q36_dedup_clusters")(spark, dir).count()
    for (q <- Seq("q36_dedup_clusters", "q51_simhash_clusters")) {
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$q min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
