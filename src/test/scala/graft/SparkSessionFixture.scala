package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (spark_guide.md: one
  * session per suite; sharing across suites avoids repeated JVM-wide
  * startup cost under `sbt -batch test`).
  */
object SparkSessionFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
