package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (spark_guide.md: one
  * session per suite; sharing across suites avoids repeated JVM-wide
  * startup cost under `sbt -batch test`).
  */
object SparkSessionFixture {

  /** Shared test helper: lowercase sha256 hex (engine `sha2(_, 256)` /
    * DuckDB `sha256()` parity family).
    */
  def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Shared test helper: EXACT Spark `size(split(trim(text), "\\s+"))`
    * semantics — space-only trim and a limit=-1 split that KEEPS
    * leading/trailing empty tokens. Java `String.trim` + Scala's
    * default split silently diverge on tab/newline-edged text.
    */
  def sparkTokenCount(t: String): Long = {
    val s = t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    s.split("\\s+", -1).length.toLong
  }

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
