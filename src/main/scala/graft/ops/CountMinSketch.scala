package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Count-Min sketch over corpus terms, and the two-pass
  * heavy-hitter query built on it (Cormode–Muthukrishnan; the classic
  * "find frequent terms without a vocabulary-sized shuffle" sketch).
  *
  * Like [[BloomSketch]], every piece of state is an exact integer
  * function of the input multiset, so the DuckDB oracle rebuilds the
  * counter matrix cell-for-cell and verifies both the sketch AND the
  * heavy-hitter set read off it:
  *
  *   - a term's 64-bit gram is the first 8 hex chars of its sha256
  *     (`conv(substring(sha2(term,256),1,8),16,10)` — engine-neutral);
  *   - probe columns use Kirsch–Mitzenmacher double hashing: row `i`
  *     probes `(gram mod P1 + i*(gram mod P2 + 1)) mod W` (P1/P2 prime,
  *     every operand < 2^33 — BIGINT-safe in any engine);
  *   - the matrix is a `(row, col) -> sum(count)` aggregate: sums are
  *     associative and commutative, so the sketch is mergeable across
  *     partitions and identical at any parallelism (proved in
  *     CountMinSpec: half-corpus sketches summed == full sketch).
  *
  * Scale shape (the 100 TB story): the corpus shuffles NO term keys to
  * build the sketch — map-side partial aggregation collapses each input
  * partition to at most Depth×Width cells, and the one exchange carries
  * only those cell keys. The collected matrix is a fixed
  * Depth×Width×8 B = 256 KiB constant (bounded by the sketch, never by
  * data — the same documented driver contract as the BPE vocab and IVF
  * centroids), which rides back into the second pass as array literals:
  * the heavy-hitter pre-filter (`est(gram) >= threshold`) runs map-side
  * BEFORE the exact groupBy, so the term exchange carries only
  * sketch-passing occurrences. Count-Min error is one-sided
  * (est >= exact always), so no true heavy hitter is lost.
  */
object CountMinSketch {

  /** Matrix depth (independent probe rows). */
  val Depth = 4

  /** Matrix width (counters per row; 4×8192×8 B = 256 KiB total). */
  val Width = 8192L

  /** Double-hashing primes (shared with [[BloomSketch]] — both are
    * > any modulus used and < 2^21, keeping `gram mod P` products tiny).
    */
  val P1 = 131071L
  val P2 = 131063L

  /** Heavy-hitter threshold divisor: a term is a candidate when its
    * estimate reaches 1/[[HeavyDiv]] of the corpus token count.
    */
  val HeavyDiv = 2000L

  /** 64-bit term gram from the sha256 prefix (non-negative, < 2^32). */
  def gramCol(term: Column): Column =
    conv(substring(sha2(term, 256), 1, 8), 16, 10).cast("long")

  /** Row-`i` probe column of one gram. */
  def position(gram: Column, i: Int): Column =
    pmod(
      pmod(gram, lit(P1)) + lit(i.toLong) * (pmod(gram, lit(P2)) + lit(1L)),
      lit(Width))

  /** Same probe position driver/test-side (for local truths). */
  def positionScala(gram: Long, i: Int): Long = {
    val h1 = ((gram % P1) + P1) % P1
    val h2 = ((gram % P2) + P2) % P2
    (h1 + i * (h2 + 1L)) % Width
  }

  /** Driver/test-side gram of a term (for local truths). */
  def gramScala(term: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(term.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** Exploded corpus terms (one row per token occurrence). */
  def corpusTerms(docs: DataFrame): DataFrame =
    docs.select(
      explode(filter(split(trim(col("text")), "\\s+"), x => x =!= ""))
        .as("term"))

  /** The counter matrix `(row, col, c)` — one bounded-cardinality
    * exchange: partial aggregation collapses every input partition to
    * <= Depth×Width cells before the shuffle.
    */
  def matrix(terms: DataFrame): DataFrame = {
    val probes = explode(array((0 until Depth).map { i =>
      struct(lit(i).as("row"), position(gramCol(col("term")), i).as("col"))
    }: _*))
    terms
      .select(probes.as("p"))
      .groupBy(col("p.row").as("row"), col("p.col").as("col"))
      .agg(count(lit(1)).as("c"))
  }

  /** Collect the matrix into Depth dense rows of Width counters (the
    * bounded 256 KiB driver constant; absent cells are 0).
    */
  def collectMatrix(m: DataFrame): Array[Array[Long]] = {
    val rows = Array.fill(Depth)(new Array[Long](Width.toInt))
    m.collect().foreach { r =>
      rows(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2)
    }
    rows
  }

  /** Point-estimate column: min over rows of the gram's counter, with
    * each row riding as a 64 KiB array literal (codegen'd element_at —
    * no UDF, no broadcast join, no shuffle).
    */
  def estimate(rows: Array[Array[Long]], gram: Column): Column =
    least((0 until Depth).map { i =>
      element_at(typedLit(rows(i).toSeq), position(gram, i).cast("int") + lit(1))
    }: _*)

  /** q112: heavy hitters via the sketch. Pass 1 builds + collects the
    * matrix; pass 2 pre-filters token occurrences map-side on
    * `est >= max(1, total div HeavyDiv)` and exact-counts ONLY the
    * survivors (the term exchange carries sketch-passing occurrences,
    * not the corpus). Output: (term, est_count, exact_count) with
    * est >= exact guaranteed; both engines derive the identical set.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val docs = RelationalOps.table(spark, dir, "documents")
    val rows = collectMatrix(matrix(corpusTerms(docs)))
    // every matrix row sums to the corpus token count — the threshold
    // needs no extra pass over the data
    val total = rows(0).sum
    val threshold = math.max(1L, total / HeavyDiv)
    val g = gramCol(col("term"))
    corpusTerms(docs)
      .filter(estimate(rows, g) >= lit(threshold))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("exact_count"))
      .select(
        col("term"),
        estimate(rows, gramCol(col("term"))).as("est_count"),
        col("exact_count"))
  }
}
