package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter over 64-bit gram hashes.
  *
  * Unlike the usual murmur-seeded Bloom filter, every piece of state here
  * is an exact integer function of the input set, so an independent engine
  * (the DuckDB oracle) can rebuild the filter bit-for-bit and verify both
  * the sketch and everything filtered through it:
  *
  *   - probe positions use double hashing (Kirsch–Mitzenmacher): the i-th
  *     position is `(h1 + i*(h2+1)) mod M` with `h1 = gram mod P1`,
  *     `h2 = gram mod P2` (P1/P2 prime, all operands < 2^21 — no overflow
  *     in any engine's BIGINT, no engine-private hash);
  *   - the bitmap is an order-independent bitwise OR, so it is mergeable
  *     across partitions (partial-state union == direct build, proved in
  *     `BloomSketchSpec`) and identical at any parallelism.
  *
  * Scale shape: the bitmap is a fixed 16 KiB regardless of input size —
  * build it with one aggregate over the small side's probe positions,
  * broadcast it as an array literal, and pre-filter the big side with a
  * codegen'd bit test BEFORE any shuffle or join. One-sided error: no
  * false negatives, so an exact equi-join on the survivors restores exact
  * semantics while the shuffle carries only the Bloom-passing keys.
  */
object BloomSketch {

  /** Bitmap size in bits (2^17 = 16 KiB — a broadcastable constant). */
  val MBits = 131072
  val Words: Int = MBits / 64

  /** Probe count. */
  val Probes = 4

  /** P1 = 2^17 - 1 and P2 = the largest prime below it. */
  val P1 = 131071L
  val P2 = 131063L

  /** The i-th probe position as a codegen'd column (pmod keeps every
    * intermediate non-negative, matching the oracle's double-mod form).
    */
  def position(gram: Column, i: Int): Column =
    pmod(
      pmod(gram, lit(P1)) + lit(i.toLong) * (pmod(gram, lit(P2)) + lit(1L)),
      lit(MBits.toLong))

  /** Same probe position driver/test-side (for local truths). */
  def positionScala(gram: Long, i: Int): Long = {
    val h1 = ((gram % P1) + P1) % P1
    val h2 = ((gram % P2) + P2) % P2
    (h1 + i * (h2 + 1L)) % MBits
  }

  /** All probe positions of one gram, as an exploded column. */
  def positions(gram: Column): Column =
    explode(array((0 until Probes).map(i => position(gram, i)): _*))

  /** Mergeable bitmap aggregator over probe positions: reduce sets a bit,
    * merge is bitwise OR — associative, commutative, idempotent, so the
    * result is independent of partitioning and row order.
    */
  object BitmapAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](Words)
    def reduce(b: Array[Long], pos: Long): Array[Long] = {
      b((pos >>> 6).toInt) |= (1L << (pos & 63L).toInt)
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < Words) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Number of set bits in a built bitmap (driver-side, on the 2 KiW
    * result of [[BitmapAgg]]).
    */
  def bitsSet(words: Array[Long]): Long =
    words.map(java.lang.Long.bitCount(_).toLong).sum

  /** Driver/test-side membership check. */
  def mayContainScala(words: Array[Long], gram: Long): Boolean =
    (0 until Probes).forall { i =>
      val pos = positionScala(gram, i)
      (words((pos >>> 6).toInt) >>> (pos & 63L).toInt & 1L) == 1L
    }

  /** Membership test as a codegen'd column: the bitmap rides along as an
    * array literal (16 KiB — a closed constant in the generated code, no
    * UDF, no broadcast join), each probe is
    * `(words[pos >> 6] >> (pos & 63)) & 1`.
    */
  def mayContain(words: Array[Long], gram: Column): Column = {
    val bw = typedLit(words.toSeq)
    (0 until Probes)
      .map { i =>
        val pos = position(gram, i)
        val word = element_at(bw, shiftright(pos, 6).cast("int") + lit(1))
        call_function("shiftright", word, pos.bitwiseAND(lit(63L)).cast("int"))
          .bitwiseAND(lit(1L)) === lit(1L)
      }
      .reduce(_ && _)
  }
}
