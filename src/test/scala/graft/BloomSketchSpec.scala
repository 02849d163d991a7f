package graft

import graft.ops.BloomSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Local truths for the deterministic Bloom sketch: position parity
  * (column vs driver math), mergeability (partial-state union == direct
  * build, at any parallelism), the one-sided-error contract (NO false
  * negatives ever; false positives exist and are measurable), and
  * column/driver membership parity.
  */
class BloomSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  private def mix(i: Long): Long = graft.synth.Synth.mix(i)

  private val members: Seq[Long] = (0 until 2000).map(i => mix(i.toLong))
  private val outsiders: Seq[Long] = (0 until 20000).map(i => mix(1000000L + i))

  private def directBitmap(grams: Seq[Long]): Array[Long] = {
    val b = BloomSketch.BitmapAgg.zero
    grams.foreach { g =>
      (0 until BloomSketch.Probes)
        .foreach(i => BloomSketch.BitmapAgg.reduce(b, BloomSketch.positionScala(g, i)))
    }
    b
  }

  test("probe positions: column expression equals driver math, incl. negative grams") {
    import spark.implicits._
    val grams = Seq(-1L, Long.MinValue, Long.MaxValue, 0L, 42L) ++ members.take(50)
    val fromCol = grams.toDF("gram")
      .select(col("gram"), BloomSketch.positions(col("gram")).as("pos"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    grams.foreach { g =>
      val expected = (0 until BloomSketch.Probes).map(BloomSketch.positionScala(g, _))
      assert(fromCol(g) == expected, s"gram $g")
      assert(expected.forall(p => p >= 0 && p < BloomSketch.MBits))
    }
  }

  test("bitmap aggregator is mergeable: partial-state union == direct build, any parallelism") {
    import spark.implicits._
    // driver-level: split into arbitrary parts, merge partials
    val (a, b) = members.splitAt(members.size / 3)
    val merged = BloomSketch.BitmapAgg.merge(directBitmap(a), directBitmap(b))
    assert(merged.toSeq == directBitmap(members).toSeq)
    // distributed: 1 partition vs 13 partitions give the identical bitmap
    def build(parts: Int): Seq[Long] = members.toDS().repartition(parts)
      .select(BloomSketch.positions(col("value")).as("pos")).as[Long]
      .select(BloomSketch.BitmapAgg.toColumn).head().toSeq
    assert(build(1) == directBitmap(members).toSeq)
    assert(build(13) == build(1))
  }

  test("one-sided error: zero false negatives; false positives exist and are counted") {
    val words = directBitmap(members)
    members.foreach(g => assert(BloomSketch.mayContainScala(words, g), s"false negative $g"))
    val memberSet = members.toSet
    val fp = outsiders.count(g => !memberSet.contains(g) && BloomSketch.mayContainScala(words, g))
    // 2000 keys × 4 probes in 2^17 bits → p_bit≈0.059, p_fp≈0.059^4≈1.2e-5;
    // 20k outsiders ⇒ expect ~0-3 false positives, and far under 1%
    assert(fp < 200, s"false-positive rate implausibly high: $fp / ${outsiders.size}")
  }

  test("membership column equals driver membership over members and outsiders") {
    import spark.implicits._
    val words = directBitmap(members)
    val probe = (members.take(200) ++ outsiders.take(2000)).toDF("gram")
    val got = probe
      .select(col("gram"), BloomSketch.mayContain(words, col("gram")).as("hit"))
      .as[(Long, Boolean)].collect()
    got.foreach { case (g, hit) =>
      assert(hit == BloomSketch.mayContainScala(words, g), s"gram $g")
    }
  }
}
