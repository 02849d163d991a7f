package graft.text

/** Deterministic text/vector algorithms used by the dedup, similarity and
  * fingerprinting operators. All pure functions — safe inside typed Dataset
  * map stages at any parallelism. Hashing is splitmix64-style mixing (public
  * domain constants), NOT Scala's hashCode (which is JVM-stable but weakly
  * mixed).
  */
object TextAlgos {

  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Stable 64-bit string hash (FNV-1a folded through mix64). */
  def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  def tokenize(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else text.trim.split("\\s+").filter(_.nonEmpty)

  /** Word w-shingles as 64-bit hashes (deduplicated). */
  def shingleHashes(tokens: Array[String], w: Int): Array[Long] = {
    if (tokens.length < w) return Array.empty
    val out = new Array[Long](tokens.length - w + 1)
    var i = 0
    while (i + w <= tokens.length) {
      var h = 0L
      var j = 0
      while (j < w) { h = mix64(h ^ hashString(tokens(i + j))); j += 1 }
      out(i) = h
      i += 1
    }
    out.distinct
  }

  /** MinHash signature of k permutations via k independent mixes of each
    * shingle hash (one-pass, O(shingles * k)).
    */
  def minhash(shingles: Array[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val s = shingles(i)
      var p = 0
      while (p < k) {
        val h = mix64(s ^ mix64(p.toLong * 0x9e3779b97f4a7c15L))
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys: hash each band of `rows` consecutive signature slots;
    * docs sharing any band key are candidate pairs.
    */
  def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix64(b.toLong)
      var r = 0
      while (r < rows) { h = mix64(h ^ sig(b * rows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** Exact Jaccard similarity of two shingle-hash sets, scaled to 0..1000
    * (integer — engine-independent comparison).
    */
  def jaccardX1000(a: Array[Long], b: Array[Long]): Int = {
    if (a.isEmpty && b.isEmpty) return 1000
    if (a.isEmpty || b.isEmpty) return 0
    val setB = b.toSet
    var inter = 0
    var i = 0
    while (i < a.length) { if (setB.contains(a(i))) inter += 1; i += 1 }
    val union = a.length + b.length - inter
    (inter.toLong * 1000L / union).toInt
  }

  /** 64-bit SimHash over token hashes (unweighted). */
  def simhash(tokens: Array[String]): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = hashString(tokens(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Codegen entry point for the `graft_simhash64` Catalyst expression
    * (graft.functions.SimHash64): called from generated Java via the
    * static forwarder, one UTF8String→String conversion, no boxing.
    */
  def simhashUtf8(s: org.apache.spark.unsafe.types.UTF8String): Long =
    simhash(tokenize(s.toString))

  /** Codegen entry point for `graft_cosine_x10000`
    * (graft.functions.CosineX10000): identical accumulation order to
    * `cosine`, so expression and typed paths are bit-identical.
    */
  def cosineX10000ArrayData(
      a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long =
    math.floor(cosine(a.toFloatArray(), b.toFloatArray()) * 10000).toLong

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * k-gram rolling hashes, min per sliding window of `w`, deduplicated.
    */
  def winnow(tokens: Array[String], k: Int, w: Int): Array[Long] = {
    val grams = shingleHashesOrdered(tokens, k)
    if (grams.isEmpty) return Array.empty
    if (grams.length <= w) return Array(grams.min)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var i = 0
    while (i + w <= grams.length) {
      var m = grams(i)
      var j = i + 1
      while (j < i + w) { if (grams(j) < m) m = grams(j); j += 1 }
      out += m
      i += 1
    }
    out.toArray
  }

  /** Ordered (non-deduplicated) k-gram hashes for winnowing. */
  private def shingleHashesOrdered(tokens: Array[String], w: Int): Array[Long] = {
    if (tokens.length < w) return Array.empty
    val out = new Array[Long](tokens.length - w + 1)
    var i = 0
    while (i + w <= tokens.length) {
      var h = 0L
      var j = 0
      while (j < w) { h = mix64(h ^ hashString(tokens(i + j))); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** Cosine similarity of two float vectors, computed in double. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deterministic hyperplane coefficient in [-1, 1) for (plane, dim) —
    * exposed so the DuckDB oracle SQL can inline the exact same literals
    * (Double.toString is shortest-roundtrip in Java 17, so the SQL parse
    * recovers the identical double).
    */
  def hyperplaneCoef(p: Int, d: Int): Double =
    (mix64(p.toLong * 0x632be59bd9b4e019L ^ d.toLong * 0x9e3779b97f4a7c15L) >> 11).toDouble / (1L << 52).toDouble

  /** Sign-bit LSH bucket of a vector under `nPlanes` deterministic random
    * hyperplanes (plane coefficients derived from mix64 of (plane, dim)).
    */
  def hyperplaneBucket(v: Array[Float], nPlanes: Int): Int = {
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var d = 0
      while (d < v.length) {
        dot += hyperplaneCoef(p, d) * v(d)
        d += 1
      }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }
}
