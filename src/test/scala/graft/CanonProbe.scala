package graft

import graft.text.TextAlgos

/** Dev probe: dump (bits, canonDouble) pairs for N seeded-random doubles
  * so tools/canon_parity_probe.py can diff them against Python repr()
  * (same shortest-round-trip format as DuckDB VARCHAR casts). Run:
  * `sbt -batch "Test/runMain graft.CanonProbe <n> <outFile>"`.
  */
object CanonProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(300000)
    val out = args.lift(1).getOrElse("/tmp/canon_probe.tsv")
    val rnd = new java.util.Random(42)
    val w = new java.io.PrintWriter(out)
    var i = 0
    var emitted = 0
    while (emitted < n) {
      // half uniform bit patterns (all exponent regimes incl. subnormals),
      // half "everyday" magnitudes
      val d =
        if (i % 2 == 0) java.lang.Double.longBitsToDouble(rnd.nextLong())
        else (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(40) - 20)
      if (!d.isNaN && !d.isInfinite) {
        w.println(s"${java.lang.Double.doubleToRawLongBits(d)}\t${TextAlgos.canonDouble(d)}")
        emitted += 1
      }
      i += 1
    }
    w.close()
    println(s"wrote $emitted pairs to $out")
  }
}
