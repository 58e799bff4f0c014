package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Pins the properties that make winnowing the guaranteed-detection
  * fingerprint (Schleimer et al. §3): the detection guarantee, the
  * density bound, and determinism — the invariants x_dedup_winnow's
  * posting join relies on. Pure kernel tests, no Spark session. */
class WinnowSpec extends AnyFunSuite {

  private def fp(s: String): Set[Long] = {
    val a = Winnowing.winnowed(UTF8String.fromString(s))
    (0 until a.numElements()).map(a.getLong).toSet
  }

  test("detection guarantee: any shared span of W+K-1 bytes shares a fingerprint") {
    // the shared span is exactly the guarantee threshold: 39 bytes
    val span = "the quick brown fox jumps over the dog"  // 38 chars
    val shared = span + "!"                              // 39
    assert(shared.length == Winnowing.W + Winnowing.K - 1)
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      def noise(n: Int) = rnd.alphanumeric.take(n).mkString
      val a = noise(rnd.nextInt(200)) + shared + noise(rnd.nextInt(200))
      val b = noise(rnd.nextInt(200)) + shared + noise(rnd.nextInt(200))
      assert(fp(a).intersect(fp(b)).nonEmpty,
        s"39-byte shared span produced disjoint fingerprint sets")
    }
  }

  test("density: selected positions stay near 2/(W+1) of gram positions") {
    val rnd = new scala.util.Random(11)
    val doc = rnd.alphanumeric.take(5000).mkString
    val m = doc.length - Winnowing.K + 1
    val d = fp(doc).size.toDouble / m
    // 2/(W+1) = 0.222...; distinct-hash collapsing pulls it slightly
    // below, window overlap keeps it well above the 1/W floor
    assert(d > 0.10 && d < 0.30, s"density $d outside (0.10, 0.30)")
  }

  test("deterministic, and short docs (< K bytes) yield empty sets") {
    val s = "winnowing is deterministic across calls and JVMs"
    assert(fp(s) == fp(s))
    assert(fp("tiny").isEmpty)
    // sub-window gram streams (K <= |s| < K+W-1) still fingerprint
    assert(fp("a" * 40).nonEmpty)
  }
}
