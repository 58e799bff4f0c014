package graft.functions

/** The shared hash kernels. Every operator that must agree with a DuckDB
  * oracle or with another operator's signatures routes through here —
  * a second copy drifting by one constant would silently break
  * x_fingerprint/x_multimodal_meta parity or split LSH buckets.
  */
object Hashing {

  /** splitmix64 finalizer (avalanche). */
  @inline def finalizeMix(z0: Long): Long = {
    var z = (z0 ^ (z0 >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  val Golden = 0x9E3779B97F4A7C15L

  /** Re-keyed mix: deterministic pseudo-random stream per (seed). */
  @inline def mix64(z: Long): Long = finalizeMix(z * Golden)

  /** FNV-1a over bytes (no finalizer). */
  @inline def fnv1a(bytes: Array[Byte], h0: Long = 0xCBF29CE484222325L): Long = {
    var h = h0
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** 31-polynomial rolling hash mod 1e9+7 over bytes — matches the
    * DuckDB oracles' per-character fold for ASCII text. */
  def poly31(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xFF)) % 1000000007L
      i += 1
    }
    acc
  }
}
