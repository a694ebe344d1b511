package graft.functions

/** Scala-side replica of the engine's cross-engine 60-bit hash
  * (`TextOps.h60` SQL fragment: md5 hex → first 15 nibbles → long).
  * Driver/executor Scala code and generated SQL must agree bit-for-bit on
  * every hash-derived value (hyperplanes, decode stubs, span fingerprints),
  * so this is the single Scala implementation.
  *
  * The first 15 hex nibbles of the digest are the top 60 bits of its first
  * 8 bytes read big-endian — computed numerically (no hex string round
  * trip; the old `%02x`-per-byte formatting dominated per-token hashing).
  * MessageDigest instances are thread-local: `digest()` resets the
  * instance, so reuse is safe, and executor tasks hash millions of tokens.
  */
object Hash60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def apply(bytes: Array[Byte]): Long = {
    val d = md.get().digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def apply(s: String): Long = apply(s.getBytes("UTF-8"))
}
