package graft.functions

/** Scala-side replica of the engine's cross-engine 60-bit hash
  * (`TextOps.h60` SQL fragment: md5 hex → first 15 nibbles → long).
  * Driver/executor Scala code and generated SQL must agree bit-for-bit on
  * every hash-derived value (hyperplanes, decode stubs), so this is the
  * single Scala implementation. */
object Hash60 {
  def apply(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.substring(0, 15), 16)
  }
}
