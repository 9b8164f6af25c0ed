package graft

/** Plain-Scala reference constructions shared across specs — one definition
  * per cross-engine contract, so a change to the kernel's construction
  * can't leave a stale copy validating the old one. */
object TestRefs {

  /** 128-byte payload whose [[graft.expr.PHash.phash64]] is EXACTLY `bits`:
    * each 2-byte segment is all-255 (bit 1) or all-0 (bit 0). With k
    * ones-segments (0 < k < 64) the ones mean 255 always beats the global
    * mean and the zeros never do, so the hash realizes any chosen pattern —
    * lets specs plant pairs at exact Hamming distances. */
  def payloadFor(bits: Long): Array[Byte] =
    (0 until 64).flatMap { i =>
      val one = ((bits >>> (63 - i)) & 1L) == 1L
      Seq.fill(2)(if (one) 255.toByte else 0.toByte)
    }.toArray

  /** The portable 60-bit md5 hash (first 15 hex chars as a long) — the
    * plain-Scala twin of `PortableSketch.h60` and the oracles'
    * `('0x'||substr(md5(s),1,15))::BIGINT`. */
  def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}
