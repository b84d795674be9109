package graft.functions

/** The corpus-wide 48-bit md5-prefix hash convention as ONE shared
  * kernel helper (self-review r20 third pass: [[DsirScore]] and
  * [[LangIdScore]] each carried a private copy of the thread-local
  * digest and the 6-byte big-endian fold — a drifting surface for the
  * one constant the whole oracle story rests on).
  *
  * `h48(bytes)` is byte-for-byte the value
  * `conv(substring(md5(s), 1, 12), 16, 10)` yields (the digest's first
  * 6 bytes read unsigned big-endian) — [[graft.ops.TextOps.shingleHash]]
  * in kernel form. One digest instance per executor thread (r17
  * ADVICE): a per-ROW `MessageDigest.getInstance` is billions of
  * provider lookups + allocations on a 100 TB scan; the instance is
  * stateless between `reset()`-prefixed uses, so thread confinement is
  * the whole safety argument. */
private[functions] object Md5Bucket {

  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The caller's per-row digest handle — fetch ONCE per row, not per
    * feature (ThreadLocal.get is cheap but not free). */
  def md(): java.security.MessageDigest = localMd.get()

  /** 48-bit md5 prefix of `bytes[off, off+len)`. */
  def h48(md: java.security.MessageDigest, bytes: Array[Byte],
          off: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** 48-bit md5 prefix of a whole byte array. */
  def h48(md: java.security.MessageDigest, bytes: Array[Byte]): Long =
    h48(md, bytes, 0, bytes.length)
}
