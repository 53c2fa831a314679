package graft.index

/** SHA-256 hex of a string (the per-row content invariant from
  * BASELINE.json input_hint; asserted against `sha2(content, 256)` in
  * tests and maintained in the docs table).
  *
  * `MessageDigest.getInstance` takes a JCA provider lock — calling it
  * per row serializes 32 executor threads (measured: the docs stage ran
  * 10x slower at local[32] than local[8]). One digest per thread,
  * reset via digest(), and table-driven hex instead of per-byte
  * String.format. */
object Sha extends Serializable {
  private val HexChars = "0123456789abcdef".toCharArray

  @transient private lazy val local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("SHA-256")
    }

  def hex(s: String): String = hexBytes(s.getBytes("UTF-8"))

  /** raw digest (thread-local instance) */
  def digest(bytes: Array[Byte]): Array[Byte] = local.get().digest(bytes)

  def toHex(h: Array[Byte]): String = {
    val out = new Array[Char](h.length * 2)
    var i = 0
    while (i < h.length) {
      out(i * 2) = HexChars((h(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(h(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def hexBytes(bytes: Array[Byte]): String = toHex(digest(bytes))
}
