package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Variable-byte (VByte) codec for posting-list blocks.
  *
  * Docids within a block are delta-encoded (first value absolute, then
  * gaps) and each delta/value is written little-endian base-128 with the
  * high bit as the continuation flag. This replaces the reference's
  * CboRoaringBitmapCodec (reference:
  * crates/milli/src/heed_codec/roaring_bitmap/cbo_roaring_bitmap_codec.rs:11-50)
  * with the delta+VByte block layout the north rule prescribes; the
  * equivalence contract is at the docid-set level, not the byte level.
  */
object VByte extends Serializable {

  /** Encode non-negative ints as raw vbyte (no delta). */
  def encode(values: Array[Int]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](values.length * 2)
    var i = 0
    while (i < values.length) {
      var v = values(i)
      require(v >= 0, s"vbyte requires non-negative values, got $v")
      while ((v & ~0x7f) != 0) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      out += v.toByte
      i += 1
    }
    out.toArray
  }

  def decode(bytes: Array[Byte]): Array[Int] = {
    val out = new ArrayBuffer[Int](bytes.length)
    var i = 0
    while (i < bytes.length) {
      var v = 0; var shift = 0; var b = 0
      do {
        b = bytes(i) & 0xff; i += 1
        v |= (b & 0x7f) << shift; shift += 7
      } while ((b & 0x80) != 0)
      out += v
    }
    out.toArray
  }

  /** Delta-encode a strictly-increasing docid array then vbyte it. */
  def encodeDeltas(sorted: Array[Int]): Array[Byte] = {
    if (sorted.isEmpty) return Array.emptyByteArray
    val deltas = new Array[Int](sorted.length)
    deltas(0) = sorted(0)
    var i = 1
    while (i < sorted.length) {
      val d = sorted(i) - sorted(i - 1)
      require(d > 0, s"docids must be strictly increasing: ${sorted(i - 1)} -> ${sorted(i)}")
      deltas(i) = d
      i += 1
    }
    encode(deltas)
  }

  def decodeDeltas(bytes: Array[Byte]): Array[Int] = {
    val deltas = decode(bytes)
    var i = 1
    while (i < deltas.length) { deltas(i) += deltas(i - 1); i += 1 }
    deltas
  }
}
