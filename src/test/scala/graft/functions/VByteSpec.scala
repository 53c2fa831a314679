package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class VByteSpec extends AnyFunSuite {

  test("roundtrip simple") {
    val v = Array(0, 1, 127, 128, 300, 16384, Int.MaxValue)
    assert(VByte.decode(VByte.encode(v)).sameElements(v))
  }

  test("delta roundtrip on sorted ids") {
    val ids = Array(3, 7, 8, 100, 5000, 1 << 20)
    assert(VByte.decodeDeltas(VByte.encodeDeltas(ids)).sameElements(ids))
  }

  test("empty") {
    assert(VByte.encodeDeltas(Array.empty).isEmpty)
    assert(VByte.decodeDeltas(Array.emptyByteArray).isEmpty)
  }

  test("property: delta roundtrip == identity for any strictly-increasing set") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val ids = Array.fill(rnd.nextInt(500))(rnd.nextInt(Int.MaxValue)).distinct.sorted
      assert(VByte.decodeDeltas(VByte.encodeDeltas(ids)).sameElements(ids))
    }
  }

  test("strictly increasing enforced") {
    intercept[IllegalArgumentException](VByte.encodeDeltas(Array(5, 5)))
    intercept[IllegalArgumentException](VByte.encodeDeltas(Array(5, 3)))
  }

  test("encoding is compact: small deltas are 1 byte") {
    val ids = (1000 until 1128).toArray // deltas of 1
    val bytes = VByte.encodeDeltas(ids)
    assert(bytes.length == 2 + 127) // first abs value 2 bytes + 127 1-byte deltas
  }
}
