package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps.Mp4

/** Pure-JVM tests for the minimal ISO BMFF writer + box-walk reader —
  * the video leg of the multimodal decode path. Seeded random shapes
  * (no scalacheck offline), plus structural checks that the parser is a
  * real box walk and not a byte-offset formula over our own output. */
class Mp4Spec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1337)

  test("write → parseMeta round-trips width/height/duration over random shapes") {
    for (_ <- 1 to 200) {
      val w = 16 + rnd.nextInt(4096)
      val h = 16 + rnd.nextInt(4096)
      val d = 1 + rnd.nextInt(36000)
      val payload = Array.fill(rnd.nextInt(256))(rnd.nextInt().toByte)
      val bytes = Mp4.write(w, h, d, payload)
      assert(Mp4.parseMeta(bytes) === ((w, h, d)))
    }
  }

  test("container structure: leading ftyp box, sizes chain to EOF") {
    val bytes = Mp4.write(320, 240, 5, "hello".getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    assert(new String(bytes, 4, 4, "US-ASCII") === "ftyp")
    // walk top-level boxes purely by size chaining; must land exactly at EOF
    var off = 0
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    while (off < bytes.length) {
      seen += new String(bytes, off + 4, 4, "US-ASCII")
      off += bb.getInt(off)
    }
    assert(off === bytes.length)
    assert(seen.toList === List("ftyp", "moov", "mdat"))
  }

  test("parser survives box reordering and unknown sibling boxes (true walk, not fixed offsets)") {
    // re-assemble a container by hand: unknown box first, then moov whose
    // trak comes before mvhd — a fixed-offset reader would misparse
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length); bb.put(tpe.getBytes("US-ASCII")); bb.put(payload)
      bb.array()
    }
    val ref = Mp4.write(640, 480, 7, Array.emptyByteArray)
    val bb = java.nio.ByteBuffer.wrap(ref)
    // extract the original moov box
    var off = 0
    var moov: Array[Byte] = null
    while (off < ref.length) {
      val size = bb.getInt(off)
      if (new String(ref, off + 4, 4, "US-ASCII") == "moov")
        moov = java.util.Arrays.copyOfRange(ref, off, off + size)
      off += size
    }
    assert(moov != null)
    // moov children are mvhd (108 bytes) then trak; swap them
    val mvhd = java.util.Arrays.copyOfRange(moov, 8, 8 + 108)
    val trak = java.util.Arrays.copyOfRange(moov, 8 + 108, moov.length)
    val shuffled = box("free", Array.fill(13)(0x5a.toByte)) ++
      box("moov", trak ++ mvhd) ++ box("mdat", "x".getBytes)
    assert(Mp4.parseMeta(shuffled) === ((640, 480, 7)))
  }

  test("malformed input fails loudly instead of inventing metadata") {
    val good = Mp4.write(128, 96, 3, Array.emptyByteArray)
    // truncated mid-moov (clipping only the trailing mdat is tolerated —
    // metadata boxes are intact; clipping into moov must fail)
    intercept[IllegalArgumentException] {
      Mp4.parseMeta(java.util.Arrays.copyOfRange(good, 0, good.length - 20))
    }
    // no moov at all
    intercept[IllegalArgumentException] {
      Mp4.parseMeta(java.util.Arrays.copyOfRange(good, 0, 24))
    }
    // corrupt a box size to zero
    val bad = good.clone()
    val bb = java.nio.ByteBuffer.wrap(bad)
    bb.putInt(24, 0) // moov size := 0
    intercept[IllegalArgumentException] { Mp4.parseMeta(bad) }
  }
}
