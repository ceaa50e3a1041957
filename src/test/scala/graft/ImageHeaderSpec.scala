package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps.ImageHeader

/** Pure-JVM tests for the PNG IHDR / JPEG SOF header reader — the image
  * leg of the multimodal metadata path. Round-trips against a REAL
  * encoder (JDK ImageIO), structural checks that the JPEG path is a
  * true marker walk (APP0/DQT/DHT segments precede the frame header in
  * ImageIO's output), and loud-failure pins for malformed bytes: the
  * gauntlet [[graft.ops.MultimodalOps.Mp4]] gets, applied to images. */
class ImageHeaderSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(4242)

  private def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
    val kind =
      if (fmt == "png") java.awt.image.BufferedImage.TYPE_INT_ARGB
      else java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(w, h, kind)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 2654435761L + y * 31 & 0xffffff).toInt)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, if (fmt == "png") "png" else "jpg", baos)
    baos.toByteArray
  }

  test("PNG: ImageIO bytes round-trip dimensions; ARGB reads color type 6 = 4 channels") {
    for (_ <- 1 to 50) {
      val w = 1 + rnd.nextInt(512); val h = 1 + rnd.nextInt(512)
      val m = ImageHeader.parse(encode(w, h, "png"))
      assert((m.format, m.width, m.height, m.channels) === (("png", w, h, 4)))
    }
  }

  test("JPEG: ImageIO bytes round-trip dimensions; baseline RGB reads 3 components") {
    for (_ <- 1 to 50) {
      val w = 1 + rnd.nextInt(512); val h = 1 + rnd.nextInt(512)
      val m = ImageHeader.parse(encode(w, h, "jpeg"))
      assert((m.format, m.width, m.height, m.channels) === (("jpeg", w, h, 3)))
    }
  }

  test("JPEG walk skips leading segments by their own lengths (not a fixed offset)") {
    // ImageIO's JPEG stream opens with APP0 (JFIF) + DQT segments before
    // SOF0; additionally splice in an APPn comment segment right after
    // SOI — a fixed-offset reader would land mid-segment and misparse
    val ref = encode(100, 50, "jpeg")
    val app = {
      val payload = "graft-test-segment".getBytes("US-ASCII")
      val bb = java.nio.ByteBuffer.allocate(4 + payload.length)
      bb.put(0xff.toByte); bb.put(0xe7.toByte) // APP7
      bb.putShort((2 + payload.length).toShort)
      bb.put(payload)
      bb.array()
    }
    val spliced = ref.slice(0, 2) ++ app ++ ref.drop(2)
    val m = ImageHeader.parse(spliced)
    assert((m.format, m.width, m.height) === (("jpeg", 100, 50)))
  }

  test("malformed PNG: truncated signature, wrong first chunk, bad color type all fail loudly") {
    val good = encode(10, 10, "png")
    val truncated = good.slice(0, 20)
    assert(intercept[IllegalArgumentException](ImageHeader.parse(truncated))
      .getMessage.contains("PNG"))
    // flip the IHDR type bytes to a fake chunk name
    val wrongChunk = good.clone()
    wrongChunk(12) = 'X'.toByte
    assert(intercept[IllegalArgumentException](ImageHeader.parse(wrongChunk))
      .getMessage.contains("not IHDR"))
    val badColor = good.clone()
    badColor(25) = 9.toByte // no such color type
    assert(intercept[IllegalArgumentException](ImageHeader.parse(badColor))
      .getMessage.contains("color type"))
  }

  test("malformed JPEG: missing frame header, truncated segment, garbage signature fail loudly") {
    // SOI + APP0-with-length that claims more bytes than exist
    val truncSeg = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x40, 0x01).map(_.toByte)
    assert(intercept[IllegalArgumentException](ImageHeader.parse(truncSeg))
      .getMessage.contains("truncated"))
    // SOI directly followed by EOI: no frame header anywhere
    val noSof = Array(0xff, 0xd8, 0xff, 0xd9, 0x00, 0x00).map(_.toByte)
    assert(intercept[IllegalArgumentException](ImageHeader.parse(noSof))
      .getMessage.contains("frame header"))
    // neither PNG nor JPEG magic
    assert(intercept[IllegalArgumentException](
      ImageHeader.parse("plainly not an image".getBytes("US-ASCII")))
      .getMessage.contains("signature"))
    // empty payload
    assert(intercept[IllegalArgumentException](ImageHeader.parse(Array.emptyByteArray))
      .getMessage.contains("short"))
  }
}
