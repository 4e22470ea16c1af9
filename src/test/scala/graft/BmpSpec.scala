package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bmp

/** The m1 multimodal decode is a REAL container parse: build() emits
  * bit-exact 24bpp BMPs and decode() must recover the header fields from the
  * bytes alone — including on hand-crafted blobs build() never produced.
  */
class BmpSpec extends AnyFunSuite {

  test("build/decode round-trip across sizes, incl. row-padding widths") {
    for (w <- Seq(1, 2, 3, 4, 5, 63, 64); h <- Seq(1, 2, 7, 64)) {
      val bytes = Bmp.build(w, h, seed = w * 1000L + h)
      val m = Bmp.decode(bytes)
      assert(m.width == w && m.height == h && m.bpp == 24)
      assert(m.fileSize == bytes.length)
      // row padding: pixel array is rowSize*height, rowSize 4-aligned
      val rowSize = ((3 * w + 3) / 4) * 4
      assert(bytes.length == 54 + rowSize * h)
    }
  }

  test("decode parses a foreign-built BMP header (not just our builder)") {
    // hand-rolled 2x1 24bpp BMP, little-endian fields
    val rowSize = 8 // 2 px * 3 B = 6, padded to 8
    val total = 54 + rowSize
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(total).putInt(0).putInt(54)
    b.putInt(40).putInt(2).putInt(1).putShort(1).putShort(24)
    b.putInt(0).putInt(rowSize).putInt(0).putInt(0).putInt(0).putInt(0)
    b.put(Array[Byte](1, 2, 3, 4, 5, 6, 0, 0))
    val m = Bmp.decode(b.array())
    assert(m == Bmp.Meta(2, 1, 24, total))
  }

  test("decode rejects non-BMP payloads loudly") {
    intercept[IllegalArgumentException](Bmp.decode("not an image".getBytes))
    intercept[IllegalArgumentException](Bmp.decode(Array.emptyByteArray))
  }

  test("deterministic: same (w, h, seed) gives identical bytes") {
    assert(Bmp.build(5, 4, 42L).sameElements(Bmp.build(5, 4, 42L)))
    assert(!Bmp.build(5, 4, 42L).sameElements(Bmp.build(5, 4, 43L)))
  }
}
