package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Wav

/** The m2 multimodal decode is a REAL container parse: build() emits
  * bit-exact RIFF/WAVE blobs (PCM16, optional LIST/INFO metadata chunk with
  * the RIFF pad byte) and decode() must recover the format by WALKING the
  * chunk list — including on hand-crafted blobs build() never produced.
  */
class WavSpec extends AnyFunSuite {

  test("build/decode round-trip across rates/channels/frames, both layouts") {
    for (rate <- Seq(8000, 16000, 44100); ch <- Seq(1, 2);
         n <- Seq(1, 64, 255); info <- Seq(false, true)) {
      val bytes = Wav.build(docId = rate + n, rate, ch, n, withInfo = info)
      val m = Wav.decode(bytes)
      assert(m.sampleRate == rate && m.channels == ch && m.bits == 16 &&
        m.nFrames == n)
      // RIFF size field covers everything after the first 8 bytes
      val riffSize = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(4)
      assert(riffSize == bytes.length - 8)
    }
  }

  test("decoded samples match the closed-form generator at every frame") {
    val doc = 1234L
    val bytes = Wav.build(doc, 16000, 2, 100, withInfo = true)
    val m = Wav.decode(bytes)
    for (f <- 0 until 100; c <- 0 until 2)
      assert(Wav.sample(bytes, m, f, c) == Wav.pcmAt(doc, f.toLong * 2 + c))
  }

  test("chunk walk: decode skips an unknown odd-sized chunk with pad byte") {
    // hand-rolled WAV with a foreign "junk" chunk (odd body -> pad) between
    // fmt and data — a fixed-offset decoder would misread this
    val pcm = Array[Byte](0x34, 0x12) // one mono frame, value 0x1234
    val junk = Array[Byte](7, 7, 7) // odd length
    val total = 12 + 24 + (8 + junk.length + 1) + 8 + pcm.length
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes, 0, 4).putInt(total - 8).put("WAVE".getBytes, 0, 4)
    b.put("fmt ".getBytes, 0, 4).putInt(16)
    b.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("junk".getBytes, 0, 4).putInt(junk.length).put(junk).put(0.toByte)
    b.put("data".getBytes, 0, 4).putInt(pcm.length).put(pcm)
    val m = Wav.decode(b.array())
    assert(m.sampleRate == 8000 && m.channels == 1 && m.nFrames == 1)
    assert(Wav.sample(b.array(), m, 0, 0) == 0x1234)
  }

  test("decode rejects non-WAV payloads loudly") {
    intercept[IllegalArgumentException](Wav.decode("not audio at all".getBytes))
    intercept[IllegalArgumentException](Wav.decode(Array.emptyByteArray))
    // RIFF signature but truncated data chunk
    val bad = Wav.build(1L, 8000, 1, 4, withInfo = false).dropRight(3)
    intercept[IllegalArgumentException](Wav.decode(bad))
  }

  test("deterministic: same inputs give identical bytes") {
    assert(Wav.build(7L, 8000, 1, 10, withInfo = true)
      .sameElements(Wav.build(7L, 8000, 1, 10, withInfo = true)))
    assert(!Wav.build(7L, 8000, 1, 10, withInfo = true)
      .sameElements(Wav.build(8L, 8000, 1, 10, withInfo = true)))
  }
}
