package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM RIFF/WAVE codec for the multimodal plumbing (m2): like
  * [[Bmp]] for m1, the offline classpath has no audio libraries, but the
  * RIFF container is simple enough to encode/decode from first principles —
  * so the m2 frame-sampling step decodes a REAL format (chunk walk → fmt →
  * data) and reads actual PCM sample values, not synthetic windows.
  * Canonical layout: "RIFF" + size + "WAVE", a 16-byte PCM "fmt " chunk,
  * an optional "LIST"/INFO metadata chunk (odd-length bodies padded per the
  * RIFF spec — decoders must walk chunks, not assume fixed offsets), and
  * the "data" chunk with 16-bit little-endian PCM.
  */
object Wav {

  /** Deterministic PCM sample by LINEAR index (frame * channels + channel)
    * — kept SQL-expressible on purpose so the m2 oracle recomputes the
    * DECODED sample values closed-form:
    * `((doc*2654435761 + i*40503) % 65536) - 32768`.
    */
  def pcmAt(docId: Long, linearIdx: Long): Int =
    (((docId * 2654435761L + linearIdx * 40503L) % 65536L) - 32768L).toInt

  /** Header + deterministic PCM payload. Real audio would arrive as-is;
    * only the sample CONTENT here is synthetic, the container is bit-exact
    * RIFF/WAVE. `withInfo` inserts a LIST/INFO chunk between fmt and data
    * so half the corpus exercises the chunk walk.
    */
  def build(docId: Long, sampleRate: Int, channels: Int, nFrames: Int,
      withInfo: Boolean): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames > 0)
    val bits = 16
    val blockAlign = channels * bits / 8
    val dataSize = nFrames * blockAlign
    val info =
      if (!withInfo) Array.emptyByteArray
      else {
        // LIST size + "INFO" + INAM subchunk; odd text length forces the
        // RIFF pad byte (the detail naive fixed-offset decoders miss)
        val txt = s"doc $docId".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        val pad = txt.length & 1
        val body = 4 + 8 + txt.length + pad
        val b = ByteBuffer.allocate(8 + body).order(ByteOrder.LITTLE_ENDIAN)
        b.put("LIST".getBytes, 0, 4).putInt(body)
        b.put("INFO".getBytes, 0, 4)
        b.put("INAM".getBytes, 0, 4).putInt(txt.length).put(txt)
        if (pad == 1) b.put(0.toByte)
        b.array()
      }
    val total = 12 + 24 + info.length + 8 + dataSize
    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes, 0, 4).putInt(total - 8).put("WAVE".getBytes, 0, 4)
    b.put("fmt ".getBytes, 0, 4).putInt(16)
    b.putShort(1) // PCM
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt(sampleRate * blockAlign) // byte rate
    b.putShort(blockAlign.toShort)
    b.putShort(bits.toShort)
    b.put(info)
    b.put("data".getBytes, 0, 4).putInt(dataSize)
    var i = 0L
    val nSamples = nFrames.toLong * channels
    while (i < nSamples) {
      b.putShort(pcmAt(docId, i).toShort)
      i += 1
    }
    b.array()
  }

  final case class Meta(sampleRate: Int, channels: Int, bits: Int,
      nFrames: Int, dataOffset: Int)

  /** Real decode: verify the RIFF/WAVE signature and WALK the chunk list
    * (sizes + pad bytes) to the fmt and data chunks. Throws on a non-WAV
    * payload (callers route unknown formats elsewhere).
    */
  def decode(bytes: Array[Byte]): Meta = {
    require(bytes.length >= 44 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      s"not a WAV blob (${bytes.length} bytes)")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var sampleRate = -1; var channels = -1; var bits = -1; var blockAlign = -1
    var dataOffset = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (dataOffset < 0 || sampleRate < 0)) {
      val id = new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = b.getInt(pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"corrupt RIFF chunk '$id' at $pos (size=$size)")
      if (id == "fmt ") {
        require(b.getShort(pos + 8) == 1, "not PCM")
        channels = b.getShort(pos + 10).toInt
        sampleRate = b.getInt(pos + 12)
        blockAlign = b.getShort(pos + 20).toInt
        bits = b.getShort(pos + 22).toInt
      } else if (id == "data") {
        dataOffset = pos + 8
        dataLen = size
      }
      pos += 8 + size + (size & 1) // chunk bodies are word-aligned
    }
    require(sampleRate > 0 && dataOffset >= 0, "missing fmt or data chunk")
    Meta(sampleRate, channels, bits, dataLen / blockAlign, dataOffset)
  }

  /** Read one decoded PCM sample (16-bit LE) — frame `frame`, channel `ch`. */
  def sample(bytes: Array[Byte], m: Meta, frame: Int, ch: Int): Int =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      .getShort(m.dataOffset + (frame * m.channels + ch) * 2).toInt
}
