package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** REAL audio codec for PCM WAV: RIFF/WAVE container parse + 16-bit PCM
  * sample decode, pure JVM (a WAV file is a 12-byte RIFF header plus
  * word-aligned `<id><size><body>` chunks; PCM needs no entropy
  * decoding, so full decode is achievable without any codec library —
  * the audio analogue of [[ImageCodec]]'s `javax.imageio` path).
  * Compressed audio (MP3/AAC) and video stay on [[Multimodal.StubCodec]].
  *
  * The chunk walk is defensive by design: media payloads at corpus
  * scale are untrusted bytes, so every size field is bounds-checked
  * against the buffer and malformed input yields `None` (caller falls
  * back to the stub), never an exception from a decode stage that
  * would fail a 100 TB job on one bad file.
  */
object WavCodec {

  /** Decoded facts: container metadata + the sample-level aggregate
    * (`sumAbs` = sum of |sample| over ALL channels) that proves the
    * PCM data was actually read, not just the header. `nFrames` is
    * per-channel sample count.
    */
  final case class WavInfo(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      nFrames: Int,
      sumAbs: Long)

  /** Canonical 44-byte-header PCM16 WAV: RIFF + 16-byte fmt + data.
    * `samples` are channel-interleaved frames.
    */
  def encodePcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "sampleRate and channels must be positive")
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII))
    bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII))
    bb.putInt(16) // PCM fmt chunk body size
    bb.putShort(1) // audio format: PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2) // byte rate
    bb.putShort((channels * 2).toShort) // block align
    bb.putShort(16) // bits per sample
    bb.put("data".getBytes(US_ASCII))
    bb.putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  private def chunkId(bytes: Array[Byte], pos: Int): String =
    new String(bytes, pos, 4, US_ASCII)

  /** Parse a PCM16 WAV; `None` on anything malformed, truncated, or
    * non-PCM16 (the stub-codec fallback contract).
    */
  def decode(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes.length < 12) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (chunkId(bytes, 0) != "RIFF" || chunkId(bytes, 8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var info: Option[WavInfo] = None
    while (pos + 8 <= bytes.length && info.isEmpty) {
      val id = chunkId(bytes, pos)
      val size = bb.getInt(pos + 4)
      val body = pos + 8
      // long arithmetic: a hostile size near Int.MaxValue overflows an
      // int sum and would slip past the bounds check
      if (size < 0 || body.toLong + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = bb.getShort(body) & 0xffff
          val channels = bb.getShort(body + 2) & 0xffff
          val rate = bb.getInt(body + 4)
          val bits = bb.getShort(body + 14) & 0xffff
          if (audioFormat != 1 || bits != 16 || channels < 1 || rate < 1) return None
          fmt = Some((channels, rate, bits))
        case "data" =>
          fmt match {
            case Some((channels, rate, bits)) =>
              val nSamples = size / 2
              var sum = 0L
              var k = 0
              while (k < nSamples) {
                sum += math.abs(bb.getShort(body + 2 * k).toLong)
                k += 1
              }
              info = Some(WavInfo(rate, channels, bits, nSamples / channels, sum))
            case None => return None // data before fmt: malformed
          }
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      pos = body + size + (size & 1) // chunks are word-aligned
    }
    info
  }
}
