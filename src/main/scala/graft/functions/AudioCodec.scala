package graft.functions

/** Pure-JVM RIFF/WAVE container parsing — REAL header decode, zero
  * external deps: the audio sibling of [[ImageCodec]]. `parse` walks the
  * chunk list (not fixed offsets — real files carry LIST/fact chunks),
  * reads the PCM `fmt ` block and sizes the `data` chunk, honoring the
  * RIFF odd-length pad rule. It never inflates samples: at 100 TB the
  * audio-profile pass reads ~44 header bytes per object and stays
  * I/O-bound, exactly like the image metadata pass (m01/m03).
  *
  * Reference behavior class: multimodal metadata extraction before heavy
  * decode. Full sample decode (when a build needs it) drops into the same
  * seam via `javax.sound.sampled.AudioSystem` — the spec proves `parse`
  * agrees with the JDK's own WAV reader.
  *
  * `wavBytes` emits a minimal VALID stream (real RIFF sizes, real PCM
  * fmt block, pad byte on odd data length) — the fixture-synthesis side
  * used by m04 to exercise the parser against byte streams the oracle can
  * size exactly.
  */
object AudioCodec {

  /** @param nSamples per-channel sample frames in the data chunk */
  final case class AudioMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, nSamples: Long, durationMs: Long)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  /** Chunk-walking WAV header parse. Returns None on null/short/non-RIFF/
    * non-PCM/structurally-broken input — never throws (the
    * AdversarialInputSpec discipline). */
  def parse(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    var i = 12
    var rate = 0; var channels = 0; var bits = 0; var dataLen = -1L
    while (i + 8 <= bytes.length && (rate == 0 || dataLen < 0)) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val len = le32(bytes, i + 4)
      if (len < 0 || i + 8 + len > bytes.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        val audioFormat = le16(bytes, i + 8)
        if (audioFormat != 1) return None // PCM only in the header path
        channels = le16(bytes, i + 10)
        rate = le32(bytes, i + 12).toInt
        bits = le16(bytes, i + 22)
        if (rate <= 0 || channels <= 0 || bits <= 0 || bits % 8 != 0) return None
      } else if (id == "data") {
        dataLen = len
      }
      i += 8 + len.toInt + (len % 2).toInt // RIFF pads odd chunks by one byte
    }
    if (rate == 0 || dataLen < 0) return None
    val blockAlign = channels * (bits / 8)
    if (blockAlign == 0 || dataLen % blockAlign != 0) return None
    val nSamples = dataLen / blockAlign
    Some(AudioMeta(rate, channels, bits, nSamples, nSamples * 1000L / rate))
  }

  /** REAL 16-bit PCM sample decode: walks the chunk list to the `data`
    * chunk and reads little-endian signed int16 samples (channel-
    * interleaved, returned as one stream — energy/VAD profiling doesn't
    * separate channels). None for non-PCM/non-16-bit/malformed input —
    * never throws. This is the content-level decode seam next to
    * [[parse]]'s header-only path: header pass for corpus profiling,
    * sample pass only for rows that survive the profile filters. */
  def pcmSamples16(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    var i = 12
    var ok = false; var dataOff = -1; var dataLen = -1L
    while (i + 8 <= bytes.length && (!ok || dataOff < 0)) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val len = le32(bytes, i + 4)
      if (len < 0 || i + 8 + len > bytes.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        ok = le16(bytes, i + 8) == 1 && le16(bytes, i + 22) == 16
      } else if (id == "data") { dataOff = i + 8; dataLen = len }
      i += 8 + len.toInt + (len % 2).toInt
    }
    if (!ok || dataOff < 0 || dataLen % 2 != 0) return None
    val n = (dataLen / 2).toInt
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      val v = le16(bytes, dataOff + 2 * k)
      out(k) = if (v >= 32768) v - 65536 else v
      k += 1
    }
    Some(out)
  }

  /** Minimal valid PCM WAV: 12-byte RIFF header, 24-byte fmt chunk,
    * 8-byte data chunk header + payload (+ pad byte when odd). Sample
    * bytes are a deterministic ramp keyed by `seed` so equal params give
    * byte-identical streams. */
  /** Haitsma–Kalker-style energy-difference fingerprint (Philips 2002):
    * 45 bits over a 16-frame × 4-band |PCM| energy grid — bit(f,b) = 1
    * iff (E(f,b)−E(f,b+1)) − (E(f−1,b)−E(f−1,b+1)) > 0, the double
    * difference that makes the code robust to global gain and slow
    * energy drift. Bands here are TIME slices (slice(k) = ⌊k·64/n⌋ —
    * a per-SAMPLE assignment, so engine and oracle can never disagree
    * on boundary samples), not FFT sub-bands: the container has no FFT,
    * and the bit algebra — the part the dedupe join consumes — is the
    * real Philips scheme. Integer-exact end to end. None for
    * unparseable/empty audio. */
  def energyFingerprint(bytes: Array[Byte]): Option[Long] =
    pcmSamples16(bytes).filter(_.nonEmpty).map { smp =>
      val n = smp.length
      val e = new Array[Long](64)
      var k = 0
      while (k < n) {
        e(((k.toLong * 64) / n).toInt) += math.abs(smp(k))
        k += 1
      }
      var fp = 0L
      var i = 0
      while (i < 45) {
        val f = i / 3 + 1; val b = i % 3
        val d = (e(f * 4 + b) - e(f * 4 + b + 1)) -
          (e((f - 1) * 4 + b) - e((f - 1) * 4 + b + 1))
        if (d > 0) fp |= 1L << i
        i += 1
      }
      fp
    }

  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Int, seed: Int = 0): Array[Byte] = {
    val blockAlign = channels * (bitsPerSample / 8)
    val dataLen = nSamples * blockAlign
    val pad = dataLen % 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen + pad)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = { var j = 0; while (j < 4) { out.write(((v >> (8 * j)) & 0xFF).toInt); j += 1 } }
    out.write("RIFF".getBytes("US-ASCII")); w32(36L + dataLen + pad)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16L)
    w16(1); w16(channels); w32(sampleRate.toLong)
    w32(sampleRate.toLong * blockAlign); w16(blockAlign); w16(bitsPerSample)
    out.write("data".getBytes("US-ASCII")); w32(dataLen.toLong)
    var j = 0
    while (j < dataLen) { out.write((seed + j) & 0xFF); j += 1 }
    if (pad == 1) out.write(0)
    out.toByteArray
  }
}
