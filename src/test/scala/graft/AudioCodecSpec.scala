package graft

import graft.functions.AudioCodec
import org.scalatest.funsuite.AnyFunSuite

/** AudioCodec contracts: the chunk-walking WAV parser must agree with the
  * JDK's own `javax.sound.sampled` reader on streams the JDK accepts, and
  * must refuse garbage without throwing (the ImageCodecSpec pattern).
  */
class AudioCodecSpec extends AnyFunSuite {

  private val cases = Seq(
    (8000, 1, 8, 1),      // odd data length → pad byte
    (16000, 2, 16, 500),
    (22050, 1, 16, 2000),
    (44100, 2, 8, 441),
    (48000, 2, 16, 48000) // one second of stereo 16-bit
  )

  test("parse recovers exactly what wavBytes encoded, incl. the pad rule") {
    for ((rate, ch, bits, n) <- cases) {
      val bytes = AudioCodec.wavBytes(rate, ch, bits, n, seed = 7)
      val dataLen = n * ch * (bits / 8)
      assert(bytes.length == 44 + dataLen + dataLen % 2)
      val m = AudioCodec.parse(bytes).get
      assert(m == AudioCodec.AudioMeta(rate, ch, bits, n, n * 1000L / rate))
    }
  }

  test("parse agrees with the JDK's own WAV reader") {
    for ((rate, ch, bits, n) <- cases) {
      val bytes = AudioCodec.wavBytes(rate, ch, bits, n)
      val fmt = javax.sound.sampled.AudioSystem
        .getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
      val af = fmt.getFormat
      assert(af.getSampleRate.toInt == rate)
      assert(af.getChannels == ch)
      assert(af.getSampleSizeInBits == bits)
      assert(fmt.getFrameLength == n)
    }
  }

  test("parse survives a LIST chunk between fmt and data") {
    val base = AudioCodec.wavBytes(16000, 1, 16, 10)
    // splice an 11-byte LIST chunk (odd → padded to 12) after fmt
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](11, 0, 0, 0) ++ Array.fill[Byte](11)('x') ++ Array[Byte](0)
    val spliced = base.slice(0, 36) ++ list ++ base.drop(36)
    // fix the RIFF size field
    val total = spliced.length - 8
    for (j <- 0 until 4) spliced(4 + j) = ((total >> (8 * j)) & 0xFF).toByte
    val m = AudioCodec.parse(spliced).get
    assert(m.sampleRate == 16000 && m.nSamples == 10L)
  }

  test("parse refuses garbage, truncation and non-PCM without throwing") {
    assert(AudioCodec.parse(null).isEmpty)
    assert(AudioCodec.parse(Array.emptyByteArray).isEmpty)
    assert(AudioCodec.parse("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(AudioCodec.parse(Array.fill[Byte](64)(0x41)).isEmpty)
    val ok = AudioCodec.wavBytes(8000, 1, 16, 100)
    assert(AudioCodec.parse(ok.slice(0, 50)).isEmpty) // data chunk truncated
    val nonPcm = ok.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    assert(AudioCodec.parse(nonPcm).isEmpty)
    // a PNG is not a WAV
    assert(AudioCodec.parse(graft.functions.ImageCodec.pngBytes(4, 4, 0)).isEmpty)
  }

  test("energyFingerprint: independent bit-formula recount on crafted samples") {
    // header from the synth, data replaced with chosen samples → full
    // control of the energy grid; n = 64 makes slice(k) = k exactly
    val n = 64
    val wav = AudioCodec.wavBytes(8000, 1, 16, n, seed = 0)
    val samples = Array.tabulate(n)(k => (k * 37) % 200 - 100) // signed, mixed
    for (k <- 0 until n) {
      val v = samples(k) & 0xFFFF
      wav(44 + 2 * k) = (v & 0xFF).toByte
      wav(44 + 2 * k + 1) = ((v >> 8) & 0xFF).toByte
    }
    // independent reference: per-slice energies then the Philips bits
    val e = samples.map(s => math.abs(s).toLong) // slice(k) = k at n = 64
    var ref = 0L
    for (i <- 0 until 45) {
      val f = i / 3 + 1; val b = i % 3
      val d = (e(f * 4 + b) - e(f * 4 + b + 1)) -
        (e((f - 1) * 4 + b) - e((f - 1) * 4 + b + 1))
      if (d > 0) ref |= 1L << i
    }
    assert(AudioCodec.energyFingerprint(wav).contains(ref))
    // identical audio → identical fingerprint (hamming 0 is the exact-dup case)
    val wav2 = wav.clone()
    assert(AudioCodec.energyFingerprint(wav2) == AudioCodec.energyFingerprint(wav))
  }

  test("pigeonhole recall: any fingerprint pair at hamming <= 2 shares a 15-bit segment") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val fp = rnd.nextLong() & ((1L << 45) - 1)
      val flips = rnd.nextInt(3) // 0, 1 or 2 bit flips
      var other = fp
      for (_ <- 0 until flips) other ^= 1L << rnd.nextInt(45)
      val segs = (f: Long) => Seq(f & 32767L, (f >> 15) & 32767L, (f >> 30) & 32767L)
      assert(segs(fp).zip(segs(other)).exists { case (a, b) => a == b },
        f"hamming<=2 pair lost by banding: $fp%x vs $other%x")
    }
  }
}
