package graft

import graft.functions.VideoCodec
import org.scalatest.funsuite.AnyFunSuite

/** VideoCodec contracts: the ISO-BMFF box walker must recover exactly what
  * mp4Bytes encoded (sizes, mvhd fields, trak count, mdat bytes), handle
  * the real-file box variants (64-bit largesize, size-0 tail box, mvhd v1,
  * unknown boxes), and refuse garbage without throwing (the
  * ImageCodec/AudioCodecSpec pattern).
  */
class VideoCodecSpec extends AnyFunSuite {

  private val cases = Seq(
    (600, 0L, 0, 0),            // zero-duration, trackless, empty mdat
    (1000, 12345L, 1, 100),
    (24000, 7L, 2, 1),
    (90000, 4503599627L, 3, 2999) // duration past 2^32 ticks would be v1; stays v0-range here
  )

  test("parse recovers exactly what mp4Bytes encoded, incl. the size formula") {
    for ((scale, dur, tracks, mdat) <- cases) {
      val bytes = VideoCodec.mp4Bytes(scale, dur % 4294967296L, tracks, mdat, seed = 7)
      assert(bytes.length == 140 + 100 * tracks + mdat)
      val m = VideoCodec.parse(bytes).get
      val d = dur % 4294967296L
      assert(m == VideoCodec.VideoMeta(scale, d, d * 1000L / scale, tracks, mdat.toLong, "isom"))
    }
  }

  test("parse handles a 64-bit largesize mdat box") {
    val base = VideoCodec.mp4Bytes(1000, 50L, 1, 16)
    // rewrite the trailing mdat (8 + 16 bytes) as size==1 + 64-bit largesize
    val mdatAt = base.length - 24
    val payload = base.takeRight(16)
    val big = new java.io.ByteArrayOutputStream()
    big.write(base, 0, mdatAt)
    big.write(Array[Byte](0, 0, 0, 1)) // size == 1 → largesize follows
    big.write("mdat".getBytes("US-ASCII"))
    val largesize = 16L + 16L
    for (s <- 56 to 0 by -8) big.write(((largesize >> s) & 0xFF).toInt)
    big.write(payload)
    val m = VideoCodec.parse(big.toByteArray).get
    assert(m.mdatBytes == 16L && m.timescale == 1000 && m.duration == 50L)
  }

  test("parse handles a size-0 (to-end-of-file) tail mdat box") {
    val base = VideoCodec.mp4Bytes(600, 10L, 0, 0)
    val tail = new java.io.ByteArrayOutputStream()
    tail.write(base)
    tail.write(Array[Byte](0, 0, 0, 0)) // size == 0 → extends to EOF
    tail.write("mdat".getBytes("US-ASCII"))
    tail.write(Array.fill[Byte](25)(0x5A))
    val m = VideoCodec.parse(tail.toByteArray).get
    assert(m.mdatBytes == 25L)
  }

  test("parse reads an mvhd version-1 (64-bit) layout") {
    // hand-build: ftyp + moov(mvhd v1) — v1 body: ver/flags, ctime(8),
    // mtime(8), timescale(4), duration(8)
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = for (s <- 24 to 0 by -8) out.write(((v >> s) & 0xFF).toInt)
    def w64(v: Long): Unit = for (s <- 56 to 0 by -8) out.write(((v >> s) & 0xFF).toInt)
    def tag(t: String): Unit = out.write(t.getBytes("US-ASCII"))
    w32(16); tag("ftyp"); tag("iso6"); w32(0)
    w32(8 + 8 + 32); tag("moov") // mvhd v1 body: ver/flags + 2×8 + 4 + 8 = 32
    w32(8 + 32); tag("mvhd")
    w32(0x01000000L) // version 1
    w64(0); w64(0) // ctime, mtime
    w32(90000) // timescale
    w64(8589934592L) // duration = 2^33 — needs 64 bits
    val m = VideoCodec.parse(out.toByteArray).get
    assert(m.timescale == 90000 && m.duration == 8589934592L && m.brand == "iso6")
    assert(m.durationMs == 8589934592L * 1000L / 90000L)
  }

  test("parse skips unknown top-level and moov-child boxes") {
    val base = VideoCodec.mp4Bytes(1000, 99L, 2, 8)
    // splice an unknown 'free' box between ftyp and moov
    val free = new java.io.ByteArrayOutputStream()
    free.write(Array[Byte](0, 0, 0, 12)); free.write("free".getBytes("US-ASCII"))
    free.write(Array.fill[Byte](4)(0x00))
    val spliced = base.slice(0, 16) ++ free.toByteArray ++ base.drop(16)
    val m = VideoCodec.parse(spliced).get
    assert(m.nTracks == 2 && m.duration == 99L && m.mdatBytes == 8L)
  }

  test("sample tables round-trip: frameCount reads back mp4BytesWithFrames") {
    // the real stts walk, against the generator's own arithmetic
    for (frames <- Seq(0, 1, 29, 96)) {
      val b = VideoCodec.mp4BytesWithFrames(1000, 2000L, nTracks = 1, nFrames = frames)
      assert(VideoCodec.frameCount(b) == Some(frames.toLong),
        s"frameCount mismatch at nFrames=$frames")
      // the sized formula the oracle relies on
      assert(b.length == 140 + 188 + frames, s"size formula broke at $frames")
      // the richer container still parses for metadata (mvhd intact)
      val m = VideoCodec.parse(b).get
      assert(m.timescale == 1000 && m.duration == 2000L && m.nTracks == 1)
    }
    // multi-track: counts sum across tracks
    val two = VideoCodec.mp4BytesWithFrames(1000, 50L, nTracks = 2, nFrames = 10)
    assert(VideoCodec.frameCount(two) == Some(20L))
    // containers WITHOUT sample tables report None (callers choose fallback)
    assert(VideoCodec.frameCount(VideoCodec.mp4Bytes(1000, 10L, 1, 64)).isEmpty)
    assert(VideoCodec.frameCount(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoCodec.frameCount(null).isEmpty)
  }

  test("frameCount survives seeded mutation/truncation fuzz") {
    val base = VideoCodec.mp4BytesWithFrames(1000, 2000L, 2, 17, frameSize = 3)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(6)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      VideoCodec.frameCount(m) // any Option is fine; must not throw
      VideoCodec.frameCount(m.take(rnd.nextInt(m.length + 1)))
      VideoCodec.parse(m)
    }
  }

  test("syncSampleIndices and frameGeometry survive the same mutation/truncation fuzz") {
    val base = VideoCodec.mp4BytesWithKeyframes(1000, 40L, 40, 3, gop = 4)
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 200) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(6)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      VideoCodec.syncSampleIndices(m) // must not throw
      VideoCodec.frameGeometry(m)
      VideoCodec.syncSampleIndices(m.take(rnd.nextInt(m.length + 1)))
    }
    assert(VideoCodec.syncSampleIndices(null).isEmpty)
    assert(VideoCodec.syncSampleIndices(Array[Byte](1, 2, 3)).isEmpty)
    // a plain-sample-table MP4 carries no stss
    assert(VideoCodec.syncSampleIndices(
      VideoCodec.mp4BytesWithFrames(1000, 10L, 1, 10)).isEmpty)
  }

  test("parse refuses garbage and truncation without throwing") {
    assert(VideoCodec.parse(null).isEmpty)
    assert(VideoCodec.parse(Array.emptyByteArray).isEmpty)
    assert(VideoCodec.parse(Array.fill[Byte](64)(0x41)).isEmpty)
    val ok = VideoCodec.mp4Bytes(1000, 10L, 1, 100)
    assert(VideoCodec.parse(ok.slice(0, 60)).isEmpty)   // cut inside moov
    assert(VideoCodec.parse(ok.slice(0, 140)).isEmpty)  // cut inside moov's traks
    assert(VideoCodec.parse(ok.slice(0, 236)).isEmpty)  // cut inside the mdat header
    val badSize = ok.clone(); badSize(0) = 0x7F // ftyp size overruns buffer
    assert(VideoCodec.parse(badSize).isEmpty)
    // a WAV is not an MP4
    assert(VideoCodec.parse(graft.functions.AudioCodec.wavBytes(8000, 1, 16, 4)).isEmpty)
    // a PNG is not an MP4
    assert(VideoCodec.parse(graft.functions.ImageCodec.pngBytes(4, 4, 0)).isEmpty)
  }
}
