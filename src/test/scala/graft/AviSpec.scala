package graft

import graft.operators.{Avi, Jpeg}
import graft.operators.Jpeg.GrayImage
import org.scalatest.funsuite.AnyFunSuite

/** AVI container codec properties: the container round trip is BYTE-exact
  * (the payload is opaque to the chunk walk), headers carry the declared
  * geometry, word alignment holds for odd-length frames, sampling keeps
  * exactly the every-k-th indices without touching the others, and the
  * declared-vs-carried frame-count guard refuses a truncated movi list.
  */
class AviSpec extends AnyFunSuite {

  private def frame(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((seed * 31 + i * 7) % 251).toByte)

  test("container round-trip is byte-exact, headers carried") {
    val frames = (0 until 5).map(f => frame(100 + f, f)) // mixed odd/even sizes
    val bytes = Avi.encode(64, 48, 40000, frames)
    val v = Avi.decode(bytes)
    assert(v.width == 64 && v.height == 48 && v.usecPerFrame == 40000)
    assert(v.frames.length == 5)
    frames.zip(v.frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "frame payload changed in transit")
    }
  }

  test("odd-length frames are word-aligned without corrupting successors") {
    val frames = Seq(frame(33, 1), frame(34, 2), frame(35, 3))
    val v = Avi.decode(Avi.encode(8, 8, 1000, frames))
    assert(v.frames.map(_.length) == Vector(33, 34, 35))
    frames.zip(v.frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("sampleFrames keeps exactly the every-k-th indices") {
    val frames = (0 until 7).map(f => frame(20, f))
    val v = Avi.decode(Avi.encode(8, 8, 1000, frames))
    assert(Avi.sampleFrames(v, 2).map(_._1) == Vector(0, 2, 4, 6))
    assert(Avi.sampleFrames(v, 3).map(_._1) == Vector(0, 3, 6))
    assert(Avi.sampleFrames(v, 1).map(_._1) == (0 until 7).toVector)
    Avi.sampleFrames(v, 2).foreach { case (i, f) =>
      assert(java.util.Arrays.equals(f, frames(i)))
    }
  }

  test("declared-vs-carried frame mismatch and non-AVI input are refused") {
    val good = Avi.encode(8, 8, 1000, Seq(frame(20, 1), frame(20, 2)))
    // chop the last movi chunk + idx1 off: header still declares 2 frames
    val truncated = java.util.Arrays.copyOfRange(good, 0, good.length - (16 * 2 + 8) - 28)
    // fix the RIFF size so the walk itself stays in bounds
    val sz = truncated.length - 8
    truncated(4) = (sz & 0xff).toByte
    truncated(5) = ((sz >> 8) & 0xff).toByte
    truncated(6) = ((sz >> 16) & 0xff).toByte
    truncated(7) = ((sz >> 24) & 0xff).toByte
    intercept[IllegalArgumentException](Avi.decode(truncated))
    intercept[IllegalArgumentException](Avi.decode("not a riff".getBytes))
  }

  test("malformed geometry fails with require messages, never an index error") {
    val good = Avi.encode(8, 8, 1000, Seq(frame(20, 1), frame(20, 2)))
    // declared RIFF size far past the data (including near-2^31 values
    // that would wrap Int arithmetic): the walk clamps to the buffer, so
    // complete content still decodes and truncated content fails inside
    // a require — never ArrayIndexOutOfBounds either way
    for (sz <- Seq(good.length + 1000, Int.MaxValue - 4)) {
      val big = good.clone()
      big(4) = (sz & 0xff).toByte
      big(5) = ((sz >> 8) & 0xff).toByte
      big(6) = ((sz >> 16) & 0xff).toByte
      big(7) = ((sz >> 24) & 0xff).toByte
      assert(Avi.decode(big).frames.length == 2, "clamped walk must still decode")
      val cut = java.util.Arrays.copyOfRange(big, 0, big.length - 10)
      val err = intercept[IllegalArgumentException](Avi.decode(cut))
      assert(err.getMessage.contains("overruns") || err.getMessage.contains("declares"),
        err.getMessage)
    }
    // a short avih chunk must be refused, not read into its neighbors
    val idx = {
      def cc(p: Int) = new String(good.slice(p, p + 4), "ISO-8859-1")
      (0 until good.length - 4).find(cc(_) == "avih").get
    }
    val short = good.clone()
    short(idx + 4) = 16 // declared avih size < the 40 the header needs
    short(idx + 5) = 0; short(idx + 6) = 0; short(idx + 7) = 0
    val e = intercept[IllegalArgumentException](Avi.decode(short))
    assert(e.getMessage.contains("avih"), e.getMessage)
  }

  test("audio track round-trips sample-exact alongside the frames") {
    val frames = (0 until 3).map(f => frame(40 + f, f))
    val samples = Array.tabulate(97)(k => ((k * 131 - 6000) % 32768).toShort)
    val bytes = Avi.encode(16, 12, 40000, frames, audio = Some((16000, samples)))
    val v = Avi.decode(bytes)
    assert(v.width == 16 && v.height == 12 && v.frames.length == 3)
    frames.zip(v.frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "frame payload changed in transit")
    }
    assert(v.audioRate == 16000)
    assert(java.util.Arrays.equals(v.audio, samples), "PCM changed in transit")
    // video-only output is unchanged by the audio extension (q55f's pin)
    val vOnly = Avi.decode(Avi.encode(16, 12, 40000, frames))
    assert(vOnly.audioRate == 0 && vOnly.audio.isEmpty)
    // and the video-only byte layout itself is identical to before
    assert(java.util.Arrays.equals(
      Avi.encode(16, 12, 40000, frames),
      Avi.encode(16, 12, 40000, frames, audio = None)))
  }

  test("MJPEG end-to-end: sampled frames decode to their generating formula") {
    val (w, h) = (16, 10)
    def lum(f: Int)(x: Int, y: Int): Int =
      (7 + f * 11 + (x / 8) * 3 + (y / 8) * 5) % 256
    val frames = (0 until 4).map { f =>
      Jpeg.encode(GrayImage(w, h,
        Array.tabulate(w * h)(i => lum(f)(i % w, i / w))))
    }
    val v = Avi.decode(Avi.encode(w, h, 40000, frames))
    Avi.sampleFrames(v, 2).foreach { case (f, jb) =>
      val img = Jpeg.decode(jb)
      assert(img.width == w && img.height == h)
      img.pixels.zipWithIndex.foreach { case (p, i) =>
        assert(p == lum(f)(i % w, i / w),
          s"frame $f pixel $i: $p != ${lum(f)(i % w, i / w)}")
      }
    }
  }
}
