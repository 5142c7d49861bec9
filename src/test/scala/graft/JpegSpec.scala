package graft

import graft.operators.Jpeg
import graft.operators.Jpeg.GrayImage
import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec properties. Two exactness regimes, by design:
  * block-constant images round-trip BIT-exact (only integer DC
  * coefficients survive the FDCT, and the all-ones quant table keeps
  * them exact — the q55e oracle contract), while arbitrary images are
  * bounded by FDCT coefficient rounding — up to 64 coefficients each
  * rounded by ≤0.5 can stack to ~±2/sample at quant 1 (isolated spikes
  * hit it; dense noise and smooth ramps stay within ±1) — the honest
  * limit of a lossy codec.
  */
class JpegSpec extends AnyFunSuite {

  private def blockFlat(w: Int, h: Int, seed: Long): GrayImage =
    GrayImage(w, h, Array.tabulate(w * h) { i =>
      val x = i % w
      val y = i / w
      ((seed * 7 + (x / 8) * 3 + (y / 8) * 5) % 256).toInt
    })

  test("block-constant images round-trip bit-exact (DC-only path)") {
    for (seed <- 0L until 40L) {
      val w = (10 + seed % 9).toInt
      val h = (9 + seed % 7).toInt
      val img = blockFlat(w, h, seed)
      val back = Jpeg.decode(Jpeg.encode(img))
      assert(back.width == w && back.height == h)
      assert(back.pixels.sameElements(img.pixels),
        s"seed $seed ${w}x$h: lossy round trip on a DC-only image")
    }
    // single-block and exact-multiple dims too
    for ((w, h) <- Seq((8, 8), (1, 1), (8, 1), (1, 8), (16, 24), (7, 7))) {
      val img = blockFlat(w, h, 3L)
      assert(Jpeg.decode(Jpeg.encode(img)).pixels.sameElements(img.pixels),
        s"${w}x$h")
    }
  }

  test("arbitrary images round-trip within ±1 per sample (AC paths)") {
    val rnd = new scala.util.Random(55)
    for (trial <- 0 until 30) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      // dense noise: many nonzero ACs, every size category
      val img = GrayImage(w, h, Array.fill(w * h)(rnd.nextInt(256)))
      val back = Jpeg.decode(Jpeg.encode(img))
      assert(back.width == w && back.height == h)
      val maxErr = img.pixels.zip(back.pixels).map {
        case (a, b) => math.abs(a - b)
      }.max
      assert(maxErr <= 1, s"trial $trial ${w}x$h: max error $maxErr")
    }
  }

  test("sparse spike images exercise long zero runs (ZRL) and still bound error") {
    val rnd = new scala.util.Random(56)
    for (_ <- 0 until 20) {
      val w = 8 + rnd.nextInt(32)
      val h = 8 + rnd.nextInt(32)
      val px = Array.fill(w * h)(128)
      // a few isolated spikes — the encoded blocks get high-frequency ACs
      // separated by >15 zeros, forcing ZRL symbols
      for (_ <- 0 until 5) px(rnd.nextInt(w * h)) = rnd.nextInt(256)
      val img = GrayImage(w, h, px)
      val back = Jpeg.decode(Jpeg.encode(img))
      val maxErr = img.pixels.zip(back.pixels).map {
        case (a, b) => math.abs(a - b)
      }.max
      // a lone spike spreads across all 64 coefficients, so rounding can
      // stack to ±2 — the worst case of the quant-1 error model
      assert(maxErr <= 2, s"${w}x$h: max error $maxErr")
    }
  }

  test("gradients (every DC diff sign, byte-stuffing-prone streams) round-trip") {
    // smooth ramps give strongly correlated DC predictions in both
    // directions; entropy bytes frequently hit 0xFF so the stuffing and
    // un-stuffing paths are exercised
    for ((w, h) <- Seq((64, 16), (16, 64), (33, 9))) {
      val img = GrayImage(w, h, Array.tabulate(w * h) { i =>
        ((i % w) * 255 / math.max(1, w - 1) +
          (i / w) * 255 / math.max(1, h - 1)) / 2
      })
      val back = Jpeg.decode(Jpeg.encode(img))
      val maxErr = img.pixels.zip(back.pixels).map {
        case (a, b) => math.abs(a - b)
      }.max
      assert(maxErr <= 1, s"${w}x$h gradient: max error $maxErr")
    }
  }

  test("malformed payloads fail loudly, never misparse") {
    val good = Jpeg.encode(blockFlat(16, 16, 1L))
    intercept[IllegalArgumentException](Jpeg.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](Jpeg.decode(good.take(20))) // truncated markers
    // flip the quant-table id the scan references to an undefined one:
    // the encoder writes exactly one DQT (FF DB len len Pq|Tq ...) with
    // Tq=0; setting Tq=1 leaves table 0 — which SOF0 references — undefined
    val dqt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xdb).get
    val badTq = good.clone()
    badTq(dqt + 4) = 0x01
    val e = intercept[IllegalArgumentException](Jpeg.decode(badTq))
    assert(e.getMessage.contains("undefined quant table"))
    // truncating inside the entropy stream must not return a plausible image
    intercept[Exception](Jpeg.decode(good.dropRight(good.length / 3)))
  }
}
