package graft.operators

/** Baseline JPEG (JFIF) codec — grayscale, sequential DCT, 8-bit — written
  * from the PUBLIC ITU-T T.81 spec (Huffman tables: Annex K.3; zigzag,
  * DCT, entropy coding: §A.3, §F): closes the one multimodal decode stub
  * the PNG/BMP/WAV decoders left open. No image library: the bit reader
  * handles 0xFF00 byte-stuffing, Huffman tables are decoded FROM the
  * stream's DHT segments (not assumed), and the IDCT is the direct
  * separable cosine sum.
  *
  * Exactness contract (what the oracle leans on): with the all-ones
  * quantization table this encoder writes, an 8×8 block whose samples are
  * CONSTANT carries only its DC coefficient, which is integer-exact
  * through FDCT→quant→Huffman→dequant→IDCT — so decode(encode(x)) == x
  * bit-for-bit for block-constant images (q55e pins that cross-engine).
  * Arbitrary images round-trip within ±1/sample (FDCT coefficient
  * rounding; JpegSpec pins the bound and the AC/run-length/ZRL paths).
  */
object Jpeg {

  /** Decoded grayscale image: row-major 0..255 luminance. */
  final case class GrayImage(width: Int, height: Int, pixels: Array[Int])

  // zigzag scan: entropy position k lives at natural position ZigZag(k)
  // (T.81 Figure A.6)
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K.3.1: luminance DC table (BITS = code-length counts 1..16,
  // HUFFVAL = symbols in code order)
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity)

  // Annex K.3.2: luminance AC table
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman code assignment (T.81 §C.2): symbol -> (code, len). */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        table(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    table
  }

  /** Decode-side canonical table: per length, the first code value and the
    * index of its first symbol (T.81 §F.2.2.3's MINCODE/MAXCODE/VALPTR).
    */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = in.bit()
      var len = 1
      while (len <= 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | in.bit()
        len += 1
      }
      require(len <= 16, "jpeg: corrupt Huffman stream (no code within 16 bits)")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  private val cosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((a, b) => math.cos((2 * a + 1) * b * math.Pi / 16.0))
  private def cNorm(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Entropy-coded bit sink with 0xFF byte stuffing (T.81 §F.1.2.3). */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(value: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // stuff
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { put((1 << (8 - n)) - 1, 8 - n) } // pad 1s
  }

  /** Entropy-coded bit source: un-stuffs 0xFF00, refuses to read past a
    * marker (T.81 §F.2.2.5).
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        require(pos < bytes.length, "jpeg: entropy stream truncated")
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "jpeg: entropy stream truncated at 0xFF")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte
          else { // a real marker: the scan is over — behave as spec padding
            pos -= 1
            b = 0xff
            // do not consume; receive() past EOB is a stream bug and the
            // all-ones padding makes it fail the maxCode require loudly
          }
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  // T.81 §F.2.2.1: EXTEND — recover the signed value from its category bits
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def category(v: Int): Int = {
    val a = math.abs(v)
    var t = 0
    while ((a >> t) != 0) t += 1
    t
  }

  /** Encode 0..255 grayscale as baseline JFIF: SOI, APP0, all-ones DQT,
    * SOF0 (8-bit, one component, 1×1 sampling), Annex-K DHTs, SOS, entropy
    * data, EOI. Partial edge blocks are padded by edge replication.
    */
  def encode(img: GrayImage): Array[Byte] = {
    val w = img.width; val h = img.height
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535 &&
      img.pixels.length == w * h, s"jpeg: bad image ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0); u16(1); u16(1) // aspect-ratio units, 1:1
    out.write(0); out.write(0)   // no thumbnail
    marker(0xdb); u16(67); out.write(0x00) // DQT, 8-bit table 0
    (0 until 64).foreach(_ => out.write(1)) // all-ones: quant = identity
    marker(0xc0); u16(11) // SOF0
    out.write(8); u16(h); u16(w); out.write(1) // 8-bit, 1 component
    out.write(1); out.write(0x11); out.write(0) // id 1, 1x1 sampling, DQT 0
    def dht(tcTh: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); out.write(tcTh)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0x00, DcBits, DcVals)
    dht(0x10, AcBits, AcVals)
    marker(0xda); u16(8) // SOS
    out.write(1); out.write(1); out.write(0x00) // component 1, DC 0 / AC 0
    out.write(0); out.write(63); out.write(0)   // full spectral, no approx
    val dcTab = buildEncodeTable(DcBits, DcVals)
    val acTab = buildEncodeTable(AcBits, AcVals)
    val bw = new BitWriter(out)
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    val coef = new Array[Int](64)
    var pred = 0
    for (by <- 0 until blocksY; bx <- 0 until blocksX) {
      // FDCT over the level-shifted (±replicated-edge) block
      val s = Array.tabulate(8, 8) { (y, x) =>
        val sy = math.min(by * 8 + y, h - 1)
        val sx = math.min(bx * 8 + x, w - 1)
        img.pixels(sy * w + sx) - 128
      }
      var zz = 0
      while (zz < 64) {
        val u = ZigZag(zz) % 8
        val v = ZigZag(zz) / 8
        var sum = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { sum += s(y)(x) * cosT(x)(u) * cosT(y)(v); x += 1 }
          y += 1
        }
        coef(zz) = math.round(0.25 * cNorm(u) * cNorm(v) * sum).toInt
        zz += 1
      }
      // DC: category + diff bits
      val diff = coef(0) - pred
      pred = coef(0)
      val t = category(diff)
      val (dcCode, dcLen) = dcTab(t)
      bw.put(dcCode, dcLen)
      if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      // AC: (run, size) symbols with ZRL/EOB
      var run = 0
      var k = 1
      while (k < 64) {
        if (coef(k) == 0) run += 1
        else {
          while (run > 15) { // ZRL
            val (c, l) = acTab(0xf0); bw.put(c, l); run -= 16
          }
          val sz = category(coef(k))
          val (c, l) = acTab((run << 4) | sz)
          bw.put(c, l)
          bw.put(if (coef(k) < 0) coef(k) + (1 << sz) - 1 else coef(k), sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (c, l) = acTab(0x00); bw.put(c, l) } // EOB
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Decode baseline JFIF produced by any conforming encoder of this
    * profile (8-bit sequential, one component, no restart markers):
    * markers are walked, quant + Huffman tables are read FROM the stream,
    * blocks are entropy-decoded, dequantized, inverse-DCT'd, clamped, and
    * cropped to the SOF dimensions. Fails loudly on any unsupported
    * profile feature — a silent misparse would poison downstream features.
    */
  def decode(bytes: Array[Byte]): GrayImage = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "jpeg: missing SOI marker")
    var pos = 2
    def u16(at: Int): Int = ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
    var w = 0; var h = 0
    var quant: Array[Int] = null
    var dcDec: HuffDecoder = null
    var acDec: HuffDecoder = null
    var dcSel = 0; var acSel = 0
    val dcTables = new Array[HuffDecoder](4)
    val acTables = new Array[HuffDecoder](4)
    val quants = new Array[Array[Int]](4)
    var compQuant = 0
    var scanAt = -1
    while (scanAt < 0) {
      require(pos + 4 <= bytes.length, "jpeg: truncated marker stream")
      require((bytes(pos) & 0xff) == 0xff, f"jpeg: expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      val len = u16(pos + 2)
      val seg = pos + 4
      m match {
        case 0xdb => // DQT (possibly several tables in one segment)
          var p = seg
          while (p < pos + 2 + len) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            require(pq == 0, "jpeg: only 8-bit quant tables supported")
            quants(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
            p += 65
          }
        case 0xc4 => // DHT (possibly several tables)
          var p = seg
          while (p < pos + 2 + len) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
            val dec = new HuffDecoder(bits, vals)
            if (tc == 0) dcTables(th) = dec else acTables(th) = dec
            p += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          require((bytes(seg) & 0xff) == 8, "jpeg: only 8-bit precision")
          h = u16(seg + 1); w = u16(seg + 3)
          val nf = bytes(seg + 5) & 0xff
          require(nf == 1, s"jpeg: only grayscale (1 component) decoded, got $nf")
          require((bytes(seg + 7) & 0xff) == 0x11,
            "jpeg: only 1x1 sampling supported")
          compQuant = bytes(seg + 8) & 0x0f
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          sys.error(f"jpeg: non-baseline SOF marker 0xff$m%02x not supported")
        case 0xdd => sys.error("jpeg: restart intervals (DRI) not supported")
        case 0xda => // SOS
          val ns = bytes(seg) & 0xff
          require(ns == 1, s"jpeg: single-scan grayscale only, got $ns components")
          dcSel = (bytes(seg + 2) & 0xff) >> 4
          acSel = bytes(seg + 2) & 0x0f
          scanAt = pos + 2 + len
        case _ => () // APPn, COM, ... — skip
      }
      if (scanAt < 0) pos += 2 + len
    }
    require(w > 0 && h > 0, "jpeg: no SOF0 before SOS")
    quant = quants(compQuant)
    require(quant != null, "jpeg: scan references an undefined quant table")
    dcDec = dcTables(dcSel); acDec = acTables(acSel)
    require(dcDec != null && acDec != null,
      "jpeg: scan references an undefined Huffman table")
    require(w.toLong * h <= (1L << 28), s"jpeg: implausible dimensions ${w}x$h")
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    val pixels = new Array[Int](w * h)
    val in = new BitReader(bytes, scanAt)
    val coef = new Array[Int](64)
    var pred = 0
    for (by <- 0 until blocksY; bx <- 0 until blocksX) {
      java.util.Arrays.fill(coef, 0)
      val t = dcDec.decode(in)
      pred += extend(in.receive(t), t)
      coef(ZigZag(0)) = pred * quant(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = acDec.decode(in)
        val r = rs >> 4
        val sz = rs & 0x0f
        if (sz == 0) {
          if (r == 15) k += 16 // ZRL
          else eob = true
        } else {
          k += r
          require(k < 64, "jpeg: AC run past block end")
          coef(ZigZag(k)) = extend(in.receive(sz), sz) * quant(k)
          k += 1
        }
      }
      // IDCT + level shift + clamp, cropped to the true image rect
      var y = 0
      while (y < 8) {
        val py = by * 8 + y
        var x = 0
        while (x < 8) {
          val px = bx * 8 + x
          if (px < w && py < h) {
            var sum = 0.0
            var v = 0
            while (v < 8) {
              var u = 0
              while (u < 8) {
                val c = coef(v * 8 + u)
                if (c != 0) sum += cNorm(u) * cNorm(v) * c * cosT(x)(u) * cosT(y)(v)
                u += 1
              }
              v += 1
            }
            val s = math.round(0.25 * sum).toInt + 128
            pixels(py * w + px) = math.max(0, math.min(255, s))
          }
          x += 1
        }
        y += 1
      }
    }
    GrayImage(w, h, pixels)
  }
}
