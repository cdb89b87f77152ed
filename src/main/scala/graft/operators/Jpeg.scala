package graft.operators

/** Baseline sequential-DCT JPEG codec (ITU-T T.81), pure JVM — the image
  * family's answer to "dHash the dominant web image format": the decoder
  * produces the LUMA plane (all a perceptual hash needs), the encoder
  * exists so specs and planted queries can round-trip without external
  * files, exactly the PNG-codec pattern ([[Multimodal.pngDecode]]).
  *
  * Implemented straight from the published spec:
  *  - marker walk (SOI/APPn/COM/DQT/DRI/SOF0/DHT/SOS/RSTn/EOI), 8-bit
  *    precision, interleaved baseline scans, byte stuffing, restart
  *    intervals with DC-predictor reset;
  *  - canonical Huffman decode per T.81 F.2.2.3 (mincode/maxcode/valptr),
  *    DC difference coding + EXTEND, AC run-length with ZRL/EOB;
  *  - sampling factors h, v ∈ {1, 2} (covers 4:4:4, 4:2:2, 4:2:0);
  *    chroma blocks are entropy-decoded to keep the bit stream in sync
  *    but NEVER dequantized or inverse-transformed — luma-only IDCT is
  *    the whole-point optimization for hashing;
  *  - separable double-precision (I)DCT with a precomputed cosine table.
  *
  * Out of scope, returns None (callers fall back like the PNG path):
  * progressive (SOF2), arithmetic coding, 12-bit precision, hierarchical.
  *
  * The encoder writes grayscale baseline with the Annex K.1 luminance
  * quantization table (IJG quality scaling) and the Annex K.3 standard
  * Huffman tables — interoperable output, deterministic bytes.
  */
object Jpeg {

  // Annex K.1 luminance quantization table, natural (row-major) order
  private val stdLumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  // zigzag index: zigzag(k) = natural position of the k-th zigzag entry
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K.3 standard Huffman tables: (bits[1..16], values)
  private val stdDcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val stdDcLumaVals = (0 to 11).map(_.toByte).toArray
  private val stdAcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val stdAcLumaVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  // precomputed cos((2x+1)·u·π/16) table for the separable (I)DCT
  private val cosT: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) { t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16); u += 1 }
      x += 1
    }
    t
  }
  @inline private def c(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  // ---------------------------------------------------------------- decode

  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // canonical code tables per T.81 F.2.2.3
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(idx: Int): Int = vals(idx) & 0xff
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var hitMarker = false
    /** next entropy-coded bit; FF00 unstuffs, any other FFxx is a marker
      * (left for the caller — restart handling peeks before reads). */
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) { hitMarker = true; return 0 }
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) { hitMarker = true; return 0 }
          val b2 = data(pos) & 0xff
          if (b2 == 0x00) { pos += 1 }
          else { hitMarker = true; pos -= 1; return 0 } // marker: rewind to FF
          b = 0xff
        }
        acc = b
        nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def alignAndExpectRst(): Boolean = {
      nBits = 0
      // skip fill FFs to the RST marker
      while (pos + 1 < data.length && (data(pos) & 0xff) == 0xff &&
        ((data(pos + 1) & 0xff) >= 0xd0 && (data(pos + 1) & 0xff) <= 0xd7)) {
        pos += 2
        hitMarker = false
        return true
      }
      false
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l) && code >= t.minCode(l))
          return t.value(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      throw new IllegalArgumentException("jpeg: invalid Huffman code")
    }
  }

  @inline private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Decode the LUMA plane of a baseline JPEG: (width, height, luma
    * bytes, row-major). Grayscale JPEGs return their single component;
    * color JPEGs return Y at full resolution (chroma entropy-decoded for
    * stream sync, never transformed). None for non-baseline profiles or
    * malformed streams. */
  def decodeLuma(content: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try decodeLumaUnsafe(content) catch { case scala.util.control.NonFatal(_) => None }
  }

  private def decodeLumaUnsafe(content: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (content == null || content.length < 4) return None
    @inline def u8(i: Int): Int = content(i) & 0xff
    def beU16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (u8(0) != 0xff || u8(1) != 0xd8) return None // SOI

    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var width = 0; var height = 0
    // per component: id, h, v, tq; scan maps: dc table id, ac table id
    var compIds: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compTq: Array[Int] = null
    var restartInterval = 0

    var i = 2
    while (i + 4 <= content.length) {
      if (u8(i) != 0xff) return None
      val marker = u8(i + 1)
      if (marker == 0xd8) { i += 2 } // stray SOI
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) { i += 2 }
      else {
        val len = beU16(i + 2)
        val seg = i + 4
        marker match {
          case 0xdb => // DQT: one or more tables
            var p = seg
            while (p < i + 2 + len) {
              val pq = u8(p) >> 4; val tq = u8(p) & 0x0f
              if (pq != 0) return None // 16-bit tables: not baseline-8
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(zigzag(k)) = u8(p + 1 + k); k += 1 }
              quant(tq) = t
              p += 65
            }
            i += 2 + len
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < i + 2 + len) {
              val tc = u8(p) >> 4; val th = u8(p) & 0x0f
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = u8(p + l); total += bits(l); l += 1 }
              val vals = new Array[Byte](total)
              System.arraycopy(content, p + 17, vals, 0, total)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTables(th) = t else acTables(th) = t
              p += 17 + total
            }
            i += 2 + len
          case 0xc0 => // SOF0 baseline
            if (u8(seg) != 8) return None // precision
            height = beU16(seg + 1); width = beU16(seg + 3)
            val nc = u8(seg + 5)
            if (nc < 1 || nc > 4) return None
            compIds = new Array[Int](nc); compH = new Array[Int](nc)
            compV = new Array[Int](nc); compTq = new Array[Int](nc)
            var ci = 0
            while (ci < nc) {
              compIds(ci) = u8(seg + 6 + ci * 3)
              compH(ci) = u8(seg + 7 + ci * 3) >> 4
              compV(ci) = u8(seg + 7 + ci * 3) & 0x0f
              compTq(ci) = u8(seg + 8 + ci * 3)
              if (compH(ci) < 1 || compH(ci) > 2 || compV(ci) < 1 || compV(ci) > 2) return None
              ci += 1
            }
            i += 2 + len
          case m if m == 0xc1 || m == 0xc2 || m == 0xc3 || (m >= 0xc5 && m <= 0xc7) ||
            (m >= 0xc9 && m <= 0xcb) || (m >= 0xcd && m <= 0xcf) =>
            return None // non-baseline SOF
          case 0xdd => // DRI
            restartInterval = beU16(seg)
            i += 2 + len
          case 0xda => // SOS — decode the scan
            if (compIds == null || width <= 0 || height <= 0) return None
            val ns = u8(seg)
            val scanDc = new Array[Int](compIds.length)
            val scanAc = new Array[Int](compIds.length)
            val scanComp = new Array[Int](ns) // component INDEX per scan slot
            var s = 0
            while (s < ns) {
              val cid = u8(seg + 1 + s * 2)
              val ci = compIds.indexOf(cid)
              if (ci < 0) return None
              scanComp(s) = ci
              scanDc(ci) = u8(seg + 2 + s * 2) >> 4
              scanAc(ci) = u8(seg + 2 + s * 2) & 0x0f
              s += 1
            }
            if (ns != compIds.length) return None // non-interleaved multi-scan: out of scope
            val hMax = compH.max; val vMax = compV.max
            val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            val lumaQ = quant(compTq(0))
            if (lumaQ == null) return None
            // luma plane, padded to whole blocks then cropped
            val lw = mcusX * 8 * compH(0)
            val lh = mcusY * 8 * compV(0)
            val luma = new Array[Byte](lw * lh)
            val br = new BitReader(content, i + 2 + len)
            val pred = new Array[Int](compIds.length)
            val coef = new Array[Int](64)
            val blk = new Array[Double](64)
            var mcu = 0
            val totalMcus = mcusX * mcusY
            while (mcu < totalMcus) {
              if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                if (!br.alignAndExpectRst()) return None
                java.util.Arrays.fill(pred, 0)
              }
              val my = mcu / mcusX; val mx = mcu % mcusX
              var s2 = 0
              while (s2 < ns) {
                val ci = scanComp(s2)
                val dcT = dcTables(scanDc(ci)); val acT = acTables(scanAc(ci))
                if (dcT == null || acT == null) return None
                var by = 0
                while (by < compV(ci)) {
                  var bx = 0
                  while (bx < compH(ci)) {
                    java.util.Arrays.fill(coef, 0)
                    val t = br.decodeHuff(dcT)
                    pred(ci) += extend(br.bits(t), t)
                    coef(0) = pred(ci)
                    var k = 1
                    while (k < 64) {
                      val rs = br.decodeHuff(acT)
                      val r = rs >> 4; val sz = rs & 0x0f
                      if (sz == 0) {
                        if (r == 15) k += 16 // ZRL
                        else k = 64 // EOB
                      } else {
                        k += r
                        if (k > 63) return None
                        coef(zigzag(k)) = extend(br.bits(sz), sz)
                        k += 1
                      }
                    }
                    if (br.hitMarker && mcu < totalMcus - 1 && s2 < ns - 1) return None
                    if (ci == 0) {
                      // dequantize + IDCT the luma block only
                      var p2 = 0
                      while (p2 < 64) { blk(p2) = coef(p2).toDouble * lumaQ(p2); p2 += 1 }
                      idct8x8(blk)
                      val ox = (mx * compH(0) + bx) * 8
                      val oy = (my * compV(0) + by) * 8
                      var yy = 0
                      while (yy < 8) {
                        var xx = 0
                        while (xx < 8) {
                          val v = math.round(blk(yy * 8 + xx) + 128.0).toInt
                          luma((oy + yy) * lw + ox + xx) =
                            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                          xx += 1
                        }
                        yy += 1
                      }
                    }
                    bx += 1
                  }
                  by += 1
                }
                s2 += 1
              }
              mcu += 1
            }
            // crop padding
            val out = new Array[Byte](width * height)
            var y = 0
            while (y < height) {
              System.arraycopy(luma, y * lw, out, y * width, width)
              y += 1
            }
            return Some((width, height, out))
          case 0xd9 => return None // EOI before SOS
          case _ => i += 2 + len // APPn, COM, others
        }
      }
    }
    None
  }

  // in-place separable 2-D IDCT (T.81 A.3.3), double precision
  private def idct8x8(b: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    // rows: over u for each (y holds v index first — do columns then rows)
    var y = 0
    while (y < 8) { // 1-D IDCT over each ROW's u
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += c(u) * b(y * 8 + u) * cosT(x * 8 + u); u += 1 }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // 1-D IDCT over each COLUMN's v
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += c(v) * tmp(v * 8 + x) * cosT(y2 * 8 + v); v += 1 }
        b(y2 * 8 + x) = s / 2.0
        y2 += 1
      }
      x += 1
    }
  }

  // forward 2-D DCT (T.81 A.3.3)
  private def fdct8x8(b: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // rows
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += b(v * 8 + x) * cosT(x * 8 + u); x += 1 }
        tmp(v * 8 + u) = s * c(u) / 2.0
        u += 1
      }
      v += 1
    }
    var u2 = 0
    while (u2 < 8) { // columns
      var v2 = 0
      while (v2 < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += tmp(y * 8 + u2) * cosT(y * 8 + v2); y += 1 }
        b(v2 * 8 + u2) = s * c(v2) / 2.0
        v2 += 1
      }
      u2 += 1
    }
  }

  // ---------------------------------------------------------------- encode

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit = { if (n > 0) put(0x7f, 8 - n) }
  }

  private def encoderCodes(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    // value -> (code, length) from the canonical table
    val codes = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var j = 0
      while (j < bits(l)) {
        codes(vals(k) & 0xff) = (code, l)
        code += 1; k += 1; j += 1
      }
      code <<= 1
      l += 1
    }
    codes
  }

  /** IJG quality scaling of the Annex K.1 table. */
  private def scaledQuant(quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality in [1,100], got $quality")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    stdLumaQuant.map(q => math.min(255, math.max(1, (q * scale + 50) / 100)))
  }

  @inline private def magnitude(v: Int): Int = {
    var t = 0; var a = math.abs(v)
    while (a != 0) { t += 1; a >>= 1 }
    t
  }

  /** Encode a grayscale raster as baseline JPEG (quality 1–100, IJG
    * scaling, standard Annex K.3 Huffman tables). Edge blocks replicate
    * the last row/column — the conventional padding. Deterministic
    * bytes for fixed inputs. */
  def encodeGray(width: Int, height: Int, pixels: Array[Byte], quality: Int = 90): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"need $width x $height = ${width * height} pixels, got ${pixels.length}")
    val q = scaledQuant(quality)
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    out.write(0xff); out.write(0xd8) // SOI
    // DQT
    out.write(0xff); out.write(0xdb); be16(67); out.write(0)
    var k = 0
    while (k < 64) { out.write(q(zigzag(k))); k += 1 }
    // SOF0: 1 component, 1x1 sampling, quant table 0
    out.write(0xff); out.write(0xc0); be16(11); out.write(8)
    be16(height); be16(width); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    // DHT: DC then AC
    def dht(tcTh: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      out.write(0xff); out.write(0xc4); be16(19 + vals.length); out.write(tcTh)
      var l = 1
      while (l <= 16) { out.write(bits(l)); l += 1 }
      vals.foreach(v => out.write(v & 0xff))
    }
    dht(0x00, stdDcLumaBits, stdDcLumaVals)
    dht(0x10, stdAcLumaBits, stdAcLumaVals)
    // SOS
    out.write(0xff); out.write(0xda); be16(8); out.write(1)
    out.write(1); out.write(0x00); out.write(0); out.write(63); out.write(0)

    val dcCodes = encoderCodes(stdDcLumaBits, stdDcLumaVals)
    val acCodes = encoderCodes(stdAcLumaBits, stdAcLumaVals)
    val bw = new BitWriter(out)
    val blk = new Array[Double](64)
    val zz = new Array[Int](64)
    var pred = 0
    val bY = (height + 7) / 8; val bX = (width + 7) / 8
    var by = 0
    while (by < bY) {
      var bx = 0
      while (bx < bX) {
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            val sx = math.min(bx * 8 + xx, width - 1)
            val sy = math.min(by * 8 + yy, height - 1)
            blk(yy * 8 + xx) = (pixels(sy * width + sx) & 0xff) - 128.0
            xx += 1
          }
          yy += 1
        }
        fdct8x8(blk)
        var p = 0
        while (p < 64) {
          zz(p) = math.round(blk(zigzag(p)) / q(zigzag(p))).toInt
          p += 1
        }
        // DC
        val diff = zz(0) - pred
        pred = zz(0)
        val t = magnitude(diff)
        val (dc, dl) = dcCodes(t)
        bw.put(dc, dl)
        if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        // AC
        var run = 0
        var kk = 1
        while (kk < 64) {
          if (zz(kk) == 0) run += 1
          else {
            while (run > 15) { val (zc, zl) = acCodes(0xf0); bw.put(zc, zl); run -= 16 }
            val sz = magnitude(zz(kk))
            val (ac, al) = acCodes((run << 4) | sz)
            bw.put(ac, al)
            bw.put(if (zz(kk) < 0) zz(kk) + (1 << sz) - 1 else zz(kk), sz)
            run = 0
          }
          kk += 1
        }
        if (run > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) } // EOB
        bx += 1
      }
      by += 1
    }
    bw.flushWithOnes()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** 64-bit perceptual dHash of a baseline JPEG's luma plane — the exact
    * [[Multimodal.pngDHash64]] cell construction (9×8 integer block
    * means, neighbor-comparison bits), so JPEG and PNG copies of the
    * same picture land in the same signature space and pair through the
    * same [[Dedup.pairsFromSignatures64]] machinery. */
  def jpegDHash64(content: Array[Byte]): Option[Long] =
    decodeLuma(content).map { case (w, h, luma) =>
      Multimodal.dhashFromLuma(w, h, p => luma(p) & 0xff)
    }
}
