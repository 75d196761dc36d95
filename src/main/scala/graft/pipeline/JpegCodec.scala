package graft.pipeline

import java.io.ByteArrayOutputStream

/** Pure-JVM baseline JPEG codec (ITU T.81): a real Huffman entropy
  * decoder — canonical code tables (Annex C), byte destuffing (F.1.2.3),
  * restart markers, DC prediction, AC run/size coding with ZRL/EOB —
  * feeding dequantization and a full 2D IDCT (A.3.3) with level shift,
  * for sequential-DCT grayscale and 4:4:4 YCbCr images. Progressive,
  * arithmetic-coded, subsampled, and 12-bit images return None.
  *
  * The matching builder emits DC-ONLY grayscale JPEGs (every 8x8 block a
  * flat value — the one case where ANY conformant IDCT is bit-exact, so
  * an external SQL oracle can replay pixels): real marker stream, real
  * Huffman codes, real byte stuffing. Conformance of both directions is
  * cross-validated in MediaSpec against the JDK's independent
  * javax.imageio JPEG codec.
  */
object JpegCodec {

  /** Zigzag-index -> natural-index map (T.81 Figure A.6). */
  private val Zig: Array[Int] = Array(
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ------------------------------------------------------------ huffman

  /** Canonical Huffman table (T.81 Annex C): `bits(i)` = #codes of length
    * i+1, `vals` = symbols in code order. Decoding uses the standard
    * mincode/maxcode/valptr walk (F.2.2.3). */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
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
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def value(l: Int, code: Int): Int = vals(valPtr(l) + (code - minCode(l))) & 0xff
  }

  // ---------------------------------------------------------- bit reader

  /** Entropy-segment bit reader with 0xFF00 destuffing; surfaces restart
    * markers (0xFFD0-D7) and end-of-stream as sentinels. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    var hitMarker: Int = -1 // marker byte seen (0xD0-0xD9), or -1

    def bit(): Int = {
      if (cnt == 0) {
        if (hitMarker >= 0) return -1
        if (pos >= b.length) { hitMarker = 0xd9; return -1 }
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) { hitMarker = 0xd9; return -1 }
          val m = b(pos) & 0xff
          pos += 1
          if (m == 0x00) v = 0xff
          else { hitMarker = m; return -1 }
        }
        buf = v; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bt = bit()
        if (bt < 0) return -1
        v = (v << 1) | bt
        i += 1
      }
      v
    }

    /** Align to a byte boundary and consume an expected restart marker. */
    def restart(): Boolean = {
      cnt = 0
      if (hitMarker >= 0xd0 && hitMarker <= 0xd7) { hitMarker = -1; return true }
      // marker not yet surfaced: it must be the next two bytes
      if (pos + 1 < b.length && (b(pos) & 0xff) == 0xff) {
        val m = b(pos + 1) & 0xff
        if (m >= 0xd0 && m <= 0xd7) { pos += 2; return true }
      }
      false
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l)) return t.value(l, code)
        val bt = bit()
        if (bt < 0) return -1
        code = (code << 1) | bt
        l += 1
      }
      -1 // corrupt: no code of length <= 16 matched
    }
  }

  /** EXTEND (T.81 F.2.2.1): map an s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // ---------------------------------------------------------------- IDCT

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }

  /** Full 2D IDCT (T.81 A.3.3), double precision — O(64^2) per block;
    * correctness over speed (the deep-decode path is a per-row transform,
    * not the extraction hot loop). `coef` in natural (row-major) order. */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    val c = new Array[Double](8)
    c(0) = 1.0 / math.sqrt(2.0)
    var i = 1
    while (i < 8) { c(i) = 1.0; i += 1 }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val f = coef(v * 8 + u)
            if (f != 0)
              sum += c(u) * c(v) * f * CosTable(x * 8 + u) * CosTable(y * 8 + v)
            u += 1
          }
          v += 1
        }
        val s = math.round(sum / 4.0).toInt + 128
        out(y * 8 + x) = if (s < 0) 0 else if (s > 255) 255 else s
        x += 1
      }
      y += 1
    }
  }

  // -------------------------------------------------------------- decode

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int,
                                var dcTab: Int = 0, var acTab: Int = 0)

  /** Decode a baseline/extended-sequential Huffman JPEG to per-component
    * pixel planes (w*h each, component order as in the SOF). Grayscale
    * yields 1 plane; color is converted by the caller. */
  private[graft] def decodePlanes(b: Array[Byte]): Option[(Int, Int, Array[Array[Int]])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var dri = 0
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      if (m == 0xd9) return None // EOI before SOS
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (len < 2 || i + 2 + len > b.length) return None
      val seg = i + 4
      val segEnd = i + 2 + len
      m match {
        case 0xdb => // DQT: one or more tables
          var p = seg
          while (p < segEnd) {
            val pq = (b(p) & 0xf0) >> 4
            val tq = b(p) & 0x0f
            if (pq != 0 || tq > 3) return None // 8-bit tables only
            if (p + 65 > segEnd) return None
            val q = new Array[Int](64)
            var k = 0
            while (k < 64) { q(Zig(k)) = b(p + 1 + k) & 0xff; k += 1 }
            quant(tq) = q
            p += 65
          }
        case 0xc4 => // DHT: one or more tables
          var p = seg
          while (p < segEnd) {
            val tc = (b(p) & 0xf0) >> 4
            val th = b(p) & 0x0f
            if (tc > 1 || th > 3) return None
            if (p + 17 > segEnd) return None
            val bits = Array.tabulate(16)(k => b(p + 1 + k) & 0xff)
            val n = bits.sum
            if (p + 17 + n > segEnd) return None
            val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + n
          }
        case 0xc0 | 0xc1 => // baseline / extended sequential, Huffman
          if (seg + 6 > segEnd) return None
          if ((b(seg) & 0xff) != 8) return None // 8-bit precision only
          h = ((b(seg + 1) & 0xff) << 8) | (b(seg + 2) & 0xff)
          w = ((b(seg + 3) & 0xff) << 8) | (b(seg + 4) & 0xff)
          val nc = b(seg + 5) & 0xff
          if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
          if (w.toLong * h > (64L << 20) / 3) return None // decoded-size cap
          if (seg + 6 + 3 * nc > segEnd) return None
          comps = Array.tabulate(nc) { ci =>
            val o = seg + 6 + 3 * ci
            Comp(b(o) & 0xff, (b(o + 1) & 0xf0) >> 4, b(o + 1) & 0x0f, b(o + 2) & 0xff)
          }
          if (comps.exists(c => c.h != 1 || c.v != 1)) return None // 4:4:4 only
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // progressive / arithmetic / lossless: out of scope
        case 0xdd => // DRI
          if (len != 4) return None
          dri = ((b(seg) & 0xff) << 8) | (b(seg + 1) & 0xff)
        case 0xda => // SOS: entropy data follows
          if (comps == null) return None
          val ns = b(seg) & 0xff
          if (ns != comps.length || seg + 1 + 2 * ns + 3 > segEnd) return None
          var si = 0
          while (si < ns) {
            val cs = b(seg + 1 + 2 * si) & 0xff
            val tabs = b(seg + 2 + 2 * si) & 0xff
            val comp = comps.find(_.id == cs).getOrElse(return None)
            comp.dcTab = (tabs & 0xf0) >> 4
            comp.acTab = tabs & 0x0f
            si += 1
          }
          return decodeScan(b, segEnd, comps, quant, dcTabs, acTabs, w, h, dri)
        case _ => () // APPn/COM/etc: skip
      }
      i = segEnd
    }
    None
  }

  private def decodeScan(b: Array[Byte], start: Int, comps: Array[Comp],
                         quant: Array[Array[Int]], dcTabs: Array[HuffTable],
                         acTabs: Array[HuffTable], w: Int, h: Int,
                         dri: Int): Option[(Int, Int, Array[Array[Int]])] = {
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val planes = Array.fill(comps.length)(new Array[Int](w * h))
    val preds = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    val r = new BitReader(b, start)
    var mcu = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          if (!r.restart()) return None
          java.util.Arrays.fill(preds, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val comp = comps(ci)
          val dcT = dcTabs(comp.dcTab)
          val acT = acTabs(comp.acTab)
          val q = quant(comp.tq)
          if (dcT == null || acT == null || q == null) return None
          java.util.Arrays.fill(coef, 0)
          val t = r.decodeHuff(dcT)
          if (t < 0 || t > 15) return None
          val diffBits = if (t == 0) 0 else r.receive(t)
          if (diffBits < 0) return None
          preds(ci) += extend(diffBits, t)
          coef(0) = preds(ci) * q(0)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = r.decodeHuff(acT)
            if (rs < 0) return None
            val run = (rs & 0xf0) >> 4
            val size = rs & 0x0f
            if (size == 0) {
              if (run == 15) k += 16 // ZRL
              else eob = true
            } else {
              k += run
              if (k > 63) return None
              val vbits = r.receive(size)
              if (vbits < 0) return None
              coef(Zig(k)) = extend(vbits, size) * q(Zig(k))
              k += 1
            }
          }
          idctBlock(coef, px)
          // copy the block into the plane, cropping at the image edge
          val x0 = bx * 8; val y0 = by * 8
          var yy = 0
          while (yy < 8 && y0 + yy < h) {
            var xx = 0
            while (xx < 8 && x0 + xx < w) {
              planes(ci)((y0 + yy) * w + (x0 + xx)) = px(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          ci += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    Some((w, h, planes))
  }

  /** Decode to per-channel stats (MediaCodec.ImagePixels): grayscale maps
    * to three equal channels; 3-component images convert YCbCr -> RGB
    * with the JFIF formulas (rounded, clamped). */
  def decodeJpegPixels(b: Array[Byte]): Option[MediaCodec.ImagePixels] =
    decodePlanes(b).map { case (w, h, planes) =>
      val sums = new Array[Long](3)
      val mins = Array.fill(3)(255)
      val maxs = new Array[Int](3)
      def acc(ch: Int, v: Int): Unit = {
        sums(ch) += v
        if (v < mins(ch)) mins(ch) = v
        if (v > maxs(ch)) maxs(ch) = v
      }
      var p = 0
      val n = w * h
      while (p < n) {
        if (planes.length == 1) {
          val v = planes(0)(p)
          acc(0, v); acc(1, v); acc(2, v)
        } else {
          val y = planes(0)(p); val cb = planes(1)(p) - 128; val cr = planes(2)(p) - 128
          def clamp(d: Double): Int = {
            val v = math.round(d).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          acc(0, clamp(y + 1.402 * cr))
          acc(1, clamp(y - 0.344136 * cb - 0.714136 * cr))
          acc(2, clamp(y + 1.772 * cb))
        }
        p += 1
      }
      MediaCodec.ImagePixels(w, h,
        Array.tabulate(3)(ch => MediaCodec.ChannelStats(sums(ch), mins(ch), maxs(ch))))
    }

  // --------------------------------------------------------------- build

  /** DC-only grayscale baseline JPEG: block (br, bc) is the flat value
    * `clamp(dc(br, bc) + 128)` where dc is quantized with Q(0,0) = 8 (so
    * dequant/IDCT is exactly the DC value — replayable without a DCT in
    * sight). Real canonical Huffman tables, real byte stuffing. `dc`
    * values must lie in [-128, 127]. */
  def buildJpegDcOnly(w: Int, h: Int, dc: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"buildJpegDcOnly: bad dims ${w}x$h")
    val out = new ByteArrayOutputStream(w * h / 8 + 512)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16(0xffd8) // SOI
    // APP0/JFIF (some readers want it before anything else)
    u16(0xffe0); u16(16)
    "JFIF".getBytes("US-ASCII").foreach(c => u8(c)); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    // DQT table 0: Q(0,0)=8 (zigzag index 0), all else 16
    u16(0xffdb); u16(2 + 1 + 64); u8(0x00)
    u8(8); (1 until 64).foreach(_ => u8(16))
    // SOF0: 8-bit, 1 component, 1x1 sampling, qtable 0
    u16(0xffc0); u16(8 + 3); u8(8); u16(h); u16(w); u8(1); u8(1); u8(0x11); u8(0)
    // DHT DC table 0: 12 symbols (categories 0-11), all at code length 4
    u16(0xffc4); u16(2 + 17 + 12); u8(0x00)
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcBits.foreach(u8); (0 until 12).foreach(u8)
    // DHT AC table 0: single symbol 0x00 (EOB) at code length 2
    u16(0xffc4); u16(2 + 17 + 1); u8(0x10)
    val acBits = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acBits.foreach(u8); u8(0x00)
    // SOS
    u16(0xffda); u16(6 + 2); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
    // entropy data: per block, DC category code (4 bits) + diff bits + EOB (2 bits)
    var bitBuf = 0
    var bitCnt = 0
    val body = new ByteArrayOutputStream(w * h / 8)
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1)
        bitCnt += 1
        if (bitCnt == 8) {
          body.write(bitBuf & 0xff)
          if ((bitBuf & 0xff) == 0xff) body.write(0x00) // byte stuffing
          bitBuf = 0; bitCnt = 0
        }
        i -= 1
      }
    }
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    var pred = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val v = dc(by, bx)
        require(v >= -128 && v <= 127, s"dc out of range: $v")
        val diff = v - pred
        pred = v
        val mag = math.abs(diff)
        var t = 0
        while ((mag >> t) != 0) t += 1 // category = bit length of |diff|
        putBits(t, 4) // canonical code for symbol t at length 4 IS t (0..11)
        if (t > 0) putBits(if (diff >= 0) diff else diff + (1 << t) - 1, t)
        putBits(0, 2) // AC EOB: canonical single length-2 code = 00
        bx += 1
      }
      by += 1
    }
    if (bitCnt > 0) { // pad the final byte with 1s (T.81 F.1.2.3)
      val pad = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
      body.write(pad & 0xff)
      if ((pad & 0xff) == 0xff) body.write(0x00)
    }
    val bb = body.toByteArray
    out.write(bb, 0, bb.length)
    u16(0xffd9) // EOI
    out.toByteArray
  }
}
