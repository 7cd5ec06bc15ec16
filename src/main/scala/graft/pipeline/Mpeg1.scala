package graft.pipeline

/** Pure-JVM MPEG-1 video (ISO/IEC 11172-2) I/P elementary-stream codec —
  * the inter-frame layer that retires the last declared decode stub.
  * No native libraries: bit-exact integer dequantization with mismatch
  * control, the reference double-precision IDCT, and forward motion
  * compensation with half-pel interpolation, all per the public spec.
  *
  * Honest scope boundary (every SHIPPED path is fixture-tested; nothing
  * outside it ever guesses):
  *  - Pictures: I and P (no B), 4:2:0, one or more slices.
  *  - Intra blocks: DC size VLCs + AC coefficients as ESCAPE codes
  *    (000001 + 6-bit run + 8-bit level) and the (0,±1)/(EOB) short
  *    codes — the escape form is spec-legal for EVERY run/level, so the
  *    built-in encoder emits nothing else and stays in the tested set.
  *  - P macroblocks: skipped (copy), MC-only (forward vector, full- or
  *    half-pel, f_code 1..7), intra refresh, and CODED non-intra
  *    residual blocks (macroblock_pattern + CBP VLC + (2·QFS+Sign)
  *    dequantization + clamped residual add) — both the MC+coded ('1')
  *    and coded-only ('01') types decode; the built-in encoder emits the
  *    coded-only form (`encode(codeResiduals = true)`), closing the
  *    P-frame loop end-to-end. The CBP table is transcribed from the
  *    public spec and structurally self-checked (prefix-free, Kraft sum)
  *    since no external reference streams exist in this container.
  *
  * Scale shape: a clip decodes sequentially by necessity (P frames
  * read the previous reconstruction), but clips are independent rows —
  * the executor-parallel unit is the clip, exactly like the MJPEG/AVI
  * path (Multimodal.scala), and features never leave the executor.
  *
  * (Reference scope: the reference ships no video codec at all; this is
  * part of the beyond-reference multimodal surface. Container layer for
  * AVI lives in Multimodal.scala:486.)
  */
object Mpeg1 {

  /** One decoded 4:2:0 picture; planes are row-major, values 0..255. */
  final case class Frame(w: Int, h: Int, y: Array[Int], cb: Array[Int], cr: Array[Int])

  // ---------------------------------------------------------------- bit IO

  final class BitReader(val bytes: Array[Byte]) {
    var pos: Int = 0 // absolute bit position
    def remainingBits: Int = bytes.length * 8 - pos
    def bit(): Int = {
      val b = (bytes(pos >>> 3) >> (7 - (pos & 7))) & 1
      pos += 1; b
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def peek(n: Int): Int = { val p = pos; val v = bits(math.min(n, remainingBits)); pos = p
      if (remainingBits < n) -1 else v }
    def align(): Unit = pos = (pos + 7) & ~7
    /** Advance to the next byte-aligned 0x000001 and return the code byte
      * after it, or -1 at end of stream. */
    def nextStartCode(): Int = {
      align()
      var o = pos >>> 3
      while (o + 4 <= bytes.length) {
        if (bytes(o) == 0 && bytes(o + 1) == 0 && bytes(o + 2) == 1) {
          pos = (o + 4) * 8
          return bytes(o + 3) & 0xFF
        }
        o += 1
      }
      pos = bytes.length * 8
      -1
    }
  }

  final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var nb = 0
    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1); nb += 1
        if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    def align(): Unit = if (nb > 0) bits(0, 8 - nb)
    def startCode(code: Int): Unit = { align(); bits(0, 16); bits(1, 8); bits(code, 8) }
    def toArray: Array[Byte] = { align(); buf.toByteArray }
  }

  // ------------------------------------------------------------ constants

  /** Default intra quantizer matrix, zigzag-independent (spec §2.4.2.3,
    * raster order). */
  val DefaultIntraQ: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  /** Zigzag scan: position i in scan order -> raster index (spec fig 2-D.7). */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** picture_rate code -> frames per second (spec table 2-D.1 subset). */
  val PictureRates: Map[Int, Double] = Map(
    1 -> 23.976, 2 -> 24.0, 3 -> 25.0, 4 -> 29.97, 5 -> 30.0,
    6 -> 50.0, 7 -> 59.94, 8 -> 60.0)

  // DC size VLCs (spec tables B.1/B.2) as (code, bits) indexed by size.
  private val DcLum: Array[(Int, Int)] = Array(
    (0x4, 3), (0x0, 2), (0x1, 2), (0x5, 3), (0x6, 3), (0xE, 4),
    (0x1E, 5), (0x3E, 6), (0x7E, 7))
  private val DcChr: Array[(Int, Int)] = Array(
    (0x0, 2), (0x1, 2), (0x2, 2), (0x6, 3), (0xE, 4), (0x1E, 5),
    (0x3E, 6), (0x7E, 7), (0xFE, 8))

  // macroblock_address_increment VLC (spec table B.1), value -> (code, bits)
  private val MbaCodes: Map[Int, (Int, Int)] = Map(
    1 -> (0x1, 1), 2 -> (0x3, 3), 3 -> (0x2, 3), 4 -> (0x3, 4), 5 -> (0x2, 4),
    6 -> (0x3, 5), 7 -> (0x2, 5), 8 -> (0x7, 7), 9 -> (0x6, 7),
    10 -> (0xB, 8), 11 -> (0xA, 8), 12 -> (0x9, 8), 13 -> (0x8, 8),
    14 -> (0x7, 8), 15 -> (0x6, 8))
  private val MbaEscape = (0x8, 11) // +33 then read another increment
  private val MbaStuffing = (0xF, 11)

  /** motion_code VLC, |code| 0..3 (the confidently-known head of spec
    * table B.4 — the built-in encoder never exceeds it; the decoder
    * rejects longer prefixes rather than guessing the tail rows). */
  private val MvCodes: Map[Int, (Int, Int)] = Map(
    0 -> (0x1, 1), 1 -> (0x2, 3), -1 -> (0x3, 3),
    2 -> (0x2, 4), -2 -> (0x3, 4), 3 -> (0x2, 5), -3 -> (0x3, 5))

  /** coded_block_pattern VLC (spec table B.3), cbp value -> (code, bits).
    * Bit 32 = Y0 (top-left), 16 = Y1, 8 = Y2, 4 = Y3, 2 = Cb, 1 = Cr.
    * All 63 nonzero patterns (cbp 0 has no code in MPEG-1 — the
    * macroblock_pattern flag implies at least one coded block).
    * Structural self-checks in Mpeg1Spec: prefix-free, unique, Kraft sum
    * exactly 510/512 (the table's two reserved 9-bit leaves). */
  private val CbpCodes: Map[Int, (Int, Int)] = Map(
    60 -> (0x7, 3),
    4 -> (0xD, 4), 8 -> (0xC, 4), 16 -> (0xB, 4), 32 -> (0xA, 4),
    12 -> (0x13, 5), 48 -> (0x12, 5), 20 -> (0x11, 5), 40 -> (0x10, 5),
    28 -> (0xF, 5), 44 -> (0xE, 5), 52 -> (0xD, 5), 56 -> (0xC, 5),
    1 -> (0xB, 5), 61 -> (0xA, 5), 2 -> (0x9, 5), 62 -> (0x8, 5),
    24 -> (0xF, 6), 36 -> (0xE, 6), 3 -> (0xD, 6), 63 -> (0xC, 6),
    5 -> (0x17, 7), 9 -> (0x16, 7), 17 -> (0x15, 7), 33 -> (0x14, 7),
    6 -> (0x13, 7), 10 -> (0x12, 7), 18 -> (0x11, 7), 34 -> (0x10, 7),
    7 -> (0x1F, 8), 11 -> (0x1E, 8), 19 -> (0x1D, 8), 35 -> (0x1C, 8),
    13 -> (0x1B, 8), 49 -> (0x1A, 8), 21 -> (0x19, 8), 41 -> (0x18, 8),
    14 -> (0x17, 8), 50 -> (0x16, 8), 22 -> (0x15, 8), 42 -> (0x14, 8),
    15 -> (0x13, 8), 51 -> (0x12, 8), 23 -> (0x11, 8), 43 -> (0x10, 8),
    25 -> (0xF, 8), 37 -> (0xE, 8), 26 -> (0xD, 8), 38 -> (0xC, 8),
    29 -> (0xB, 8), 45 -> (0xA, 8), 53 -> (0x9, 8), 57 -> (0x8, 8),
    30 -> (0x7, 8), 46 -> (0x6, 8), 54 -> (0x5, 8), 58 -> (0x4, 8),
    31 -> (0x7, 9), 47 -> (0x6, 9), 55 -> (0x5, 9), 59 -> (0x4, 9),
    27 -> (0x3, 9), 39 -> (0x2, 9))

  /** Structural-audit view of [[CbpCodes]] for the spec's prefix/Kraft
    * checks (the table is transcribed from the public standard and cannot
    * be validated against reference streams in this container — the
    * self-checks plus the encoder/decoder closed loop are the gate). */
  private[graft] def cbpTable: Map[Int, (Int, Int)] = CbpCodes

  // ------------------------------------------------------- IDCT / FDCT

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private def cu(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Reference 2-D IDCT (spec Annex A numerical characteristics are for
    * conformance of APPROXIMATE idcts; the double-precision direct form
    * is exact to rounding). In: raster-order coefficients; out: spatial. */
  def idct8x8(f: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = f(v * 8 + u)
            if (c != 0)
              acc += cu(u) * cu(v) * c * CosTable(x * 8 + u) * CosTable(y * 8 + v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = math.round(acc / 4.0).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** Forward DCT (encoder side). */
  def fdct8x8(s: Array[Int]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            acc += s(y * 8 + x) * CosTable(x * 8 + u) * CosTable(y * 8 + v)
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = cu(u) * cu(v) * acc / 4.0
        u += 1
      }
      v += 1
    }
    out
  }

  // ------------------------------------------------------------- decoder

  final case class Mpeg1Error(msg: String) extends RuntimeException(msg)

  private def dcSize(r: BitReader, lum: Boolean): Int = {
    // both DC tables are prefix-free with <= 8-bit codes: walk bit by bit
    val table = if (lum) DcLum else DcChr
    var code = 0; var len = 0
    while (len < 9) {
      code = (code << 1) | r.bit(); len += 1
      var s = 0
      while (s < table.length) {
        if (table(s)._2 == len && table(s)._1 == code) return s
        s += 1
      }
    }
    throw Mpeg1Error("bad DC size code")
  }

  /** Decode one INTRA block's coefficients (zigzag order) into
    * raster-order dequantized values. `dcPred` in DC-value space (F00/8).
    * Returns the new DC predictor. */
  private def decodeBlock(r: BitReader, lum: Boolean,
                          qscale: Int, iq: Array[Int], dcPred: Int,
                          out: Array[Int]): Int = {
    java.util.Arrays.fill(out, 0)
    var i = 0 // zigzag index of last coded coefficient
    val size = dcSize(r, lum)
    val diff =
      if (size == 0) 0
      else {
        val v = r.bits(size)
        if ((v & (1 << (size - 1))) != 0) v else v - (1 << size) + 1
      }
    val newPred = dcPred + diff
    out(0) = newPred * 8
    // AC: EOB '10' | escape '000001' + 6-bit run + 8/16-bit level | (0,±1) '11s'
    var done = false
    while (!done) {
      if (r.peek(2) == 2) { r.bits(2); done = true }
      else if (r.peek(6) == 1) {
        r.bits(6)
        val run = r.bits(6)
        val level = escapeLevel(r)
        i += run + 1
        if (i > 63) throw Mpeg1Error("AC run past block end")
        out(Zigzag(i)) = dequant(level, qscale, iq(Zigzag(i)))
      } else if (r.peek(2) == 3) {
        r.bits(2)
        val sign = r.bit()
        i += 1
        if (i > 63) throw Mpeg1Error("AC run past block end")
        out(Zigzag(i)) = dequant(if (sign == 1) -1 else 1, qscale, iq(Zigzag(i)))
      } else throw Mpeg1Error("AC VLC outside supported subset")
    }
    newPred
  }

  /** Intra AC dequantization with mismatch control (spec §2.4.4.1):
    * truncate-toward-zero division, oddification toward zero, clamp. */
  private def dequant(qfs: Int, qscale: Int, w: Int): Int = {
    var f = (2 * qfs * qscale * w) / 16
    if ((f & 1) == 0) f = f - Integer.signum(f)
    math.max(-2048, math.min(2047, f))
  }

  /** NON-intra dequantization (spec §2.4.4.2): the (2·QFS + Sign) form
    * with the same mismatch control. The default non-intra matrix is flat
    * 16 (spec §2.4.2.3), which this codec pins (no loaded matrices). */
  private def dequantNI(qfs: Int, qscale: Int): Int = {
    var f = ((2 * qfs + Integer.signum(qfs)) * qscale * 16) / 16
    if ((f & 1) == 0) f = f - Integer.signum(f)
    math.max(-2048, math.min(2047, f))
  }

  // flat 9-bit-prefix decode tables: slot (code << (9-len)) holds the cbp
  // and its code length for every padding of a valid code — O(1) per bit
  // in the macroblock hot path instead of a 63-entry scan per bit
  private val (cbpDecVal, cbpDecLen): (Array[Int], Array[Int]) = {
    val v = Array.fill(512)(-1); val n = Array.fill(512)(0)
    CbpCodes.foreach { case (cbp, (c, l)) =>
      val base = c << (9 - l)
      var j = 0
      while (j < (1 << (9 - l))) { v(base + j) = cbp; n(base + j) = l; j += 1 }
    }
    (v, n)
  }

  private def cbpDecode(r: BitReader): Int = {
    var code = 0; var len = 0
    while (len < 9) {
      code = (code << 1) | r.bit(); len += 1
      val idx = code << (9 - len)
      // prefix-freeness: a strict prefix of a longer code lands in that
      // code's slot range with a LONGER recorded length — no false hit
      if (cbpDecLen(idx) == len) return cbpDecVal(idx)
    }
    throw Mpeg1Error("bad coded_block_pattern")
  }

  /** Decode one NON-intra (residual) block into raster-order dequantized
    * values. No DC predictor; the FIRST coefficient uses the dct_coeff_
    * first convention ('1s' = run 0 level ±1; EOB impossible), subsequent
    * coefficients the shared EOB/'11s'/escape set. Like the intra path,
    * the built-in encoder emits only escapes, but the short forms decode
    * too. */
  private def decodeBlockNI(r: BitReader, qscale: Int, out: Array[Int]): Unit = {
    java.util.Arrays.fill(out, 0)
    var i = 0 // zigzag index of the last coded coefficient
    // first coefficient
    if (r.peek(1) == 1) {
      r.bits(1); val sign = r.bit()
      out(Zigzag(0)) = dequantNI(if (sign == 1) -1 else 1, qscale)
    } else if (r.peek(6) == 1) {
      r.bits(6)
      val run = r.bits(6)
      val level = escapeLevel(r)
      i = run
      if (i > 63) throw Mpeg1Error("AC run past block end")
      out(Zigzag(i)) = dequantNI(level, qscale)
    } else throw Mpeg1Error("non-intra first coefficient outside supported subset")
    // subsequent coefficients
    var done = false
    while (!done) {
      if (r.peek(2) == 2) { r.bits(2); done = true } // EOB
      else if (r.peek(6) == 1) {
        r.bits(6)
        val run = r.bits(6)
        val level = escapeLevel(r)
        i += run + 1
        if (i > 63) throw Mpeg1Error("AC run past block end")
        out(Zigzag(i)) = dequantNI(level, qscale)
      } else if (r.peek(2) == 3) {
        r.bits(2)
        val sign = r.bit()
        i += 1
        if (i > 63) throw Mpeg1Error("AC run past block end")
        out(Zigzag(i)) = dequantNI(if (sign == 1) -1 else 1, qscale)
      } else throw Mpeg1Error("AC VLC outside supported subset")
    }
  }

  /** The escape form's 8/16-bit level field (shared by intra and
    * non-intra paths). */
  private def escapeLevel(r: BitReader): Int = {
    var level = r.bits(8)
    if (level == 0x00) level = r.bits(8)            // 16-bit escape, +128..255
    else if (level == 0x80) level = r.bits(8) - 256 // 16-bit escape, -255..-128
    else if (level > 128) level -= 256              // 8-bit two's complement
    level
  }

  private def mvDecode(r: BitReader): Int = {
    // walk the supported prefix set; reject anything longer
    var code = 0; var len = 0
    while (len < 6) {
      code = (code << 1) | r.bit(); len += 1
      MvCodes.foreach { case (v, (c, l)) => if (l == len && c == code) return v }
    }
    throw Mpeg1Error("motion code outside supported subset")
  }

  /** Reconstruct one motion component (spec §2.4.4.2): differential VLC +
    * f_code residual, wrapped into [-16f, 16f-1] (half-pel units unless
    * full_pel, in which case the caller doubles). */
  private def reconMv(code: Int, residual: Int, f: Int, pred: Int): Int = {
    val delta =
      if (code == 0) 0
      else {
        val mag = (math.abs(code) - 1) * f + residual + 1
        if (code < 0) -mag else mag
      }
    var v = pred + delta
    val range = 32 * f
    if (v < -16 * f) v += range else if (v >= 16 * f) v -= range
    v
  }

  /** Forward-predict one 8x8 (or 16x16) region from `ref` with half-pel
    * bilinear interpolation; MV in half-pel units. Edges clamp (our
    * encoder never emits out-of-frame vectors; clamping keeps garbage
    * streams from crashing the partition). */
  private def predict(ref: Array[Int], rw: Int, rh: Int,
                      dstX: Int, dstY: Int, size: Int,
                      mvxHalf: Int, mvyHalf: Int,
                      out: Array[Int], ow: Int): Unit = {
    val fx = mvxHalf >> 1; val fy = mvyHalf >> 1
    val hx = mvxHalf & 1; val hy = mvyHalf & 1
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        def px(sx: Int, sy: Int): Int = {
          val cx = math.max(0, math.min(rw - 1, sx))
          val cy = math.max(0, math.min(rh - 1, sy))
          ref(cy * rw + cx)
        }
        val sx = dstX + x + fx; val sy = dstY + y + fy
        val v =
          if (hx == 0 && hy == 0) px(sx, sy)
          else if (hy == 0) (px(sx, sy) + px(sx + 1, sy) + 1) / 2
          else if (hx == 0) (px(sx, sy) + px(sx, sy + 1) + 1) / 2
          else (px(sx, sy) + px(sx + 1, sy) + px(sx, sy + 1) + px(sx + 1, sy + 1) + 2) / 4
        out((dstY + y) * ow + dstX + x) = v
        x += 1
      }
      y += 1
    }
  }

  /** Decode an MPEG-1 video elementary stream into frames (display order
    * == coding order for I/P-only streams). Throws [[Mpeg1Error]] on
    * anything outside the supported subset; callers in the Spark surface
    * convert that to a null row. */
  def decode(bytes: Array[Byte]): Seq[Frame] = {
    val r = new BitReader(bytes)
    var w = 0; var h = 0; var mbW = 0; var mbH = 0
    var iq = DefaultIntraQ
    val frames = scala.collection.mutable.ArrayBuffer[Frame]()
    var refY: Array[Int] = null; var refCb: Array[Int] = null; var refCr: Array[Int] = null

    // B pictures predict from TWO references: `past*` (the older I/P) and
    // `ref*` (the most recent I/P — decode order precedes the B, display
    // order follows it). I/P completion shifts ref -> past; B never
    // becomes a reference (spec §2.4.4.3).
    var pastY: Array[Int] = null; var pastCb: Array[Int] = null; var pastCr: Array[Int] = null

    var code = r.nextStartCode()
    while (code >= 0) {
      code match {
        case 0xB3 => // sequence header
          w = r.bits(12); h = r.bits(12)
          mbW = (w + 15) / 16; mbH = (h + 15) / 16
          r.bits(4); r.bits(4) // aspect, rate
          r.bits(18); r.bit(); r.bits(10); r.bit() // bitrate, marker, vbv, constrained
          if (r.bit() == 1) { // load_intra_quantizer_matrix (zigzag order)
            val m = new Array[Int](64)
            var i = 0; while (i < 64) { m(Zigzag(i)) = r.bits(8); i += 1 }
            iq = m
          }
          if (r.bit() == 1) { var i = 0; while (i < 64) { r.bits(8); i += 1 } }
          code = r.nextStartCode()
        case 0xB8 => // GOP header
          r.bits(25); r.bit(); r.bit()
          code = r.nextStartCode()
        case 0x00 => // picture
          r.bits(10) // temporal reference
          val ptype = r.bits(3)
          r.bits(16) // vbv_delay
          if (ptype != 1 && ptype != 2 && ptype != 3)
            throw Mpeg1Error(s"picture type $ptype unsupported (I/P/B only)")
          var fullPel = false; var fCode = 1
          var fullPelB = false; var fCodeB = 1
          if (ptype >= 2) { fullPel = r.bit() == 1; fCode = r.bits(3)
            if (fCode < 1 || fCode > 7) throw Mpeg1Error("bad forward_f_code") }
          if (ptype == 3) { fullPelB = r.bit() == 1; fCodeB = r.bits(3)
            if (fCodeB < 1 || fCodeB > 7) throw Mpeg1Error("bad backward_f_code") }
          while (r.bit() == 1) r.bits(8) // extra_information_picture
          if (ptype == 2 && refY == null) throw Mpeg1Error("P picture without reference")
          if (ptype == 3 && (refY == null || pastY == null))
            throw Mpeg1Error("B picture without two references")

          val cw = mbW * 8; val ch = mbH * 8
          val curY = new Array[Int](mbW * 16 * mbH * 16)
          val curCb = new Array[Int](cw * ch)
          val curCr = new Array[Int](cw * ch)
          val f = 1 << (fCode - 1)
          val fB = 1 << (fCodeB - 1)

          // scratch planes for interpolated B prediction (lazily sized
          // once per picture, reused across macroblocks)
          lazy val scrY = new Array[Int](curY.length)
          lazy val scrC = new Array[Int](curCb.length)

          // B prediction into cur at one macroblock: forward from past,
          // backward from ref (the future picture), interpolated = per-pel
          // rounded average (spec //2: half away from zero; pels are
          // non-negative, so (a+b+1)>>1)
          def predictBMb(mbx: Int, mby: Int, useF: Boolean, useB: Boolean,
                         fx: Int, fy: Int, bx: Int, by: Int): Unit = {
            val hfx = if (fullPel) fx * 2 else fx
            val hfy = if (fullPel) fy * 2 else fy
            val hbx = if (fullPelB) bx * 2 else bx
            val hby = if (fullPelB) by * 2 else by
            def one(dstP: Array[Int], scrP: Array[Int],
                    pastP: Array[Int], refP: Array[Int],
                    pw: Int, ph: Int, ox: Int, oy: Int, sz: Int,
                    fhx: Int, fhy: Int, bhx: Int, bhy: Int): Unit = {
              if (useF && useB) {
                predict(pastP, pw, ph, ox, oy, sz, fhx, fhy, dstP, pw)
                predict(refP, pw, ph, ox, oy, sz, bhx, bhy, scrP, pw)
                var yy = 0
                while (yy < sz) {
                  var xx = 0
                  while (xx < sz) {
                    val p = (oy + yy) * pw + ox + xx
                    dstP(p) = (dstP(p) + scrP(p) + 1) >> 1
                    xx += 1
                  }
                  yy += 1
                }
              } else if (useF) predict(pastP, pw, ph, ox, oy, sz, fhx, fhy, dstP, pw)
              else predict(refP, pw, ph, ox, oy, sz, bhx, bhy, dstP, pw)
            }
            one(curY, scrY, pastY, refY, mbW * 16, mbH * 16,
              mbx * 16, mby * 16, 16, hfx, hfy, hbx, hby)
            one(curCb, scrC, pastCb, refCb, cw, ch, mbx * 8, mby * 8, 8,
              hfx / 2, hfy / 2, hbx / 2, hby / 2)
            one(curCr, scrC, pastCr, refCr, cw, ch, mbx * 8, mby * 8, 8,
              hfx / 2, hfy / 2, hbx / 2, hby / 2)
          }

          // slices
          code = r.nextStartCode()
          while (code >= 0x01 && code <= 0xAF) {
            var qscale = r.bits(5)
            while (r.bit() == 1) r.bits(8) // extra_bit_slice
            var mbAddr = (code - 1) * mbW - 1
            var dcY = 128; var dcCb = 128; var dcCr = 128
            var pmvX = 0; var pmvY = 0
            // B-picture state: separate fwd/bwd MV predictors, plus the
            // previous MB's prediction directions (a skipped B MB repeats
            // them with the CURRENT pmvs — spec §2.4.4.3; prevIntraB
            // guards the illegal skip-after-intra / skip-first cases)
            var pmvFx = 0; var pmvFy = 0; var pmvBx = 0; var pmvBy = 0
            var prevMf = false; var prevMbk = false; var prevIntraB = true
            val blk = new Array[Int](64)
            var sliceDone = false
            while (!sliceDone) {
              // macroblock_address_increment (with stuffing/escape)
              var inc = 0
              var reading = true
              while (reading) {
                var codeBits = 0; var len = 0; var matched = false
                while (!matched && len < 12) {
                  codeBits = (codeBits << 1) | r.bit(); len += 1
                  if (len == MbaStuffing._2 && codeBits == MbaStuffing._1) { matched = true } // stuffing: retry
                  else if (len == MbaEscape._2 && codeBits == MbaEscape._1) { inc += 33; matched = true }
                  else MbaCodes.foreach { case (v, (c, l)) =>
                    if (!matched && l == len && c == codeBits) { inc += v; matched = true; reading = false } }
                }
                if (!matched) throw Mpeg1Error("bad macroblock_address_increment")
              }
              val newAddr = mbAddr + inc
              // skipped macroblocks: P copies the co-located reference and
              // resets the MV predictor; B repeats the PREVIOUS MB's
              // prediction directions with the current (unreset) pmvs
              if (inc > 1) {
                if (ptype == 1) throw Mpeg1Error("skipped macroblock in I picture")
                if (ptype == 3) {
                  if (prevIntraB)
                    throw Mpeg1Error("skipped B macroblock after intra or at slice start")
                  var a = mbAddr + 1
                  while (a < newAddr) {
                    predictBMb(a % mbW, a / mbW, prevMf, prevMbk,
                      pmvFx, pmvFy, pmvBx, pmvBy)
                    a += 1
                  }
                  dcY = 128; dcCb = 128; dcCr = 128
                } else {
                  var a = mbAddr + 1
                  while (a < newAddr) {
                    copyMb(refY, refCb, refCr, curY, curCb, curCr, a % mbW, a / mbW, mbW)
                    a += 1
                  }
                  pmvX = 0; pmvY = 0
                  dcY = 128; dcCb = 128; dcCr = 128
                }
              }
              mbAddr = newAddr
              val mbx = mbAddr % mbW; val mby = mbAddr / mbW

              // macroblock_type
              var intra = false; var mf = false; var quant = false; var pattern = false
              var mbk = false // B-only: backward motion
              if (ptype == 1) {
                if (r.bit() == 1) intra = true
                else if (r.bit() == 1) { intra = true; quant = true }
                else throw Mpeg1Error("bad I macroblock_type")
              } else if (ptype == 2) {
                if (r.bit() == 1) { mf = true; pattern = true }
                else if (r.bit() == 1) pattern = true
                else if (r.bit() == 1) mf = true
                else if (r.bits(2) == 3) intra = true          // 00011
                else throw Mpeg1Error("macroblock_type outside supported subset")
              } else {
                // B-picture macroblock_type (ISO 11172-2 table B.2d),
                // decoded by leading-zero count: 1p=interp, 01p=bwd,
                // 001p=fwd (p = coded_block_pattern flag), 00011=intra,
                // 00010=quant+interp+cbp, 000011=quant+fwd+cbp,
                // 000010=quant+bwd+cbp, 000001=quant+intra
                var z = 0
                while (z <= 5 && r.bit() == 0) z += 1
                z match {
                  case 0 => mf = true; mbk = true; pattern = r.bit() == 1
                  case 1 => mbk = true; pattern = r.bit() == 1
                  case 2 => mf = true; pattern = r.bit() == 1
                  case 3 =>
                    if (r.bit() == 1) intra = true
                    else { quant = true; mf = true; mbk = true; pattern = true }
                  case 4 =>
                    if (r.bit() == 1) { quant = true; mf = true; pattern = true }
                    else { quant = true; mbk = true; pattern = true }
                  case 5 => quant = true; intra = true
                  case _ => throw Mpeg1Error("bad B macroblock_type")
                }
              }
              if (quant) qscale = r.bits(5)

              if (ptype == 3 && !intra) {
                // B motion + prediction: each coded direction updates its
                // own predictor; prediction uses the resulting pmvs (an
                // uncoded direction keeps — and never resets — its pmv)
                if (mf) {
                  val cx = mvDecode(r)
                  val rx = if (fCode > 1 && cx != 0) r.bits(fCode - 1) else 0
                  val cy = mvDecode(r)
                  val ry = if (fCode > 1 && cy != 0) r.bits(fCode - 1) else 0
                  pmvFx = reconMv(cx, rx, f, pmvFx)
                  pmvFy = reconMv(cy, ry, f, pmvFy)
                }
                if (mbk) {
                  val cx = mvDecode(r)
                  val rx = if (fCodeB > 1 && cx != 0) r.bits(fCodeB - 1) else 0
                  val cy = mvDecode(r)
                  val ry = if (fCodeB > 1 && cy != 0) r.bits(fCodeB - 1) else 0
                  pmvBx = reconMv(cx, rx, fB, pmvBx)
                  pmvBy = reconMv(cy, ry, fB, pmvBy)
                }
                predictBMb(mbx, mby, mf, mbk, pmvFx, pmvFy, pmvBx, pmvBy)
                dcY = 128; dcCb = 128; dcCr = 128
                prevMf = mf; prevMbk = mbk; prevIntraB = false
              }

              if (mf && ptype == 2) {
                val cx = mvDecode(r)
                val rx = if (fCode > 1 && cx != 0) r.bits(fCode - 1) else 0
                val cy = mvDecode(r)
                val ry = if (fCode > 1 && cy != 0) r.bits(fCode - 1) else 0
                pmvX = reconMv(cx, rx, f, pmvX)
                pmvY = reconMv(cy, ry, f, pmvY)
                val hx = if (fullPel) pmvX * 2 else pmvX
                val hy = if (fullPel) pmvY * 2 else pmvY
                predict(refY, mbW * 16, mbH * 16, mbx * 16, mby * 16, 16, hx, hy, curY, mbW * 16)
                // chroma vectors: half the luma vector, truncation toward zero
                val chx = (hx / 2) // still half-pel units at chroma resolution
                val chy = (hy / 2)
                predict(refCb, cw, ch, mbx * 8, mby * 8, 8, chx, chy, curCb, cw)
                predict(refCr, cw, ch, mbx * 8, mby * 8, 8, chx, chy, curCr, cw)
                dcY = 128; dcCb = 128; dcCr = 128
              }

              // coded-but-unmoved P macroblock ('01' pattern-only type):
              // prediction is the co-located reference, MV predictor resets
              if (ptype == 2 && !intra && !mf) {
                copyMb(refY, refCb, refCr, curY, curCb, curCr, mbx, mby, mbW)
                pmvX = 0; pmvY = 0
                dcY = 128; dcCb = 128; dcCr = 128
              }

              if (intra) {
                if (ptype == 2) { pmvX = 0; pmvY = 0 }
                if (ptype == 3) { // intra resets every B predictor (spec)
                  pmvFx = 0; pmvFy = 0; pmvBx = 0; pmvBy = 0
                  prevIntraB = true
                }
                var b = 0
                while (b < 4) { // luminance blocks
                  dcY = decodeBlock(r, lum = true, qscale, iq, dcY, blk)
                  writeBlock(idct8x8(blk), curY, mbW * 16,
                    mbx * 16 + (b % 2) * 8, mby * 16 + (b / 2) * 8)
                  b += 1
                }
                dcCb = decodeBlock(r, lum = false, qscale, iq, dcCb, blk)
                writeBlock(idct8x8(blk), curCb, cw, mbx * 8, mby * 8)
                dcCr = decodeBlock(r, lum = false, qscale, iq, dcCr, blk)
                writeBlock(idct8x8(blk), curCr, cw, mbx * 8, mby * 8)
              } else if (pattern) {
                // non-intra coded residual blocks over the MC/co-located
                // prediction already written into cur
                val cbp = cbpDecode(r)
                var b = 0
                while (b < 6) {
                  if ((cbp & (32 >> b)) != 0) {
                    decodeBlockNI(r, qscale, blk)
                    val sp = idct8x8(blk)
                    if (b < 4)
                      addBlock(sp, curY, mbW * 16,
                        mbx * 16 + (b % 2) * 8, mby * 16 + (b / 2) * 8)
                    else if (b == 4) addBlock(sp, curCb, cw, mbx * 8, mby * 8)
                    else addBlock(sp, curCr, cw, mbx * 8, mby * 8)
                  }
                  b += 1
                }
              }

              // end of slice: 23 zero bits next (or stream end)
              val nxt = r.peek(23)
              if (nxt == 0 || nxt == -1 || r.remainingBits < 23) sliceDone = true
            }
            code = r.nextStartCode()
          }
          frames += cropFrame(curY, curCb, curCr, mbW, mbH, w, h)
          // I/P become references (most-recent shifts to past); B never do
          if (ptype != 3) {
            pastY = refY; pastCb = refCb; pastCr = refCr
            refY = curY; refCb = curCb; refCr = curCr
          }
        case 0xB7 => code = -1 // sequence end
        case _ => code = r.nextStartCode() // user data / extensions: skip
      }
    }
    if (frames.isEmpty) throw Mpeg1Error("no pictures decoded")
    frames.toSeq
  }

  private def copyMb(refY: Array[Int], refCb: Array[Int], refCr: Array[Int],
                     curY: Array[Int], curCb: Array[Int], curCr: Array[Int],
                     mbx: Int, mby: Int, mbW: Int): Unit = {
    val lw = mbW * 16; val cw = mbW * 8
    var y = 0
    while (y < 16) {
      System.arraycopy(refY, (mby * 16 + y) * lw + mbx * 16, curY, (mby * 16 + y) * lw + mbx * 16, 16)
      y += 1
    }
    var c = 0
    while (c < 8) {
      System.arraycopy(refCb, (mby * 8 + c) * cw + mbx * 8, curCb, (mby * 8 + c) * cw + mbx * 8, 8)
      System.arraycopy(refCr, (mby * 8 + c) * cw + mbx * 8, curCr, (mby * 8 + c) * cw + mbx * 8, 8)
      c += 1
    }
  }

  private def writeBlock(sp: Array[Int], plane: Array[Int], pw: Int,
                         ox: Int, oy: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val v = sp(y * 8 + x)
        plane((oy + y) * pw + ox + x) = math.max(0, math.min(255, v))
        x += 1
      }
      y += 1
    }
  }

  /** Residual add: prediction already sits in `plane`; the decoded
    * residual spatial block ADDS onto it, clamped (spec §2.4.4.4). */
  private def addBlock(sp: Array[Int], plane: Array[Int], pw: Int,
                       ox: Int, oy: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val p = (oy + y) * pw + ox + x
        plane(p) = math.max(0, math.min(255, plane(p) + sp(y * 8 + x)))
        x += 1
      }
      y += 1
    }
  }

  private def cropFrame(yP: Array[Int], cbP: Array[Int], crP: Array[Int],
                        mbW: Int, mbH: Int, w: Int, h: Int): Frame = {
    val lw = mbW * 16; val cwFull = mbW * 8
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val y = new Array[Int](w * h); val cb = new Array[Int](cw * ch); val cr = new Array[Int](cw * ch)
    var r = 0
    while (r < h) { System.arraycopy(yP, r * lw, y, r * w, w); r += 1 }
    r = 0
    while (r < ch) {
      System.arraycopy(cbP, r * cwFull, cb, r * cw, cw)
      System.arraycopy(crP, r * cwFull, cr, r * cw, cw)
      r += 1
    }
    Frame(w, h, y, cb, cr)
  }

  // ------------------------------------------------------------- encoder

  /** Encode frames as an MPEG-1 I/P elementary stream. Dimensions must be
    * multiples of 16 (macroblock-aligned — the general crop path is
    * decoder-only). Frame 0 is intra; each later frame is a P picture
    * whose macroblocks are, per MB: SKIPPED when identical to the
    * co-located reference block, MC-ONLY when the caller's motion hint
    * reproduces the block exactly from the reference, and INTRA
    * otherwise — the spec-minimal encoder that still exercises every
    * inter-frame decode path. `mvHint` is a full-pel (dx, dy) global
    * motion per P frame (where the block content moved FROM, i.e.
    * cur(x,y) == prev(x+dx, y+dy)); pass (0,0) for static content.
    *
    * `codeResiduals = true` replaces P-frame intra refresh with CODED
    * NON-INTRA residual macroblocks (type '01': zero-MV prediction + CBP
    * + quantized-DCT residual blocks) — the full inter-coding path. Off
    * by default so residual-free streams stay byte-identical. */
  def encode(frames: Seq[Frame], qscale: Int = 8,
             mvHints: Seq[(Int, Int)] = Nil,
             codeResiduals: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "encode needs at least one frame")
    val w = frames.head.w; val h = frames.head.h
    require(w % 16 == 0 && h % 16 == 0, s"encoder needs MB-aligned dims, got ${w}x$h")
    require(frames.forall(f => f.w == w && f.h == h), "all frames must share dimensions")
    require(qscale >= 1 && qscale <= 31, s"qscale must be 1..31, got $qscale")
    val mbW = w / 16; val mbH = h / 16
    val bw = new BitWriter

    // sequence header
    bw.startCode(0xB3)
    bw.bits(w, 12); bw.bits(h, 12)
    bw.bits(1, 4)  // square pels
    bw.bits(3, 4)  // 25 fps
    bw.bits(0x3FFFF, 18); bw.bits(1, 1) // variable bitrate + marker
    bw.bits(0, 10); bw.bits(0, 1)       // vbv, constrained
    bw.bits(0, 1); bw.bits(0, 1)        // default matrices
    bw.startCode(0xB8)
    bw.bits(0, 25); bw.bits(1, 1); bw.bits(0, 1) // timecode, closed, broken

    var ref: Frame = null
    frames.zipWithIndex.foreach { case (fr, fi) =>
      val hint = if (fi == 0) (0, 0)
        else mvHints.lift(fi - 1).getOrElse((0, 0))
      encodePicture(bw, fr, ref, if (fi == 0) 1 else 2, qscale, hint, mbW, mbH,
        codeResiduals)
      // the decoder's reference is its own reconstruction; ours must match
      ref = reconstruct(fr, ref, if (fi == 0) 1 else 2, qscale, hint, mbW, mbH,
        codeResiduals)
    }
    bw.startCode(0xB7)
    bw.toArray
  }


  /** Encode DISPLAY-order frames as an MPEG-1 elementary stream with B
    * pictures: transmit order I, then per pair (P of display k+2, B of
    * display k+1), trailing odd frame as plain P — the minimal closed
    * IBP group structure (spec §2.4.1). B macroblocks choose, per MB:
    * SKIP (same prediction as the previous MB), FORWARD copy from the
    * past reference, BACKWARD copy from the future reference,
    * INTERPOLATED (per-pel rounded average — the spec //2), or INTRA
    * refresh — all with zero motion vectors (f_code 1), the
    * spec-minimal subset that still drives every B decode path:
    * dual-reference management, the B-type VLC, both-direction MV
    * predictors and B skip repetition. decode() emits frames in DECODE
    * order: (d0, d2, d1, d4, d3, ...). */
  def encodeIbp(display: Seq[Frame], qscale: Int = 8): Array[Byte] = {
    require(display.nonEmpty, "encodeIbp needs at least one frame")
    val w = display.head.w; val h = display.head.h
    require(w % 16 == 0 && h % 16 == 0, s"encoder needs MB-aligned dims, got ${w}x$h")
    require(display.forall(f => f.w == w && f.h == h), "all frames must share dimensions")
    require(qscale >= 1 && qscale <= 31, s"qscale must be 1..31, got $qscale")
    val mbW = w / 16; val mbH = h / 16
    val bw = new BitWriter
    bw.startCode(0xB3)
    bw.bits(w, 12); bw.bits(h, 12)
    bw.bits(1, 4); bw.bits(3, 4)
    bw.bits(0x3FFFF, 18); bw.bits(1, 1)
    bw.bits(0, 10); bw.bits(0, 1)
    bw.bits(0, 1); bw.bits(0, 1)
    bw.startCode(0xB8)
    bw.bits(0, 25); bw.bits(1, 1); bw.bits(0, 1)

    var past: Frame = null
    var futr: Frame = null
    encodePicture(bw, display.head, null, 1, qscale, (0, 0), mbW, mbH)
    futr = reconstruct(display.head, null, 1, qscale, (0, 0), mbW, mbH)
    var i = 1
    while (i < display.size) {
      if (i + 1 < display.size) {
        encodePicture(bw, display(i + 1), futr, 2, qscale, (0, 0), mbW, mbH)
        val rec = reconstruct(display(i + 1), futr, 2, qscale, (0, 0), mbW, mbH)
        past = futr; futr = rec
        encodePictureB(bw, display(i), past, futr, qscale, mbW, mbH)
        i += 2
      } else {
        encodePicture(bw, display(i), futr, 2, qscale, (0, 0), mbW, mbH)
        futr = reconstruct(display(i), futr, 2, qscale, (0, 0), mbW, mbH)
        i += 1
      }
    }
    bw.startCode(0xB7)
    bw.toArray
  }

  /** Per-MB B mode against the RECONSTRUCTED references (what the decoder
    * holds): 1 = forward copy matches, 2 = backward copy matches,
    * 3 = interpolated average matches, 4 = intra. Matching tolerates the
    * same `8·qscale` quantization-noise band as the P-mode decision
    * ([[mbMode]]); B pictures are never references, so tolerated noise
    * cannot compound. */
  private def bMbMode(cur: Frame, past: Frame, futr: Frame,
                      mbx: Int, mby: Int, qscale: Int): Int = {
    val tol = 8 * qscale
    if (mbMatches(cur, past, mbx, mby, 0, 0, tol)) 1
    else if (mbMatches(cur, futr, mbx, mby, 0, 0, tol)) 2
    else if (mbMatchesAvg(cur, past, futr, mbx, mby, tol)) 3
    else 4
  }

  private def mbMatchesAvg(cur: Frame, past: Frame, futr: Frame,
                           mbx: Int, mby: Int, tol: Int): Boolean = {
    val w = cur.w
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val p = (mby * 16 + y) * w + mbx * 16 + x
        if (math.abs(cur.y(p) - ((past.y(p) + futr.y(p) + 1) >> 1)) > tol) return false
        x += 1
      }
      y += 1
    }
    val cw = w / 2
    var c = 0
    while (c < 8) {
      var x = 0
      while (x < 8) {
        val p = (mby * 8 + c) * cw + mbx * 8 + x
        if (math.abs(cur.cb(p) - ((past.cb(p) + futr.cb(p) + 1) >> 1)) > tol) return false
        if (math.abs(cur.cr(p) - ((past.cr(p) + futr.cr(p) + 1) >> 1)) > tol) return false
        x += 1
      }
      c += 1
    }
    true
  }

  // Encode one B picture (zero-MV subset; decisions mirrored by
  // reconstructB()).
  private def encodePictureB(bw: BitWriter, cur: Frame, past: Frame,
                             futr: Frame, qscale: Int,
                             mbW: Int, mbH: Int): Unit = {
    bw.startCode(0x00)
    bw.bits(0, 10); bw.bits(3, 3); bw.bits(0xFFFF, 16)
    bw.bits(0, 1); bw.bits(1, 3) // forward: half-pel, f_code 1
    bw.bits(0, 1); bw.bits(1, 3) // backward: half-pel, f_code 1
    bw.bits(0, 1)
    bw.startCode(0x01)
    bw.bits(qscale, 5); bw.bits(0, 1)
    var dcY = 128; var dcCb = 128; var dcCr = 128
    var pending = 0
    var prevMode = -1
    val total = mbW * mbH
    var addr = 0
    while (addr < total) {
      val mbx = addr % mbW; val mby = addr / mbW
      val mode = bMbMode(cur, past, futr, mbx, mby, qscale)
      val mustCode = addr == 0 || addr == total - 1
      if (!mustCode && mode == prevMode && mode != 4) {
        // legal B skip: same prediction directions as the previous MB and
        // (zero-MV subset) identical vectors
        pending += 1
      } else {
        var inc = pending + 1
        while (inc > 33) { bw.bits(MbaEscape._1, MbaEscape._2); inc -= 33 }
        bw.bits(MbaCodes(inc)._1, MbaCodes(inc)._2)
        pending = 0
        mode match {
          case 1 => // forward only: '0010'
            bw.bits(2, 4)
            writeMv(bw, 0, 0, 1); writeMv(bw, 0, 0, 1)
          case 2 => // backward only: '010'
            bw.bits(2, 3)
            writeMv(bw, 0, 0, 1); writeMv(bw, 0, 0, 1)
          case 3 => // interpolated: '10'
            bw.bits(2, 2)
            writeMv(bw, 0, 0, 1); writeMv(bw, 0, 0, 1) // forward
            writeMv(bw, 0, 0, 1); writeMv(bw, 0, 0, 1) // backward
          case _ => // intra: '00011'
            bw.bits(3, 5)
            var b = 0
            while (b < 4) {
              dcY = encodeBlock(bw,
                takeBlock(cur.y, cur.w, mbx * 16 + (b % 2) * 8, mby * 16 + (b / 2) * 8),
                lum = true, qscale, dcY)
              b += 1
            }
            val cw = cur.w / 2
            dcCb = encodeBlock(bw, takeBlock(cur.cb, cw, mbx * 8, mby * 8), lum = false, qscale, dcCb)
            dcCr = encodeBlock(bw, takeBlock(cur.cr, cw, mbx * 8, mby * 8), lum = false, qscale, dcCr)
        }
        if (mode != 4) { dcY = 128; dcCb = 128; dcCr = 128 }
        prevMode = mode
      }
      addr += 1
    }
  }

  /** The decoder-identical reconstruction of a zero-MV B picture —
    * [[reconstruct]]'s sibling for [[encodePictureB]], exposed for the
    * spec suite to assert bit-exact decode. */
  private[graft] def reconstructB(cur: Frame, past: Frame, futr: Frame,
                                  qscale: Int, mbW: Int, mbH: Int): Frame = {
    val out = Frame(cur.w, cur.h,
      new Array[Int](cur.w * cur.h),
      new Array[Int](cur.w / 2 * cur.h / 2),
      new Array[Int](cur.w / 2 * cur.h / 2))
    val total = mbW * mbH
    var addr = 0
    while (addr < total) {
      val mbx = addr % mbW; val mby = addr / mbW
      bMbMode(cur, past, futr, mbx, mby, qscale) match {
        case 1 => copyMbFrames(past, out, mbx, mby)
        case 2 => copyMbFrames(futr, out, mbx, mby)
        case 3 =>
          val w = cur.w
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              val p = (mby * 16 + y) * w + mbx * 16 + x
              out.y(p) = (past.y(p) + futr.y(p) + 1) >> 1
              x += 1
            }
            y += 1
          }
          val cw = w / 2
          var c = 0
          while (c < 8) {
            var x = 0
            while (x < 8) {
              val p = (mby * 8 + c) * cw + mbx * 8 + x
              out.cb(p) = (past.cb(p) + futr.cb(p) + 1) >> 1
              out.cr(p) = (past.cr(p) + futr.cr(p) + 1) >> 1
              x += 1
            }
            c += 1
          }
        case _ => reconstructIntraMb(cur, out, mbx, mby, qscale)
      }
      addr += 1
    }
    out
  }

  // Encode one picture; block decisions mirrored by reconstruct().
  private def encodePicture(bw: BitWriter, cur: Frame, ref: Frame, ptype: Int,
                            qscale: Int, hint: (Int, Int), mbW: Int, mbH: Int,
                            codeResiduals: Boolean = false): Unit = {
    bw.startCode(0x00)
    bw.bits(0, 10); bw.bits(ptype, 3); bw.bits(0xFFFF, 16)
    // half-pel precision, f_code=2: deltas from a reset predictor to a
    // ±2-pel vector are ±4 half-pel units, representable as
    // (|code|-1)·f + r + 1 with |code| <= 3, f = 2
    if (ptype == 2) { bw.bits(0, 1); bw.bits(2, 3) }
    bw.bits(0, 1) // extra_bit_picture
    bw.startCode(0x01) // single slice
    bw.bits(qscale, 5); bw.bits(0, 1)

    var dcY = 128; var dcCb = 128; var dcCr = 128
    var pmvX = 0; var pmvY = 0
    var pending = 0 // skipped MBs to fold into the next increment
    var wroteAny = false
    val total = mbW * mbH
    var addr = 0
    while (addr < total) {
      val mbx = addr % mbW; val mby = addr / mbW
      val mode0 = mbMode(cur, ref, ptype, hint, mbx, mby, qscale)
      // residual coding replaces intra refresh in P pictures when enabled
      val mode =
        if (codeResiduals && mode0 == 2 && ptype == 2 && ref != null) 3
        else mode0
      // the first and last MB of a slice may not be skipped
      val mustCode = addr == 0 || addr == total - 1
      if (mode == 0 && !mustCode) {
        pending += 1
        pmvX = 0; pmvY = 0; dcY = 128; dcCb = 128; dcCr = 128
      } else {
        var inc = pending + 1
        while (inc > 33) { bw.bits(MbaEscape._1, MbaEscape._2); inc -= 33 }
        bw.bits(MbaCodes(inc)._1, MbaCodes(inc)._2)
        pending = 0; wroteAny = true
        val effMode = if (mode == 0) 1 else mode // forced-coded skip -> MC with (0,0)... as MV delta
        if (effMode == 1 && ptype == 2) {
          // MC-only macroblock, type '001'
          bw.bits(1, 3)
          val dx = if (mode == 0) 0 else hint._1
          val dy = if (mode == 0) 0 else hint._2
          writeMv(bw, dx * 2, pmvX, fCode = 2); writeMv(bw, dy * 2, pmvY, fCode = 2)
          pmvX = dx * 2; pmvY = dy * 2
          dcY = 128; dcCb = 128; dcCr = 128
        } else if (effMode == 3) {
          val (cbp, levels) = quantizeResidualMb(cur, ref, mbx, mby, qscale)
          if (cbp == 0) {
            // the whole residual quantized away: MC-only zero-MV copy
            bw.bits(1, 3)
            writeMv(bw, 0, pmvX, fCode = 2); writeMv(bw, 0, pmvY, fCode = 2)
          } else {
            bw.bits(1, 2) // macroblock_type '01': coded, no MV
            val (cc, cl) = CbpCodes(cbp)
            bw.bits(cc, cl)
            var b = 0
            while (b < 6) {
              if ((cbp & (32 >> b)) != 0) emitNIBlock(bw, levels(b))
              b += 1
            }
          }
          pmvX = 0; pmvY = 0
          dcY = 128; dcCb = 128; dcCr = 128
        } else {
          // intra
          if (ptype == 1) bw.bits(1, 1) else { bw.bits(3, 5); pmvX = 0; pmvY = 0 }
          var b = 0
          while (b < 4) {
            dcY = encodeBlock(bw, takeBlock(cur.y, cur.w, mbx * 16 + (b % 2) * 8, mby * 16 + (b / 2) * 8),
              lum = true, qscale, dcY)
            b += 1
          }
          val cw = cur.w / 2
          dcCb = encodeBlock(bw, takeBlock(cur.cb, cw, mbx * 8, mby * 8), lum = false, qscale, dcCb)
          dcCr = encodeBlock(bw, takeBlock(cur.cr, cw, mbx * 8, mby * 8), lum = false, qscale, dcCr)
        }
      }
      addr += 1
    }
    assert(wroteAny)
  }

  /** 0 = skip (prediction matches co-located reference), 1 = MC with
    * hint, 2 = intra. "Matches" is within `8·qscale` per pixel — the
    * reference is the lossy RECONSTRUCTION, so an exact-match rule would
    * never fire after frame 0; tolerating the quantization-noise band is
    * precisely the "prediction good enough, skip the residual" decision a
    * residual-free encoder must make (the decoder copies reference
    * pixels, so tolerated noise never compounds into new coding error).
    * MC requires EVEN hint components: odd full-pel luma shifts make the
    * chroma vector half-pel (interpolated), which the shift-match test
    * cannot represent — those macroblocks refresh as intra instead. */
  private def mbMode(cur: Frame, ref: Frame, ptype: Int, hint: (Int, Int),
                     mbx: Int, mby: Int, qscale: Int): Int = {
    if (ptype == 1 || ref == null) return 2
    val tol = 8 * qscale
    if (mbMatches(cur, ref, mbx, mby, 0, 0, tol)) return 0
    val (dx, dy) = hint
    if ((dx != 0 || dy != 0) && dx % 2 == 0 && dy % 2 == 0 &&
      math.abs(dx) <= 2 && math.abs(dy) <= 2 &&
      mbMatches(cur, ref, mbx, mby, dx, dy, tol)) return 1
    2
  }

  private def mbMatches(cur: Frame, ref: Frame, mbx: Int, mby: Int,
                        dx: Int, dy: Int, tol: Int): Boolean = {
    val w = cur.w; val h = cur.h
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val sx = mbx * 16 + x + dx; val sy = mby * 16 + y + dy
        if (sx < 0 || sx >= w || sy < 0 || sy >= h) return false
        if (math.abs(cur.y((mby * 16 + y) * w + mbx * 16 + x) - ref.y(sy * w + sx)) > tol)
          return false
        x += 1
      }
      y += 1
    }
    val cw = w / 2; val chh = h / 2
    val cdx = dx / 2; val cdy = dy / 2 // exact: mbMode admits even shifts only
    var y2 = 0
    while (y2 < 8) {
      var x2 = 0
      while (x2 < 8) {
        val sx = mbx * 8 + x2 + cdx; val sy = mby * 8 + y2 + cdy
        if (sx < 0 || sx >= cw || sy < 0 || sy >= chh) return false
        if (math.abs(cur.cb((mby * 8 + y2) * cw + mbx * 8 + x2) - ref.cb(sy * cw + sx)) > tol)
          return false
        if (math.abs(cur.cr((mby * 8 + y2) * cw + mbx * 8 + x2) - ref.cr(sy * cw + sx)) > tol)
          return false
        x2 += 1
      }
      y2 += 1
    }
    true
  }

  private def writeMv(bw: BitWriter, target: Int, pred: Int, fCode: Int): Unit = {
    val f = 1 << (fCode - 1)
    var d = target - pred
    val range = 32 * f
    if (d < -16 * f) d += range else if (d >= 16 * f) d -= range
    if (d == 0) { val (c, l) = MvCodes(0); bw.bits(c, l) }
    else {
      val mag = math.abs(d)
      val codeMag = (mag - 1) / f + 1
      val res = (mag - 1) % f
      val signed = if (d < 0) -codeMag else codeMag
      require(MvCodes.contains(signed), s"MV delta $d outside encoder subset")
      val (c, l) = MvCodes(signed)
      bw.bits(c, l)
      if (fCode > 1) bw.bits(res, fCode - 1)
    }
  }

  private def takeBlock(plane: Array[Int], pw: Int, ox: Int, oy: Int): Array[Int] = {
    val b = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) { b(y * 8 + x) = plane((oy + y) * pw + ox + x); x += 1 }
      y += 1
    }
    b
  }

  /** Quantize + emit one intra block; returns the new DC predictor.
    * AC levels ride the escape code (always legal), clamped to the 16-bit
    * escape range. */
  private def encodeBlock(bw: BitWriter, spatial: Array[Int], lum: Boolean,
                          qscale: Int, dcPred: Int): Int = {
    val f = fdct8x8(spatial)
    // DC: F00/8 rounded, predictor-differenced
    val dc = math.max(0, math.min(255, math.round(f(0) / 8.0).toInt))
    var diff = dc - dcPred
    val size = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    val (dcode, dlen) = (if (lum) DcLum else DcChr)(size)
    bw.bits(dcode, dlen)
    if (size > 0) bw.bits(if (diff >= 0) diff else diff + (1 << size) - 1, size)
    // AC in zigzag order: invert the intra dequant (F = (2*q*W*QFS)/16)
    var run = 0
    var i = 1
    while (i < 64) {
      val ri = Zigzag(i)
      val target = f(ri)
      var level = math.round(target * 16.0 / (2.0 * qscale * DefaultIntraQ(ri))).toInt
      level = math.max(-255, math.min(255, level))
      if (level == 0) run += 1
      else { emitEscape(bw, run, level); run = 0 }
      i += 1
    }
    bw.bits(2, 2) // EOB
    dc
  }

  /** The escape form (always legal for any run/level pair): '000001' +
    * 6-bit run + 8- or 16-bit level. */
  private def emitEscape(bw: BitWriter, run: Int, level: Int): Unit = {
    bw.bits(1, 6)
    bw.bits(run, 6)
    if (level >= -127 && level <= 127 && level != 0 && level != -128)
      bw.bits(level & 0xFF, 8)
    else if (level > 127) { bw.bits(0x00, 8); bw.bits(level, 8) }
    else { bw.bits(0x80, 8); bw.bits(level + 256, 8) }
  }

  /** Quantized NON-intra residual for one macroblock against the
    * co-located reference: 6 blocks (Y0..Y3, Cb, Cr), zigzag-order
    * levels, null where the block quantizes to all-zero.
    * Returns (coded_block_pattern, blocks). Flat non-intra matrix (16):
    * level = trunc(F / (2·qscale)), clamped to the escape range. */
  private def quantizeResidualMb(cur: Frame, ref: Frame, mbx: Int, mby: Int,
                                 qscale: Int): (Int, Array[Array[Int]]) = {
    val out = new Array[Array[Int]](6)
    var cbp = 0
    var b = 0
    while (b < 6) {
      val (plane, rplane, pw, ox, oy) =
        if (b < 4) (cur.y, ref.y, cur.w,
          mbx * 16 + (b % 2) * 8, mby * 16 + (b / 2) * 8)
        else if (b == 4) (cur.cb, ref.cb, cur.w / 2, mbx * 8, mby * 8)
        else (cur.cr, ref.cr, cur.w / 2, mbx * 8, mby * 8)
      val res = new Array[Int](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          res(y * 8 + x) =
            plane((oy + y) * pw + ox + x) - rplane((oy + y) * pw + ox + x)
          x += 1
        }
        y += 1
      }
      val f = fdct8x8(res)
      val lev = new Array[Int](64)
      var any = false
      var i = 0
      while (i < 64) {
        var l = (f(Zigzag(i)) / (2.0 * qscale)).toInt // trunc toward zero
        l = math.max(-255, math.min(255, l))
        lev(i) = l
        if (l != 0) any = true
        i += 1
      }
      if (any) { cbp |= 32 >> b; out(b) = lev }
      b += 1
    }
    (cbp, out)
  }

  /** Emit one coded non-intra block: every nonzero level as an escape
    * (legal in both first- and next-coefficient positions), then EOB.
    * The caller guarantees at least one nonzero level (cbp bit set). */
  private def emitNIBlock(bw: BitWriter, lev: Array[Int]): Unit = {
    var run = 0
    var i = 0
    while (i < 64) {
      val level = lev(i)
      if (level == 0) run += 1
      else { emitEscape(bw, run, level); run = 0 }
      i += 1
    }
    bw.bits(2, 2) // EOB
  }

  /** The encoder's model of the decoder, used for reference tracking:
    * what the decoder will reconstruct for this picture, computed with
    * the SAME per-MB decision function and the same quantize/dequant/
    * IDCT arithmetic as the emitted bitstream's decode — so later P
    * pictures predict from the decoder's frame, not the pristine input
    * (the standard closed-loop encoder requirement). */
  private def reconstruct(cur: Frame, ref: Frame, ptype: Int, qscale: Int,
                          hint: (Int, Int), mbW: Int, mbH: Int,
                          codeResiduals: Boolean = false): Frame = {
    val out = Frame(cur.w, cur.h,
      new Array[Int](cur.w * cur.h),
      new Array[Int](cur.w / 2 * cur.h / 2),
      new Array[Int](cur.w / 2 * cur.h / 2))
    val total = mbW * mbH
    var addr = 0
    while (addr < total) {
      val mbx = addr % mbW; val mby = addr / mbW
      val m0 = mbMode(cur, ref, ptype, hint, mbx, mby, qscale)
      val mode0 =
        if (codeResiduals && m0 == 2 && ptype == 2 && ref != null) 3 else m0
      val mustCode = addr == 0 || addr == total - 1
      val mode = if (mode0 == 0 && mustCode) 1 else mode0
      if (mode == 0 || (mode == 1 && mode0 == 0)) {
        // skip or forced-coded zero-MV MC: copy co-located reference
        copyMbFrames(ref, out, mbx, mby)
      } else if (mode == 1) {
        copyShifted(ref, out, mbx, mby, hint._1, hint._2)
      } else if (mode == 3) {
        reconstructResidualMb(cur, ref, out, mbx, mby, qscale)
      } else {
        reconstructIntraMb(cur, out, mbx, mby, qscale)
      }
      addr += 1
    }
    out
  }

  /** Quantize-dequantNI-IDCT one residual MB exactly as the decoder will
    * (zero-MV prediction + clamped residual add); an all-zero-quantized
    * residual reconstructs as the plain co-located copy, matching the
    * encoder's cbp=0 MC-only fallback. */
  private def reconstructResidualMb(cur: Frame, ref: Frame, dst: Frame,
                                    mbx: Int, mby: Int, qscale: Int): Unit = {
    val (cbp, levels) = quantizeResidualMb(cur, ref, mbx, mby, qscale)
    copyMbFrames(ref, dst, mbx, mby)
    var b = 0
    while (b < 6) {
      if ((cbp & (32 >> b)) != 0) {
        val deq = new Array[Int](64)
        var i = 0
        while (i < 64) {
          if (levels(b)(i) != 0) deq(Zigzag(i)) = dequantNI(levels(b)(i), qscale)
          i += 1
        }
        val sp = idct8x8(deq)
        if (b < 4)
          addBlock(sp, dst.y, cur.w, mbx * 16 + (b % 2) * 8, mby * 16 + (b / 2) * 8)
        else if (b == 4) addBlock(sp, dst.cb, cur.w / 2, mbx * 8, mby * 8)
        else addBlock(sp, dst.cr, cur.w / 2, mbx * 8, mby * 8)
      }
      b += 1
    }
  }

  private def copyMbFrames(src: Frame, dst: Frame, mbx: Int, mby: Int): Unit =
    copyShifted(src, dst, mbx, mby, 0, 0)

  private def copyShifted(src: Frame, dst: Frame, mbx: Int, mby: Int,
                          dx: Int, dy: Int): Unit = {
    val w = src.w
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        dst.y((mby * 16 + y) * w + mbx * 16 + x) =
          src.y((mby * 16 + y + dy) * w + mbx * 16 + x + dx)
        x += 1
      }
      y += 1
    }
    val cw = w / 2
    val cdx = dx / 2; val cdy = dy / 2
    var c = 0
    while (c < 8) {
      var x = 0
      while (x < 8) {
        dst.cb((mby * 8 + c) * cw + mbx * 8 + x) =
          src.cb((mby * 8 + c + cdy) * cw + mbx * 8 + x + cdx)
        dst.cr((mby * 8 + c) * cw + mbx * 8 + x) =
          src.cr((mby * 8 + c + cdy) * cw + mbx * 8 + x + cdx)
        x += 1
      }
      c += 1
    }
  }

  /** Quantize-dequantize-IDCT one intra MB exactly as the decoder will. */
  private def reconstructIntraMb(cur: Frame, dst: Frame, mbx: Int, mby: Int,
                                 qscale: Int): Unit = {
    def roundTrip(plane: Array[Int], outPlane: Array[Int], pw: Int, ox: Int, oy: Int): Unit = {
      val f = fdct8x8(takeBlock(plane, pw, ox, oy))
      val deq = new Array[Int](64)
      val dc = math.max(0, math.min(255, math.round(f(0) / 8.0).toInt))
      deq(0) = dc * 8
      var i = 1
      while (i < 64) {
        val ri = Zigzag(i)
        var level = math.round(f(ri) * 16.0 / (2.0 * qscale * DefaultIntraQ(ri))).toInt
        level = math.max(-255, math.min(255, level))
        if (level != 0) deq(ri) = dequant(level, qscale, DefaultIntraQ(ri))
        i += 1
      }
      val sp = idct8x8(deq)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          outPlane((oy + y) * pw + ox + x) = math.max(0, math.min(255, sp(y * 8 + x)))
          x += 1
        }
        y += 1
      }
    }
    var b = 0
    while (b < 4) {
      roundTrip(cur.y, dst.y, cur.w, mbx * 16 + (b % 2) * 8, mby * 16 + (b / 2) * 8)
      b += 1
    }
    roundTrip(cur.cb, dst.cb, cur.w / 2, mbx * 8, mby * 8)
    roundTrip(cur.cr, dst.cr, cur.w / 2, mbx * 8, mby * 8)
  }
}
