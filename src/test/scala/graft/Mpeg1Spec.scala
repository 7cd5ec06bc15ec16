package graft

import graft.pipeline.Mpeg1
import graft.pipeline.Mpeg1.{BitWriter, Frame}

/** The inter-frame codec, tested at three levels: encoder/decoder
  * round-trips (distortion bounds), motion-compensation/skip behavior
  * (P-frame machinery), and a HAND-ASSEMBLED bitstream written directly
  * from the spec's field layout — independent of the encoder — whose
  * half-pel prediction output is hand-computed. */
class Mpeg1Spec extends org.scalatest.funsuite.AnyFunSuite {

  private def flatFrame(w: Int, h: Int, y: Int, c: Int = 128): Frame =
    Frame(w, h, Array.fill(w * h)(y), Array.fill(w / 2 * h / 2)(c),
      Array.fill(w / 2 * h / 2)(c))

  private def patternFrame(w: Int, h: Int, shift: Int): Frame = {
    val y = Array.tabulate(w * h) { i =>
      val yy = i / w; val xx = i % w
      (graft.functions.TextHash.mix(7L + (yy + shift) * 4096L + (xx + shift)) & 0xFF).toInt
    }
    Frame(w, h, y, Array.fill(w / 2 * h / 2)(128), Array.fill(w / 2 * h / 2)(128))
  }

  test("I-frame round-trip: distortion bounded by the quantization step") {
    val f = patternFrame(48, 32, 0)
    for (q <- Seq(1, 2, 4)) {
      val bytes = Mpeg1.encode(Seq(f), qscale = q)
      val out = Mpeg1.decode(bytes)
      assert(out.length == 1)
      val d = out.head
      assert(d.w == 48 && d.h == 32)
      val errs = f.y.zip(d.y).map { case (a, b) => math.abs(a - b) }
      // intra reconstruction error is bounded by the dequant step
      // (~q·W/8 per coefficient); random-texture worst case stays well
      // inside 6q + DC rounding
      assert(errs.max <= 6 * q + 2, s"q=$q max=${errs.max}")
      assert(errs.sum.toDouble / errs.length <= 2.0 * q, s"q=$q mean")
      // flat chroma reconstructs exactly (DC-only blocks)
      assert(d.cb.forall(_ == 128) && d.cr.forall(_ == 128))
    }
  }

  test("P-frame skip: identical frames decode identical and cost almost nothing") {
    val f = patternFrame(64, 32, 0)
    val solo = Mpeg1.encode(Seq(f), qscale = 2)
    val pair = Mpeg1.encode(Seq(f, f), qscale = 2)
    val out = Mpeg1.decode(pair)
    assert(out.length == 2)
    assert(out(0).y.sameElements(out(1).y))
    // the P picture is skip/zero-MV MBs only: a handful of bytes, not a
    // second intra picture
    assert(pair.length - solo.length < solo.length / 10,
      s"P picture too large: ${pair.length - solo.length} vs I ${solo.length}")
  }

  test("P-frame motion compensation: planted (+2,+2) shift reproduces through MVs") {
    val w = 64; val h = 48
    def at(shift: Int) = patternFrame(w, h, shift)
    val frames = Seq(at(0), at(2), at(4))
    val bytes = Mpeg1.encode(frames, qscale = 2, mvHints = Seq((2, 2), (2, 2)))
    val out = Mpeg1.decode(bytes)
    assert(out.length == 3)
    // interior of frame k equals frame k-1 shifted by (2,2) EXACTLY — MC
    // copies the reconstructed reference, so interior MBs carry zero new
    // quantization error
    for (k <- 1 to 2; y <- 0 until h - 2; x <- 0 until w - 2
         if x < (w / 16 - 1) * 16 && y < (h / 16 - 1) * 16) {
      assert(out(k).y(y * w + x) == out(k - 1).y((y + 2) * w + x + 2),
        s"frame $k at ($x,$y)")
    }
    // and MC made the P frames cheap relative to the I frame: interior
    // MBs (6 of 12) motion-compensate, edge MBs (fresh content) refresh
    // as intra, so each P frame costs ~half an I frame — full intra
    // re-coding would put the total at ~3x the solo I frame
    val solo = Mpeg1.encode(Seq(at(0)), qscale = 2)
    assert(bytes.length < solo.length * 5 / 2,
      s"P frames re-coded as intra? ${bytes.length} vs I ${solo.length}")
  }

  test("P frames really depend on the reference: corrupting I corrupts P") {
    val frames = Seq(patternFrame(32, 32, 0), patternFrame(32, 32, 2))
    val bytes = Mpeg1.encode(frames, qscale = 2, mvHints = Seq((2, 2)))
    val clean = Mpeg1.decode(bytes)
    // flip luma bits inside the FIRST picture's payload (well past the
    // headers, well before the second picture startcode)
    val secondPic = {
      var o = 12; var found = -1
      while (found < 0 && o + 4 <= bytes.length) {
        if (bytes(o) == 0 && bytes(o + 1) == 0 && bytes(o + 2) == 1 &&
          bytes(o + 3) == 0) found = o
        o += 1
      }
      var second = -1; o = found + 4
      while (second < 0 && o + 4 <= bytes.length) {
        if (bytes(o) == 0 && bytes(o + 1) == 0 && bytes(o + 2) == 1 &&
          bytes(o + 3) == 0) second = o
        o += 1
      }
      second
    }
    val corrupt = bytes.clone()
    corrupt(secondPic - 40) = (corrupt(secondPic - 40) ^ 0x55).toByte
    val dirty = try Some(Mpeg1.decode(corrupt)) catch {
      case _: Mpeg1.Mpeg1Error => None // corruption may break parsing: also fine
    }
    dirty.foreach { d =>
      assert(!d(1).y.sameElements(clean(1).y),
        "P frame unchanged after corrupting its reference")
    }
  }

  test("hand-assembled spec bitstream: DC blocks parse, half-pel MC interpolates") {
    // Written from the ISO/IEC 11172-2 field layout directly — NOT via the
    // encoder — so the decoder's parse is checked against the spec text.
    val bw = new BitWriter
    // sequence header: 16x16, square pels, 25 fps, VBR
    bw.startCode(0xB3)
    bw.bits(16, 12); bw.bits(16, 12)
    bw.bits(1, 4); bw.bits(3, 4)
    bw.bits(0x3FFFF, 18); bw.bits(1, 1)
    bw.bits(0, 10); bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)
    // I picture
    bw.startCode(0x00)
    bw.bits(0, 10); bw.bits(1, 3); bw.bits(0xFFFF, 16); bw.bits(0, 1)
    bw.startCode(0x01)
    bw.bits(1, 5); bw.bits(0, 1) // qscale 1
    bw.bits(1, 1) // address increment 1
    bw.bits(1, 1) // macroblock_type: intra
    // Y0 (cols 0-7): DC 100. predictor 128 -> diff -28, size 5
    // ('1110'), bits = -28 + 31 = 3
    bw.bits(0xE, 4); bw.bits(3, 5); bw.bits(2, 2) // EOB
    // Y1 (cols 8-15): DC 200. pred 100 -> diff +100, size 7 ('111110')
    bw.bits(0x3E, 6); bw.bits(100, 7); bw.bits(2, 2)
    // Y2 (cols 0-7): DC 100. diff -100, size 7, bits -100+127=27
    bw.bits(0x3E, 6); bw.bits(27, 7); bw.bits(2, 2)
    // Y3: DC 200. diff +100
    bw.bits(0x3E, 6); bw.bits(100, 7); bw.bits(2, 2)
    // Cb, Cr: DC 128 = zero diff, chroma size-0 code '00'
    bw.bits(0, 2); bw.bits(2, 2)
    bw.bits(0, 2); bw.bits(2, 2)
    // P picture, full_pel=0, f_code=2
    bw.startCode(0x00)
    bw.bits(1, 10); bw.bits(2, 3); bw.bits(0xFFFF, 16)
    bw.bits(0, 1); bw.bits(2, 3); bw.bits(0, 1)
    bw.startCode(0x01)
    bw.bits(1, 5); bw.bits(0, 1)
    bw.bits(1, 1)  // address increment 1
    bw.bits(1, 3)  // macroblock_type '001': MC only
    // MVx: +1 half-pel: motion_code 1 ('010') + residual 0 (1 bit, f=2)
    bw.bits(2, 3); bw.bits(0, 1)
    // MVy: 0: motion_code 0 ('1'), no residual
    bw.bits(1, 1)
    bw.startCode(0xB7)

    val out = Mpeg1.decode(bw.toArray)
    assert(out.length == 2)
    val i = out(0)
    // DC-only blocks are exactly flat
    for (y <- 0 until 16; x <- 0 until 16)
      assert(i.y(y * 16 + x) == (if (x < 8) 100 else 200), s"I at ($x,$y)")
    assert(i.cb.forall(_ == 128) && i.cr.forall(_ == 128))
    // half-pel +x prediction: avg of ref(x) and ref(x+1), rounded up —
    // 150 exactly at the 100|200 boundary column, edge clamps at x=15
    val p = out(1)
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = if (x < 7) 100 else if (x == 7) 150 else 200
      assert(p.y(y * 16 + x) == want, s"P at ($x,$y): got ${p.y(y * 16 + x)}")
    }
  }

  test("B-frames: fwd/bwd/interp/intra/skip macroblocks all decode exactly") {
    val w = 64; val h = 32 // 4x2 macroblocks
    val q = 2
    val f0 = patternFrame(w, h, 0)
    val f2 = patternFrame(w, h, 8)
    // the decoder's references are RECONSTRUCTIONS — build the planted B
    // from the decoded I/P pair so fwd/bwd/interp matches are exact
    val ip = Mpeg1.decode(Mpeg1.encode(Seq(f0, f2), qscale = q))
    val r0 = ip(0); val r2 = ip(1)
    def avg(a: Int, b: Int) = (a + b + 1) >> 1
    val f1 = Frame(w, h,
      new Array[Int](w * h),
      new Array[Int](w / 2 * h / 2),
      new Array[Int](w / 2 * h / 2))
    // per-MB plan: 0=fwd 1=bwd 2=interp 3=intra 4=fwd 5=fwd(skips) 6=interp 7=bwd
    val plan = Array(1, 2, 3, 4, 1, 1, 3, 2)
    for (addr <- 0 until 8) {
      val mbx = addr % 4; val mby = addr / 4
      for (yy <- 0 until 16; xx <- 0 until 16) {
        val p = (mby * 16 + yy) * w + mbx * 16 + xx
        f1.y(p) = plan(addr) match {
          case 1 => r0.y(p)
          case 2 => r2.y(p)
          case 3 => avg(r0.y(p), r2.y(p))
          case _ => 200
        }
      }
      val cw = w / 2
      for (cc <- 0 until 8; xx <- 0 until 8) {
        val p = (mby * 8 + cc) * cw + mbx * 8 + xx
        f1.cb(p) = plan(addr) match {
          case 1 => r0.cb(p); case 2 => r2.cb(p)
          case 3 => avg(r0.cb(p), r2.cb(p)); case _ => 128
        }
        f1.cr(p) = plan(addr) match {
          case 1 => r0.cr(p); case 2 => r2.cr(p)
          case 3 => avg(r0.cr(p), r2.cr(p)); case _ => 128
        }
      }
    }
    val bytes = Mpeg1.encodeIbp(Seq(f0, f1, f2), qscale = q)
    val out = Mpeg1.decode(bytes)
    // decode order: I(d0), P(d2), B(d1)
    assert(out.length == 3)
    assert(out(0).y.sameElements(r0.y) && out(1).y.sameElements(r2.y))
    val b = out(2)
    for (addr <- 0 until 8 if plan(addr) != 4) {
      val mbx = addr % 4; val mby = addr / 4
      for (yy <- 0 until 16; xx <- 0 until 16) {
        val p = (mby * 16 + yy) * w + mbx * 16 + xx
        assert(b.y(p) == f1.y(p),
          s"MB $addr (mode ${plan(addr)}) luma mismatch at ($xx,$yy): ${b.y(p)} != ${f1.y(p)}")
      }
    }
    // the intra MB round-trips within the quantization bound (flat block)
    for (yy <- 0 until 16; xx <- 0 until 16) {
      val p = (0 * 16 + yy) * w + 3 * 16 + xx
      assert(math.abs(b.y(p) - 200) <= 6 * q + 2)
    }
    // B picture is overwhelmingly copies: far cheaper than an I picture
    val iOnly = Mpeg1.encode(Seq(f1), qscale = q)
    val ipOnly = Mpeg1.encode(Seq(f0, f2), qscale = q)
    assert(bytes.length - ipOnly.length < iOnly.length / 2,
      s"B picture too large: ${bytes.length - ipOnly.length} vs I ${iOnly.length}")
  }

  test("B-frames: longer IBPBP group keeps reference order straight") {
    val w = 48; val h = 32
    val q = 2
    // display d0..d4; B frames (d1, d3) are exact copies of their FUTURE
    // reference, so every B MB takes the backward path against the
    // correct (most recent I/P) reference — a slot-management probe
    val d0 = patternFrame(w, h, 0)
    val d2 = patternFrame(w, h, 4)
    val d4 = patternFrame(w, h, 9)
    val ipr = Mpeg1.decode(Mpeg1.encode(Seq(d0, d2, d4), qscale = q))
    val bytes = Mpeg1.encodeIbp(Seq(d0, ipr(1), d2, ipr(2), d4), qscale = q)
    val out = Mpeg1.decode(bytes)
    assert(out.length == 5)
    // decode order: I(d0) P(d2) B(=rec d2) P(d4) B(=rec d4)
    assert(out(1).y.sameElements(ipr(1).y))
    assert(out(2).y.sameElements(ipr(1).y), "first B must equal its future ref")
    assert(out(3).y.sameElements(ipr(2).y))
    assert(out(4).y.sameElements(ipr(2).y), "second B must equal its future ref")
  }

  test("B picture without two references fails loudly") {
    val bw = new BitWriter
    bw.startCode(0xB3)
    bw.bits(16, 12); bw.bits(16, 12)
    bw.bits(1, 4); bw.bits(3, 4)
    bw.bits(0x3FFFF, 18); bw.bits(1, 1)
    bw.bits(0, 10); bw.bits(0, 1)
    bw.bits(0, 1); bw.bits(0, 1)
    bw.startCode(0x00)
    bw.bits(0, 10); bw.bits(3, 3); bw.bits(0xFFFF, 16)
    bw.bits(0, 1); bw.bits(1, 3); bw.bits(0, 1); bw.bits(1, 3); bw.bits(0, 1)
    val e = intercept[Mpeg1.Mpeg1Error](Mpeg1.decode(bw.toArray))
    assert(e.getMessage.contains("two references"))
  }

  test("out-of-subset streams fail loudly, garbage never decodes") {
    intercept[Mpeg1.Mpeg1Error](Mpeg1.decode(Array.fill(64)(0x42.toByte)))
    // a '01' pattern-only macroblock whose CBP bits are start-code zeros
    // must raise (bad coded_block_pattern), not guess residuals
    val bw = new BitWriter
    bw.startCode(0xB3)
    bw.bits(16, 12); bw.bits(16, 12); bw.bits(1, 4); bw.bits(3, 4)
    bw.bits(0x3FFFF, 18); bw.bits(1, 1); bw.bits(0, 10)
    bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)
    bw.startCode(0x00)
    bw.bits(0, 10); bw.bits(1, 3); bw.bits(0xFFFF, 16); bw.bits(0, 1)
    bw.startCode(0x01)
    bw.bits(1, 5); bw.bits(0, 1)
    bw.bits(1, 1); bw.bits(1, 1)
    // one flat intra MB (DC 128 everywhere: luma size-0 '100', chroma '00')
    for (_ <- 0 until 4) { bw.bits(0x4, 3); bw.bits(2, 2) }
    bw.bits(0, 2); bw.bits(2, 2); bw.bits(0, 2); bw.bits(2, 2)
    bw.startCode(0x00)
    bw.bits(1, 10); bw.bits(2, 3); bw.bits(0xFFFF, 16)
    bw.bits(0, 1); bw.bits(1, 3); bw.bits(0, 1)
    bw.startCode(0x01)
    bw.bits(1, 5); bw.bits(0, 1)
    bw.bits(1, 1)
    bw.bits(1, 2) // macroblock_type '01': pattern-only, then zeros only
    bw.startCode(0xB7)
    intercept[Mpeg1.Mpeg1Error](Mpeg1.decode(bw.toArray))
  }

  test("CBP table structure: prefix-free, unique, Kraft sum 510/512") {
    val t = Mpeg1.cbpTable
    assert(t.keySet == (1 to 63).toSet) // every nonzero pattern, no cbp 0
    def bitsOf(c: Int, l: Int): String =
      (l - 1 to 0 by -1).map(b => (c >> b) & 1).mkString
    val codes = t.values.toSeq.map { case (c, l) => bitsOf(c, l) }
    assert(codes.distinct.size == codes.size)
    for (a <- codes; b <- codes if a != b)
      assert(!b.startsWith(a), s"'$a' prefixes '$b'")
    val kraft = t.values.map { case (_, l) => 1.0 / (1 << l) }.sum
    assert(math.abs(kraft - 510.0 / 512.0) < 1e-12, s"kraft $kraft")
  }

  test("P-frame coded residuals: round-trip distortion bounded, cheaper than intra") {
    // frame 2 = frame 1 plus a smooth brightness ramp: un-MC-able content
    // change that residual coding must capture
    val w = 48; val h = 32
    val f0 = patternFrame(w, h, 0)
    val f1 = Frame(w, h,
      f0.y.zipWithIndex.map { case (v, i) =>
        math.min(255, v + 20 + (i % w) / 8) },
      f0.cb.map(v => math.min(255, v + 10)), f0.cr.clone())
    for (q <- Seq(2, 4)) {
      val bytes = Mpeg1.encode(Seq(f0, f1), qscale = q, codeResiduals = true)
      val out = Mpeg1.decode(bytes)
      assert(out.length == 2)
      val errs = f1.y.zip(out(1).y).map { case (a, b) => math.abs(a - b) }
      // non-intra quantization step is 2q per coefficient; a smooth ramp
      // concentrates energy in a few coefficients — generous bound
      assert(errs.max <= 8 * q + 2, s"q=$q max=${errs.max}")
      assert(errs.sum.toDouble / errs.length <= 3.0 * q, s"q=$q mean")
      val errsCb = f1.cb.zip(out(1).cb).map { case (a, b) => math.abs(a - b) }
      assert(errsCb.max <= 8 * q + 2, s"q=$q chroma max=${errsCb.max}")
      // residual coding of a small delta must beat re-coding as intra
      val intraCoded = Mpeg1.encode(Seq(f0, f1), qscale = q)
      assert(bytes.length < intraCoded.length,
        s"residual P (${bytes.length}) not cheaper than intra refresh (${intraCoded.length})")
    }
  }

  test("coded residuals compose with skip: unchanged MBs still skip") {
    // only the top-left MB changes; the rest must still be skipped even
    // with residual coding enabled
    val w = 48; val h = 32
    val f0 = patternFrame(w, h, 0)
    val y1 = f0.y.clone()
    for (y <- 0 until 16; x <- 0 until 16)
      y1(y * w + x) = math.min(255, y1(y * w + x) + 40)
    val f1 = Frame(w, h, y1, f0.cb.clone(), f0.cr.clone())
    val bytes = Mpeg1.encode(Seq(f0, f1), qscale = 2, codeResiduals = true)
    val out = Mpeg1.decode(bytes)
    // untouched region decodes IDENTICAL to the reference reconstruction
    for (y <- 16 until h; x <- 0 until w)
      assert(out(1).y(y * w + x) == out(0).y(y * w + x), s"at ($x,$y)")
    // changed MB tracks the new content
    val errs = for (y <- 0 until 16; x <- 0 until 16)
      yield math.abs(out(1).y(y * w + x) - f1.y(y * w + x))
    assert(errs.max <= 18, s"changed-MB max err ${errs.max}")
    // a pair with NO change costs less than the residual-coded pair
    val still = Mpeg1.encode(Seq(f0, f0), qscale = 2, codeResiduals = true)
    assert(still.length < bytes.length)
  }

  test("hand-assembled coded-only P macroblock: spec-layout residual decodes") {
    // written from the field layout directly (NOT via the encoder): one
    // 16x16 I picture (flat 128), then a P picture whose single MB is
    // type '01' with cbp=32 (Y0 only) carrying a lone DC residual level
    // +2 -> dequantNI(2, qscale=1) = (2*2+1)*1*16/16 = 5 -> oddified 5;
    // IDCT of DC-only 5 is flat round(5/8)=1 per pel... exact: idct value
    // 5/8 = 0.625 rounds to 1 -> every Y0 pel = 129, everything else 128
    val bw = new BitWriter
    bw.startCode(0xB3)
    bw.bits(16, 12); bw.bits(16, 12); bw.bits(1, 4); bw.bits(3, 4)
    bw.bits(0x3FFFF, 18); bw.bits(1, 1); bw.bits(0, 10)
    bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)
    bw.startCode(0x00)
    bw.bits(0, 10); bw.bits(1, 3); bw.bits(0xFFFF, 16); bw.bits(0, 1)
    bw.startCode(0x01)
    bw.bits(1, 5); bw.bits(0, 1)
    bw.bits(1, 1); bw.bits(1, 1)
    for (_ <- 0 until 4) { bw.bits(0x4, 3); bw.bits(2, 2) }
    bw.bits(0, 2); bw.bits(2, 2); bw.bits(0, 2); bw.bits(2, 2)
    // P picture, full_pel=0, f_code=1
    bw.startCode(0x00)
    bw.bits(1, 10); bw.bits(2, 3); bw.bits(0xFFFF, 16)
    bw.bits(0, 1); bw.bits(1, 3); bw.bits(0, 1)
    bw.startCode(0x01)
    bw.bits(1, 5); bw.bits(0, 1)
    bw.bits(1, 1) // address increment 1
    bw.bits(1, 2) // macroblock_type '01': coded, no MV
    bw.bits(0xA, 4) // cbp=32 (Y0 only): code '1010', 4 bits
    // Y0 block, first coefficient as escape: run 0, level +2, then EOB
    bw.bits(1, 6); bw.bits(0, 6); bw.bits(2, 8)
    bw.bits(2, 2)
    bw.startCode(0xB7)
    val out = Mpeg1.decode(bw.toArray)
    assert(out.length == 2)
    val p = out(1)
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = if (x < 8 && y < 8) 129 else 128
      assert(p.y(y * 16 + x) == want, s"P at ($x,$y): got ${p.y(y * 16 + x)}")
    }
    assert(p.cb.forall(_ == 128) && p.cr.forall(_ == 128))
  }
}
