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

  test("out-of-subset streams fail loudly, garbage never decodes") {
    intercept[Mpeg1.Mpeg1Error](Mpeg1.decode(Array.fill(64)(0x42.toByte)))
    // a P macroblock with macroblock_pattern ('01' = coded, no MC) must
    // raise, not guess: residual decode is outside the testable subset
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
    bw.bits(1, 2) // macroblock_type '01': pattern-only
    bw.startCode(0xB7)
    intercept[Mpeg1.Mpeg1Error](Mpeg1.decode(bw.toArray))
  }
}
