package graft.operators

import graft.Mp4H264Decoder
import org.scalatest.funsuite.AnyFunSuite

/** CAVLC I_16x16 luma-DC-only gate (the r13 boundary notch, VERDICT r12
  * #7): validates the transcribed ITU-T tables STRUCTURALLY (prefix-
  * freeness and Kraft completeness — a single-bit transcription typo in
  * a VLC table almost always breaks one of the two), the encoder/decoder
  * pair by round-trip over randomized coefficient vectors (covers every
  * reachable codeword class: all (T1, T) pairs, total_zeros values, run
  * lengths, level prefix/suffix escalation), and the full decode path
  * end-to-end against an INDEPENDENTLY computed expected Y plane (the
  * §8.5.10/§8.5.12/§8.3.3.3 arithmetic re-derived here, not shared with
  * the decoder).
  */
class CavlcSpec extends AnyFunSuite {
  private val C = Mp4H264Decoder.Cavlc

  private def assertPrefixFree(name: String, codes: Seq[String]): Unit = {
    assert(codes.distinct.length == codes.length, s"$name: duplicate code")
    for (a <- codes; b <- codes if a != b)
      assert(!b.startsWith(a), s"$name: '$a' is a prefix of '$b'")
  }

  private def kraft(codes: Seq[String]): Double =
    codes.map(c => math.pow(2.0, -c.length)).sum

  test("coeff_token nC<2 table: prefix-free, Kraft-complete up to the documented hole") {
    val codes = C.CoeffTokenNc01.keys.toSeq
    assert(codes.length == 62, "62 (TrailingOnes, TotalCoeff) entries")
    assertPrefixFree("coeff_token", codes)
    // the 15-zero codeword is unassigned in Table 9-5's first column —
    // the one hole; everything else must tile the code space exactly
    assert(math.abs(kraft(codes) - (1.0 - math.pow(2.0, -15))) < 1e-12,
      s"kraft ${kraft(codes)}")
  }

  test("total_zeros tables: prefix-free, complete except T=1's documented hole") {
    (1 to 15).foreach { t =>
      val col = C.TotalZeros(t)
      assert(col.length == 17 - t, s"T=$t column length")
      assertPrefixFree(s"total_zeros T=$t", col)
      val expected = if (t == 1) 1.0 - math.pow(2.0, -9) else 1.0
      assert(math.abs(kraft(col) - expected) < 1e-12,
        s"T=$t kraft ${kraft(col)}")
    }
  }

  test("run_before tables: prefix-free, complete except zerosLeft>6's hole") {
    (1 to 7).foreach { z =>
      val col = C.RunBefore(z)
      assertPrefixFree(s"run_before zl=$z", col)
      val expected = if (z == 7) 1.0 - math.pow(2.0, -11) else 1.0
      assert(math.abs(kraft(col) - expected) < 1e-12,
        s"zl=$z kraft ${kraft(col)}")
    }
  }

  test("round-trip property: encode→decode identity over randomized DC vectors") {
    val rng = new scala.util.Random(1314)
    // sweep density so every TotalCoeff 0..16, many total_zeros and run
    // shapes, trailing-one counts, and level escalation paths occur
    for (trial <- 0 until 2000) {
      val density = trial % 17
      val scan = new Array[Int](16)
      val positions = rng.shuffle((0 until 16).toList).take(density)
      positions.foreach { p =>
        // mix of ±1 (trailing-one candidates) and larger magnitudes
        // (suffix escalation); cap well inside the level_prefix fence
        val mag = rng.nextInt(4) match {
          case 0 => 1
          case 1 => 1 + rng.nextInt(2)
          case 2 => 2 + rng.nextInt(14)
          case _ => 2 + rng.nextInt(120)
        }
        scan(p) = if (rng.nextBoolean()) mag else -mag
      }
      for (nC <- Seq(0, 8, 16)) {
        val back = C.roundTrip(scan, nC)
        assert(back.toSeq == scan.toSeq,
          s"trial $trial nC=$nC: ${scan.toSeq} -> ${back.toSeq}")
      }
    }
  }

  /** Independent §8.5.10 + §8.5.12 + §8.3.3.3 model: expected flat value
    * of each 4×4 block of a DC-pred I_16x16 MB given its scan-ordered
    * DC levels, QP, and the DC prediction value. */
  private def expectedMb(scan: Array[Int], qp: Int, pred: Int): Array[Array[Int]] = {
    val zig = Seq((0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3),
      (1, 2), (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3))
    val c = Array.ofDim[Int](4, 4)
    zig.zipWithIndex.foreach { case ((i, j), k) => c(i)(j) = scan(k) }
    val h = Array(Array(1, 1, 1, 1), Array(1, 1, -1, -1),
      Array(1, -1, -1, 1), Array(1, -1, 1, -1))
    def mul(a: Array[Array[Int]], b: Array[Array[Int]]) =
      Array.tabulate(4, 4)((i, j) => (0 until 4).map(k => a(i)(k) * b(k)(j)).sum)
    val f = mul(mul(h, c), h)
    val v = Seq(10, 11, 13, 14, 16, 18)(qp % 6) * 16
    Array.tabulate(4, 4) { (i, j) =>
      val dc =
        if (qp >= 36) (f(i)(j) * v) << (qp / 6 - 6)
        else (f(i)(j) * v + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      math.max(0, math.min(255, pred + ((dc + 32) >> 6)))
    }
  }

  test("end-to-end: single CAVLC-DC macroblock decodes to the closed-form plane") {
    // one MB, one nonzero DC at scan 0, qp 28: dcY = (5·256+2)>>2 = 320
    // everywhere, r = (320+32)>>6 = 5, pred = 128 → flat 133
    val scan = new Array[Int](16); scan(0) = 5
    val mp4 = Mp4H264Decoder.syntheticMp4CavlcDc(16, 16, 28, Seq(Seq(scan)))
    val Seq((w, h, y)) = Mp4H264Decoder.framesY(mp4)
    assert((w, h) == (16, 16))
    assert(y.forall(b => (b & 0xff) == 133), s"got ${y.head & 0xff}")
    assert(Mp4H264Decoder.frameMeanLumas(mp4).toSeq == Seq(133L))
  }

  test("end-to-end: multi-MB picture, varied DC arrays, byte-exact vs the model") {
    // 2×2 MBs, qp 30, per-MB distinct DC level vectors exercising
    // T=0, T=1, T=16, and a sparse mixed vector (runs + total_zeros)
    val mbs = Seq(
      new Array[Int](16), // all-zero residual: pure prediction
      { val a = new Array[Int](16); a(0) = 3; a },
      Array.tabulate(16)(k => if (k % 2 == 0) 2 + k / 2 else -(1 + k / 2)),
      { val a = new Array[Int](16); a(2) = 4; a(7) = -1; a(11) = 1; a })
    val qp = 30
    val mp4 = Mp4H264Decoder.syntheticMp4CavlcDc(32, 32, qp, Seq(mbs))
    val Seq((w, h, y)) = Mp4H264Decoder.framesY(mp4)
    assert((w, h) == (32, 32))
    // replay the decoder's raster order with the independent model,
    // tracking DC prediction from the model's own reconstruction
    val plane = Array.ofDim[Int](32, 32)
    for (mb <- 0 until 4) {
      val (mbY, mbX) = ((mb / 2) * 16, (mb % 2) * 16)
      val hasA = mb % 2 > 0
      val hasB = mb >= 2
      var sum = 0L
      if (hasB) (0 until 16).foreach(i => sum += plane(mbY - 1)(mbX + i))
      if (hasA) (0 until 16).foreach(j => sum += plane(mbY + j)(mbX - 1))
      val pred =
        if (hasA && hasB) ((sum + 16) >> 5).toInt
        else if (hasA || hasB) ((sum + 8) >> 4).toInt
        else 128
      val blocks = expectedMb(mbs(mb), qp, pred)
      for (j <- 0 until 16; i <- 0 until 16)
        plane(mbY + j)(mbX + i) = blocks(j / 4)(i / 4)
    }
    for (j <- 0 until 32; i <- 0 until 32)
      assert((y(j * 32 + i) & 0xff) == plane(j)(i),
        s"pixel ($i,$j): decoded ${y(j * 32 + i) & 0xff} vs model ${plane(j)(i)}")
  }

  test("mixed I_PCM + CAVLC picture exercises the nC>=8 coeff_token context") {
    import Mp4H264Decoder.{PcmMb, DcMb}
    // 2×2: PCM | DC (left PCM → nC=16) / DC (top PCM → nC=16) |
    // DC (left ctx 0 + top ctx 0 → nC=0)
    val dc = { val a = new Array[Int](16); a(0) = 5; a }
    val mp4 = Mp4H264Decoder.syntheticMp4MixedPcmCavlc(32, 32, 28,
      Seq(PcmMb(200), DcMb(dc.clone()), DcMb(dc.clone()), DcMb(dc.clone())))
    val Seq((_, _, y)) = Mp4H264Decoder.framesY(mp4)
    def px(i: Int, j: Int) = y(j * 32 + i) & 0xff
    assert(px(0, 0) == 200, "PCM block intact")
    // MB1: left neighbour is the PCM MB (edge 200) → pred = (16·200+8)>>4
    // = 200, +5 residual = 205
    assert(px(16, 0) == 205, s"MB1 ${px(16, 0)}")
    // MB2: top neighbour PCM → pred 200 → 205
    assert(px(0, 16) == 205, s"MB2 ${px(0, 16)}")
    // MB3: left 205 + top 205 → pred (16·205+16·205+16)>>5 = 205 → 210
    assert(px(16, 16) == 210, s"MB3 ${px(16, 16)}")
  }

  test("fences: oversized level_prefix fails typed/loud") {
    // the 2<=nC<8 context fence moved OUT of coeff_token in round 13 —
    // those tables are now transcribed and CavlcAcSpec exercises them;
    // the envelope fence lives at the mb_type/prediction level instead
    // (CavlcAcSpec's plane-prediction quarantine probe).
    // A level magnitude far past the prefix cap still round-trips via the
    // 12-bit escape; one beyond the escape cap fails loudly in the encoder
    val big = new Array[Int](16); big(0) = 2000
    assert(C.roundTrip(big, 0).toSeq == big.toSeq)
    val tooBig = new Array[Int](16); tooBig(0) = 1 << 20
    intercept[IllegalArgumentException](C.roundTrip(tooBig, 0))
  }
}
