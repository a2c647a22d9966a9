package graft.operators

import graft.{Mp4H264Decoder, UnsupportedMediaFeature}
import org.scalatest.funsuite.AnyFunSuite

/** CAVLC I_16x16 with FULL AC residuals (mb_type 15, CBP luma 15) — the
  * round-13 notch past luma-DC-only: the two remaining Table 9-5
  * coeff_token contexts (2 ≤ nC < 4, 4 ≤ nC < 8), the 15-position AC
  * block scan, per-4×4-block nC derivation across macroblock borders,
  * AC dequant (§8.5.12.1 — exact `normAdjust << qp/6` form with the
  * flat weight matrix), and the full §8.5.12.2 inverse core transform.
  *
  * Expected planes/checksums come from an independent from-spec Python
  * model (matrix-form Hadamard + direct inverse-transform butterflies,
  * structurally unlike the decoder's Scala) — the class-0 plane is also
  * re-derived by hand in comments below.
  */
class CavlcAcSpec extends AnyFunSuite {
  private val C = Mp4H264Decoder.Cavlc

  private def assertPrefixFree(name: String, codes: Seq[String]): Unit = {
    assert(codes.distinct.length == codes.length, s"$name: duplicate code")
    for (a <- codes; b <- codes if a != b)
      assert(!b.startsWith(a), s"$name: '$a' is a prefix of '$b'")
  }

  test("coeff_token 2<=nC<4 / 4<=nC<8 tables: 62 entries, prefix-free, Kraft") {
    for ((name, t, kraftNum, kraftDen) <- Seq(
      ("nC24", C.CoeffTokenNc24, 8191L, 8192L),
      ("nC48", C.CoeffTokenNc48, 1023L, 1024L))) {
      // one entry per legal (T1, T): T=0 has 1, T=1 has 2, T=2 has 3,
      // T>=3 have 4 -> 1+2+3+4*14 = 62
      assert(t.size == 62, s"$name: ${t.size} entries")
      assert(t.values.toSeq.distinct.length == 62, s"$name: duplicate value")
      t.values.foreach { case (t1, tot) =>
        assert(t1 >= 0 && t1 <= math.min(3, tot) && tot >= 0 && tot <= 16)
      }
      assertPrefixFree(name, t.keys.toSeq)
      // Kraft sum as an exact fraction over the longest code length —
      // completeness up to the spec's own single documented hole
      val maxLen = t.keys.map(_.length).max
      // keys is a SET — map to a Seq first or equal powers collapse
      val num = t.keys.toSeq.map(c => 1L << (maxLen - c.length)).sum
      assert(num * kraftDen == kraftNum * (1L << maxLen),
        s"$name: Kraft ${num}/${1L << maxLen}, expected $kraftNum/$kraftDen")
    }
  }

  test("round-trip: randomized 15-position AC scans across every context class") {
    val rnd = new scala.util.Random(1913L)
    for (trial <- 1 to 400) {
      val n = if (trial % 3 == 0) 15 else 16
      val scan = new Array[Int](n)
      val total = rnd.nextInt(n + 1)
      val pos = rnd.shuffle(scan.indices.toList).take(total).sorted
      // decode order runs from the HIGHEST scan position down: the first
      // up-to-3 of those may be trailing ±1s, everything after must have
      // |level| >= 2 (the encoder's §9.2.2 precondition)
      val nTrail = if (pos.isEmpty) 0 else rnd.nextInt(math.min(3, pos.length) + 1)
      pos.reverse.zipWithIndex.foreach { case (p, i) =>
        val mag = if (i < nTrail) 1 else 2 + rnd.nextInt(8)
        scan(p) = if (rnd.nextBoolean()) mag else -mag
      }
      for (nC <- Seq(0, 2, 3, 4, 7, 8, 16)) {
        val back = C.roundTrip(scan, nC)
        assert(back.toSeq == scan.toSeq,
          s"trial $trial nC=$nC n=$n: ${scan.mkString(",")} -> ${back.mkString(",")}")
      }
    }
  }

  /** Class-0 hand derivation (qp 28, lone MB, pred 128): DC scan [5,0…]
    * → dcY = (5·256+2)>>2 = 320 everywhere; block (0,0) adds AC level 2
    * at scan 0 → zigzag (0,1) → d(0,1) = 2·20·16 = 640 (normAdjust
    * mixed-parity 20 at m=4, << qp/6=4). Row-0 butterfly: e =
    * [960, 640, 0, −320]; columns are DC-only → every row of the block
    * reads ((e_j+32)>>6) = [15, 10, 0, −5] + pred → [143, 138, 128,
    * 123]; the 15 DC-only blocks stay (320+32)>>6 + 128 = 133. */
  test("end-to-end: single-MB AC block decodes to the hand-derived plane") {
    val dc5 = { val a = new Array[Int](16); a(0) = 5; a }
    val ac = { val a = new Array[Int](15); a(0) = 2; a }
    val flat0 = IndexedSeq.tabulate(16)(i =>
      if (i == 0) ac else new Array[Int](15))
    val mp4 = Mp4H264Decoder.syntheticMp4CavlcAc(16, 16, 28,
      Seq(Seq(Mp4H264Decoder.AcMb(dc5, flat0))))
    val Seq((w, h, y)) = Mp4H264Decoder.framesY(mp4)
    assert(w == 16 && h == 16)
    for (j <- 0 until 16; i <- 0 until 16) {
      val want =
        if (j < 4 && i < 4) Seq(143, 138, 128, 123)(i)
        else 133
      assert((y(j * 16 + i) & 0xff) == want, s"pixel ($i,$j)")
    }
  }

  private def checksum(y: Array[Byte]): (Long, Long, Long) = {
    var s = 0L; var wsum = 0L
    var i = 0
    while (i < y.length) {
      val v = (y(i) & 0xff).toLong
      s += v
      wsum = (wsum + v * (i + 1)) % 1000000007L
      i += 1
    }
    (y.length.toLong, s, wsum)
  }

  test("cross-MB nC chain drives the 2<=nC<8 contexts; checksums match the model") {
    // MB0: AC TotalCoeff 4 in block (3,0) -> MB1's DC and block (0,0)
    // parse with nC = 4 (4<=nC<8 table); MB1 block (1,0)'s in-MB left
    // neighbour has TotalCoeff 3 -> nC = 3 (2<=nC<4 table)
    val dc5 = { val a = new Array[Int](16); a(0) = 5; a }
    val dc3 = { val a = new Array[Int](16); a(0) = 3; a }
    def acOf(levels: Int*): Array[Int] = {
      val a = new Array[Int](15)
      levels.zipWithIndex.foreach { case (v, i) => a(i) = v }
      a
    }
    def grid(m: Map[Int, Array[Int]]): IndexedSeq[Array[Int]] =
      IndexedSeq.tabulate(16)(i => m.getOrElse(i, new Array[Int](15)))
    val mb0 = Mp4H264Decoder.AcMb(dc5, grid(Map(3 -> acOf(3, 2, 1, 1))))
    val mb1 = Mp4H264Decoder.AcMb(dc3,
      grid(Map(0 -> acOf(2, 1, 1), 1 -> acOf(1))))
    val mp4 = Mp4H264Decoder.syntheticMp4CavlcAc(32, 16, 28, Seq(Seq(mb0, mb1)))
    val Seq((_, _, y)) = Mp4H264Decoder.framesY(mp4)
    assert(checksum(y) == ((512L, 67848L, 17392320L)),
      s"got ${checksum(y)}") // from-spec Python model constants
  }

  test("qp 40 AC (the >=36 DC scaling path under coded AC)") {
    val dc2 = { val a = new Array[Int](16); a(0) = 2; a }
    val ac = { val a = new Array[Int](15); a(5) = -3; a }
    val scans = IndexedSeq.tabulate(16)(i =>
      if (i == 4 * 1 + 1) ac else new Array[Int](15)) // block (1,1)
    val mp4 = Mp4H264Decoder.syntheticMp4CavlcAc(16, 16, 40,
      Seq(Seq(Mp4H264Decoder.AcMb(dc2, scans))))
    val Seq((_, _, y)) = Mp4H264Decoder.framesY(mp4)
    assert(checksum(y) == ((256L, 34816L, 4473976L)), s"got ${checksum(y)}")
  }

  test("the fence narrowed, not vanished: plane-predicted I_16x16 quarantines") {
    // mb_type 4 (I_16x16_3_0_0: plane prediction) stays outside the
    // envelope — the probe writes a syntactically valid slice whose
    // first macroblock announces it
    val mp4 = Mp4H264Decoder.syntheticMp4CavlcAc(16, 16, 28,
      Seq(Seq(Mp4H264Decoder.UnsupportedProbeMb)))
    val e = intercept[UnsupportedMediaFeature] {
      Mp4H264Decoder.framesY(mp4)
    }
    assert(e.reason == "unsupported_macroblock", e.toString)
    assert(e.getMessage.contains("mb_type 4"), e.getMessage)
  }
}
