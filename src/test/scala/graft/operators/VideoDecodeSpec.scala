package graft.operators

import graft.{ImageIoDecoder, MjpegAviDecoder, MultimodalQueries, SparkSpec, WavDecoder}

/** Real-codec gate for the video modality: actual RIFF/AVI payloads with
  * JDK-encoded JPEG frames, demuxed by the hand-rolled RIFF walker and
  * decoded frame-by-frame through javax.imageio, via the SAME featurize
  * plumbing as the image/audio/FakeDecoder paths. Pins: true dims +
  * frame count from the container, luma consistency with the
  * single-image decoder on identical frame bytes, decode-twice
  * determinism, the fail-vs-skip ledger on non-AVI payloads, and
  * three-modality routing over one mixed corpus.
  */
class VideoDecodeSpec extends SparkSpec {

  private def records(payloads: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    payloads.map { case (id, b) => MultimodalQueries.MediaRecord(id, b, "video") }
      .toDS()
  }

  test("decode real MJPEG-AVIs: dims, frame count, luma — twice identically") {
    val payloads = Seq(
      1L -> MjpegAviDecoder.syntheticAvi(16, 12, nFrames = 3, seed = 5),
      2L -> MjpegAviDecoder.syntheticAvi(8, 8, nFrames = 1, seed = 42))
    def run() = MultimodalQueries.featurize(records(payloads), MjpegAviDecoder)
      .collect().sortBy(_.doc_id)
    val a = run(); val b = run()
    assert(a.toSeq == b.toSeq, "decode must be deterministic across runs")
    assert(a.map(f => (f.doc_id, f.width, f.height, f.n_frames)).toSeq ==
      Seq((1L, 16L, 12L, 3L), (2L, 8L, 8L, 1L)))
    assert(a(0).byte_len == payloads(0)._2.length.toLong)
    // mean luma over all frames == pixel-count-weighted mean of the
    // per-frame single-image decodes on the SAME extracted frame bytes
    val fs = MjpegAviDecoder.frames(payloads(0)._2)
    assert(fs.length == 3)
    val per = fs.map(f => ImageIoDecoder.decode(0L, f, "image"))
    val nPix = per.map(p => p.width * p.height).sum
    val expected = per.map(p => p.mean_byte * (p.width * p.height)).sum / nPix
    assert(math.abs(a(0).mean_byte - expected) < 1e-9,
      s"video luma ${a(0).mean_byte} != frame-weighted ${expected}")
  }

  test("RIFF walker: frame payloads round-trip the container byte-for-byte") {
    // encode known JPEG bytes, wrap, demux — the extracted chunks must be
    // the original encoded frames exactly (word-alignment padding never
    // leaks into payloads)
    val avi = MjpegAviDecoder.syntheticAvi(9, 7, nFrames = 4, seed = 11)
    val fs = MjpegAviDecoder.frames(avi)
    assert(fs.length == 4)
    fs.foreach { f =>
      assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8,
        "every extracted frame must start with the JPEG SOI marker")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img.getWidth == 9 && img.getHeight == 7)
    }
  }

  test("error policy: non-AVI payload fails loudly by default, skip mode ledgers") {
    val ok = MjpegAviDecoder.syntheticAvi(8, 8, 2, seed = 3)
    val bad = Array.tabulate[Byte](64)(i => (i * 37).toByte) // not RIFF
    val ds = records(Seq(1L -> ok, 2L -> bad))
    intercept[org.apache.spark.SparkException] {
      MultimodalQueries.featurize(ds, MjpegAviDecoder).collect()
    }
    val acc = spark.sparkContext.longAccumulator("skipped")
    val kept = MultimodalQueries
      .featurize(ds, MjpegAviDecoder, failOnError = false, skipped = Some(acc))
      .collect()
    assert(kept.map(_.doc_id).toSeq == Seq(1L))
    assert(acc.value == 1L, "skipped payloads must be ledgered, not silently dropped")
  }

  test("dHash: survives PNG→JPEG re-encoding, separates distinct content") {
    import java.awt.image.BufferedImage
    // pure horizontal luma gradient — adjacent-pixel relations are far
    // from tie, so lossy JPEG noise cannot flip them
    def gradient(invert: Boolean): BufferedImage = {
      val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val v = x * 255 / 63
        val g = if (invert) 255 - v else v
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    def encode(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val png = encode(gradient(invert = false), "png")
    val jpg = encode(gradient(invert = false), "jpg")
    val inv = encode(gradient(invert = true), "png")
    // byte-level hashes differ completely (PNG vs JPEG bytes share
    // nothing) — the pixel-level dHash is what survives the re-encode
    assert(!java.util.Arrays.equals(png, jpg))
    val (hp, hj, hi) = (ImageIoDecoder.dHash(png), ImageIoDecoder.dHash(jpg),
      ImageIoDecoder.dHash(inv))
    assert(hamming(hp, hj) <= 8,
      s"re-encode must be a near-dup: hamming ${hamming(hp, hj)}")
    assert(hamming(hp, hi) >= 48,
      s"inverted content must be far: hamming ${hamming(hp, hi)}")
    assert(hp == ImageIoDecoder.dHash(png), "dHash must be deterministic")
  }

  test("real frame sampling: stride demux matches single-image decodes") {
    import spark.implicits._
    val avi = MjpegAviDecoder.syntheticAvi(10, 8, nFrames = 5, seed = 21)
    val ds = Seq(MultimodalQueries.MediaRecord(7L, avi, "video")).toDS()
    val out = MultimodalQueries.sampleRealFrames(ds, stride = 2)
      .collect().sortBy(_.frame_idx)
    // frames 0, 2, 4 of 5 at stride 2
    assert(out.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L))
    assert(out.forall(f => f.width == 10L && f.height == 8L))
    // each sampled frame's luma equals the standalone image decode of the
    // same demuxed bytes
    val fs = MjpegAviDecoder.frames(avi)
    out.foreach { f =>
      val solo = ImageIoDecoder.decode(7L, fs(f.frame_idx.toInt), "image")
      assert(f.mean_luma == solo.mean_byte, s"frame ${f.frame_idx}: $f vs $solo")
    }
    // skip-with-ledger on a corrupt payload mixed into the corpus
    val bad = Seq(
      MultimodalQueries.MediaRecord(1L, avi, "video"),
      MultimodalQueries.MediaRecord(2L, Array.tabulate[Byte](32)(_.toByte), "video"))
      .toDS()
    val acc = spark.sparkContext.longAccumulator("skipped")
    val kept = MultimodalQueries
      .sampleRealFrames(bad, stride = 2, failOnError = false, skipped = Some(acc))
      .collect()
    assert(kept.map(_.doc_id).distinct.toSeq == Seq(1L))
    assert(acc.value == 1L)
  }

  test("three modalities route through one dispatching decoder") {
    import spark.implicits._
    val mixed = Seq(
      MultimodalQueries.MediaRecord(1L, ImageIoDecoder.syntheticPng(12, 8, 3), "image"),
      MultimodalQueries.MediaRecord(2L, WavDecoder.syntheticWav(50, 8000, 1, 7), "audio"),
      MultimodalQueries.MediaRecord(3L, MjpegAviDecoder.syntheticAvi(10, 6, 2, 9), "video"))
      .toDS()
    object Routing extends graft.MediaDecoder {
      def decode(id: Long, bytes: Array[Byte], mediaType: String) = mediaType match {
        case "audio" => WavDecoder.decode(id, bytes, mediaType)
        case "video" => MjpegAviDecoder.decode(id, bytes, mediaType)
        case _ => ImageIoDecoder.decode(id, bytes, mediaType)
      }
    }
    val out = MultimodalQueries.featurize(mixed, Routing).collect().sortBy(_.doc_id)
    assert(out.map(f => (f.doc_id, f.media_type, f.width, f.height, f.n_frames)).toSeq ==
      Seq((1L, "image", 12L, 8L, 1L), (2L, "audio", 8000L, 1L, 50L),
        (3L, "video", 10L, 6L, 2L)))
  }
}
