package graft.operators

import graft.{ImageIoDecoder, MultimodalQueries, SparkSpec}

/** Real-codec gate for the multimodal pipeline (VERDICT r7 #5): actual
  * PNG payloads decoded by javax.imageio through the SAME featurize
  * plumbing the oracle-gated FakeDecoder queries use — dimensions and
  * luma verified against the known rendered pixels, decode-twice
  * determinism pinned, and the skip-with-ledger error policy proven on
  * a corrupt payload.
  */
class ImageDecodeSpec extends SparkSpec {

  private def records(payloads: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    payloads.map { case (id, b) => MultimodalQueries.MediaRecord(id, b, "image") }
      .toDS()
  }

  test("decode real PNGs: true dimensions and exact luma, twice identically") {
    val payloads = Seq(1L -> ImageIoDecoder.syntheticPng(40, 30, seed = 7),
      2L -> ImageIoDecoder.syntheticPng(8, 8, seed = 99))
    def run() = MultimodalQueries.featurize(records(payloads), ImageIoDecoder)
      .collect().sortBy(_.doc_id)
    val a = run(); val b = run()
    assert(a.toSeq == b.toSeq, "decode must be deterministic across runs")
    assert(a.map(f => (f.doc_id, f.width, f.height, f.n_frames)).toSeq ==
      Seq((1L, 40L, 30L, 1L), (2L, 8L, 8L, 1L)))
    // luma recomputed here straight from the spec's own pixel formula
    def expectedLuma(w: Int, h: Int, seed: Int): Double = {
      var s = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val r = x * 255 / math.max(1, w - 1); val g = y * 255 / math.max(1, h - 1)
        val bl = (seed + 31 * x + 17 * y) & 0xff
        s += (299 * r + 587 * g + 114 * bl) / 1000
      }
      s.toDouble / (w * h)
    }
    assert(a(0).mean_byte == expectedLuma(40, 30, 7))
    assert(a(1).mean_byte == expectedLuma(8, 8, 99))
    assert(a(0).byte_len == payloads(0)._2.length.toLong, "byte_len is the raw payload size")
  }

  test("nearest-neighbor resize: exact output size, deterministic, correct corner pixels") {
    val png = ImageIoDecoder.syntheticPng(64, 48, seed = 3)
    val r1 = ImageIoDecoder.resizeNearest(png, 16, 16)
    val r2 = ImageIoDecoder.resizeNearest(png, 16, 16)
    assert(r1.length == 16 * 16 * 3)
    assert(r1.toSeq == r2.toSeq, "resize must be deterministic")
    // top-left source pixel is (x=0,y=0): r=0, g=0, b=seed
    assert((r1(0) & 0xff, r1(1) & 0xff, r1(2) & 0xff) == (0, 0, 3))
  }

  test("error policy: corrupt payload fails loudly by default, skip mode counts it") {
    val ok = ImageIoDecoder.syntheticPng(10, 10, seed = 1)
    val bad = Array.tabulate[Byte](64)(i => (i * 37).toByte) // not an image
    val ds = records(Seq(1L -> ok, 2L -> bad))
    intercept[org.apache.spark.SparkException] {
      MultimodalQueries.featurize(ds, ImageIoDecoder).collect()
    }
    val acc = spark.sparkContext.longAccumulator("skipped")
    val kept = MultimodalQueries
      .featurize(ds, ImageIoDecoder, failOnError = false, skipped = Some(acc))
      .collect()
    assert(kept.map(_.doc_id).toSeq == Seq(1L))
    assert(acc.value == 1L, "skipped payloads must be ledgered, not silently dropped")
  }
}
