package graft.operators

import graft.{MultimodalQueries, SparkSpec, WavDecoder}

/** Real-codec gate for the audio modality: actual RIFF/WAVE payloads
  * decoded by javax.sound.sampled through the SAME featurize plumbing as
  * the image and FakeDecoder paths — rate/channels/frames verified
  * against the written header, amplitude verified against the fixture's
  * own sample formula, decode-twice determinism pinned, and the
  * skip-with-ledger error policy proven on a corrupt payload.
  */
class AudioDecodeSpec extends SparkSpec {

  private def records(payloads: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    payloads.map { case (id, b) => MultimodalQueries.MediaRecord(id, b, "audio") }
      .toDS()
  }

  test("decode real WAVs: header fields and exact mean amplitude, twice identically") {
    val payloads = Seq(
      1L -> WavDecoder.syntheticWav(nFrames = 800, sampleRate = 16000, channels = 1, seed = 5),
      2L -> WavDecoder.syntheticWav(nFrames = 300, sampleRate = 8000, channels = 2, seed = 42))
    def run() = MultimodalQueries.featurize(records(payloads), WavDecoder)
      .collect().sortBy(_.doc_id)
    val a = run(); val b = run()
    assert(a.toSeq == b.toSeq, "decode must be deterministic across runs")
    assert(a.map(f => (f.doc_id, f.width, f.height, f.n_frames)).toSeq ==
      Seq((1L, 16000L, 1L, 800L), (2L, 8000L, 2L, 300L)))
    // mean |amplitude| recomputed here straight from the fixture formula
    def expectedMean(nSamples: Int, seed: Int): Double = {
      var s = 0L
      for (i <- 0 until nSamples) s += math.abs(WavDecoder.sample(i, seed).toLong)
      s.toDouble / nSamples / 256.0
    }
    assert(a(0).mean_byte == expectedMean(800, 5))
    assert(a(1).mean_byte == expectedMean(600, 42), "stereo: frames x channels samples")
    assert(a(0).byte_len == payloads(0)._2.length.toLong, "byte_len is the raw payload size")
  }

  test("windowEnergies matches the sample formula and m198's fingerprint collides on shared seeds") {
    val seed = 7
    val wav = WavDecoder.syntheticWav(nFrames = 1952, sampleRate = 16000,
      channels = 1, seed = seed)
    val en = WavDecoder.windowEnergies(wav, 32, 61)
    val expected = Array.tabulate(61) { w =>
      (w * 32 until (w + 1) * 32).map(i => math.abs(WavDecoder.sample(i, seed).toLong)).sum
    }
    assert(en.toSeq == expected.toSeq)
    // same seed, longer payload: identical first-61-window fingerprint
    val longer = WavDecoder.syntheticWav(2016, 16000, 1, seed)
    assert(WavDecoder.windowEnergies(longer, 32, 61).toSeq == en.toSeq,
      "shared-prefix payloads must share the fingerprint windows")
    // the m198 query surfaces those collisions as near-dups
    val out = graft.SparkEntry.queries("m198_audio_fingerprint")(spark, sf).collect()
    assert(out.nonEmpty)
    val bySig = out.groupBy(_.getLong(2))
    out.foreach { r =>
      val sameSig = bySig(r.getLong(2)).length - 1
      assert(r.getLong(3) >= sameSig,
        s"doc ${r.getLong(0)}: ${r.getLong(3)} near-dups but $sameSig identical-sig partners")
    }
  }

  test("m261 VAD: silent blocks decode to exact zero energy and segments merge maximally") {
    // fixture formula replayed from first principles: seed 7 -> period 6,
    // block b silent iff (b + 7) % 6 == 0 (b = 5, 11, 17, ...)
    val seed = 7
    val wav = WavDecoder.syntheticWavSegmented(64 * 32, 16000, seed)
    val en = WavDecoder.windowEnergies(wav, 32, 64)
    val period = 4 + seed % 3
    for (b <- 0 until 64) {
      if ((b + seed) % period == 0)
        assert(en(b) == 0L, s"silent block $b must decode to EXACT zeros")
      else {
        val expected = (b * 32 until (b + 1) * 32)
          .map(i => math.abs(WavDecoder.sample(i, seed).toLong)).sum
        assert(en(b) == expected, s"voiced block $b energy")
        assert(en(b) > 32L * 64, s"voiced block $b must clear the gate threshold")
      }
    }
    // the query's segments are exactly the maximal voiced runs of the rule
    val segs = graft.SparkEntry.queries("m261_audio_vad")(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 7L) // 7 % 23 = 7 -> this seed
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val voicedRuns = (0 until 64).foldLeft(List.empty[(Long, Long)]) { (acc, b) =>
      if ((b + seed) % period == 0) acc
      else acc match {
        case (s0, e0) :: tail if e0 == b - 1 => (s0, b.toLong) :: tail
        case _ => (b.toLong, b.toLong) :: acc
      }
    }.reverse.map { case (s0, e0) => (s0, e0, e0 - s0 + 1) }
    assert(segs.toSeq == voicedRuns,
      "segments must be the maximal voiced runs, merged across no gaps")
  }

  test("error policy: corrupt payload fails loudly by default, skip mode counts it") {
    val ok = WavDecoder.syntheticWav(100, 8000, 1, seed = 9)
    val bad = Array.tabulate[Byte](64)(i => (i * 37).toByte) // not a WAV
    val ds = records(Seq(1L -> ok, 2L -> bad))
    intercept[org.apache.spark.SparkException] {
      MultimodalQueries.featurize(ds, WavDecoder).collect()
    }
    val acc = spark.sparkContext.longAccumulator("skipped")
    val kept = MultimodalQueries
      .featurize(ds, WavDecoder, failOnError = false, skipped = Some(acc))
      .collect()
    assert(kept.map(_.doc_id).toSeq == Seq(1L))
    assert(acc.value == 1L, "skipped payloads must be ledgered, not silently dropped")
  }

  test("decoders compose per media_type: one corpus, image and audio rows routed") {
    // the MediaDecoder trait takes media_type, so a mixed corpus routes
    // through one dispatching decoder — the shape a real multimodal
    // table needs (no per-modality table split).
    import spark.implicits._
    val mixed = Seq(
      MultimodalQueries.MediaRecord(1L, graft.ImageIoDecoder.syntheticPng(12, 8, 3), "image"),
      MultimodalQueries.MediaRecord(2L, WavDecoder.syntheticWav(50, 8000, 1, 7), "audio"))
      .toDS()
    object Routing extends graft.MediaDecoder {
      def decode(id: Long, bytes: Array[Byte], mediaType: String) = mediaType match {
        case "audio" => WavDecoder.decode(id, bytes, mediaType)
        case _ => graft.ImageIoDecoder.decode(id, bytes, mediaType)
      }
    }
    val out = MultimodalQueries.featurize(mixed, Routing).collect().sortBy(_.doc_id)
    assert(out.map(f => (f.doc_id, f.media_type, f.width, f.height)).toSeq ==
      Seq((1L, "image", 12L, 8L), (2L, "audio", 8000L, 1L)))
  }
}
