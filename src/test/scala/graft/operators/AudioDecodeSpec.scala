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
