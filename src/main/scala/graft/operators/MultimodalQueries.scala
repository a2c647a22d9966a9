package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder-prompt north-star surface): media
  * payloads travel as opaque `binary` columns with typed metadata, and
  * per-batch decode/feature-extraction runs as partition-local Scala code
  * (`mapPartitions` over a typed Dataset — the Scala analogue of
  * `mapInPandas` batch UDFs).
  *
  * The container has no image/audio codecs, so [[FakeDecoder]] is a
  * clearly-marked deterministic stand-in: the Spark-side plumbing (binary
  * schema, batch iteration, partitioning, output schema) is real and
  * tested; swapping in a real decoder changes only the function body.
  */
object MultimodalQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** One media record: payload + metadata. Built from `documents` text
    * bytes, standing in for image/audio blobs. */
  case class MediaRecord(doc_id: Long, media: Array[Byte], media_type: String)

  case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Long,
      width: Long, height: Long, n_frames: Long, mean_byte: Double)

  /** STUB decoder — deterministic fake. A real deployment would replace
    * the body with an actual codec call (e.g. javax.imageio / ffmpeg
    * bindings); the signature (bytes → features) and the partition-local
    * batch loop around it stay identical. */
  object FakeDecoder {
    def decode(id: Long, bytes: Array[Byte], mediaType: String): MediaFeatures = {
      val len = bytes.length.toLong
      // fake "header parse": dimensions derived from content bytes
      val w = 64L + (if (len > 0) (bytes(0) & 0x7f).toLong else 0L)
      val h = 64L + (if (len > 1) (bytes(1) & 0x7f).toLong else 0L)
      val frames = if (mediaType == "video") 1L + len % 16L else 1L
      var sum = 0.0
      var i = 0
      while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
      MediaFeatures(id, mediaType, len, w, h, frames,
        if (len == 0) 0.0 else sum / len)
    }
  }

  val queries: Map[String, Q] = Map(
    /** Binary-column metadata pass — payload size, chunk count, sha256 —
      * pure Column DSL over binary, fully codegen'd, oracle-matched. */
    "m45_multimodal_meta" -> ((s, d) =>
      documents(s, d)
        .select(
          col("doc_id"),
          encode(col("text"), "UTF-8").as("media"))
        .select(
          col("doc_id"),
          octet_length(col("media")).cast("long").as("byte_len"),
          ceil(octet_length(col("media")).cast("double") / 4096.0).cast("long")
            .as("n_chunks"),
          sha2(col("media"), 256).as("sha256"))
        .orderBy("doc_id")),

    /** Partition-local batch decode via mapPartitions over a typed
      * Dataset — the real shape of a 100 TB media pipeline (each task
      * decodes its partition's blobs; no shuffle, no driver involvement).
      * Decode itself is the deterministic FakeDecoder stub. */
    "m46_media_features" -> ((s, d) => {
      import s.implicits._
      val records = documents(s, d)
        .select(
          col("doc_id"),
          encode(col("text"), "UTF-8").as("media"),
          // deterministic fake modality assignment
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"))
        .as[MediaRecord]
      records
        .mapPartitions(_.map(r => FakeDecoder.decode(r.doc_id, r.media, r.media_type)))
        .toDF()
        .orderBy("doc_id")
    }),

    /** Batch resize: every "image" payload downsampled to a 32×32 target —
      * the normalization step before a vision encoder. The stub "resize"
      * stride-samples the payload bytes to ≤1024 output bytes (a real
      * deployment swaps in a codec's scaler; the batch loop, binary-in/
      * binary-out schema, and partition locality are the real plumbing).
      * Emits source/target dims, resized length, and the resized payload's
      * sha256 so determinism is spec-checkable. */
    "m76_resize_batch" -> ((s, d) => {
      import s.implicits._
      val images = documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
          lit("image").as("media_type"))
        .filter(pmod(col("doc_id"), lit(3)) === 0) // the fake "image" modality
        .as[MediaRecord]
      val (dstW, dstH) = (32L, 32L)
      images
        .mapPartitions(_.map { r =>
          val f = FakeDecoder.decode(r.doc_id, r.media, r.media_type)
          val target = (dstW * dstH).toInt
          val stride = math.max(1, r.media.length / target)
          val resized = r.media.indices.by(stride).take(target)
            .map(r.media).toArray
          val sha = java.security.MessageDigest.getInstance("SHA-256")
            .digest(resized).map("%02x".format(_)).mkString
          (r.doc_id, f.width, f.height, dstW, dstH, resized.length.toLong, sha)
        })
        .toDF("doc_id", "src_width", "src_height", "dst_width", "dst_height",
          "resized_len", "resized_sha")
        .orderBy("doc_id")
    }),

    /** Frame sampling: one row per sampled frame of each "video" payload
      * (every 4th frame, deterministic) with its byte-range offsets — the
      * shape a video-training pipeline feeds to a decoder fleet: the
      * explode happens before the expensive per-frame work, so frames of
      * one video fan out across tasks. Decode itself stays the stub. */
    "m47_frame_sample" -> ((s, d) => {
      import s.implicits._
      val videos = documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
          lit("video").as("media_type"))
        .filter(pmod(col("doc_id"), lit(3)) === 2) // the fake "video" modality
        .as[MediaRecord]
      videos
        .mapPartitions(_.flatMap { r =>
          val f = FakeDecoder.decode(r.doc_id, r.media, r.media_type)
          val frameBytes = math.max(1L, f.byte_len / f.n_frames)
          (0L until f.n_frames by 4).map { idx =>
            (r.doc_id, idx, idx * frameBytes,
              math.min(f.byte_len, (idx + 1) * frameBytes), f.width, f.height)
          }
        })
        .toDF("doc_id", "frame_idx", "byte_start", "byte_end", "width", "height")
        .orderBy("doc_id", "frame_idx")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "m45_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / 4096.0) AS BIGINT) AS n_chunks,
        |  sha256(text) AS sha256
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
