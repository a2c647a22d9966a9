package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

/** Pluggable media decoder surface (VERDICT r7 #5): the typed
  * mapPartitions pipelines in [[MultimodalQueries]] are parameterized
  * over this trait, so the deterministic [[MultimodalQueries.FakeDecoder]]
  * (which keeps the DuckDB-oracle hash gates byte-for-byte replicable)
  * and the REAL [[ImageIoDecoder]] run through the identical batch
  * plumbing — schema, partition locality, error policy.
  */
trait MediaDecoder extends Serializable {
  def decode(id: Long, bytes: Array[Byte],
      mediaType: String): MultimodalQueries.MediaFeatures
}

/** Real image decode via `javax.imageio` (in the JDK — zero added
  * dependencies, PNG/BMP/GIF/JPEG readers ship with every JVM).
  * Features mirror FakeDecoder's schema: true pixel dimensions and the
  * mean 8-bit luma over all pixels (ITU-R BT.601 integer weights, so
  * the value is bit-deterministic across runs and hosts — no float
  * accumulation order dependence; ImageDecodeSpec pins decode-twice
  * identity). Undecodable payloads throw; the pipeline's error policy
  * ([[MultimodalQueries.featurize]]) decides fail-vs-skip, because at
  * 100 TB corrupt blobs are routine and a single bad crawl record must
  * not kill a stage — but silent drops must be the caller's explicit
  * choice.
  */
object ImageIoDecoder extends MediaDecoder {
  def decode(id: Long, bytes: Array[Byte],
      mediaType: String): MultimodalQueries.MediaFeatures = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"record $id: payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var lumaSum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        // BT.601 luma in integer arithmetic: (299R + 587G + 114B) / 1000
        lumaSum += (299 * r + 587 * g + 114 * b) / 1000
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h.toLong
    MultimodalQueries.MediaFeatures(id, mediaType, bytes.length.toLong,
      w.toLong, h.toLong, 1L, if (n == 0) 0.0 else lumaSum.toDouble / n)
  }

  /** Deterministic nearest-neighbor resize to (dstW × dstH), returned as
    * packed RGB triplets — the normalize-before-encoder step m76 stubs,
    * on real pixels. Nearest-neighbor (not area-average) so the output
    * bytes are a pure function of the source pixels with no rounding
    * ambiguity. */
  def resizeNearest(bytes: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Byte](dstW * dstH * 3)
    var y = 0
    while (y < dstH) {
      val sy = math.min(h - 1, y * h / dstH)
      var x = 0
      while (x < dstW) {
        val sx = math.min(w - 1, x * w / dstW)
        val rgb = img.getRGB(sx, sy)
        val i = (y * dstW + x) * 3
        out(i) = ((rgb >> 16) & 0xff).toByte
        out(i + 1) = ((rgb >> 8) & 0xff).toByte
        out(i + 2) = (rgb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Test/fixture helper: render a deterministic RGB gradient and encode
    * it with the JDK's PNG writer — a REAL compressed image payload with
    * known pixel content, built without any external asset. */
  def syntheticPng(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 255 / math.max(1, w - 1)) & 0xff
        val g = (y * 255 / math.max(1, h - 1)) & 0xff
        val b = (seed + 31 * x + 17 * y) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
