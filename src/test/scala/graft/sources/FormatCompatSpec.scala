package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** On-disk manifest format compatibility (ADVICE r14): this revision
  * stamps `#format=2` in every manifest; pre-header (format-1) manifests
  * ordered stats lines `col|file|min|max` and wrote DV addresses
  * URI-escaped. The contract: format-1 STATS parse exactly via the old
  * field order (the header's absence is the discriminator); format-1
  * manifests carrying DELETION VECTORS are refused loudly with the
  * rewrite remedy — their escaped addresses would silently stop matching
  * the decoded scan addresses, resurrecting deleted rows.
  *
  * The tests perform manifest surgery by hand — they ARE the legacy
  * writer.
  */
class FormatCompatSpec extends SparkSpec {

  private def tempTable(): String =
    java.nio.file.Files.createTempDirectory("snapfmt").toString + "/t"

  private def mkDf(ks: Seq[Long]) = {
    import spark.implicits._
    ks.map(k => (k, k % 2, k * 7L)).toDF("k", "p", "v")
  }

  /** Rewrite version `v`'s manifest through `fix`, bypassing the commit
    * protocol — the stand-in for a file written by the old revision. */
  private def rewriteManifest(dir: String, v: Long,
      fix: Seq[String] => Seq[String]): Unit = {
    val p = java.nio.file.Paths.get(dir, "_manifests", s"v$v.manifest")
    val lines = java.nio.file.Files.readAllLines(p)
    val fixed = fix(scala.jdk.CollectionConverters
      .ListHasAsScala(lines).asScala.toSeq)
    java.nio.file.Files.write(p,
      scala.jdk.CollectionConverters.SeqHasAsJava(fixed).asJava)
    // surgery bypasses the commit protocol, so drop the memoized lines
    SnapshotTable.invalidateManifestCache(
      new org.apache.hadoop.fs.Path(p.toString).toString)
    (): Unit
  }

  test("format-1 stats lines (old col|file|min|max order) parse via the " +
      "fallback and prune ranges identically") {
    val dir = tempTable()
    SnapshotTable.writeClustered(spark, dir, mkDf(1L to 400L), "p", "k",
      rangeParts = 4)
    val statsBefore = SnapshotTable.fileStats(spark, dir, "k")
    assert(statsBefore.nonEmpty)
    val (_, keptBefore, totBefore) =
      SnapshotTable.readRange(spark, dir, "k", 10L, 60L)
    // de-evolve the manifest to format 1: drop the header, swap the
    // stats fields back to the old order
    rewriteManifest(dir, 1L, lines => lines.flatMap { l =>
      if (l.startsWith("#format=")) None
      else if (l.startsWith("%")) {
        val Array(c, mn, mx, f) = l.stripPrefix("%").split("\\|", 4)
        Some(s"%$c|$f|$mn|$mx")
      } else Some(l)
    })
    assert(SnapshotTable.fileStats(spark, dir, "k") == statsBefore,
      "format-1 stats must parse to the same index")
    val (df, kept, tot) = SnapshotTable.readRange(spark, dir, "k", 10L, 60L)
    assert((kept, tot) == (keptBefore, totBefore),
      "pruning must be identical under the fallback parse")
    assert(df.count() == 51L)
  }

  test("a format-1 manifest carrying deletion vectors is refused with " +
      "the rewrite remedy on every read path") {
    val dir = tempTable()
    SnapshotTable.write(spark, dir, mkDf(1L to 50L), "p")
    SnapshotTable.deleteWhereDV(spark, dir, col("k") === 7L) // v2: has a DV
    rewriteManifest(dir, 2L,
      _.filterNot(_.startsWith("#format=")))
    val e = intercept[IllegalStateException] {
      SnapshotTable.read(spark, dir).count()
    }
    assert(e.getMessage.contains("Rewrite the table"), e.getMessage)
    intercept[IllegalStateException] {
      SnapshotTable.readChangesSince(spark, dir, 1L)
    }
    // a DV-free format-1 manifest stays readable (append-era tables)
    val plain = tempTable()
    SnapshotTable.write(spark, plain, mkDf(1L to 10L), "p")
    rewriteManifest(plain, 1L, _.filterNot(_.startsWith("#format=")))
    assert(SnapshotTable.read(spark, plain).count() == 10L)
  }
}
