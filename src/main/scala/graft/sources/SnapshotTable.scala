package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-isolated partitioned parquet table — the manifest-commit
  * protocol VERDICT r7 asked for (`Layouts.deleteWhere`'s dynamic
  * overwrite swaps partition directories in place, so a reader racing a
  * delete can observe a half-swapped table; here that race is closed).
  *
  * Design (the public Delta/Iceberg core idea, reduced to its minimum):
  *  - data files are IMMUTABLE and uniquely named; a mutation only ever
  *    ADDS files, never rewrites or deletes one in place;
  *  - `_manifests/v{N}.manifest` lists every data file of snapshot N
  *    (one relative path per line); the manifest is staged to a temp
  *    name and atomically PUBLISHED into place ([[publishIfAbsent]]:
  *    rename-without-overwrite on HDFS, link(2) on local filesystems —
  *    POSIX rename(2) would silently REPLACE an existing destination,
  *    so plain rename is not a CAS there);
  *  - readers resolve max-N once and read exactly that file list, so
  *    every query sees one complete snapshot: concurrent commits only
  *    add files the reader never looks at, and nothing a manifest
  *    references is deleted until `vacuum`;
  *  - two writers racing the same version: the loser's publish fails
  *    (destination exists) and it RE-DERIVES against the winner's
  *    committed state before retrying — optimistic concurrency without
  *    a lock service, and without the lost update a blind version-bump
  *    retry would cause (re-publishing a pre-race file/DV/stats list at
  *    the advanced version silently drops the winner's commit);
  *  - row-level deletes can commit as DELETION VECTORS ('~'-prefixed
  *    manifest lines naming parquet sidecars of (file, row-index)
  *    addresses under `_dv/`) — see [[deleteWhereDV]]: the data-file
  *    list is untouched, readers anti-join the addresses out, and
  *    [[compact]] folds accumulated DVs back into data files.
  *
  * Scale shape: a manifest holds one line per data file (file-count-,
  * not row-sized — the same class as compactParquet's intent file); the
  * delete path stages survivor files ONLY for partitions that contain
  * matches, so a 100 TB table pays for the partitions a user appears
  * in. Vacuum is the only operation that removes bytes, and it keeps
  * every file the latest manifest references, so it can run any time
  * after in-flight readers of older snapshots drain (the retention
  * contract every lakehouse vacuum has).
  */
object SnapshotTable {

  private val ManifestDir = "_manifests"

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestVersion(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("v") && n.endsWith(".manifest"))
      n.stripPrefix("v").stripSuffix(".manifest").toLongOption
    else None
  }

  private def readManifest(fs: FileSystem, path: Path): Seq[String] = {
    val in = fs.open(path)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** Data-file lines of a manifest (metadata lines start with '#',
    * deletion-vector lines with '~', file-stats lines with '%'). */
  private def dataLines(lines: Seq[String]): Seq[String] =
    lines.filter(l => l.nonEmpty && !l.startsWith("#") &&
      !l.startsWith("~") && !l.startsWith("%"))

  /** Deletion-vector sidecar lines of a manifest ('~'-prefixed relative
    * paths under `_dv/`). */
  private def dvLines(lines: Seq[String]): Seq[String] =
    lines.filter(_.startsWith("~")).map(_.stripPrefix("~"))

  /** Per-file column-stats lines ('%'-prefixed `col|file|min|max`) —
    * the data-skipping index. Self-describing (the column name rides in
    * the line), so stats survive commits without separate header
    * plumbing and several columns can be indexed side by side. */
  private def statLines(lines: Seq[String]): Seq[String] =
    lines.filter(_.startsWith("%")).map(_.stripPrefix("%"))

  /** Parse one stats line into (column, file, min, max). */
  private def parseStat(line: String): (String, String, Long, Long) = {
    val Array(c, f, mn, mx) = line.split('|')
    (c, f, mn.toLong, mx.toLong)
  }

  /** Stats lines still valid after a commit keeps only `kept` data
    * files (stats address immutable files, so validity IS presence). */
  private def carriedStats(stats: Seq[String], kept: Seq[String]): Seq[String] = {
    val keptSet = kept.toSet
    stats.filter(s => keptSet.contains(parseStat(s)._2))
  }

  /** Latest committed (version, data-file relative paths); None if the
    * table has no committed snapshot yet. */
  def latest(spark: SparkSession, dir: String): Option[(Long, Seq[String])] =
    latestFull(spark, dir).map { case (v, files, _) => (v, files) }

  /** Latest committed (version, data files, deletion-vector files). */
  def latestFull(spark: SparkSession,
      dir: String): Option[(Long, Seq[String], Seq[String])] =
    latestState(spark, dir).map { case (v, f, dv, _) => (v, f, dv) }

  /** Latest (version, files, dvs, stats lines); None when uncommitted. */
  private def latestState(spark: SparkSession,
      dir: String): Option[(Long, Seq[String], Seq[String], Seq[String])] = {
    val (fs, root) = fsFor(spark, dir)
    val mdir = new Path(root, ManifestDir)
    if (!fs.exists(mdir)) return None
    val versions = fs.listStatus(mdir).toSeq
      .flatMap(f => manifestVersion(f.getPath).map(_ -> f.getPath))
    if (versions.isEmpty) None
    else {
      val (v, path) = versions.maxBy(_._1)
      val lines = readManifest(fs, path)
      Some((v, dataLines(lines), dvLines(lines), statLines(lines)))
    }
  }

  /** Per-file min/max stats of `statsCol` in the latest snapshot, as
    * (file → (min, max)) — the inspection surface for the data-skipping
    * index [[writeClustered]] builds and [[readRange]] prunes with. */
  def fileStats(spark: SparkSession, dir: String,
      statsCol: String): Map[String, (Long, Long)] =
    latestState(spark, dir).map(_._4).getOrElse(Seq.empty)
      .map(parseStat).collect {
        case (c, f, mn, mx) if c == statsCol => f -> (mn, mx)
      }.toMap

  /** Read snapshot `version` (default: latest). The returned frame is
    * bound to that snapshot's exact file list — concurrent commits and
    * later vacuums of NEWER garbage never change what it reads. */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame =
    readResolved(spark, dir, version, withLineage = false)

  /** Column names of the row-address lineage pair [[readResolved]] can
    * attach: (relative data-file path, row index within that file). */
  private[sources] val FileCol = "__snap_file"
  private[sources] val PosCol = "__snap_pos"

  /** Snapshot read with deletion vectors applied and, when asked, the
    * (file, row-position) lineage pair kept on the frame — the stable
    * row ADDRESS every position-delete needs. Addresses come from the
    * parquet scan's `_metadata` struct (`file_path` + `row_index`,
    * generated by the reader, zero storage cost); data files are
    * immutable, so an address written into a DV stays valid until the
    * file itself leaves the manifest. The lineage columns (and the
    * `row_index` generation they force) are only paid for when DVs
    * exist or the caller needs addresses — a DV-free read keeps the
    * exact plain-scan plan.
    *
    * Scale shape: DVs hold one row per DELETED row, so the anti-join's
    * build side is delete-sized, not table-sized — AQE broadcasts it in
    * the common small-delete case, and a huge accumulated delete set
    * degrades to one shuffled anti-join, never a table rewrite. */
  private def readResolved(spark: SparkSession, dir: String,
      version: Option[Long], withLineage: Boolean,
      restrictTo: Option[Set[String]] = None): DataFrame = {
    val (fs, root) = fsFor(spark, dir)
    val (allFiles, dvs) = version match {
      case None =>
        val (_, fls, dv) = latestFull(spark, dir)
          .getOrElse(sys.error(s"$dir has no committed snapshot"))
        (fls, dv)
      case Some(v) =>
        val p = new Path(new Path(root, ManifestDir), s"v$v.manifest")
        require(fs.exists(p), s"$dir has no snapshot v$v")
        val lines = readManifest(fs, p)
        (dataLines(lines), dvLines(lines))
    }
    val files = restrictTo match {
      case Some(keep) => allFiles.filter(keep)
      case None => allFiles
    }
    require(files.nonEmpty, s"$dir snapshot is empty")
    // basePath keeps the hive partition column visible on per-file reads;
    // mergeSchema makes column ADDS a metadata-only evolution — files
    // written before the add surface the new column as null (the
    // Delta/Iceberg add-column contract; parquet footers carry each
    // file's own schema, so no data rewrite happens)
    val plain = spark.read.option("basePath", dir).option("mergeSchema", "true")
      .parquet(files.map(f => new Path(root, f).toString): _*)
    if (dvs.isEmpty && !withLineage) return plain
    // `substring_index(file_path, '/', -2)` = "part=<v>/<name>.parquet" —
    // exactly the manifest's relative-path format, independent of the
    // filesystem scheme/root the absolute URI carries
    val addressed = plain
      .withColumn(FileCol, substring_index(col("_metadata.file_path"), "/", -2))
      .withColumn(PosCol, col("_metadata.row_index"))
    val applied =
      if (dvs.isEmpty) addressed
      else addressed.join(
        spark.read.parquet(dvs.map(f => new Path(root, f).toString): _*)
          .select(col("file").as(FileCol), col("pos").as(PosCol)),
        Seq(FileCol, PosCol), "left_anti")
    if (withLineage) applied else applied.drop(FileCol, PosCol)
  }

  /** Commit history, newest first: (version, commit epoch millis, meta
    * headers) — the DESCRIBE HISTORY surface. Manifests written before
    * timestamps were stamped fall back to the manifest file's mtime. */
  def history(spark: SparkSession, dir: String): Seq[(Long, Long, Map[String, String])] = {
    val (fs, root) = fsFor(spark, dir)
    val mdir = new Path(root, ManifestDir)
    if (!fs.exists(mdir)) return Seq.empty
    fs.listStatus(mdir).toSeq
      .flatMap(f => manifestVersion(f.getPath).map(v => (v, f)))
      .sortBy(-_._1)
      .map { case (v, f) =>
        val meta = readManifest(fs, f.getPath)
          .filter(_.startsWith("#"))
          .flatMap { l =>
            l.stripPrefix("#").split("=", 2) match {
              case Array(k, value) => Some(k -> value)
              case _ => None
            }
          }.toMap
        val ts = meta.get("ts").flatMap(_.toLongOption)
          .getOrElse(f.getModificationTime)
        (v, ts, meta)
      }
  }

  /** Timestamp time travel (the `TIMESTAMP AS OF` surface): read the
    * highest-version snapshot committed at or before `tsMillis`. Commit
    * stamps live inside the atomically-renamed manifest, so the mapping
    * from timestamp to snapshot is as crash-consistent as the commits
    * themselves. */
  def readAsOf(spark: SparkSession, dir: String, tsMillis: Long): DataFrame = {
    val eligible = history(spark, dir).filter(_._2 <= tsMillis)
    require(eligible.nonEmpty,
      s"$dir has no snapshot committed at or before $tsMillis")
    read(spark, dir, Some(eligible.maxBy(_._1)._1))
  }

  /** Incremental append reader (change-feed-lite for append-only
    * workloads — the "process only what's new since my last run"
    * contract a downstream job wants): the rows of every data file
    * present in the latest snapshot but absent from `sinceVersion`'s
    * manifest. Exact for append/appendBatch workloads because data
    * files are immutable and uniquely named; after a rewriting
    * operation (deleteWhere/merge/compact) rewritten partitions'
    * files reappear as "new" — callers needing row-level semantics
    * under rewrites should diff snapshots by content (q142's CDC).
    * Returns None when nothing changed. */
  def readAppendsSince(spark: SparkSession, dir: String,
      sinceVersion: Long): Option[DataFrame] =
    readAppendsSinceVersioned(spark, dir, sinceVersion).map(_._2)

  /** As [[readAppendsSince]], but ALSO returns the snapshot version the
    * delta was diffed against — the version a read-modify-write
    * maintainer (MaterializedView.refresh) must record as covered.
    * Re-reading `latest()` after this call is a TOCTOU bug (ADVICE r10):
    * an append landing between the diff and the re-read would be
    * recorded as covered without its rows ever being aggregated, and no
    * later refresh would recover them. */
  def readAppendsSinceVersioned(spark: SparkSession, dir: String,
      sinceVersion: Long): Option[(Long, DataFrame)] = {
    val (fs, root) = fsFor(spark, dir)
    val sinceP = new Path(new Path(root, ManifestDir), s"v$sinceVersion.manifest")
    require(fs.exists(sinceP), s"$dir has no snapshot v$sinceVersion")
    val sinceLines = readManifest(fs, sinceP)
    val before = dataLines(sinceLines).toSet
    val (nowV, now, nowDvs, _) = latestState(spark, dir)
      .getOrElse(sys.error(s"$dir has no committed snapshot"))
    // a deletion vector is INVISIBLE to a file-list diff (it adds no
    // data file), so an incremental maintainer fed only "fresh files"
    // would silently keep rows a DV deleted — fail loudly instead of
    // going stale (deleteWhere/merge rewrites at least RESURFACE as new
    // files, which over-counts but cannot silently drop a deletion)
    if (dvLines(sinceLines).toSet != nowDvs.toSet)
      throw new IllegalStateException(
        s"$dir: the deletion-vector set changed between v$sinceVersion " +
          s"and v$nowV — append-diff reading cannot represent row " +
          "deletes; rebuild the derived state from the snapshot or diff " +
          "by content (q142's CDC)")
    val fresh = now.filterNot(before)
    if (fresh.isEmpty) None
    else Some(nowV ->
      spark.read.option("basePath", dir).option("mergeSchema", "true")
        .parquet(fresh.map(f => new Path(root, f).toString): _*))
  }

  /** Stage `df` under unique file names inside `dir`'s hive layout and
    * return the new files' relative paths (nothing is committed yet). */
  private def stage(spark: SparkSession, dir: String, df: DataFrame,
      partCol: String): Seq[String] = {
    val (fs, root) = fsFor(spark, dir)
    val tmp = new Path(dir.stripSuffix("/") + "__snap_stage_" +
      java.util.UUID.randomUUID().toString.take(8))
    df.write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
    val staged = fs.listStatus(tmp).filter(_.isDirectory).flatMap { pd =>
      fs.listStatus(pd.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(f => (pd.getPath.getName, f.getPath))
    }.toSeq
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val moved = staged.zipWithIndex.map { case ((part, src), i) =>
      val rel = s"$part/snap-$uuid-$i.parquet"
      val dest = new Path(root, rel)
      fs.mkdirs(dest.getParent)
      require(fs.rename(src, dest), s"could not stage $src into $dir")
      rel
    }
    fs.delete(tmp, true)
    moved
  }

  /** Atomic publish of fully-written `tmp` as `dest`, returning false
    * when `dest` already exists — the CAS primitive every commit rides.
    * On HDFS, rename refuses an existing destination, so plain rename IS
    * the primitive. On the local filesystem Hadoop delegates rename to
    * POSIX rename(2), which atomically REPLACES an existing destination
    * — two racing writers would both "succeed", one silently
    * overwriting the other's manifest (ADVICE r10). There the primitive
    * is link(2) (`Files.createLink`): it fails with EEXIST atomically
    * when the destination exists, and the linked name appears with the
    * tmp file's complete content, so reader atomicity is preserved.
    * Crash-safety is unchanged: a writer dying at any point leaves only
    * a `.tmp` name that no reader resolves and vacuum can sweep. */
  private[sources] def publishIfAbsent(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
    val local = Option(fs.getUri.getScheme).forall(_ == "file")
    if (local) {
      val t = java.nio.file.Paths.get(tmp.toUri.getPath)
      val d = java.nio.file.Paths.get(dest.toUri.getPath)
      try { java.nio.file.Files.createLink(d, t); fs.delete(tmp, false); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          // no-hardlink filesystem: plain rename is NOT a CAS on a
          // POSIX-replace filesystem — a losing racer's rename also
          // succeeds (silently replacing the winner), and no local
          // post-check can close that window (a losing rename also
          // removes tmp, so re-checking tmp proves nothing — ADVICE r11).
          // Degraded atomicity must be a DELIBERATE choice (ADVICE r12):
          // fail fast unless the deployment explicitly opts in to
          // single-writer semantics on this filesystem.
          val optIn = org.apache.spark.sql.SparkSession.getActiveSession
            .exists(_.conf.get(
              "spark.graft.snapshot.unsafeRenameFallback", "false").toBoolean)
          if (!optIn)
            throw new IllegalStateException(
              s"no hardlink support for $dest: the version-commit CAS " +
                "would degrade to a non-atomic rename, so two concurrent " +
                "committers of the same version could both 'succeed' with " +
                "one commit silently clobbered. Set " +
                "spark.graft.snapshot.unsafeRenameFallback=true to accept " +
                "single-writer-only semantics on this filesystem.")
          System.err.println(
            s"[graft.SnapshotTable] WARN: no hardlink support for $dest — " +
              "rename fallback explicitly enabled; concurrent same-version " +
              "commits are not CAS-safe on this filesystem")
          fs.rename(tmp, dest)
      }
    } else fs.rename(tmp, dest)
  }

  /** Serialize (`#k=v` headers + file list) and atomically publish the
    * manifest for version `v`; true iff THIS writer won the version.
    * The single serialization path for [[commit]] and [[writeIf]] —
    * every commit stamps its wall-clock millis INSIDE the manifest (the
    * readAsOf timestamp-travel anchor), atomic with the file list, so
    * there is no window where data is committed but its metadata is
    * not. The loser's tmp file is cleaned up here. */
  private def writeManifest(fs: FileSystem, mdir: Path, v: Long,
      files: Seq[String], meta: Map[String, String],
      dvs: Seq[String] = Seq.empty,
      stats: Seq[String] = Seq.empty): Boolean = {
    fs.mkdirs(mdir)
    val stamped = meta + ("ts" -> System.currentTimeMillis().toString)
    val header = stamped.toSeq.sorted.map { case (k, value) => s"#$k=$value" }
    val tmp = new Path(mdir,
      s".v$v.manifest.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(((header ++ files ++ dvs.map("~" + _) ++
      stats.map("%" + _)).mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (publishIfAbsent(fs, tmp, new Path(mdir, s"v$v.manifest"))) true
    else { fs.delete(tmp, false); false }
  }

  /** Atomically commit `files` as snapshot max+1; retries the VERSION
    * NUMBER if another writer claims it first. ONLY safe for content
    * that does not depend on the previous snapshot (write()'s full
    * replace) — every content-bearing mutation uses [[commitAt]] inside
    * a read-derive-commit loop instead, because re-publishing a carried
    * file/DV/stats list derived before the race would silently drop the
    * winner's commit. `meta` key/values are written as `#key=value`
    * header lines INSIDE the manifest, so metadata (e.g. a streaming
    * batch id) commits in the same atomic publish as the file list.
    * Returns the committed version. */
  private def commit(spark: SparkSession, dir: String, files: Seq[String],
      meta: Map[String, String] = Map.empty,
      dvs: Seq[String] = Seq.empty,
      stats: Seq[String] = Seq.empty): Long = {
    val (fs, root) = fsFor(spark, dir)
    val mdir = new Path(root, ManifestDir)
    var attempt = 0
    while (attempt < 20) {
      val v = latest(spark, dir).map(_._1).getOrElse(0L) + 1
      // exactly one writer can publish v{N}.manifest; the loser re-reads
      // latest and retries at the advanced version
      if (writeManifest(fs, mdir, v, files, meta, dvs, stats)) return v
      attempt += 1
    }
    sys.error(s"could not commit to $dir after 20 attempts")
  }

  /** Single-shot CAS commit at version `expectedPrev + 1`; true iff
    * this writer won. The building block of every read-derive-commit
    * loop below: [[commit]]'s blind retry is only safe for write()'s
    * state-INDEPENDENT content — a content-bearing mutation that lost
    * the race must RE-DERIVE against the winner's state, or its stale
    * carried file/DV/stats lists silently drop the winner's commit
    * (the classic optimistic-concurrency lost update). */
  private def commitAt(spark: SparkSession, dir: String, expectedPrev: Long,
      files: Seq[String], meta: Map[String, String],
      dvs: Seq[String] = Seq.empty, stats: Seq[String] = Seq.empty): Boolean = {
    val (fs, root) = fsFor(spark, dir)
    writeManifest(fs, new Path(root, ManifestDir), expectedPrev + 1,
      files, meta, dvs, stats)
  }

  /** Drop staged-but-never-committed files (a lost racer's leftovers —
    * no manifest references them, so deletion is always safe; vacuum
    * would reclaim them anyway, this just does it eagerly). */
  private def dropStaged(spark: SparkSession, dir: String,
      rels: Seq[String]): Unit = {
    val (fs, root) = fsFor(spark, dir)
    rels.foreach(f => fs.delete(new Path(root, f), false))
  }

  private val MaxCommitAttempts = 20

  /** Create (or replace the content of) the table as snapshot max+1. */
  def write(spark: SparkSession, dir: String, df: DataFrame,
      partCol: String, meta: Map[String, String] = Map.empty): Long =
    commit(spark, dir, stage(spark, dir, df, partCol), meta)

  /** Create (or replace) the table CLUSTERED on `statsCol` with a
    * per-file min/max data-skipping index: rows are range-partitioned
    * on the column before staging, so files carry near-disjoint value
    * ranges, and one column-pruned pass over the staged files collects
    * each file's (min, max) into '%'-prefixed manifest lines — the
    * public Delta/Iceberg file-stats idea reduced to its minimum, and
    * the third pruning leg next to hive partition dirs and the Z-order
    * bucket IN-list (`Layouts.writeZOrdered`). `statsCol` must be
    * integral (long-castable): stats serialize as LONGs so pruning
    * arithmetic is exact; fractional keys quantize first (the
    * repo-wide lattice rule).
    *
    * Scale shape: the range shuffle is the single pass any clustered
    * write pays anyway; the stats job re-reads ONLY the stats column
    * of the new files (column-pruned scan, codegen'd min/max, one
    * file-count-sized collect); and the index itself is manifest
    * metadata — committed atomically with the files it describes, no
    * separate stats store to keep consistent. */
  def writeClustered(spark: SparkSession, dir: String, df: DataFrame,
      partCol: String, statsCol: String, rangeParts: Int = 0): Long = {
    // rangeParts = 0 (default) derives the slice count from the corpus:
    // max(16, ceil(n / spark.graft.cluster.targetSliceRows)) — the knob
    // rule every tiered operator here follows (a CONSTANT slice count is
    // a scale bug: at 100 TB, n/16 rows per slice is a straggler file
    // and a useless index; a constant ROWS-PER-SLICE target keeps file
    // sizes flat and index selectivity constant at any n). The count is
    // one cheap aggregate against data the write is about to shuffle
    // anyway; callers that already know n can pass rangeParts explicitly.
    val parts =
      if (rangeParts > 0) rangeParts
      else {
        val target = spark.conf
          .get("spark.graft.cluster.targetSliceRows", (1L << 22).toString)
          .toLong
        math.max(16L, (df.count() + target - 1) / target).toInt
      }
    val files = stage(spark, dir,
      df.repartitionByRange(parts, col(statsCol)), partCol)
    commit(spark, dir, files, Map.empty, Seq.empty,
      computeStats(spark, dir, files, statsCol))
  }

  /** One distributed, column-pruned pass over `files` collecting each
    * file's (min, max) of `statsCol` as stats lines. */
  private def computeStats(spark: SparkSession, dir: String,
      files: Seq[String], statsCol: String): Seq[String] = {
    val (_, root) = fsFor(spark, dir)
    spark.read.option("basePath", dir)
      .parquet(files.map(f => new Path(root, f).toString): _*)
      .select(substring_index(col("_metadata.file_path"), "/", -2).as("f"),
        col(statsCol).cast("long").as("v"))
      .groupBy("f").agg(min("v").as("mn"), max("v").as("mx"))
      .collect()
      .map(r => s"$statsCol|${r.getString(0)}|${r.getLong(1)}|${r.getLong(2)}")
      .toSeq
  }

  /** Range read through the data-skipping index: resolve the latest
    * snapshot, PRUNE every data file whose committed [min, max] on
    * `statsCol` cannot intersect [lo, hi] (a file with no stats — e.g.
    * landed by a plain append — is conservatively kept), then apply the
    * residual predicate to the surviving files. Deletion vectors still
    * apply. Returns (frame, files kept, files total) so callers can
    * assert the skipping actually happened.
    *
    * Scale shape: pruning is manifest arithmetic on the driver —
    * file-count-sized, no footer reads, no data IO — and the residual
    * filter pushes into the parquet scan of only the surviving files.
    * On a clustered 100 TB table a narrow range touches O(range) files
    * regardless of table size; the 1-D complement of Z-order's 2-D
    * bucket pruning. */
  def readRange(spark: SparkSession, dir: String, statsCol: String,
      lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val (v, files, _, stats) = latestState(spark, dir)
      .getOrElse(sys.error(s"$dir has no committed snapshot"))
    val ranges = stats.map(parseStat)
      .collect { case (c, f, mn, mx) if c == statsCol => f -> (mn, mx) }
      .toMap
    val live = files.filter(f => ranges.get(f) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None => true // no stats for this file: must scan it
    })
    val residual = col(statsCol).cast("long").between(lo, hi)
    val frame =
      if (live.isEmpty) // schema-stable empty relation, zero IO
        read(spark, dir, Some(v)).filter(lit(false))
      else readResolved(spark, dir, Some(v), withLineage = false,
        restrictTo = Some(live.toSet)).filter(residual)
    (frame, live.size, files.size)
  }

  /** Conditional (compare-and-swap) write: commits `df` as snapshot
    * `expectedPrev + 1` IFF no other writer has claimed it — the
    * rename-without-overwrite that makes ordinary commits atomic doubles
    * as the CAS primitive, this variant just refuses to retry at a
    * different version. Returns None when the table advanced past
    * `expectedPrev` (the caller's read is stale; re-read and re-derive).
    * This is what read-modify-write maintainers (MaterializedView
    * refresh) need: a lost race must surface as a retryable failure,
    * never as a double-applied delta. */
  def writeIf(spark: SparkSession, dir: String, df: DataFrame,
      partCol: String, expectedPrev: Long,
      meta: Map[String, String] = Map.empty): Option[Long] = {
    val current = latest(spark, dir).map(_._1).getOrElse(0L)
    if (current != expectedPrev) return None
    val files = stage(spark, dir, df, partCol)
    val (fs, root) = fsFor(spark, dir)
    val mdir = new Path(root, ManifestDir)
    val v = expectedPrev + 1
    if (writeManifest(fs, mdir, v, files, meta)) Some(v)
    else {
      // lost the race: drop the staged files — they were never
      // referenced by any committed manifest (tmp cleanup happened
      // inside writeManifest)
      files.foreach(f => fs.delete(new Path(root, f), false))
      None
    }
  }

  /** Append rows as a new snapshot (old files — and any deletion
    * vectors over them — carry over untouched). Concurrent-append safe:
    * the staged files are reusable across attempts (uniquely named,
    * content-stable), but the CARRIED lists re-derive from the winner's
    * state on every CAS loss — two racing appends both land, in some
    * order, with neither's files dropped. */
  def append(spark: SparkSession, dir: String, df: DataFrame,
      partCol: String): Long = {
    val staged = stage(spark, dir, df, partCol)
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      val (v, prev, dvs, stats) = latestState(spark, dir)
        .getOrElse((0L, Seq.empty, Seq.empty, Seq.empty))
      if (commitAt(spark, dir, v, prev ++ staged, Map.empty, dvs, stats))
        return v + 1
      attempt += 1
    }
    sys.error(s"could not append to $dir after $MaxCommitAttempts attempts")
  }

  /** Snapshot-isolated delete: partitions containing matches get their
    * survivors re-staged as NEW files; the commit swaps the affected
    * partitions' old files out of the manifest in one atomic rename.
    * Readers of the previous snapshot keep every file they resolved.
    * Returns (new version, affected partition values). */
  def deleteWhere(spark: SparkSession, dir: String, partCol: String,
      del: Column): (Long, Seq[String]) = {
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      val (base, files, dvs, stats) = latestState(spark, dir)
        .getOrElse(sys.error(s"$dir has no committed snapshot"))
      val snap = read(spark, dir, Some(base))
      val affected = snap.filter(del).select(col(partCol).cast("string"))
        .distinct().collect().map(_.getString(0)).toSeq.sorted
      if (affected.isEmpty) return (base, Nil)
      val affectedDirs = affected.map(v => s"$partCol=$v").toSet
      val keptFiles = files.filterNot(f => affectedDirs.contains(f.split('/').head))
      val survivors = snap
        .filter(col(partCol).cast("string").isin(affected: _*))
        .filter(!del)
      val newFiles =
        if (survivors.isEmpty) Seq.empty
        else stage(spark, dir, survivors, partCol)
      // DV rows over rewritten files address files no longer in the
      // manifest — harmless no-ops at read; rows over kept files must
      // keep applying, so the DV set carries over whole
      if (commitAt(spark, dir, base, keptFiles ++ newFiles, Map.empty, dvs,
          carriedStats(stats, keptFiles)))
        return (base + 1, affected)
      // lost the race: the survivors were derived against a stale
      // snapshot — drop the stage and re-derive against the winner's
      dropStaged(spark, dir, newFiles)
      attempt += 1
    }
    sys.error(s"could not delete from $dir after $MaxCommitAttempts attempts")
  }

  /** Row-level delete WITHOUT rewriting any data file — the
    * position-delete / deletion-vector design (public Delta DV /
    * Iceberg position-delete idea, reduced to its minimum): matching
    * rows' stable addresses (relative file path, row index within the
    * file) are written as a parquet SIDECAR under `_dv/`, and the new
    * manifest commits the UNCHANGED data-file list plus the sidecar
    * ('~'-prefixed line). Readers anti-join the scan against the DV set
    * on the address pair, so the delete is visible atomically with the
    * commit while every byte of data stays where it was.
    *
    * This is the contract a 100 TB table needs for small deletes (GDPR
    * row erasure, bad-record retraction): [[deleteWhere]] re-stages
    * every partition a match lives in — one matching row in each of
    * 10k partitions rewrites the whole table — while this pays one scan
    * to find addresses plus delete-sized bytes, independent of
    * partition spread. The read-side cost is the delete-sized anti-join
    * until [[compact]] folds accumulated DVs back into data files.
    * Stacks: a second DV delete runs against the DV-applied snapshot,
    * so re-deleting an already-deleted row is a no-op, not a duplicate
    * address. Returns (version, deleted row count); no commit when
    * nothing matches. */
  def deleteWhereDV(spark: SparkSession, dir: String,
      del: Column): (Long, Long) = {
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      val (base, files, dvs, stats) = latestState(spark, dir)
        .getOrElse(sys.error(s"$dir has no committed snapshot"))
      val hits = readResolved(spark, dir, Some(base), withLineage = true)
        .filter(del)
        .select(col(FileCol).as("file"), col(PosCol).as("pos"))
        .cache()
      try {
        val n = hits.count()
        if (n == 0L) return (base, 0L)
        val newDvs = stageDv(spark, dir, hits)
        if (commitAt(spark, dir, base, files, Map.empty, dvs ++ newDvs, stats))
          return (base + 1, n)
        // lost the race: addresses were derived against a stale snapshot
        // (the winner may have rewritten files or deleted the same rows)
        // — drop the staged sidecars and re-derive against its state
        dropStaged(spark, dir, newDvs)
      } finally hits.unpersist(): Unit
      attempt += 1
    }
    sys.error(s"could not DV-delete from $dir after $MaxCommitAttempts attempts")
  }

  /** Stage a (file, pos) address frame as immutable parquet sidecars
    * under `_dv/`, returning their relative paths (nothing committed).
    * Part files move as-is — a huge delete set stays distributed. */
  private def stageDv(spark: SparkSession, dir: String,
      addresses: DataFrame): Seq[String] = {
    val (fs, root) = fsFor(spark, dir)
    val tmp = new Path(dir.stripSuffix("/") + "__dv_stage_" +
      java.util.UUID.randomUUID().toString.take(8))
    addresses.write.mode("overwrite").parquet(tmp.toString)
    val parts = fs.listStatus(tmp).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    fs.mkdirs(new Path(root, "_dv"))
    val moved = parts.zipWithIndex.map { case (f, i) =>
      val rel = s"_dv/dv-$uuid-$i.parquet"
      require(fs.rename(f.getPath, new Path(root, rel)),
        s"could not stage deletion vector into $dir")
      rel
    }
    fs.delete(tmp, true)
    moved
  }

  /** MERGE (upsert): rows of `updates` whose `keyCol` matches an existing
    * row REPLACE it; the rest are inserted — the lakehouse `MERGE INTO
    * ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT` shape.
    *
    * `updates` must be key-unique (enforced — duplicate keys make
    * "replace" ambiguous). A matched key's old row is removed even when
    * the update row moves it to a DIFFERENT partition: its old partition
    * is rewritten without it, and the update row stages into its own.
    *
    * Scale shape: finding matches is one join of the snapshot against the
    * update KEYS (broadcastable when the batch is small — the common CDC
    * case); the rewrite is partition-scoped exactly like [[deleteWhere]]
    * — only partitions that CONTAIN a matched key re-stage their
    * survivors, so a small upsert into a 100 TB table pays for the
    * partitions it touches plus one key-probe scan, never a full rewrite.
    *
    * Returns (version, replacedRowCount, insertedRowCount). */
  def merge(spark: SparkSession, dir: String, partCol: String,
      keyCol: String, updates: DataFrame,
      meta: Map[String, String] = Map.empty): (Long, Long, Long) = {
    val upCount = updates.count()
    val upKeys = updates.select(col(keyCol)).distinct()
    require(upKeys.count() == upCount,
      s"merge updates must be key-unique on '$keyCol'")
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      latestState(spark, dir) match {
        case None => // empty table: merge degenerates to create
          val staged = stage(spark, dir, updates, partCol)
          if (commitAt(spark, dir, 0L, staged, meta)) return (1L, 0L, upCount)
          dropStaged(spark, dir, staged) // lost to a concurrent creator:
                                         // re-derive as a real merge
        case Some((base, files, dvs, stats)) =>
          val snap = read(spark, dir, Some(base))
          // one pass: per-partition matched-row counts -> affected set +
          // replaced total + (via distinct keys) inserted total
          val matched = snap.select(col(keyCol),
              col(partCol).cast("string").as("__part"))
            .join(upKeys, Seq(keyCol))
          // per-partition row counts give the affected set + replaced total;
          // the inserted count needs GLOBALLY distinct matched keys (a key
          // living in several partitions counts once), a second grain over
          // the same key-probe join
          val agg = matched
            .groupBy("__part").agg(count(lit(1)).as("n")).collect()
          val affected = agg.map(_.getString(0)).toSeq.sorted
          val replaced = agg.map(_.getLong(1)).sum
          val matchedKeys =
            if (affected.isEmpty) 0L
            else matched.select(keyCol).distinct().count()
          val affectedDirs = affected.map(v => s"$partCol=$v").toSet
          val keptFiles =
            files.filterNot(f => affectedDirs.contains(f.split('/').head))
          val staged =
            if (affected.isEmpty) stage(spark, dir, updates, partCol)
            else {
              val survivors = snap
                .filter(col(partCol).cast("string").isin(affected: _*))
                .join(upKeys, Seq(keyCol), "left_anti")
                .select(snap.columns.map(col): _*)
              stage(spark, dir,
                survivors.unionByName(updates.select(snap.columns.map(col): _*)),
                partCol)
            }
          if (commitAt(spark, dir, base, keptFiles ++ staged, meta, dvs,
              carriedStats(stats, keptFiles)))
            return (base + 1, replaced, upCount - matchedKeys)
          // lost the race: the match probe ran against a stale snapshot
          dropStaged(spark, dir, staged)
      }
      attempt += 1
    }
    sys.error(s"could not merge into $dir after $MaxCommitAttempts attempts")
  }

  /** Exactly-once streaming MERGE — the foreachBatch CDC-apply sink
    * body ([[appendBatch]]'s upsert sibling): the micro-batch's id
    * commits INSIDE the same manifest as the merged file list, so a
    * replayed batch (driver died after commit, before the engine
    * checkpointed) finds its `#batch=` marker and returns the already-
    * committed version instead of applying the upsert twice. A MERGE
    * is NOT idempotent on its own — replaying "replace key k" is
    * harmless, but replaying a batch that was already folded in can
    * resurrect rows a LATER batch replaced if batches raced; the
    * marker closes that by making replay detection exact, not
    * semantic. Returns the committed (or previously-committed)
    * version. */
  def mergeBatch(spark: SparkSession, dir: String, partCol: String,
      keyCol: String, updates: DataFrame, batchId: Long,
      queryId: String = "q"): Long = {
    val (fs, root) = fsFor(spark, dir)
    val mdir = new Path(root, ManifestDir)
    val tag = s"#batch=$queryId/$batchId"
    if (fs.exists(mdir)) {
      // newest-first: a replay retries the LAST batch, so this is O(1)
      // in the common case; the full scan only runs for ancient ids
      val prior = fs.listStatus(mdir).toSeq
        .flatMap(f => manifestVersion(f.getPath).map(_ -> f.getPath))
        .sortBy(-_._1)
        .find { case (_, p) => readManifest(fs, p).contains(tag) }
      prior.foreach { case (v, _) => return v }
    }
    merge(spark, dir, partCol, keyCol, updates,
      Map("batch" -> s"$queryId/$batchId"))._1
  }

  /** Exactly-once streaming append: the foreachBatch sink body. The
    * micro-batch's id is committed INSIDE the manifest (`#batch=<id>`
    * header), so data and replay marker are one atomic rename — if the
    * driver dies after commit but before the engine checkpoints, the
    * replayed batch finds its id and becomes a no-op instead of a
    * duplicate (the Delta/Iceberg idempotent-sink contract).
    *
    * Returns the committed (or previously-committed) version. */
  def appendBatch(spark: SparkSession, dir: String, df: DataFrame,
      partCol: String, batchId: Long, queryId: String = "q"): Long = {
    val (fs, root) = fsFor(spark, dir)
    val mdir = new Path(root, ManifestDir)
    val tag = s"#batch=$queryId/$batchId"
    if (fs.exists(mdir)) {
      // newest-first: a replay retries the LAST batch, so this is O(1)
      // in the common case; the full scan only runs for ancient ids
      val prior = fs.listStatus(mdir).toSeq
        .flatMap(f => manifestVersion(f.getPath).map(_ -> f.getPath))
        .sortBy(-_._1)
        .find { case (_, p) => readManifest(fs, p).contains(tag) }
      prior.foreach { case (v, _) => return v }
    }
    val staged = stage(spark, dir, df, partCol)
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      val (v, prev, dvs, stats) = latestState(spark, dir)
        .getOrElse((0L, Seq.empty, Seq.empty, Seq.empty))
      if (commitAt(spark, dir, v, prev ++ staged,
          Map("batch" -> s"$queryId/$batchId"), dvs, stats))
        return v + 1
      // lost a CAS to a concurrent writer; if that writer WAS this very
      // batch (two speculative replays racing), the tag check finds it
      val replayed = fs.listStatus(mdir).toSeq
        .flatMap(f => manifestVersion(f.getPath).map(_ -> f.getPath))
        .sortBy(-_._1)
        .find { case (_, p) => readManifest(fs, p).contains(tag) }
      replayed.foreach { case (rv, _) =>
        dropStaged(spark, dir, staged); return rv
      }
      attempt += 1
    }
    sys.error(s"could not append batch to $dir after $MaxCommitAttempts attempts")
  }

  /** OPTIMIZE: rewrite every partition holding more than `targetFiles`
    * data files into `targetFiles` (default 1), committed as one new
    * snapshot — readers of the old snapshot keep their small files until
    * vacuum. Row-identical by construction; only file boundaries change.
    * Returns (version, partitions compacted); base version when nothing
    * qualifies. */
  def compact(spark: SparkSession, dir: String, partCol: String,
      targetFiles: Int = 1): (Long, Seq[String]) = {
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      val (base, files, dvs, stats) = latestState(spark, dir)
        .getOrElse(sys.error(s"$dir has no committed snapshot"))
      val byPart = files.groupBy(_.split('/').head)
      val crowded = byPart.filter(_._2.size > targetFiles).keys.toSeq.sorted
      if (crowded.isEmpty && dvs.isEmpty) return (base, Nil)
      val crowdedVals = crowded.map(_.split('=').last)
      val keptFiles = files.filterNot(f => crowded.contains(f.split('/').head))
      val snap = read(spark, dir, Some(base)) // DV-applied: the rewrite FOLDS
                                              // deletions into the new files
      val newFiles =
        if (crowded.isEmpty) Seq.empty
        else stage(spark, dir, snap
          .filter(col(partCol).cast("string").isin(crowdedVals: _*))
          .repartition(targetFiles), partCol)
      // deletion-vector maintenance rides the same commit: rows addressing
      // rewritten (now-dropped) files were folded into the rewrite, so only
      // rows addressing KEPT files survive — re-staged as one compacted DV
      // set (empty → the table returns to the DV-free fast read path)
      val keptDvs =
        if (dvs.isEmpty) Seq.empty
        else {
          val (_, root) = fsFor(spark, dir)
          import spark.implicits._
          val alive = spark.read
            .parquet(dvs.map(f => new Path(root, f).toString): _*)
            .join(broadcast(keptFiles.toDF("file")), Seq("file"), "left_semi")
          if (alive.isEmpty) Seq.empty else stageDv(spark, dir, alive)
        }
      if (commitAt(spark, dir, base, keptFiles ++ newFiles, Map.empty,
          keptDvs, carriedStats(stats, keptFiles)))
        return (base + 1, crowded)
      // lost the race (e.g. to a concurrent append/DV delete): the
      // rewrite captured a stale snapshot — drop it and re-derive
      dropStaged(spark, dir, newFiles ++ keptDvs)
      attempt += 1
    }
    sys.error(s"could not compact $dir after $MaxCommitAttempts attempts")
  }

  /** Drop every data file no manifest ≤ latest-but-retained references:
    * keeps the latest `retain` snapshots' manifests (default 1) and any
    * file they reference; everything else (orphaned stages from crashes,
    * files only older snapshots used) is deleted. Run after in-flight
    * readers of dropped snapshots drain. Returns deleted file count. */
  def vacuum(spark: SparkSession, dir: String, retain: Int = 1): Int = {
    val (fs, root) = fsFor(spark, dir)
    val mdir = new Path(root, ManifestDir)
    if (!fs.exists(mdir)) return 0
    val manifests = fs.listStatus(mdir).toSeq
      .flatMap(f => manifestVersion(f.getPath).map(_ -> f.getPath))
      .sortBy(-_._1)
    val (keep, drop) = manifests.splitAt(math.max(1, retain))
    val keptLines = keep.map { case (_, p) => readManifest(fs, p) }
    val referenced: Set[String] = keptLines.flatMap(dataLines).toSet
    val referencedDv: Set[String] = keptLines.flatMap(dvLines).toSet
    var deleted = 0
    val dvDir = new Path(root, "_dv")
    if (fs.exists(dvDir)) {
      fs.listStatus(dvDir).filter(f => f.isFile &&
          f.getPath.getName.endsWith(".parquet")).foreach { f =>
        if (!referencedDv.contains(s"_dv/${f.getPath.getName}")) {
          fs.delete(f.getPath, false); deleted += 1
        }
      }
      if (fs.listStatus(dvDir).isEmpty) fs.delete(dvDir, false): Unit
    }
    fs.listStatus(root).filter(f => f.isDirectory &&
        f.getPath.getName.contains("=")).foreach { pd =>
      fs.listStatus(pd.getPath).filter(f => f.isFile &&
          f.getPath.getName.endsWith(".parquet")).foreach { f =>
        val rel = s"${pd.getPath.getName}/${f.getPath.getName}"
        if (!referenced.contains(rel)) { fs.delete(f.getPath, false); deleted += 1 }
      }
      if (fs.listStatus(pd.getPath).isEmpty) fs.delete(pd.getPath, false)
    }
    drop.foreach { case (_, p) => fs.delete(p, false) }
    deleted
  }
}
