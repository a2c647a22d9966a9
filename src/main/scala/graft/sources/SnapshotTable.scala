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
  *    name and RENAMED into place — rename-without-overwrite is the
  *    single atomic commit point (HDFS and POSIX both guarantee it);
  *  - readers resolve max-N once and read exactly that file list, so
  *    every query sees one complete snapshot: concurrent commits only
  *    add files the reader never looks at, and nothing a manifest
  *    references is deleted until `vacuum`;
  *  - two writers racing the same version: the loser's rename fails
  *    (destination exists) and it retries against the new latest —
  *    optimistic concurrency without a lock service.
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

  /** Latest committed (version, data-file relative paths); None if the
    * table has no committed snapshot yet. */
  def latest(spark: SparkSession, dir: String): Option[(Long, Seq[String])] = {
    val (fs, root) = fsFor(spark, dir)
    val mdir = new Path(root, ManifestDir)
    if (!fs.exists(mdir)) return None
    val versions = fs.listStatus(mdir).toSeq
      .flatMap(f => manifestVersion(f.getPath).map(_ -> f.getPath))
    if (versions.isEmpty) None
    else {
      val (v, path) = versions.maxBy(_._1)
      val in = fs.open(path)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      Some(v -> lines.filter(_.nonEmpty))
    }
  }

  /** Read snapshot `version` (default: latest). The returned frame is
    * bound to that snapshot's exact file list — concurrent commits and
    * later vacuums of NEWER garbage never change what it reads. */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame = {
    val (fs, root) = fsFor(spark, dir)
    val files = version match {
      case None =>
        latest(spark, dir)
          .getOrElse(sys.error(s"$dir has no committed snapshot")) ._2
      case Some(v) =>
        val p = new Path(new Path(root, ManifestDir), s"v$v.manifest")
        require(fs.exists(p), s"$dir has no snapshot v$v")
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
            .filter(_.nonEmpty)
        finally in.close()
    }
    require(files.nonEmpty, s"$dir snapshot is empty")
    // basePath keeps the hive partition column visible on per-file reads
    spark.read.option("basePath", dir)
      .parquet(files.map(f => new Path(root, f).toString): _*)
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

  /** Atomically commit `files` as snapshot max+1; retries if another
    * writer claims the version first. Returns the committed version. */
  private def commit(spark: SparkSession, dir: String,
      files: Seq[String]): Long = {
    val (fs, root) = fsFor(spark, dir)
    val mdir = new Path(root, ManifestDir)
    fs.mkdirs(mdir)
    var attempt = 0
    while (attempt < 20) {
      val v = latest(spark, dir).map(_._1).getOrElse(0L) + 1
      val tmp = new Path(mdir,
        s".v$v.manifest.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = fs.create(tmp, true)
      try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      // rename-without-overwrite IS the commit: exactly one writer can
      // create v{N}.manifest, the loser re-reads latest and retries
      if (fs.rename(tmp, new Path(mdir, s"v$v.manifest"))) return v
      fs.delete(tmp, false)
      attempt += 1
    }
    sys.error(s"could not commit to $dir after 20 attempts")
  }

  /** Create (or replace the content of) the table as snapshot max+1. */
  def write(spark: SparkSession, dir: String, df: DataFrame,
      partCol: String): Long =
    commit(spark, dir, stage(spark, dir, df, partCol))

  /** Append rows as a new snapshot (old files carry over untouched). */
  def append(spark: SparkSession, dir: String, df: DataFrame,
      partCol: String): Long = {
    val prev = latest(spark, dir).map(_._2).getOrElse(Seq.empty)
    commit(spark, dir, prev ++ stage(spark, dir, df, partCol))
  }

  /** Snapshot-isolated delete: partitions containing matches get their
    * survivors re-staged as NEW files; the commit swaps the affected
    * partitions' old files out of the manifest in one atomic rename.
    * Readers of the previous snapshot keep every file they resolved.
    * Returns (new version, affected partition values). */
  def deleteWhere(spark: SparkSession, dir: String, partCol: String,
      del: Column): (Long, Seq[String]) = {
    val (base, files) = latest(spark, dir)
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
    (commit(spark, dir, keptFiles ++ newFiles), affected)
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
    val referenced: Set[String] = keep.flatMap { case (_, p) =>
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          .filter(_.nonEmpty)
      finally in.close()
    }.toSet
    var deleted = 0
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
