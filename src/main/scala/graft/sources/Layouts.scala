package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the cluster-scale paths the toy data
  * doesn't force: bucketed co-located joins and salted skew joins.
  */
object Layouts {

  /** Persist a DataFrame as a bucketed, sorted table so later equi-joins
    * on the bucket keys are shuffle-free (both sides pre-partitioned by
    * the same hash — the Spark answer to co-located joins at 100 TB).
    * Requires a session with a warehouse dir (saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction — the operational fix for streaming/append
    * sinks that accrete thousands of KB-scale parquet files (each costs a
    * task + a footer read per query). Rewrites a directory to
    * ceil(bytes/targetBytes) files: read (footer-only size scan first),
    * repartition, write to a sibling temp dir, then atomically swap.
    * Returns the new file count. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(path).filter(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compact_tmp")
    spark.read.parquet(dir).repartition(parts)
      .write.mode("overwrite").parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(dir + "__compact_old")
    fs.delete(bak, true)
    require(fs.rename(path, bak), s"could not stage $dir")
    require(fs.rename(tmp, path), s"could not swap compacted files into $dir")
    fs.delete(bak, true)
    fs.listStatus(path).count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  /** Skew-resistant equi-join: the (possibly skewed) left side gets a
    * deterministic-per-row salt in [0, n); the right side is replicated n
    * times, one copy per salt value, and the join key becomes (key, salt).
    * Hot keys spread across n reducers instead of one. Result is
    * row-identical to the plain join for inner and left joins — the salt
    * only routes rows. Right/full outer are rejected: every unmatched
    * right row would surface once per replica. (AQE skew-join handles
    * most cases automatically; this is the explicit tool for when it
    * can't, e.g. a skewed aggregate above the join.) */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, n: Int, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "leftouter").contains(
      joinType.toLowerCase.replaceAll("[_ ]", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType' " +
        "(right/full would replicate unmatched right rows n times)")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(leftKey), monotonically_increasing_id()), lit(n.toLong)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until n).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) && salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__salt")
  }
}
