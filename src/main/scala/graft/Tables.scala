package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver's deterministic testdata tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives a scale-factor directory
  * (e.g. /root/testdata/sf0.01) and reads one parquet file per table. At
  * 100 TB these would be partitioned parquet/Delta directories; the reader
  * API is identical (`spark.read.parquet(dir)`), so nothing here is
  * toy-scale-specific. Filters and projections applied downstream reach the
  * parquet scan via Catalyst pushdown (verified with .explain in the specs).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.parquet stores ts as parquet TIMESTAMP(NANOS). Depending on
    * the Spark build, that column surfaces either as raw long nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`) or as a native
    * TIMESTAMP_NTZ; normalize both to a µs TIMESTAMP_NTZ column. The
    * testdata carries no sub-µs parts, so the conversion is lossless. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")).cast("timestamp_ntz"))
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Conditional scan spread before a CPU-heavy per-row stage (guide
    * §2.5's "one huge unsplittable file" case): IF the scan's actual
    * partition count is below the session's core parallelism (the bench
    * corpus is a single parquet row group, so the scan is one task),
    * hash-repartition by the DETERMINISTIC `keyCol` — never rand, which
    * duplicates/loses rows under task retry (§2.5). A many-file
    * production scan is already wide and skips the shuffle entirely.
    * Hoisted from the six per-file r16 copies (ADVICE r16: the copies
    * had already drifted in doc comments); call sites guarantee the
    * downstream stage is per-row or integer-exact, so values are
    * partitioning-independent. */
  def conditionalSpread(s: SparkSession, df: DataFrame,
      keyCol: String): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, org.apache.spark.sql.functions.col(keyCol))
  }
}
