package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Stage 5 — Load (S4-S5; ref: src/etl_functions.py:396-439).
  *
  * Writes all 14 tables as headered CSV and Parquet. Outputs are ordered
  * by their natural keys before writing (hazard H1 — pandas groupby
  * orders by key, Spark groupBy doesn't) and coalesced to one file to
  * match the reference's single-file-per-table layout. At 100 TB the
  * coalesce(1) goes away and the fact partitions by date_id — the sort
  * keys below already are those partition keys.
  */
object Load {

  /** Natural output ordering per table (H1). */
  val sortKeys: Map[String, Seq[String]] = Map(
    "dim_date" -> Seq("id"),
    "dim_customer" -> Seq("customer_id"),
    "dim_product" -> Seq("product_id"),
    "dim_seller" -> Seq("seller_id"),
    "dim_order" -> Seq("order_id"),
    "dim_review" -> Seq("review_id"),
    "fact_sales" -> Seq("order_id", "order_item_id"),
    "agg_sales_by_date" -> Seq("year", "month"),
    "agg_sales_by_category" -> Seq("category_name"),
    "agg_sales_by_location" -> Seq("state"),
    "agg_sales_by_city" -> Seq("state", "city"),
    "agg_sales_by_seller" -> Seq("seller_id"),
    "agg_review_metrics" -> Seq("review_score"))

  def allTables(star: StarSchema, aggs: AggTables): Map[String, DataFrame] =
    star.dims ++ aggs.byName + ("fact_sales" -> star.factSales)

  def writeAll(star: StarSchema, aggs: AggTables, outDir: String): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    // Share the transformed frames across the 14 exports (the round-3
    // 100,000× lever — BASELINE.md's [load] itemization showed every
    // parquet sink re-running its joins over the raw input): the fact
    // feeds 7 outputs (itself + 6 aggregates) and each DIMENSION feeds
    // its own sink plus every aggregate that joins it, so all seven
    // upstream frames persist for the export's lifetime. The aggregates
    // themselves write exactly once each — caching them too is the
    // measured 10,000× cache-thrash trap (fourteen concurrent full-table
    // caches exceed storage memory; BASELINE.md round-3 finding #2).
    // MATERIALIZE before the parallel writers launch: persist() alone is
    // lazy, so the concurrent futures would race to compute the same
    // cached partitions and duplicate the work. Dims materialize
    // concurrently — each count is an independent job.
    val tAll = System.nanoTime()
    val share = sys.env.getOrElse("SPARK_GRAFT_ETL_SHARE", "on") != "off"
    val shared = if (share) star.dims.values.toSeq :+ star.factSales else Nil
    shared.foreach(_.persist())
    Await.result(Future.sequence(shared.map(df => Future(df.count()))), Duration.Inf)
    if (share) System.err.println(
      f"[load] cache materialization ${(System.nanoTime() - tAll) / 1e9}%.1fs")
    if (share) {
      val sc = star.factSales.sparkSession.sparkContext
      sc.getRDDStorageInfo.foreach { i =>
        System.err.println(s"[load] cached ${i.name} parts=${i.numCachedPartitions}/" +
          s"${i.numPartitions} mem=${i.memSize / 1048576}MB disk=${i.diskSize / 1048576}MB")
      }
    }
    // Bounded export concurrency, sized by the MEASURED data scale
    // (SPARK_GRAFT_ETL_POOL overrides): at golden scale the 26 exports
    // are sub-second jobs and wall time is pure scheduling latency, so
    // run them all side by side; at GB scale the same concurrency is the
    // measured wall-killer — 13 concurrent global sorts split the
    // executor-memory pool 13 ways and saturate one disk, so the three
    // GB-scale tables' CSV exports took ~980 s EACH under contention vs
    // 13 s isolated (round-4 timeline, PERFORMANCE.md); two-wide was the
    // measured optimum (221 s vs 420 s four-wide, 1045 s serial includes
    // the pre-fix concat). The switch reads the just-materialized cache
    // footprint from the block manager — metadata, no extra job; with
    // sharing disabled (debug path) it falls back to wide.
    val cachedBytes =
      star.factSales.sparkSession.sparkContext.getRDDStorageInfo
        .map(i => i.memSize + i.diskSize).sum
    val poolSize = sys.env.get("SPARK_GRAFT_ETL_POOL").map(_.toInt)
      .getOrElse(if (cachedBytes > (2L << 30)) 2 else 13)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(poolSize)
    val poolEc: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      // independent output tables write concurrently; Spark schedules the
      // jobs side by side (26 tiny jobs serially = pure scheduling latency)
      // builder iteration aid: restrict to named tables (comma-separated)
      val onlyTables = sys.env.get("SPARK_GRAFT_ETL_ONLY")
        .map(_.split(",").map(_.trim).toSet)
      val jobs = allTables(star, aggs).toSeq
        .filter { case (name, _) => onlyTables.forall(_.contains(name)) }
        .map { case (name, df) =>
        Future {
          // Both sinks run the range-partitioned sort fully DISTRIBUTED
          // and write in parallel; nothing is cached and no task ever
          // holds a whole table. History of this path (both prior
          // formulations measured on the BASELINE.md scale ladder):
          //  - orderBy(...).coalesce(1) collapsed the SORT itself into
          //    the single writer task — minutes of single-core spill-sort
          //    per GB-scale table at 100,000× (most of that run's 36 min);
          //  - sorting into a persisted cache and coalescing only for the
          //    write fixed 100,000× but thrashed at 10,000×: fourteen
          //    concurrent full-table caches exceed storage memory and the
          //    single writer task re-reads spilled blocks (282 s vs 55 s).
          // The ordered SINGLE-FILE artifact (S4/T2 golden contract) is
          // produced by byte-concatenating the sorted CSV parts in
          // partition order — pure sequential IO, no parse, no sort, no
          // cache. The sort keys are unique per table, so the distributed
          // sort is row-identical to a single-task sort. Parquet stays a
          // directory of sorted parts: Spark writers always emit
          // directories, and parquet has no cross-file read-order
          // contract a single part could provide.
          val t0 = System.nanoTime()
          val sorted = df.orderBy(sortKeys(name).map(col): _*)
          sorted.write.mode("overwrite").parquet(s"$outDir/parquet/$name")
          val t1 = System.nanoTime()
          // The CSV derives from the parquet just written, not from the
          // table's plan: each sink otherwise re-executes the table's
          // full upstream DAG (scan+joins over the whole raw input — at
          // the 9.5 GB baseline scale that redundancy was most of the
          // load stage), while re-reading the columnar output costs a
          // fraction of that. Types round-trip exactly (timestamps are
          // already µs-truncated), so the CSV bytes are unchanged; the
          // re-sort is needed because parquet reads carry no cross-file
          // order guarantee.
          val back = df.sparkSession.read.parquet(s"$outDir/parquet/$name")
            .orderBy(sortKeys(name).map(col): _*)
          writeOrderedCsv(back, df.columns.toSeq, s"$outDir/csv/$name")
          // per-table cost itemization (stderr keeps the stdout report
          // line contract clean); start/end are seconds since writeAll
          // entry so concurrent-phase overlap is reconstructible from the
          // log (per-table durations alone hide queueing)
          System.err.println(f"[load] $name%-22s parquet=${(t1 - t0) / 1e9}%6.1fs " +
            f"csv=${(System.nanoTime() - t1) / 1e9}%6.1fs " +
            f"start=${(t0 - tAll) / 1e9}%6.1fs end=${(System.nanoTime() - tAll) / 1e9}%6.1fs")
        }(poolEc)
      }
      Await.result(Future.sequence(jobs), Duration.Inf)
    } finally {
      shared.foreach(_.unpersist())
      pool.shutdown()
    }
  }

  /** Ordered single-file CSV without any single-task sort: the sorted
    * frame writes as headerless parts (each part a contiguous key range —
    * range partitioning — and part file names carry the partition index),
    * which then byte-concatenate in name order under a generated header
    * line. Sequential IO is the only serial step; at 100 TB the concat
    * itself is the thing to drop, not the sort (and `writeAtScale` below
    * does exactly that). */
  private def writeOrderedCsv(sorted: DataFrame, columns: Seq[String], dest: String): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = sorted.sparkSession.sparkContext.hadoopConfiguration
    val tmp = new Path(dest + "__parts")
    val fs = tmp.getFileSystem(conf)
    val tw = System.nanoTime()
    sorted.write.mode("overwrite")
      .option("header", "false")
      // default CSV writer prints ms precision; golden carries ns
      // (we keep µs — the max Spark holds)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(tmp.toString)
    val tc = System.nanoTime()
    val destPath = new Path(dest)
    fs.delete(destPath, true)
    fs.mkdirs(destPath)
    // Concat through the RAW local filesystem with a 1 MiB copy buffer.
    // The default path (ChecksumFileSystem + io.file.buffer.size=4096)
    // CRC-checksums every 512-byte chunk and issues 4 KiB write syscalls:
    // measured 355 s (~11 MB/s, one core pegged in writeChunk) to concat
    // dim_order's 4 GB at the 100,000× rung — the single largest cost in
    // the whole scaled export. Raw FS + big buffer is pure sequential IO
    // (the golden artifact carries no .crc sidecar anyone reads).
    val rawFs = fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    // order parts by their NUMERIC partition index, not the file name:
    // Spark pads the index to 5 digits, so a lexicographic sort silently
    // misorders part-100000 before part-99999 beyond 10^5 partitions
    // (ADVICE r3) — parse the index and fail loudly on an unparseable name
    val partIdx = "part-(\\d+)".r
    val parts = fs.listStatus(tmp)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .sortBy { f =>
        partIdx.findFirstMatchIn(f.getPath.getName).map(_.group(1).toLong)
          .getOrElse(sys.error(s"unparseable part file name: ${f.getPath.getName}"))
      }
    val out = rawFs.create(new Path(destPath, "part-00000-ordered.csv"), true)
    try {
      out.write((columns.mkString(",") + "\n").getBytes("UTF-8"))
      parts.foreach { p =>
        val in = rawFs.open(p.getPath)
        try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 1 << 20, false)
        finally in.close()
      }
    } finally out.close()
    val td = System.nanoTime()
    fs.delete(tmp, true)
    System.err.println(f"[csv] $dest parts=${(tc - tw) / 1e9}%.1fs " +
      f"concat=${(td - tc) / 1e9}%.1fs del=${(System.nanoTime() - td) / 1e9}%.1fs")
  }

  /** Cluster-scale layout: the fact partitions by month (date_id prefix) so
    * time-sliced queries prune partitions at the file index, and rows are
    * sorted by date_id within files for min/max row-group skipping. The
    * dimensions stay unpartitioned single-directory parquet (they
    * broadcast). At 100 TB this is the only write path; the golden
    * single-file layout above exists for reference parity. */
  def writeAtScale(star: StarSchema, aggs: AggTables, outDir: String): Unit = {
    val fact = star.factSales
      .withColumn("month_id", (org.apache.spark.sql.functions.col("date_id") / 100L)
        .cast("long"))
      .repartition(org.apache.spark.sql.functions.col("month_id"))
      .sortWithinPartitions("date_id", "order_id")
    fact.write.mode("overwrite").partitionBy("month_id")
      .parquet(s"$outDir/fact_sales")
    (star.dims ++ aggs.byName).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }
  }
}
