package graft.etl

import org.apache.spark.sql.SparkSession

/** End-to-end wiring (ref: src/etl_functions.py:562-585): extract →
  * transform → model → aggregate → load. Each output table is one lazy
  * logical plan; the only driver-side materializations are the per-table
  * imputation medians (Transform) — the same barrier the reference has.
  */
object Pipeline {

  final case class Result(star: StarSchema, aggs: AggTables)

  def build(spark: SparkSession, rawPath: String): Either[String, Result] =
    Extract(spark, rawPath).map { raw =>
      val transformed = Transform(raw)
      val star = Model(transformed)
      val aggs = Aggregates(star.factSales, star)
      Result(star, aggs)
    }

  /** Build + write every table as CSV + Parquet, plus the S9 instructions
    * side output (`reports/dashboard/power_bi_instructions.md`) and the
    * S8 chart sink (the five reference-named dashboard PNGs). */
  def run(spark: SparkSession, rawPath: String, outDir: String): Either[String, Result] =
    build(spark, rawPath).map { r => exportAll(spark, r, outDir); r }

  /** The one export step (shared by [[run]] and [[main]]): all 26 table
    * sinks, the S9 instructions file, the S8 dashboard PNGs. Chart
    * series derive from the agg PARQUET just written, not from the agg
    * plans: writeAll has unpersisted the shared frames by the time the
    * charts render, so the logical plans would re-run their full
    * upstream joins over the raw input — measured ~15 s of the
    * 10,000×-scale run (round-12 ladder re-measure root cause; the same
    * redundancy the CSV-from-parquet derivation in Load closed in round
    * 3). Reading the columnar output back costs milliseconds and the
    * values are identical by construction. */
  private def exportAll(spark: SparkSession, r: Result, outDir: String): Unit = {
    Load.writeAll(r.star, r.aggs, outDir)
    Instructions.write(outDir)
    Charts.writeDashboard(
      r.aggs.byName.map { case (n, _) =>
        n -> spark.read.parquet(s"$outDir/parquet/$n")
      },
      java.nio.file.Paths.get(outDir, "reports", "dashboard").toString)
  }

  def main(args: Array[String]): Unit = {
    val rawPath = if (args.length > 0) args(0) else "/root/reference/data/raw"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_etl_out"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false") // parity mode (H5)
      .config("spark.ui.enabled", "false")
      // The 14 output tables export CONCURRENTLY, and their distinct plans
      // carry well over 100 generated classes between them — the default
      // codegen cache (spark.sql.codegen.cache.maxEntries=100, static)
      // then misses on nearly every task and Janino recompiles per task:
      // measured 343 s → 51 s at the 10,000× scale rung from this one
      // setting (round-4 finding, PERFORMANCE.md). Harmless when unneeded
      // (it is an upper bound, not a reservation).
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // Tungsten pages must stay BELOW half a G1 region or every sort
      // page is a humongous allocation (G1 regions: heap/2048, so 16 MiB
      // at a 31 GiB heap, 32 MiB at 64 GiB; humongous = ≥ half region).
      // Spark's auto page (up to 64 MiB on big heaps) and the first
      // attempt at a fix (16m — still ≥ half of any region ≤ 32 MiB) both
      // land humongous: old-gen fills with page allocations and G1 churns
      // concurrent marks (measured: old gen pinned at 99.9% during sorts,
      // nondeterministic multi-minute stalls). 2m is sub-humongous for
      // every heap ≥ 8 GiB and sorters address 8192 pages × 2 MiB = 16 GiB
      // per consumer — far above any task's need.
      .config("spark.buffer.pageSize", "2m")
      // All local-FS streams (CSV/parquet part writes, the golden concat's
      // source reads) default to io.file.buffer.size=4096 — 4 KiB write
      // syscalls under the CRC layer (measured 11 MB/s on the golden
      // concat). 1 MiB buffers make every stream sequential-IO-sized.
      .config("spark.hadoop.io.file.buffer.size", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    Pipeline.build(spark, rawPath) match {
      case Left(err) => System.err.println(s"pipeline failed: $err"); sys.exit(1)
      case Right(r) =>
        // build_sec captures the eager fraction of plan construction —
        // essentially the per-table imputation-median barriers (each
        // forces a scan); load_sec is everything the 26 exports execute.
        // The split plus Load's per-table [load] stderr lines itemize
        // where a scaled run's wall goes (round-3 9.5 GB finding: the
        // single-task sorts hid there).
        val buildSecs = (System.nanoTime() - t0) / 1e9
        val tL = System.nanoTime()
        exportAll(spark, r, outDir)
        val loadSecs = (System.nanoTime() - tL) / 1e9
        // in-process ETL seconds (extract→export), excluding JVM/session
        // startup — the number comparable across engines at scale
        val runSecs = (System.nanoTime() - t0) / 1e9
        val report = Quality.check(r.star, r.aggs)
        println(f"pipeline ok=${report.ok} run_sec=$runSecs%.2f " +
          f"build_sec=$buildSecs%.2f load_sec=$loadSecs%.2f fk=${report.fkViolations} " +
          s"nulls=${report.nullCounts} fact=${report.factTotalSales} agg=${report.aggTotalSales}")
    }
    spark.stop()
  }
}
