package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary diagnostic main (round 4): isolates why timestamp-heavy
  * tables' CSV exports run ~30× slower than their parquet sinks at the
  * 100,000× rung (dim_order 431 s vs 9.8 s serial, clean disk). Times the
  * same read→sort→write-csv pipeline under varying timestamp handling. */
object CsvProbe {
  def main(args: Array[String]): Unit = {
    val src = args(0) // parquet dir of dim_order
    var b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-csv-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // each knob omitted entirely when its env is "auto"/unset — matching
    // Pipeline's parity-mode session requires ANSI=false, PAGESIZE=16m,
    // CODEGEN=5000
    sys.env.get("PROBE_ANSI").filter(_ != "auto")
      .foreach(v => b = b.config("spark.sql.ansi.enabled", v))
    sys.env.get("PROBE_PAGESIZE").filter(_ != "auto")
      .foreach(v => b = b.config("spark.buffer.pageSize", v))
    sys.env.get("PROBE_CODEGEN").filter(_ != "auto")
      .foreach(v => b = b.config("spark.sql.codegen.cache.maxEntries", v))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val df = spark.read.parquet(src)
    time("scan only (count)")(df.count())
    time("sort + csv, micros format")(
      df.orderBy("order_id").write.mode("overwrite")
        .option("header", "false")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv("/dev/shm/probe_micros"))
    time("sort + csv, default format")(
      df.orderBy("order_id").write.mode("overwrite")
        .option("header", "false")
        .csv("/dev/shm/probe_default"))
    val tsCols = df.schema.fields.filter(_.dataType.typeName == "timestamp").map(_.name)
    val pre = tsCols.foldLeft(df)((d, c) =>
      d.withColumn(c, date_format(col(c), "yyyy-MM-dd HH:mm:ss.SSSSSS")))
    time("sort + csv, pre-formatted via date_format")(
      pre.orderBy("order_id").write.mode("overwrite")
        .option("header", "false")
        .csv("/dev/shm/probe_preformat"))
    time("sort + csv, no timestamp cols")(
      df.drop(tsCols: _*).orderBy("order_id").write.mode("overwrite")
        .option("header", "false")
        .csv("/dev/shm/probe_drop"))
    // repeat of test 2 — separates per-variant cost from cumulative
    // session/JVM degradation (if this is slow, the SESSION got slow)
    time("sort + csv, micros format REPEAT")(
      df.orderBy("order_id").write.mode("overwrite")
        .option("header", "false")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv("/dev/shm/probe_micros2"))
    spark.stop()
  }
}
