package graft.etl

import org.apache.spark.sql.SparkSession

/** Temporary diagnostic main (round 4): times each stage of one aggregate
  * table's plan in isolation to localize the scaled-export regression. */
object DebugTiming {
  def main(args: Array[String]): Unit = {
    val rawPath = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-debug")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val raw = time("extract")(Extract(spark, rawPath)).toOption.get
    val transformed = time("transform (median barriers)")(Transform(raw))
    val star = time("model")(Model(transformed))
    val aggs = time("aggregates (plan construction)")(Aggregates(star.factSales, star))
    time("fact count")(System.err.println("fact rows=" + star.factSales.count()))
    time("aggByDate count")(System.err.println("rows=" + aggs.salesByDate.count()))
    aggs.salesByDate.explain("formatted")
    time("aggByDate parquet")(
      aggs.salesByDate.orderBy("year", "month")
        .write.mode("overwrite").parquet("/tmp/debug_agg_parquet"))
    spark.stop()
  }
}
