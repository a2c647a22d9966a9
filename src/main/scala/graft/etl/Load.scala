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
    // the fact feeds 7 of the outputs (itself + 6 aggregates) and each
    // CSV+parquet pair re-executes its plan — cache it once for the
    // export, and MATERIALIZE before the parallel writers launch:
    // persist() alone is lazy, so the concurrent futures would race to
    // compute the same cached partitions and duplicate the work
    star.factSales.persist().count()
    try {
      // independent output tables write concurrently; Spark schedules the
      // jobs side by side (26 tiny jobs serially = pure scheduling latency)
      val jobs = allTables(star, aggs).toSeq.map { case (name, df) =>
        Future {
          // The sort runs DISTRIBUTED (range-partitioned, 32 tasks) and is
          // cached; coalesce(1) then merely concatenates the cached sorted
          // partitions in order inside the single writer task. The former
          // orderBy(...).coalesce(1) collapsed the sort itself into that
          // one task — minutes of single-core spill-sort per GB-scale
          // table at the 100,000x baseline scale (measured: the first
          // 9.5 GB pipeline run spent most of its 36 min there), vs ~40 s
          // of pure single-file write IO once the sort is parallel. The
          // output keys are unique per table, so the distributed sort is
          // byte-identical to the single-task sort (no tie reordering).
          val sorted = df.orderBy(sortKeys(name).map(col): _*).persist()
          sorted.count()
          val ordered = sorted.coalesce(1)
          try {
            ordered.write.mode("overwrite").option("header", "true")
              // default CSV writer prints ms precision; golden carries ns
              // (we keep µs — the max Spark holds)
              .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .csv(s"$outDir/csv/$name")
            ordered.write.mode("overwrite").parquet(s"$outDir/parquet/$name")
          } finally sorted.unpersist()
        }
      }
      Await.result(Future.sequence(jobs), Duration.Inf)
    } finally star.factSales.unpersist()
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
