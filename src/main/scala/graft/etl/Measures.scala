package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Power BI / DAX query surface (§3.3, A13;
  * ref: src/etl_functions.py:461-548) as a composable query API.
  *
  * The reference *declares* this workload (model relationships, measures,
  * slicers) for Power BI to execute; here it is an executable API: any
  * conjunction of dimension filters, any grouping columns, all five
  * measures in one aggregation pass. Every dim joins broadcast (J6), so
  * the plan at 100 TB is scan → broadcast joins → one shuffle for the
  * final aggregate.
  */
object Measures {

  /** fact joined to the five dimensions with disambiguated column names
    * (dim columns prefixed: dt_*, cust_*, prod_*, sell_*, ord_*; review
    * appears via fact.review_score).
    *
    * Broadcast is hinted only where size is guaranteed (dim_date: one row
    * per day, forever small). dim_order grows 1:1 with orders and
    * customer/product/seller grow with the business — hard-hinting those
    * would OOM the driver at 100 TB, so Catalyst/AQE picks broadcast only
    * when they actually fit under the threshold (which they do at toy
    * scale, keeping the same local plan). */
  def model(star: StarSchema): DataFrame = {
    def prefixed(df: DataFrame, p: String): DataFrame =
      df.columns.foldLeft(df)((acc, c) => acc.withColumnRenamed(c, s"${p}_$c"))
    star.factSales
      .join(broadcast(prefixed(star.dimDate, "dt")),
        col("date_id") === col("dt_id"), "inner")
      .join(prefixed(star.dimCustomer, "cust"),
        col("customer_id") === col("cust_id"), "inner")
      .join(prefixed(star.dimProduct, "prod"),
        col("product_id") === col("prod_id"), "inner")
      .join(prefixed(star.dimSeller, "sell"),
        col("seller_id") === col("sell_id"), "inner")
      .join(prefixed(star.dimOrder, "ord"),
        col("order_id") === col("ord_id"), "inner")
  }

  /** DAX measures (ref :500-504): Total Vendas, Total Frete, Número de
    * Pedidos (exact DISTINCTCOUNT), Ticket Médio (DIVIDE → null-on-zero),
    * Percentual de Frete. */
  def measureColumns: Seq[Column] = Seq(
    sum("price").as("total_sales"),
    sum("freight_value").as("total_freight"),
    countDistinct("order_id").as("order_count"),
    try_divide(sum("price"), countDistinct("order_id").cast("double")).as("avg_ticket"),
    (try_divide(sum("freight_value"), sum("price")) * 100.0).as("freight_pct"))

  /** Evaluate all measures under arbitrary slicer filters and groupings
    * (ref slicers :530-534: year/quarter/month, category, state, price band). */
  def evaluate(star: StarSchema, filters: Seq[Column] = Nil,
      groupBy: Seq[Column] = Nil): DataFrame = {
    val filtered = filters.foldLeft(model(star))(_.filter(_))
    if (groupBy.isEmpty) filtered.agg(measureColumns.head, measureColumns.tail: _*)
    else filtered.groupBy(groupBy: _*).agg(measureColumns.head, measureColumns.tail: _*)
  }

  /** 100 TB opt-in: HyperLogLog++ order counts (single-pass, mergeable
    * sketch, no distinct expansion) in place of exact DISTINCTCOUNT —
    * SURVEY A13's explicit trade-off. rsd defaults to 1%. */
  def evaluateApprox(star: StarSchema, filters: Seq[Column] = Nil,
      groupBy: Seq[Column] = Nil, rsd: Double = 0.01): DataFrame = {
    val approxCols = Seq(
      sum("price").as("total_sales"),
      sum("freight_value").as("total_freight"),
      approx_count_distinct(col("order_id"), rsd).as("order_count"),
      try_divide(sum("price"), approx_count_distinct(col("order_id"), rsd).cast("double"))
        .as("avg_ticket"),
      (try_divide(sum("freight_value"), sum("price")) * 100.0).as("freight_pct"))
    val filtered = filters.foldLeft(model(star))(_.filter(_))
    if (groupBy.isEmpty) filtered.agg(approxCols.head, approxCols.tail: _*)
    else filtered.groupBy(groupBy: _*).agg(approxCols.head, approxCols.tail: _*)
  }
}
