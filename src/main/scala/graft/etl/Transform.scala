package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stage 2 — Transform (F1-F11, J1, P5; ref: src/etl_functions.py:50-127).
  *
  * Order of operations matters and mirrors the reference exactly
  * (hazard H3): parse timestamps → impute (numeric → per-column median,
  * string → 'unknown') → derive date/delivery columns → translation join.
  * Derived-column NaNs (from null timestamp arithmetic) are therefore
  * never imputed, and post-join translation nulls are never filled.
  *
  * The median computation is the pipeline's one driver-side barrier —
  * one collect of a single row of per-column medians per table, identical
  * in shape to the reference's eager median (SURVEY §3.1); everything
  * else stays lazy.
  */
object Transform {

  /** F1: string → timestamp with pandas errors='coerce' semantics
    * (null on unparseable, ANSI-safe). Accepts both bare and
    * 9-fractional-digit forms. */
  def parseTs(c: Column): Column = coalesce(
    try_to_timestamp(c),
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss.SSSSSSSSS")))

  private def parseDates(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df) { (acc, c) =>
      acc.withColumn(c, parseTs(col(c)))
    }

  /** F9+F10: numeric null → per-column exact median; string null →
    * 'unknown'. Timestamp columns are untouched (pandas NaT is neither
    * numeric nor object). */
  def impute(df: DataFrame): DataFrame = {
    val numericCols = df.schema.fields.collect {
      case StructField(n, _: NumericType, _, _) => n
    }.toSeq
    val stringCols = df.schema.fields.collect {
      case StructField(n, StringType, _, _) => n
    }.toSeq
    val withMedians =
      if (numericCols.isEmpty) df
      else {
        val medianRow = df.agg(
          median(col(numericCols.head)).as(numericCols.head),
          numericCols.tail.map(c => median(col(c)).as(c)): _*).first()
        val fills = numericCols.zipWithIndex.collect {
          case (c, i) if !medianRow.isNullAt(i) =>
            c -> medianRow.get(i).asInstanceOf[Number].doubleValue()
        }.toMap
        if (fills.isEmpty) df else df.na.fill(fills)
      }
    if (stringCols.isEmpty) withMedians else withMedians.na.fill("unknown", stringCols)
  }

  /** Derived order columns (F2, F3, F7, P5;
    * ref: src/etl_functions.py:95-116). */
  private def deriveOrderColumns(orders: DataFrame): DataFrame = {
    def fracDays(a: Column, b: Column): Column =
      (a.cast("double") - b.cast("double")) / 86400.0
    orders
      .withColumn("purchase_year", year(col("order_purchase_timestamp")))
      .withColumn("purchase_month", month(col("order_purchase_timestamp")))
      .withColumn("purchase_day", dayofmonth(col("order_purchase_timestamp")))
      .withColumn("purchase_dayofweek", weekday(col("order_purchase_timestamp")))
      .withColumn("purchase_quarter", quarter(col("order_purchase_timestamp")))
      .withColumn("delivery_time_days",
        fracDays(col("order_delivered_customer_date"), col("order_purchase_timestamp")))
      .withColumn("delivery_delay_days",
        fracDays(col("order_delivered_customer_date"), col("order_estimated_delivery_date")))
      // pandas NaN <= 0 evaluates False, not null — replicate (golden
      // dim_order has False where the delivery timestamps are missing)
      .withColumn("delivered_on_time",
        coalesce(col("delivery_delay_days") <= 0.0, lit(false)))
  }

  def apply(raw: RawTables): RawTables = {
    val parsed = RawTables(
      customers = raw.customers,
      orders = parseDates(raw.orders, Schemas.dateColumns("orders")),
      orderItems = parseDates(raw.orderItems, Schemas.dateColumns("order_items")),
      products = raw.products,
      sellers = raw.sellers,
      reviews = parseDates(raw.reviews, Schemas.dateColumns("reviews")),
      categoryTranslation = raw.categoryTranslation)

    // each impute() ends in a one-row median collect — an independent
    // driver barrier per table. Run them concurrently so the wall cost is
    // the slowest table's median job, not the sum of seven
    val imputed = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val Seq(cus, ord, oit, prd, sel, rev) = Await.result(
        Future.sequence(Seq(
          parsed.customers, parsed.orders, parsed.orderItems,
          parsed.products, parsed.sellers, parsed.reviews).map(t => Future(impute(t)))),
        Duration.Inf)
      RawTables(cus, ord, oit, prd, sel, rev,
        categoryTranslation = parsed.categoryTranslation.map(impute))
    }

    val withDerived = imputed.copy(orders = deriveOrderColumns(imputed.orders))

    // J1: left join category translation onto products (broadcast — the
    // translation table is a handful of rows even on the real dataset).
    // pandas merge(on=) keeps the left table's column order with the new
    // column appended; Seq-join moves the key first, so re-project.
    val products = withDerived.categoryTranslation match {
      case Some(tr) =>
        val joined = withDerived.products.join(
          broadcast(tr), Seq("product_category_name"), "left")
        joined.select((withDerived.products.columns.toIndexedSeq :+
          "product_category_name_english").map(col): _*)
      case None => withDerived.products
    }
    withDerived.copy(products = products)
  }
}
