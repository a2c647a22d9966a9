package graft.etl

import org.apache.spark.sql.types._

/** Explicit source schemas for the 7 Olist CSVs (SURVEY §1.3, FIXTURES.md §A).
  *
  * Schema inference is off for determinism (hazard H6). Timestamp columns
  * are read as STRING and parsed in Transform (F1) to reproduce pandas'
  * `errors='coerce'` null-on-unparseable semantics; the raw strings carry
  * 9 fractional digits which truncate to Spark's µs precision (H10 — the
  * resulting error in day-fraction arithmetic is ~1e-15, far below the
  * 1e-9 comparison tolerance).
  */
object Schemas {

  private def s(name: String) = StructField(name, StringType)
  private def l(name: String) = StructField(name, LongType)
  private def d(name: String) = StructField(name, DoubleType)

  val customers: StructType = StructType(Seq(
    s("customer_id"), s("customer_unique_id"), l("customer_zip_code_prefix"),
    s("customer_city"), s("customer_state")))

  val orders: StructType = StructType(Seq(
    s("order_id"), s("customer_id"), s("order_status"),
    s("order_purchase_timestamp"), s("order_approved_at"),
    s("order_delivered_carrier_date"), s("order_delivered_customer_date"),
    s("order_estimated_delivery_date")))

  val orderItems: StructType = StructType(Seq(
    s("order_id"), l("order_item_id"), s("product_id"), s("seller_id"),
    s("shipping_limit_date"), d("price"), d("freight_value")))

  val products: StructType = StructType(Seq(
    s("product_id"), s("product_category_name"), l("product_name_length"),
    l("product_description_length"), l("product_photos_qty"), l("product_weight_g"),
    l("product_length_cm"), l("product_height_cm"), l("product_width_cm")))

  val sellers: StructType = StructType(Seq(
    s("seller_id"), l("seller_zip_code_prefix"), s("seller_city"), s("seller_state")))

  val reviews: StructType = StructType(Seq(
    s("review_id"), s("order_id"), l("review_score"),
    s("review_comment_title"), s("review_comment_message"),
    s("review_creation_date"), s("review_answer_timestamp")))

  val categoryTranslation: StructType = StructType(Seq(
    s("product_category_name"), s("product_category_name_english")))

  /** Timestamp-typed columns per table, parsed in Transform
    * (ref: src/etl_functions.py:71-82). */
  val dateColumns: Map[String, Seq[String]] = Map(
    "orders" -> Seq("order_purchase_timestamp", "order_approved_at",
      "order_delivered_carrier_date", "order_delivered_customer_date",
      "order_estimated_delivery_date"),
    "reviews" -> Seq("review_creation_date", "review_answer_timestamp"),
    "order_items" -> Seq("shipping_limit_date"))
}
