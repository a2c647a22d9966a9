package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage 1 — Extract (S1-S3; ref: src/etl_functions.py:14-47).
  *
  * CSV scans with explicit schemas (no inference). The category-translation
  * table is optional (S2, hazard H7): its presence is probed through the
  * Hadoop FileSystem like the reference's os.path.exists, so the same code
  * works on HDFS/S3 paths at scale.
  */
final case class RawTables(
    customers: DataFrame,
    orders: DataFrame,
    orderItems: DataFrame,
    products: DataFrame,
    sellers: DataFrame,
    reviews: DataFrame,
    categoryTranslation: Option[DataFrame]) {
  def byName: Map[String, DataFrame] = Map(
    "customers" -> customers, "orders" -> orders, "order_items" -> orderItems,
    "products" -> products, "sellers" -> sellers, "reviews" -> reviews) ++
    categoryTranslation.map("category_translation" -> _)
}

object Extract {

  /** Decimal money mode (SURVEY §1.3 north star; VERDICT r3 #8): when
    * `spark.graft.etl.decimalMoney=true`, the order-items money columns
    * (price, freight_value) read as DECIMAL(12,2) instead of double, so
    * every downstream sum is exact and order-independent — the choice an
    * exact-money workload makes at 100 TB. Default OFF: the reference is
    * double-typed and the golden parquet schemas must match
    * bit-identically. Gated by TransformSpec's decimal-mode case and the
    * q84_decimal_money driver oracle (same semantics over testdata). */
  private[etl] val DecimalMoneyConf = "spark.graft.etl.decimalMoney"

  private def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  private def maybeDecimal(spark: SparkSession, items: DataFrame): DataFrame =
    if (spark.conf.get(DecimalMoneyConf, "false").toBoolean)
      items
        .withColumn("price", org.apache.spark.sql.functions.col("price")
          .cast("decimal(12,2)"))
        .withColumn("freight_value", org.apache.spark.sql.functions.col("freight_value")
          .cast("decimal(12,2)"))
    else items

  /** Load the 7 raw tables; FileNotFound on a required table surfaces as a
    * Left (typed error), matching the reference's None-return (S3). */
  def apply(spark: SparkSession, basePath: String): Either[String, RawTables] = {
    val fs = new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(name: String): Boolean = fs.exists(new Path(s"$basePath/$name"))

    val required = Seq(
      "olist_customers_dataset.csv", "olist_orders_dataset.csv",
      "olist_order_items_dataset.csv", "olist_products_dataset.csv",
      "olist_sellers_dataset.csv", "olist_order_reviews_dataset.csv")
    val missing = required.filterNot(exists)
    if (missing.nonEmpty) Left(s"missing raw inputs: ${missing.mkString(", ")}")
    else Right(RawTables(
      customers = readCsv(spark, s"$basePath/olist_customers_dataset.csv", Schemas.customers),
      orders = readCsv(spark, s"$basePath/olist_orders_dataset.csv", Schemas.orders),
      orderItems = maybeDecimal(spark,
        readCsv(spark, s"$basePath/olist_order_items_dataset.csv", Schemas.orderItems)),
      products = readCsv(spark, s"$basePath/olist_products_dataset.csv", Schemas.products),
      sellers = readCsv(spark, s"$basePath/olist_sellers_dataset.csv", Schemas.sellers),
      reviews = readCsv(spark, s"$basePath/olist_order_reviews_dataset.csv", Schemas.reviews),
      categoryTranslation =
        if (exists("product_category_name_translation.csv"))
          Some(readCsv(spark, s"$basePath/product_category_name_translation.csv",
            Schemas.categoryTranslation))
        else None))
  }
}
