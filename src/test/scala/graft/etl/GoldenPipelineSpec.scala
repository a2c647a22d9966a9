package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden end-to-end test (SURVEY §5.3.1): run the full pipeline on the
  * reference's committed raw CSVs and compare all 14 output tables
  * value-for-value against the reference's committed data/transformed
  * CSVs (true golden files — the reference rerun
  * reproduces them bit-identically; SURVEY §5.1).
  *
  * Comparison is value-level: rows sorted, doubles at 1e-9 relative
  * tolerance, timestamps at µs (golden carries ns; Spark holds µs — H10).
  */
class GoldenPipelineSpec extends SparkSpec {

  private val goldenDir = "/root/reference/data/transformed"
  private lazy val result = Pipeline.build(spark, "/root/reference/data/raw")
    .fold(err => fail(s"pipeline failed: $err"), identity)

  private def ts(n: String) = StructField(n, TimestampType)
  private def str(n: String) = StructField(n, StringType)
  private def lng(n: String) = StructField(n, LongType)
  private def int(n: String) = StructField(n, IntegerType)
  private def dbl(n: String) = StructField(n, DoubleType)
  private def bool(n: String) = StructField(n, BooleanType)

  /** Golden output schemas (FIXTURES.md §B, verified from committed parquet). */
  private val goldenSchemas: Map[String, StructType] = Map(
    "dim_date" -> StructType(Seq(ts("date"), int("year"), int("month"), int("day"),
      int("dayofweek"), int("quarter"), lng("is_weekend"), str("month_name"),
      str("dayofweek_name"), lng("id"))),
    "dim_customer" -> StructType(Seq(str("customer_id"), str("customer_unique_id"),
      lng("customer_zip_code_prefix"), str("customer_city"), str("customer_state"),
      str("id"))),
    "dim_product" -> StructType(Seq(str("product_id"), str("product_category_name"),
      lng("product_name_length"), lng("product_description_length"),
      lng("product_photos_qty"), lng("product_weight_g"), lng("product_length_cm"),
      lng("product_height_cm"), lng("product_width_cm"),
      str("product_category_name_english"), str("id"))),
    "dim_seller" -> StructType(Seq(str("seller_id"), lng("seller_zip_code_prefix"),
      str("seller_city"), str("seller_state"), str("id"))),
    "dim_order" -> StructType(Seq(str("order_id"), str("order_status"),
      ts("order_purchase_timestamp"), ts("order_approved_at"),
      ts("order_delivered_carrier_date"), ts("order_delivered_customer_date"),
      ts("order_estimated_delivery_date"), dbl("delivery_time_days"),
      dbl("delivery_delay_days"), bool("delivered_on_time"), str("id"))),
    "dim_review" -> StructType(Seq(str("review_id"), str("order_id"),
      lng("review_score"), str("review_comment_title"), str("review_comment_message"),
      ts("review_creation_date"), ts("review_answer_timestamp"), str("id"))),
    "fact_sales" -> StructType(Seq(str("order_id"), lng("order_item_id"),
      str("product_id"), str("seller_id"), str("customer_id"), lng("date_id"),
      dbl("price"), dbl("freight_value"), lng("review_score"))),
    "agg_sales_by_date" -> StructType(Seq(int("year"), int("month"), int("quarter"),
      lng("order_count"), dbl("total_sales"), dbl("total_freight"),
      dbl("avg_order_value"), dbl("freight_percentage"))),
    "agg_sales_by_category" -> StructType(Seq(str("category_name"), lng("order_count"),
      dbl("total_sales"), dbl("total_freight"), dbl("avg_order_value"))),
    "agg_sales_by_location" -> StructType(Seq(str("state"), lng("order_count"),
      dbl("total_sales"), dbl("total_freight"), dbl("avg_order_value"))),
    "agg_sales_by_city" -> StructType(Seq(str("state"), str("city"), lng("order_count"),
      dbl("total_sales"), str("location"))),
    "agg_sales_by_seller" -> StructType(Seq(str("seller_id"), lng("order_count"),
      dbl("total_sales"), dbl("total_freight"), dbl("avg_order_value"))),
    "agg_review_metrics" -> StructType(Seq(lng("review_score"), lng("order_count"),
      dbl("total_sales"), dbl("nps"))))

  /** Read a golden CSV all-string, then cast per the golden schema
    * (timestamps via the same coerce-parse used by the pipeline — the
    * golden files print 9 fractional digits, or bare dates for dim_date). */
  private def readGolden(name: String): DataFrame = {
    val schema = goldenSchemas(name)
    val raw = spark.read.option("header", "true")
      .schema(StructType(schema.map(f => StructField(f.name, StringType))))
      .csv(s"$goldenDir/$name.csv")
    raw.select(schema.map { f =>
      f.dataType match {
        case TimestampType => Transform.parseTs(col(f.name)).as(f.name)
        case BooleanType => lower(col(f.name)).cast(BooleanType).as(f.name)
        case dt => col(f.name).cast(dt).as(f.name)
      }
    }: _*)
  }

  private lazy val ourTables: Map[String, DataFrame] =
    Load.allTables(result.star, result.aggs)

  goldenSchemas.keys.toSeq.sorted.foreach { name =>
    test(s"$name matches golden") {
      val golden = readGolden(name)
      val ours = ourTables(name)
      // exact schema parity with the golden parquet types
      assert(ours.columns.toSeq == golden.columns.toSeq,
        s"column order: ${ours.columns.toSeq} vs ${golden.columns.toSeq}")
      assertSameRows(golden, ours)
    }
  }

  test("quality invariants hold (notebook cell 21)") {
    val report = Quality.check(result.star, result.aggs)
    assert(report.fkOk, s"FK violations: ${report.fkViolations}")
    assert(report.nullsOk, s"null counts: ${report.nullCounts}")
    assert(report.reconciled,
      s"fact=${report.factTotalSales} agg=${report.aggTotalSales}")
  }

  test("int32 columns match golden parquet dtypes (H6)") {
    val dimDate = ourTables("dim_date")
    val types = dimDate.schema.fields.map(f => f.name -> f.dataType).toMap
    Seq("year", "month", "day", "dayofweek", "quarter").foreach { c =>
      assert(types(c) == IntegerType, s"dim_date.$c should be int32, was ${types(c)}")
    }
    assert(types("is_weekend") == LongType)
    assert(types("id") == LongType)
  }
}
