package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DAX measure surface (§3.3): global measures reconcile with the
  * aggregate tables, slicer filters behave, and the approx variant stays
  * within its error bound.
  */
class MeasuresSpec extends SparkSpec {

  private lazy val result = Pipeline.build(spark, "/root/reference/data/raw")
    .fold(err => fail(err), identity)

  test("global measures reconcile with agg_sales_by_date totals") {
    val global = Measures.evaluate(result.star).first()
    val aggTotals = result.aggs.salesByDate
      .agg(sum("total_sales"), sum("total_freight"), sum("order_count")).first()
    assert(math.abs(global.getDouble(0) - aggTotals.getDouble(0)) < 1e-6)
    assert(math.abs(global.getDouble(1) - aggTotals.getDouble(1)) < 1e-6)
    // global exact DISTINCTCOUNT <= summed per-day distinct counts (H2)
    assert(global.getLong(2) <= aggTotals.getLong(2))
  }

  test("slicer filters restrict measures (year slicer)") {
    val all = Measures.evaluate(result.star).first().getDouble(0)
    val y2022 = Measures.evaluate(result.star,
      filters = Seq(col("dt_year") === 2022)).first().getDouble(0)
    assert(y2022 <= all + 1e-9)
    assert(y2022 > 0.0)
  }

  test("grouped measures: one row per state, avg_ticket = sales/orders") {
    val byState = Measures.evaluate(result.star,
      groupBy = Seq(col("cust_customer_state"))).collect()
    assert(byState.length == result.star.dimCustomer
      .select("customer_state").distinct().count())
    byState.foreach { r =>
      val sales = r.getDouble(1); val orders = r.getLong(3)
      val ticket = r.getDouble(4)
      assert(math.abs(ticket - sales / orders) < 1e-9 * math.max(sales, 1.0))
    }
  }

  test("approx measures stay within 5x rsd of exact at this scale") {
    val exact = Measures.evaluate(result.star).first()
    val approx = Measures.evaluateApprox(result.star, rsd = 0.01).first()
    val exactN = exact.getLong(2).toDouble
    val approxN = approx.getLong(2).toDouble
    assert(math.abs(approxN - exactN) / exactN <= 0.05,
      s"approx=$approxN exact=$exactN")
    assert(math.abs(approx.getDouble(0) - exact.getDouble(0)) < 1e-6) // sums exact
  }
}
