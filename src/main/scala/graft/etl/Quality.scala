package graft.etl

import org.apache.spark.sql.functions._

/** Post-load invariants (J7, A11; ref: notebooks/01_etl_process.ipynb
  * cell 21) — the reference's in-notebook verification as a typed API:
  * FK integrity via anti-joins, fact null counts, fact↔aggregate sum
  * reconciliation.
  */
object Quality {

  final case class Report(
      fkViolations: Map[String, Long],
      nullCounts: Map[String, Long],
      factTotalSales: Double,
      aggTotalSales: Double) {
    def fkOk: Boolean = fkViolations.values.forall(_ == 0L)
    def nullsOk: Boolean = nullCounts.values.forall(_ == 0L)
    // np.isclose semantics (the notebook's comparison): rtol 1e-5 + atol
    // 1e-8. An absolute epsilon is wrong here — the aggregate rounds each
    // group to cents, so fact-vs-agg drift grows with group count and
    // total magnitude (observed ~0.7 on a 1.6e8 total at 1000x scale).
    def reconciled: Boolean =
      math.abs(factTotalSales - aggTotalSales) <= 1e-8 + 1e-5 * math.abs(aggTotalSales)
    def ok: Boolean = fkOk && nullsOk && reconciled
  }

  def check(star: StarSchema, aggs: AggTables): Report = {
    // the checks below run ~8 independent jobs over the fact (5 FK
    // anti-joins, a null scan, a sum); materialize it once
    val fact = star.factSales.persist()
    fact.count()
    try checkImpl(fact, star, aggs) finally fact.unpersist()
  }

  private def checkImpl(fact: org.apache.spark.sql.DataFrame,
      star: StarSchema, aggs: AggTables): Report = {

    // cell 21:5-13 — every fact FK resolves in its dimension (anti-join empty)
    val fks = Seq(
      ("order_id", star.dimOrder), ("product_id", star.dimProduct),
      ("seller_id", star.dimSeller), ("customer_id", star.dimCustomer),
      ("date_id", star.dimDate))
    val fkViolations = fks.map { case (fk, dim) =>
      fk -> fact.select(fk).distinct()
        .join(dim.select("id"), fact(fk) === dim("id"), "left_anti")
        .count()
    }.toMap

    // cell 21:15-18 — null counts over the key fact columns, one pass
    val keyCols = Seq("order_id", "order_item_id", "product_id", "seller_id",
      "customer_id", "date_id", "price")
    val nullRow = fact.agg(
      sum(when(col(keyCols.head).isNull, 1L).otherwise(0L)).as(keyCols.head),
      keyCols.tail.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(c)): _*).first()
    val nullCounts = keyCols.zipWithIndex.map { case (c, i) => c -> nullRow.getLong(i) }.toMap

    // cell 21:20-26 — sum(fact.price) == sum(agg_sales_by_date.total_sales)
    val factSum = fact.agg(sum("price")).first().getDouble(0)
    val aggSum = aggs.salesByDate.agg(sum("total_sales")).first().getDouble(0)

    Report(fkViolations, nullCounts, factSum, aggSum)
  }
}
