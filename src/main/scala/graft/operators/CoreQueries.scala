package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator surface (SURVEY.md §2) expressed over the
  * driver testdata tables. One named query per operator row, each with a
  * DuckDB-equivalent oracle in [[oracleSql]].
  *
  * Scale notes (100 TB design): every query is a declarative DataFrame plan
  * — Catalyst pushes filters/projections to the parquet scan, chooses
  * broadcast-hash joins for the small dimensions (region/nation/supplier),
  * and runs partial+final hash aggregation around a single shuffle. Nothing
  * collects to the driver.
  */
object CoreQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** A1: hash group-by, multi-agg with exact count-distinct
    * (ref: src/etl_functions.py:261-265). */
  private val q1Agg: Q = (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_price"),
        countDistinct("l_orderkey").as("order_count"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1Agg
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_price,
        |  count(DISTINCT l_orderkey) AS order_count,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
