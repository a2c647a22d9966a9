package graft

import org.apache.spark.sql.functions._

/** The typed facade and the SQL catalog must agree with the DataFrame
  * surface: typed pipelines produce the same numbers, and spark.sql text
  * (including the custom expressions) matches the Column-DSL plans.
  */
class TypedSqlSpec extends SparkSpec {

  test("typed Dataset aggregation agrees with the DataFrame result") {
    import spark.implicits._
    val typedResult = Typed.lineitem(spark, sf)
      .filter(_.l_quantity > 10.0)
      .groupByKey(_.l_returnflag)
      .mapGroups((flag, rows) => flag -> rows.map(_.l_extendedprice).sum)
      .collect().toMap
    val untyped = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 10.0)
      .groupBy("l_returnflag").agg(sum("l_extendedprice").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typedResult.keySet == untyped.keySet)
    typedResult.foreach { case (k, v) =>
      assert(math.abs(v - untyped(k)) <= 1e-9 * math.max(math.abs(v), 1.0))
    }
  }

  test("spark.sql over the catalog matches the DataFrame q1_agg") {
    SqlCatalog.register(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  count(DISTINCT l_orderkey) AS order_count
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    val viaDf = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), countDistinct("l_orderkey").as("order_count"))
      .orderBy("l_returnflag", "l_linestatus")
    assertSameRows(viaDf, viaSql)
  }

  test("custom expressions are callable from SQL text") {
    SqlCatalog.register(spark, sf)
    val row = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS c,
        |  dot_product(a.embedding, a.embedding) AS sq
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 0
        |LIMIT 1""".stripMargin).first()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-9) // self-cosine = 1
    assert(row.getDouble(1) > 0.0)
  }

  test("typed mapPartitions runs partition-local Scala over Documents") {
    import spark.implicits._
    val lens = Typed.documents(spark, sf)
      .mapPartitions(_.map(doc => (doc.doc_id, doc.text.length.toLong)))
      .toDF("doc_id", "len")
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    assertSameRows(expected, lens)
  }
}
