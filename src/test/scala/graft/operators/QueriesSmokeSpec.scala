package graft

/** Every registered query runs at sf0.001, returns rows, and (when it has
  * an oracle) the oracle mentions exactly the query's output columns —
  * guarding against the silent column-name hash-mismatch failure mode of
  * the driver's compare. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every oracle references each output column name") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val df = SparkEntry.queries(name)(spark, sf)
      val lowered = sql.toLowerCase
      df.columns.foreach { c =>
        assert(lowered.contains(c.toLowerCase),
          s"$name: output column '$c' not mentioned in oracle SQL")
      }
    }
  }

  test("oracle set is a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
