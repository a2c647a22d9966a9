package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral contracts for the round-8 third-wave operators beyond their
  * DuckDB hash gates: association-rule arithmetic on a hand-computed
  * basket fixture, quality-check verdicts on a deliberately broken table,
  * KLL sketch accuracy + mergeability at the function level, A/B z-test
  * significance on a constructed extreme experiment (variant assignment
  * recomputed with JDK MessageDigest — a third, Spark-free engine), and
  * last-touch attribution tie/deadline semantics.
  */
class BiOpsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("biops").toString

  private def eventsFixture(
      dir: String, rows: Seq[(Long, String, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (id, ts, user, typ, v) =>
      (id, java.sql.Timestamp.valueOf(ts), user, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("q164_basket_rules: hand-computed support/confidence/lift") {
    import spark.implicits._
    val dir = tmp()
    // 8 baskets: 6×{BX,BY}, 1×{BX}, 1×{BZ} → supp X=7, Y=6, Z=1, XY=6
    val li = (1L to 6L).flatMap(o => Seq((o, 1L), (o, 2L))) ++
      Seq((7L, 1L), (8L, 3L))
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "BX"), (2L, "BY"), (3L, "BZ")).toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val rules = graft.FunctionQueries.queries("q164_basket_rules")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    // only the two BX/BY directions clear the supp_both >= 5 floor
    assert(rules.keySet == Set(("BX", "BY"), ("BY", "BX")), s"rules: $rules")
    val (sXY, saX, scY, confXY, liftXY) = rules(("BX", "BY"))
    assert((sXY, saX, scY) == (6L, 7L, 6L))
    assert(math.abs(confXY - 6.0 / 7.0) < 1e-8)
    assert(math.abs(liftXY - 48.0 / 42.0) < 1e-8)
    val (_, _, _, confYX, liftYX) = rules(("BY", "BX"))
    assert(confYX == 1.0)
    assert(math.abs(liftYX - 48.0 / 42.0) < 1e-8)
  }

  test("q165_quality_checks: broken table trips exactly the broken checks") {
    import spark.implicits._
    val dir = tmp()
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    Seq(
      (1L, Option(10L), "F", 100.0, ts("2024-01-01 00:00:00")),
      (2L, Option.empty[Long], "O", 200.0, ts("2024-01-02 00:00:00")),
      (2L, Option(11L), "P", 300.0, ts("2024-01-03 00:00:00")),
      (3L, Option(12L), "X", 20000000.0, ts("2024-01-04 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(1L, 99L).toDF("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rep = graft.FunctionQueries.queries("q165_quality_checks")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(rep.size == 7)
    assert(rep(("completeness", "orders.o_custkey")) == (0.75, false))
    assert(rep(("completeness", "orders.o_orderdate")) == (1.0, true))
    assert(rep(("uniqueness", "orders.o_orderkey")) == (0.75, false))
    assert(rep(("range_0_10m", "orders.o_totalprice")) == (0.75, false))
    assert(rep(("accepted_FOP", "orders.o_orderstatus")) == (0.75, false))
    assert(rep(("ref_integrity", "lineitem.l_orderkey")) == (0.5, false))
    assert(rep(("row_count", "orders")) == (4.0, true))
  }

  test("kll sketch: accuracy, mergeability, and serialization roundtrip") {
    import spark.implicits._
    graft.functions.KllAggregates.register(spark)
    val df = (1 to 10000).map(i => (i % 4, i.toDouble)).toDF("g", "v")
    // one-shot sketch: p50 within the ±3% rank band used by the gate
    val p50 = df.agg(expr("kll_quantile(kll_sketch_agg(v, 200), 0.5d)"))
      .head().getDouble(0)
    assert(p50 >= 4700.0 && p50 <= 5300.0, s"p50=$p50")
    // partial sketches per group merged == same accuracy band (the
    // persisted-sketch-table path: merge NEVER touches raw values)
    val merged = df.groupBy("g").agg(expr("kll_sketch_agg(v, 200)").as("sk"))
      .agg(expr("kll_quantile(kll_merge_agg(sk, 200), 0.5d)"))
      .head().getDouble(0)
    assert(merged >= 4700.0 && merged <= 5300.0, s"merged p50=$merged")
    val p90 = df.agg(expr("kll_quantile(kll_sketch_agg(v, 200), 0.9d)"))
      .head().getDouble(0)
    assert(p90 >= 8700.0 && p90 <= 9300.0, s"p90=$p90")
  }

  test("q166_quantile_rollup: rank contract holds on a known distribution") {
    val dir = tmp()
    eventsFixture(dir, (1 to 1000).map { i =>
      (i.toLong, f"2024-01-${i % 10 + 1}%02d 00:00:00", i.toLong % 7, "m", i.toDouble)
    })
    val rows = graft.FunctionQueries.queries("q166_quantile_rollup")(spark, dir)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) == 1000L)          // n
    assert(r.getLong(2) == 10L)            // n_day_cells
    assert(r.getDouble(3) == 500.5)        // exact interpolating p50 of 1..1000
    assert(r.getBoolean(4) && r.getBoolean(5), s"rank contract failed: $r")
  }

  /** The gated query's variant rule, recomputed Spark-free (third engine):
    * first 16 bits of md5(user_id string), even → A. */
  private def variantA(u: Long): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(u.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 4), 16) % 2 == 0
  }

  test("q168_ab_test: constructed extreme experiment is significant") {
    val dir = tmp()
    // every A-user converts (purchase over the 180 cut), no B-user does
    val users = (1L to 40L)
    eventsFixture(dir, users.map { u =>
      (u, "2024-01-01 00:00:00", u, "purchase",
        if (variantA(u)) 200.0 else 10.0)
    })
    val nA = users.count(variantA)
    assert(nA > 0 && nA < users.size, s"degenerate hash split nA=$nA")
    val r = graft.EventQueries.queries("q168_ab_test")(spark, dir).head()
    assert(r.getLong(0) == nA.toLong && r.getLong(1) == nA.toLong,
      s"A cell: $r")       // n_a, conv_a: all of A converted
    assert(r.getLong(3) == (users.size - nA).toLong && r.getLong(4) == 0L,
      s"B cell: $r")       // n_b, conv_b
    assert(r.getDouble(2) == 1.0 && r.getDouble(5) == 0.0)
    assert(r.getDouble(6) > 1.96 && r.getBoolean(7), s"z/significant: $r")
  }

  test("q169_attribution: as-of pick, equal-ts touch, and direct fallback") {
    import spark.implicits._
    val dir = tmp()
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    eventsFixture(dir, Seq(
      (1L, "2024-01-01 01:00:00", 1L, "click", 0.0),
      (2L, "2024-01-01 03:00:00", 1L, "view", 0.0)))
    Seq(
      (101L, 1L, "F", 10.0, ts("2024-01-01 02:00:00")), // after click → click
      (102L, 1L, "F", 20.0, ts("2024-01-01 03:00:00")), // AT view's ts → view (<=)
      (103L, 2L, "F", 40.0, ts("2024-01-01 05:00:00"))) // no events → direct
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val m = graft.EventQueries.queries("q169_attribution")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m == Map(
      "click" -> ((1L, 10.0)),
      "view" -> ((1L, 20.0)),
      "direct" -> ((1L, 40.0))), s"attribution: $m")
  }
}
