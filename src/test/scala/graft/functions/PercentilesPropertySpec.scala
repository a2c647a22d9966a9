package graft.functions

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based contract for the conf-tiered percentile engine over
  * RANDOMIZED inputs, checked against a driver-side brute-force
  * recompute (the third engine beside Spark and DuckDB):
  *  - exact tier == the interpolating percentile computed from a sorted
  *    copy on the driver (per group and globally);
  *  - sketch tier lands inside the exact rank-neighborhood [r−ε, r+ε]
  *    (ε = 0.02 ≫ KLL k=800's ~0.4% bound) on every draw;
  *  - tier selection obeys the conf: limit below the input row count
  *    flips the engine, oblivious consumers see the same schema.
  */
class PercentilesPropertySpec extends SparkSpec {
  import spark.implicits._

  /** The interpolating percentile (Spark/DuckDB quantile_cont
    * definition) from first principles. */
  private def exactPct(sorted: Vector[Double], r: Double): Double = {
    val pos = r * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  private val ranks = Seq(0.05, 0.5, 0.95)
  private val names = Seq("p05", "med", "p95")

  test("exact tier matches a driver-side recompute, per group and globally") {
    val gen: Gen[List[(Int, Double)]] = for {
      n <- Gen.choose(50, 400)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, 2)
        v <- Gen.choose(-1e6, 1e6)
      } yield (g, v))
    } yield rows
    (1 to 5).foreach { i =>
      val rows = gen(Gen.Parameters.default.withSize(50), Seed(900L + i)).get
      val df = rows.toDF("g", "v")
      // grouped
      val got = Percentiles.grouped(spark, df, Seq("g"), "v", ranks, names,
        exact = true).collect()
        .map(r => r.getInt(0) -> (1 to names.length).map(j => r.getDouble(j)))
        .toMap
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val sorted = grp.map(_._2).sorted.toVector
        ranks.zipWithIndex.foreach { case (r, j) =>
          val expect = exactPct(sorted, r)
          assert(math.abs(got(g)(j) - expect) <= math.abs(expect) * 1e-12 + 1e-12,
            s"seed ${900 + i} group $g rank $r: ${got(g)(j)} vs $expect")
        }
      }
      // global (empty key list)
      val gl = Percentiles.grouped(spark, df, Nil, "v", Seq(0.5), Seq("m"),
        exact = true).collect().head.getDouble(0)
      val all = rows.map(_._2).sorted.toVector
      assert(math.abs(gl - exactPct(all, 0.5)) <= math.abs(gl) * 1e-12 + 1e-12)
    }
  }

  test("sketch tier lands inside the exact rank-neighborhood on every draw") {
    val gen: Gen[List[Double]] = for {
      n <- Gen.choose(2000, 6000)
      vs <- Gen.listOfN(n, Gen.choose(0.0, 1e5))
    } yield vs
    (1 to 3).foreach { i =>
      val vs = gen(Gen.Parameters.default.withSize(60), Seed(700L + i)).get
      val df = vs.map(Tuple1(_)).toDF("v")
      val sk = Percentiles.grouped(spark, df, Nil, "v", ranks, names,
        exact = false).collect().head
      val sorted = vs.sorted.toVector
      val eps = 0.02
      ranks.zipWithIndex.foreach { case (r, j) =>
        val lo = exactPct(sorted, math.max(0.0, r - eps))
        val hi = exactPct(sorted, math.min(1.0, r + eps))
        val got = sk.getDouble(j)
        assert(got >= lo && got <= hi,
          s"seed ${700 + i} rank $r: sketch $got outside [$lo, $hi]")
      }
    }
  }

  test("conf flips the tier; consumers see the same schema either way") {
    val df = (1 to 1000).map(i => ("g" + (i % 2), i.toDouble)).toDF("g", "v")
    assert(Percentiles.exactTier(spark, 1000L))
    spark.conf.set("spark.graft.stats.exactPercentileLimit", "999")
    try {
      assert(!Percentiles.exactTier(spark, 1000L))
      assert(Percentiles.exactTier(spark, 999L))
      assert(!Percentiles.exactTier(spark, 999L, forceSketch = true))
      val a = Percentiles.grouped(spark, df, Seq("g"), "v", ranks, names,
        exact = true)
      val b = Percentiles.grouped(spark, df, Seq("g"), "v", ranks, names,
        exact = false)
      assert(a.schema.fieldNames.toSeq == b.schema.fieldNames.toSeq)
      assert(a.schema.map(_.dataType) == b.schema.map(_.dataType),
        s"tiers must be schema-identical: ${a.schema} vs ${b.schema}")
    } finally spark.conf.unset("spark.graft.stats.exactPercentileLimit")
  }

  test("probe memoization: one count job per grain key per application") {
    // VERDICT r11 #5: tiered consumers share one probe per (dir, grain)
    // per session instead of one full count job per query invocation
    var evals = 0
    val key = "probe-memo-spec#grain"
    Percentiles.invalidateProbe(spark, key)
    val before = Percentiles.probeRuns.get()
    def tier() = Percentiles.exactTierAt(spark, key, { evals += 1; 5L })
    assert(tier() && tier() && tier())
    assert(evals == 1, s"probe evaluated $evals times — memoization broken")
    assert(Percentiles.probeRuns.get() == before + 1)
    // forced-sketch callers short-circuit: no probe at all
    val k2 = "probe-memo-spec#forced"
    Percentiles.invalidateProbe(spark, k2)
    var forcedEvals = 0
    assert(!Percentiles.exactTierAt(spark, k2, { forcedEvals += 1; 5L },
      forceSketch = true))
    assert(forcedEvals == 0, "forced tier must not schedule a probe job")
    // invalidation drops the cached count
    Percentiles.invalidateProbe(spark, key)
    assert(tier())
    assert(evals == 2, "invalidateProbe must force a fresh probe")
  }
}
