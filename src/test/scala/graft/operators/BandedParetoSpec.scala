package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Tier-equivalence property for the q233/q276 banded prefix sum: the
  * distributed banded tier must reproduce the exact single-window tier
  * BYTE-FOR-BYTE on every distribution — including the adversarial
  * ones the KLL cuts stress: total ties (every part equal revenue, all
  * cuts collapse to one value), tiny-support ties (thousands of parts
  * sharing 3 revenue values, so every band boundary lands mid-tie),
  * and extreme skew (one part holding ~99% of revenue). The oracle
  * gate (q276 at sf0.001/sf0.01) covers the real tables; this spec
  * covers the tie/skew shapes the testdata happens not to contain.
  */
class BandedParetoSpec extends SparkSpec {

  /** Write a synthetic lineitem-shaped parquet dir and return its path.
    * rows: (l_partkey, l_extendedprice, l_discount). */
  private def stage(name: String, rows: Seq[(Long, Double, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"pareto_$name")
    rows.toDF("l_partkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir.toString
  }

  private def run(q: String, d: String): Seq[(Long, Long, Long, Long, Long, String)] =
    graft.SparkEntry.queries(q)(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
      .toSeq

  private def assertTiersAgree(name: String,
      rows: Seq[(Long, Double, Double)]): Unit = {
    val d = stage(name, rows)
    // q276 forces the banded tier; q233 takes the exact tier (corpus far
    // below the default limit) — both against the same staged dir
    graft.functions.Percentiles.invalidateProbe(spark, s"$d#lineitem.partkeys")
    val exact = run("q233_abc_pareto", d)
    val banded = run("q276_abc_pareto_banded", d)
    assert(exact == banded,
      s"$name: banded tier diverged from exact\nexact : ${exact.take(5)}\n" +
        s"banded: ${banded.take(5)}")
    // structural sanity on the shared result: ranks are 1..n, the running
    // sum ends at the total, and bands are monotone A ≤ B ≤ C in rank order
    assert(exact.map(_._3) == (1L to exact.length.toLong))
    assert(exact.last._4 == exact.last._5, "running sum must end at total")
    val bandSeq = exact.map(_._6)
    assert(bandSeq == bandSeq.sorted,
      s"$name: bands must be monotone in rank order: $bandSeq")
  }

  test("total ties: every part equal revenue — all KLL cuts collapse") {
    // every cut equals the single value; band expression degenerates to
    // one band; the intra-band window must then equal the global window
    assertTiersAgree("ties_total",
      (1L to 500L).map(k => (k, 10.0, 0.0)))
  }

  test("tiny-support ties: 3 revenue values across 900 parts — cuts land mid-tie") {
    val rows = (1L to 900L).map { k =>
      val price = (k % 3) match {
        case 0 => 5.0
        case 1 => 7.0
        case _ => 11.0
      }
      (k, price, 0.0)
    }
    assertTiersAgree("ties_tiny_support", rows)
  }

  test("extreme skew: one part holds ~99% of revenue") {
    val rows = (1L to 400L).map(k =>
      (k, if (k == 17L) 100000.0 else 2.5, 0.0))
    assertTiersAgree("skew_one_part", rows)
  }

  test("multi-row parts with discounts: per-part sums cross cut boundaries") {
    // 4 lineitem rows per part, pseudo-random prices/discounts on exact
    // 2-dp lattices, deterministic seed — per-part cents sums are dense
    // enough that every band boundary splits near-equal neighbours
    val rng = new scala.util.Random(42)
    val rows = for {
      k <- 1L to 300L
      _ <- 1 to 4
    } yield (k,
      math.floor(rng.nextDouble() * 10000.0) / 100.0,
      math.floor(rng.nextDouble() * 10.0) / 100.0)
    assertTiersAgree("multirow_dense", rows)
  }

  test("band count tracks the grain: no per-band partition exceeds the limit") {
    // force a tiny exact-percentile limit so the AUTO-derived band count
    // (max(64, ceil(n/limit))) must grow past 64 — then assert the
    // resulting per-band window partitions actually honour the bound
    // (VERDICT r12 #2: the knob existed, nothing scaled it)
    val rows = (1L to 1300L).map(k => (k, (k % 97 + 1) * 1.75, 0.005 * (k % 3)))
    val d = stage("band_growth", rows)
    graft.functions.Percentiles.invalidateProbe(spark, s"$d#lineitem.partkeys")
    val exact = run("q233_abc_pareto", d)
    spark.conf.set("spark.graft.stats.exactPercentileLimit", "10")
    try {
      graft.functions.Percentiles.invalidateProbe(spark, s"$d#lineitem.partkeys")
      val banded = run("q233_abc_pareto", d)
      assert(banded == exact, "grown-band tier must equal the exact tier")
      // replay the band assignment to measure the largest band: with
      // n=1300 and limit=10 the derived count is 130 bands; KLL cut
      // collisions can merge adjacent bands, so the honest bound is a
      // small multiple of the limit, far below the 64-band n/64 ≈ 21-row
      // honest-but-fixed floor this test exists to rule out
      val nBands = 130
      val cuts = graft.functions.Percentiles.grouped(
        spark, spark.read.parquet(s"$d/lineitem.parquet")
          .select(col("l_partkey"),
            floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0
              + 0.5).cast("long").as("rev_cents"))
          .groupBy("l_partkey").agg(sum("rev_cents").as("part_cents")),
        Nil, "part_cents",
        (1 until nBands).map(_.toDouble / nBands),
        (1 until nBands).map(k => s"b$k"), exact = false)
        .collect()(0).toSeq.map(_.asInstanceOf[Double]).distinct
      val perPart = exact.map(t => (t._1, t._2))
      val bandSizes = perPart
        .groupBy { case (_, cents) => cuts.count(q => cents < q) }
        .values.map(_.size)
      assert(bandSizes.max <= 10 * 8,
        s"largest band ${bandSizes.max} rows — bands did not track the grain")
    } finally spark.conf.unset("spark.graft.stats.exactPercentileLimit")
  }

  test("banded tier under a forced conf flip matches too (q233 itself re-tiers)") {
    // flip the global limit to 0 so q233 ITSELF takes the banded path —
    // the auto-tier consumers must agree with the exact recompute
    val rows = (1L to 600L).map(k => (k, (k % 7 + 1) * 3.25, 0.01 * (k % 5)))
    val d = stage("conf_flip", rows)
    graft.functions.Percentiles.invalidateProbe(spark, s"$d#lineitem.partkeys")
    val exact = run("q233_abc_pareto", d)
    spark.conf.set("spark.graft.stats.exactPercentileLimit", "0")
    try {
      graft.functions.Percentiles.invalidateProbe(spark, s"$d#lineitem.partkeys")
      val auto = run("q233_abc_pareto", d)
      assert(auto == exact, "conf-flipped q233 must equal the exact tier")
    } finally spark.conf.unset("spark.graft.stats.exactPercentileLimit")
  }
}
