package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.3.4) over randomized micro-fact
  * tables: aggregation decomposition, distinct-count bounds, NPS range,
  * left-join multiplicity bounds, and median-fill idempotence. Samples are
  * drawn from scalacheck Gens with fixed seeds for reproducibility.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val factGen: Gen[List[(String, Long, Double, Long)]] =
    Gen.nonEmptyListOf(for {
      order <- Gen.choose(1, 20).map(i => s"o$i")
      item <- Gen.choose(1L, 4L)
      price <- Gen.choose(1, 100000).map(_ / 100.0)
      score <- Gen.choose(0L, 5L)
    } yield (order, item, price, score))

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))

  test("sum decomposes over any grouping; countDistinct <= count") {
    samples(factGen, 10).foreach { rows =>
      val df = rows.toDF("order_id", "item", "price", "score")
      val total = df.agg(sum("price")).first().getDouble(0)
      val grouped = df.groupBy("score").agg(
        sum("price").as("s"), countDistinct("order_id").as("d"), count(lit(1)).as("n"))
      val parts = grouped.agg(sum("s")).first().getDouble(0)
      assert(math.abs(total - parts) < 1e-6 * math.max(math.abs(total), 1.0))
      grouped.collect().foreach(r => assert(r.getLong(2) <= r.getLong(3)))
    }
  }

  test("lattice rounding of double sums is invariant to partitioning") {
    // the class of bug behind round-1's q1_agg hash failure: double
    // summation is non-associative, so partial-aggregation order shifts
    // sums by ulps. Rounding AT the data's decimal lattice (here 2, for
    // cent-valued prices) must give byte-identical results regardless of
    // how the rows are partitioned.
    samples(factGen, 10).foreach { rows =>
      val df = rows.toDF("order_id", "item", "price", "score")
      def roundedSums(parts: Int): Map[Long, Double] =
        df.repartition(parts).groupBy("score")
          .agg(round(sum("price"), 2).as("s"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val one = roundedSums(1)
      Seq(3, 7, 32).foreach { p =>
        val m = roundedSums(p)
        assert(m == one, s"round-2 sums differ between 1 and $p partitions")
        // byte-identical, not just numerically close
        m.foreach { case (k, v) =>
          assert(java.lang.Double.doubleToLongBits(v) ==
            java.lang.Double.doubleToLongBits(one(k)))
        }
      }
    }
  }

  test("NPS stays in [-100, 100] for any score distribution") {
    samples(factGen, 10).foreach { rows =>
      val fact = rows.toDF("order_id", "order_item_id", "price", "review_score")
      val perScore = fact.groupBy("review_score").agg(
        countDistinct("order_id").as("order_count"), sum("price").as("total_sales"))
      val nps = perScore.agg(
        ((sum(when(col("review_score") === 5, col("order_count")).otherwise(0L))
          .cast("double") / sum("order_count") * 100.0) -
          (sum(when(col("review_score") <= 3, col("order_count")).otherwise(0L))
            .cast("double") / sum("order_count") * 100.0)).as("nps"))
        .first().getDouble(0)
      assert(nps >= -100.0 - 1e-9 && nps <= 100.0 + 1e-9, s"nps=$nps")
    }
  }

  test("left join multiplicity: rows = sum over keys of max(1, matches) (H8)") {
    samples(Gen.zip(factGen, factGen), 10).foreach { case (left, right) =>
      val l = left.toDF("k", "item", "price", "score").select("k", "price")
      val r = right.toDF("k", "item", "price", "score").select(col("k"), col("score"))
      val joined = l.join(r, Seq("k"), "left")
      val rightCounts = r.groupBy("k").count().collect()
        .map(row => row.getString(0) -> row.getLong(1)).toMap
      val expected = l.collect().map(row => rightCounts.getOrElse(row.getString(0), 1L)).sum
      assert(joined.count() == expected)
    }
  }

  test("impute is idempotent and leaves no numeric nulls") {
    val gen = Gen.nonEmptyListOf(Gen.option(Gen.choose(1, 1000).map(_ / 10.0)))
    samples(gen, 10).filter(_.exists(_.isDefined)).foreach { xs =>
      val df = xs.toDF("x")
      val once = Transform.impute(df)
      assert(once.filter(col("x").isNull).count() == 0)
      val twice = Transform.impute(once)
      assertSameRows(once, twice)
    }
  }
}
