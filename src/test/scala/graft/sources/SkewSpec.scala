package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** AQE must detect and split a synthesized hot key at runtime (the
  * automatic half of the skew story; Layouts.saltedJoin is the manual
  * half). Thresholds are lowered so toy-scale partitions qualify as
  * skewed; correctness is asserted against the non-AQE result.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4096",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1024")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // hot key: every 3rd lineitem row lands on key 0
      val skewed = Tables.lineitem(spark, "/root/testdata/sf0.01")
        .select(when(col("l_orderkey") % 3 === 0, 0L)
          .otherwise(col("l_orderkey")).as("k"), col("l_extendedprice"))
      val dim = Tables.orders(spark, "/root/testdata/sf0.01")
        .select(col("o_orderkey").as("k"), col("o_totalprice"))
        .unionByName(spark.range(1).select(lit(0L).as("k"), lit(0.0).as("o_totalprice")))
        .distinct()
      val joined = skewed.join(dim, "k")
      // collect() executes this exact queryExecution so AQE finalizes it
      // (count() would build a separate plan)
      val n = joined.collect().length.toLong
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("skew=true") || plan.contains("isSkew=true"),
        "AQE did not mark the join skewed:\n" + plan)
      // correctness unchanged vs the plain (no skew handling) result
      val expected = Tables.lineitem(spark, "/root/testdata/sf0.01").count()
      assert(n >= expected, s"skewed join lost rows: $n < $expected")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
