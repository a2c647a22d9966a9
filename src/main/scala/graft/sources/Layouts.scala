package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the cluster-scale paths the toy data
  * doesn't force: bucketed co-located joins and salted skew joins.
  */
object Layouts {

  /** Persist a DataFrame as a bucketed, sorted table so later equi-joins
    * on the bucket keys are shuffle-free (both sides pre-partitioned by
    * the same hash — the Spark answer to co-located joins at 100 TB).
    * Requires a session with a warehouse dir (saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Skew-resistant equi-join: the (possibly skewed) left side gets a
    * deterministic-per-row salt in [0, n); the right side is replicated n
    * times, one copy per salt value, and the join key becomes (key, salt).
    * Hot keys spread across n reducers instead of one. Result is
    * row-identical to the plain join for inner and left joins — the salt
    * only routes rows. Right/full outer are rejected: every unmatched
    * right row would surface once per replica. (AQE skew-join handles
    * most cases automatically; this is the explicit tool for when it
    * can't, e.g. a skewed aggregate above the join.) */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, n: Int, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "leftouter").contains(
      joinType.toLowerCase.replaceAll("[_ ]", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType' " +
        "(right/full would replicate unmatched right rows n times)")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(leftKey), monotonically_increasing_id()), lit(n.toLong)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until n).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) && salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__salt")
  }
}
