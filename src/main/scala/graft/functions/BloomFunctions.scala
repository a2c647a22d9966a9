package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's bloom-filter expressions — the same
  * codegen'd machinery Catalyst's runtime-filter injection uses
  * (`BloomFilterAggregate` builds the sketch as a TypedImperativeAggregate,
  * `BloomFilterMightContain` probes it), exposed as temp functions because
  * they are public classes but absent from the default FunctionRegistry:
  *
  *  - `bloom_filter_agg(xxhash64(x), estimatedItems, numBits)` → binary
  *  - `might_contain(sketch, xxhash64(x))` → boolean
  *
  * Used by d99's decontamination tier; registration follows the
  * [[TopKAggregate]] pattern (idempotent per session).
  */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg", exprs =>
        new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)).toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain", exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
