package graft.plans

import graft.SparkSpec

/** The extensions entry point must inject all four functions without
  * error; end-to-end SQL execution of the injected expressions is covered
  * by TypedSqlSpec against the runtime registration path (both go through
  * the same expression constructors).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extension injects all custom functions into a SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }

  test("injected expression constructors build and evaluate") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val arr = Literal.create(Array(1.0f, 0.0f), ArrayType(FloatType, containsNull = false))
    val cos = graft.functions.CosineSimilarity(arr, arr)
    assert(math.abs(cos.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
    val dot = graft.functions.DotProduct(arr, arr)
    assert(math.abs(dot.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }
}
