package graft.plans

import graft.SparkSpec

/** The extensions entry point must inject every custom function without
  * error — the same set the runtime path registers — and the injected
  * constructors must evaluate; end-to-end SQL execution is covered by
  * TypedSqlSpec against the runtime registration path (both go through
  * the same expression constructors).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extension injects all custom functions into a SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    // the extensions path must cover the SAME function names as the
    // runtime registration path — a function present in only one means a
    // SQL user and a Column-DSL user see different catalogs
    graft.functions.VectorFunctions.register(spark)
    graft.functions.TopKAggregate.register(spark)
    graft.functions.StringSimilarity.register(spark)
    graft.functions.KllAggregates.register(spark)
    graft.functions.ThetaAggregates.register(spark)
    graft.functions.GramMatrixAgg.register(spark)
    graft.functions.CountMinAgg.register(spark)
    graft.functions.MisraGriesAgg.register(spark)
    for (fn <- Seq("cosine_sim", "dot_product", "topk_by_score", "xxhash64_seed",
        "rolling_min_hash", "minhash_signature", "l2sq",
        "jaro_sim", "jaro_winkler_sim",
        "kll_sketch_agg", "kll_merge_agg", "kll_quantile",
        "theta_sketch_agg", "theta_merge_agg", "theta_estimate",
        "theta_intersect_estimate", "theta_union_estimate",
        "gram_matrix_agg", "count_min_agg", "cms_estimate",
        "misra_gries_agg")) {
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(fn)),
        s"$fn missing from runtime registry")
    }
  }

  test("injected expression constructors build and evaluate") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val arr = Literal.create(Array(1.0f, 0.0f), ArrayType(FloatType, containsNull = false))
    val cos = graft.functions.CosineSimilarity(arr, arr)
    assert(math.abs(cos.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
    val dot = graft.functions.DotProduct(arr, arr)
    assert(math.abs(dot.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
    val sig = graft.functions.MinHashSignature(
      Literal.create(Array(123456789L, 987654321L), ArrayType(LongType, containsNull = false)),
      Literal(4))
    val out = sig.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(out.numElements() == 4)
    assert(out.toLongArray().forall(_ != Long.MaxValue))
  }
}
