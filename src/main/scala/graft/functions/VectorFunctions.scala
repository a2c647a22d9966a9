package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math.
  *
  * A Scala UDF over Array[Float] would deserialize each array to a boxed
  * WrappedArray per row; these expressions read the unsafe ArrayData
  * in-place and participate in whole-stage codegen, which is the difference
  * between "works on 2k vectors" and "works on 10^9 vectors" for the
  * brute-force similarity path (SURVEY §7.3).
  */
sealed trait VectorPairExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
        if (lt == FloatType || lt == DoubleType) && lt == rt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects two arrays of float or double, got ${left.dataType} / ${right.dataType}")
    }
  }
}

/** cosine(a, b) = dot(a,b) / (|a| |b|); 0.0 when either norm is zero.
  * Computed in double regardless of input element width. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorPairExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    if (elemIsFloat) {
      while (i < n) {
        val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
    } else {
      while (i < n) {
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.$get($i);
         |  double $yi = (double) $y.$get($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a, b) in double. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorPairExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    if (elemIsFloat) {
      while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $x.$get($i) * (double) $y.$get($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  @volatile private var registered: Set[SparkSession] = Set.empty

  /** Idempotently register the vector expressions with the session's
    * function registry so they're callable from both the Column DSL
    * (via call_function) and plain SQL. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
      // xxhash64 with an explicit seed (the functions._ wrapper pins seed
      // 42); the seed argument must be a foldable literal. Used for the
      // MinHash permutation family — ANSI-safe, unlike affine (a*h+b)
      // permutations which overflow LongType under ANSI mode.
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "rolling_min_hash", exprs => RollingMinHash(exprs(0), exprs(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "xxhash64_seed", exprs =>
          org.apache.spark.sql.catalyst.expressions.XxHash64(
            exprs.init, exprs.last.eval(null).asInstanceOf[Number].longValue()),
        "built-in")
      registered += spark
    }
  }

  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("cosine_sim", a, b)
  }

  def dotProduct(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("dot_product", a, b)
  }
}
