package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** rolling_min_hash(text, k): minimum polynomial rolling hash over all
  * k-byte windows of the UTF-8 text — the classic Rabin-Karp/winnowing
  * document fingerprint. O(n) per document via the rolling update
  * h' = (h - lead·B^(k-1))·B + next, wrapping in Long (ANSI-safe: the
  * wraparound happens in JVM arithmetic, not SQL arithmetic).
  *
  * Equal texts always collide; texts sharing any k-byte run are likely to
  * collide — which is exactly the fingerprint property winnowing-style
  * near-dup detection wants. Texts shorter than k hash their whole bytes.
  */
case class RollingMinHash(left: Expression, right: Expression)
    extends BinaryExpression {

  private val Base = 1000003L

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects (string, int), got $other")
    }

  override def nullSafeEval(text: Any, kAny: Any): Any = {
    val bytes = text.asInstanceOf[UTF8String].getBytes
    val k = kAny.asInstanceOf[Int]
    RollingMinHash.minHash(bytes, k, Base)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, kv) => {
      val cls = RollingMinHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.minHash($t.getBytes(), $kv, ${Base}L);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "rolling_min_hash"
}

object RollingMinHash {
  /** Minimum polynomial hash over all k-byte windows (whole input if
    * shorter than k). Called from both interpreted eval and codegen. */
  def minHash(bytes: Array[Byte], k: Int, base: Long): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.max(1, math.min(k, n))
    var pow = 1L // base^(w-1), wrapped
    var i = 1
    while (i < w) { pow *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * base + (bytes(i) & 0xff); i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xff) * pow) * base + (bytes(i) & 0xff)
      if (h < min) min = h
      i += 1
    }
    min
  }
}
