package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_lsh_bucket(embedding ARRAY<FLOAT>, planes INT) -> INT`
  *
  * Random-hyperplane LSH (Charikar 2002): bit p of the bucket is the
  * sign of the dot product with a pseudo-random ±1 hyperplane derived
  * deterministically from splitmix64(p·131 + d) — no stored model, so
  * every executor (and every cluster size) derives identical buckets.
  * Cosine-similar vectors collide with probability 1 − θ/π per bit.
  */
case class LshBucket(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "graft_lsh_bucket"
  override def dataType: DataType = IntegerType
  override def nullSafeEval(vec: Any, planesAny: Any): Any = {
    val arr = vec.asInstanceOf[ArrayData]
    val planes = planesAny.asInstanceOf[Int]
    val n = arr.numElements()
    var bucket = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val sign = if ((Hash64.mix(p.toLong * 131L + d) & 1L) == 1L) 1.0 else -1.0
        dot += arr.getFloat(d).toDouble * sign
        d += 1
      }
      if (dot > 0.0) bucket |= (1 << p)
      p += 1
    }
    java.lang.Integer.valueOf(bucket)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
