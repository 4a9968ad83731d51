package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(bits, value) -> BOOLEAN` — membership probe
  * against a serialized `org.apache.spark.util.sketch.BloomFilter`
  * (the one `DataFrame.stat.bloomFilter` builds), embedded in the plan
  * as a binary literal and shipped to executors with the task binary
  * (Spark broadcasts large task binaries itself).
  *
  * The 100 TB role: when a membership side is too large for a
  * broadcast-hash join (the d7 guard) but its BLOOM still fits
  * (~9.6 bits/item at 1% fpp ⇒ ~120 MB per 10^8 distinct keys), a
  * map-side `filter(graft_bloom_contains(...))` drops ~99% of the
  * probe stream BEFORE the shuffle the exact join needs. Bloom filters
  * have no false negatives, so following the pre-filter with the exact
  * equi-join yields a provably EXACT result — false positives are the
  * only survivors of the pre-filter that the join then discards.
  *
  * Probe hashing matches the builder: `stat.bloomFilter` inserts a
  * string column as its UTF-8 bytes (`putBinary`), and this probe
  * calls `mightContainBinary` on the value's UTF-8 bytes — parity is
  * asserted empirically in OpsSpec (bloom path ≡ exact path row-for-
  * row, which a single false negative would break).
  *
  * `bits` must be a plan-time literal: the filter is deserialized once
  * per (task-deserialized) expression instance, not per row. */
case class BloomContains(bits: Expression, value: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = bits
  override def right: Expression = value
  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (bits.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains: bits must be BINARY, got ${bits.dataType.sql}")
    else if (value.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains: value must be STRING, got ${value.dataType.sql}")
    else if (!bits.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains: bits must be a plan-time literal (the serialized filter)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val bloom: BloomFilter = {
    val b = bits.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
  }

  override def nullSafeEval(bitsV: Any, v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bits = newLeft, value = newRight)
}
