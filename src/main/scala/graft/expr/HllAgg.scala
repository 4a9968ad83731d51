package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_hll(hash BIGINT, p) -> ARRAY<INT>` — HyperLogLog registers
  * (Flajolet et al. 2007) over pre-mixed 64-bit hashes as a typed
  * imperative aggregate. `p` is a plan-time literal (4..16); the
  * buffer is the 2^p-byte register array, merged element-wise-max.
  *
  * This is the scale-safe distinct-count topology: an exact
  * `countDistinct(tok)` per group shuffles every (group, value) pair —
  * at corpus scale, the full vocabulary × host matrix — while this
  * aggregate ships exactly 2^p bytes per group per partition and
  * merges associatively (max is commutative, idempotent, and
  * duplicate-insensitive, so no upstream `distinct` is needed).
  *
  * Register math, fixed and oracle-mirrorable in integer SQL:
  * bucket = top p bits of the hash; v = low 64-p bits;
  * rho = (64-p) - bitlen(v) + 1 (v=0 → 64-p+1) — the leading-zero
  * rank expressed through bit-LENGTH so DuckDB's `length(bin(v))`
  * computes the identical value. The ESTIMATE (alpha·m²/Σ2^-reg) is
  * deliberately NOT part of the aggregate's output: IEEE summation
  * order would differ between engines, while the registers themselves
  * are exact integers — derive estimates downstream (see OpsSpec's
  * accuracy check).
  */
case class HllAgg(
    hashExpr: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"graft_hll: p must be in [4,16], got $p")
  private val m = 1 << p
  private val restBits = 64 - p
  private val restMask = if (restBits == 64) -1L else (1L << restBits) - 1

  override def prettyName: String = "graft_hll"
  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val mv = h.asInstanceOf[Long]
      val bucket = (mv >>> restBits).toInt
      val v = mv & restMask
      // bitlen(v) = 64 - nlz(v); rho = restBits - bitlen(v) + 1
      val rho =
        if (v == 0L) restBits + 1
        else restBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(v))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(o: Int): HllAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(hashExpr = cs(0))
}

object HllAgg {
  /** Standard HLL estimate from a register array (driver/test-side
    * helper; see the Scaladoc for why this is not in the aggregate). */
  def estimate(regs: Array[Int]): Double = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val z = 1.0 / regs.map(r => math.pow(2.0, -r)).sum
    val e = alpha * m * m * z
    val zeros = regs.count(_ == 0)
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
    else e
  }
}
