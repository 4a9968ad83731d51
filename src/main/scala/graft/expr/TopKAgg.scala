package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_topk(score DOUBLE, id BIGINT, k) -> ARRAY<STRUCT<score,id>>`
  *
  * Bounded top-k as a typed imperative aggregate: each partition keeps
  * only its k best (score DESC, id ASC tie-break) candidates in a
  * bounded heap, partial buffers of ≤k rows merge associatively, and
  * the final buffer evaluates to the sorted top-k array.
  *
  * This is the scale-safe replacement for `row_number().over(Window
  * .partitionBy(query))` ranking: the window shape shuffles EVERY
  * scored candidate row (|corpus-probed| × |queries|) just to discard
  * all but k, while this aggregate ships at most k rows per query per
  * partition — the standard distributed-top-k topology.
  *
  * Determinism: the ordering (score DESC, then id ASC) is total, so
  * results are identical to the window formulation for any tie layout.
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Buf] {

  // Inputs must already be DOUBLE/BIGINT — GraftSession.register wraps
  // the arguments in Casts so float scores / int ids coerce at analysis
  // instead of failing as a raw asInstanceOf inside a task.
  // (ImplicitCastInputTypes is unavailable here: Spark 4 makes
  // AbstractDataType private[sql].)

  override def prettyName: String = "graft_topk"

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKAgg.entryType, containsNull = false)

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKAgg.Buf, b: TopKAgg.Buf): TopKAgg.Buf = {
    b.foreach((s, i) => a.offer(s, i))
    a
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val arr = buf.sorted
    new GenericArrayData(arr.map { case (s, i) => InternalRow(s, i) }.toArray[Any])
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKAgg.Buf(k)
    var j = 0
    while (j < n) { buf.offer(in.readDouble(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = cs(0), idExpr = cs(1))
}

object TopKAgg {
  val entryType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** Bounded "worst-first" binary heap of (score, id): the root is the
    * currently-worst kept entry (lowest score; ties: highest id), so a
    * better candidate replaces it in O(log k). */
  final class Buf(k: Int) {
    private var n = 0
    private val scores = new Array[Double](math.max(1, k))
    private val ids = new Array[Long](math.max(1, k))

    def size: Int = n

    /** true if (s1,i1) is WORSE than (s2,i2) in keep order. */
    @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 < s2 || (s1 == s2 && i1 > i2)

    def offer(s: Double, i: Long): Unit = {
      if (k == 0) return
      if (n < k) {
        scores(n) = s; ids(n) = i; n += 1
        var c = n - 1
        while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
          swap(c, (c - 1) / 2); c = (c - 1) / 2
        }
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        siftDown(0)
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftDown(start: Int): Unit = {
      var p = start
      var cont = true
      while (cont) {
        val l = 2 * p + 1; val r = l + 1
        var w = p
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == p) cont = false else { swap(p, w); p = w }
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(scores(j), ids(j)); j += 1 }
    }

    /** Best-first: score DESC, id ASC. */
    def sorted: Seq[(Double, Long)] = {
      val out = new Array[(Double, Long)](n)
      var j = 0
      while (j < n) { out(j) = (scores(j), ids(j)); j += 1 }
      out.sortBy { case (s, i) => (-s, i) }.toSeq
    }
  }
}
