package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Last-writer-wins row selection as ONE hash aggregation.
  *
  * `graft_last_by2(k1, k2, v)` returns `struct(k1, k2, v)` for the
  * group row with the lexicographically largest `(k1, k2)` — the
  * argmax every "latest event per key" query needs (q08 mirrors the
  * reference's .parseRemReturnLocs, events.R:263: last checkout wins,
  * ties broken by id).
  *
  * Why not `max_by(struct(...), struct(ts, id))`: a struct aggregation
  * buffer is not UnsafeRow-mutable, so the declarative form silently
  * plans SortAggregate — a per-partition sort of EVERY raw event,
  * O(n log n) growing with the corpus (the r16 orderAssembly finding;
  * q08's pair read 6.8× at sf1 under it). Packing `(ts, id)` into one
  * int64 for a plain `max` doesn't survive scale — 51-bit epoch micros
  * + 30-bit ids at sf10 already exceed 63 bits — and the winner-join
  * alternative re-scans the corpus. This TypedImperativeAggregate
  * keeps the whole selection in ObjectHashAggregate: one corpus scan,
  * per-group state of exactly (2 longs + the candidate value), partial
  * buffers merged map-side, ONE winner-grain exchange, no sort
  * anywhere.
  *
  * Memory/scale: per-group state is ~32 B + |v|; the hash map degrades
  * gracefully past `spark.sql.objectHashAggregate.sortBased
  * .fallbackThreshold` (raised from Spark's 128 in GraftSession /
  * Bench / Verify — the default was tuned for percentile-sized
  * buffers, while these fixed-width buffers hold hundreds of
  * thousands of groups per task comfortably).
  *
  * Null contract: rows with a null ordering key carry no position and
  * are skipped (max_by's null-ordering semantics); a null `v` on the
  * winning row survives as a null field. Empty/all-null-key group →
  * NULL struct. Callers that mirror a ROW_NUMBER oracle (which ranks
  * null keys instead of dropping them) must pre-filter null keys on
  * BOTH sides — q08 does (ADVICE r17).
  */
case class ArgMaxLast2(
    k1Expr: Expression,
    k2Expr: Expression,
    vExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMaxLast2.Buf]
  with TernaryLike[Expression] {

  override def first: Expression = k1Expr
  override def second: Expression = k2Expr
  override def third: Expression = vExpr

  override def dataType: DataType = StructType(Seq(
    StructField("k1", LongType, nullable = false),
    StructField("k2", LongType, nullable = false),
    StructField("v", vExpr.dataType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_last_by2"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k1Expr.dataType != LongType || k2Expr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"ordering keys must be BIGINT, got (${k1Expr.dataType.sql}, ${k2Expr.dataType.sql})")
    else if (!Seq[DataType](StringType, DoubleType, LongType).contains(vExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"value must be STRING, DOUBLE or BIGINT, got ${vExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): ArgMaxLast2.Buf = new ArgMaxLast2.Buf

  override def update(b: ArgMaxLast2.Buf, input: InternalRow): ArgMaxLast2.Buf = {
    val k1v = k1Expr.eval(input)
    val k2v = k2Expr.eval(input)
    if (k1v != null && k2v != null) {
      val k1 = k1v.asInstanceOf[Long]; val k2 = k2v.asInstanceOf[Long]
      if (!b.set || k1 > b.k1 || (k1 == b.k1 && k2 > b.k2)) {
        val v = vExpr.eval(input)
        b.set = true; b.k1 = k1; b.k2 = k2
        // clone strings: the UTF8String points into a reused row buffer
        b.v = v match { case s: UTF8String => s.clone(); case other => other }
      }
    }
    b
  }

  override def merge(b: ArgMaxLast2.Buf, o: ArgMaxLast2.Buf): ArgMaxLast2.Buf =
    if (!o.set) b
    else if (!b.set || o.k1 > b.k1 || (o.k1 == b.k1 && o.k2 > b.k2)) o
    else b

  override def eval(b: ArgMaxLast2.Buf): Any =
    if (!b.set) null else InternalRow(b.k1, b.k2, b.v)

  override def serialize(b: ArgMaxLast2.Buf): Array[Byte] = {
    if (!b.set) return Array[Byte](0)
    // value payload: 8 fixed bytes for long/double, length-prefixed
    // bytes for string, -1 length for null — keyed by vExpr.dataType,
    // which both serializing and deserializing sides share
    val vb: Array[Byte] = b.v match {
      case null => null
      case s: UTF8String => s.getBytes
      case l: java.lang.Long =>
        java.nio.ByteBuffer.allocate(8).putLong(l).array()
      case d: java.lang.Double =>
        java.nio.ByteBuffer.allocate(8).putDouble(d).array()
    }
    val out = java.nio.ByteBuffer.allocate(1 + 8 + 8 + 4 + (if (vb == null) 0 else vb.length))
    out.put(1: Byte).putLong(b.k1).putLong(b.k2)
    if (vb == null) out.putInt(-1) else { out.putInt(vb.length); out.put(vb) }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): ArgMaxLast2.Buf = {
    val b = new ArgMaxLast2.Buf
    val in = java.nio.ByteBuffer.wrap(bytes)
    if (in.get() == (1: Byte)) {
      b.set = true; b.k1 = in.getLong(); b.k2 = in.getLong()
      val n = in.getInt()
      if (n >= 0) {
        val vb = new Array[Byte](n); in.get(vb)
        b.v = vExpr.dataType match {
          case StringType => UTF8String.fromBytes(vb)
          case LongType => java.lang.Long.valueOf(java.nio.ByteBuffer.wrap(vb).getLong())
          case DoubleType => java.lang.Double.valueOf(java.nio.ByteBuffer.wrap(vb).getDouble())
        }
      }
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ArgMaxLast2 =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArgMaxLast2 =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ArgMaxLast2 =
    copy(k1Expr = f, k2Expr = s, vExpr = t)
}

object ArgMaxLast2 {
  /** set=false ⇔ no qualifying row seen; v is the winner's value
    * (UTF8String cloned / boxed Long / boxed Double), which may
    * legitimately be null. */
  final class Buf {
    var set: Boolean = false
    var k1: Long = 0L
    var k2: Long = 0L
    var v: Any = null
  }
}
