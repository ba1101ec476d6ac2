package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Frequency-capped id collection — the hot-key guard as ONE aggregate.
  *
  * `graft_collect_capped(id, cap)` returns the group's ids as a sorted
  * array when the group holds ≤ cap rows, NULL otherwise. It exists for
  * the near-dup pair generators (d22 band buckets, d23 signature
  * classes): candidate pairs explode from each group locally, so the
  * whole "count the group, drop over-cap groups, pair the survivors"
  * contract costs one corpus scan and one exchange — no second counting
  * pass (the r15 hot-list anti-join device) and no count window forcing
  * a sort-exchange under a join that would otherwise broadcast (the r15
  * band-cap device; it regressed d35 at sf1 because the band self-join
  * had planned ZERO exchanges).
  *
  * Memory is bounded by construction, which `collect_list`+`size`
  * cannot promise: the buffer stores at most cap ids, and the moment a
  * group's count passes the cap the stored ids are dropped — a
  * 10M-document boilerplate class costs 16 bytes of buffer, not an 80 MB
  * list. That bound is exactly why this is a custom
  * TypedImperativeAggregate rather than a built-in composition.
  *
  * Output order is pinned (ascending) so downstream pair emission is
  * deterministic regardless of partition arrival order. Null ids are
  * skipped (collect_list semantics); an all-null group evaluates to
  * NULL like an over-cap one — both carry no pair signal.
  */
case class CappedLongCollect(
    child: Expression,
    capExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedLongCollect.Buf]
  with BinaryLike[Expression] {

  private lazy val cap: Int = capExpr.eval().asInstanceOf[Number].intValue()

  override def left: Expression = child
  override def right: Expression = capExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_collect_capped"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"id must be BIGINT, got ${child.dataType.sql}")
    } else if (!capExpr.foldable ||
      !(capExpr.dataType == IntegerType || capExpr.dataType == LongType)) {
      TypeCheckResult.TypeCheckFailure("cap must be an integer constant")
    } else {
      // validate the UNtruncated value: intValue() on a long cap would
      // silently wrap (2^32+50 -> 50) and run with the wrong cap
      val v = capExpr.eval()
      if (v == null || v.asInstanceOf[Number].longValue() <= 0) {
        TypeCheckResult.TypeCheckFailure("cap must be a positive constant")
      } else if (v.asInstanceOf[Number].longValue() > Int.MaxValue) {
        TypeCheckResult.TypeCheckFailure(
          s"cap must fit in INT, got ${v.asInstanceOf[Number].longValue()}")
      } else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): CappedLongCollect.Buf =
    new CappedLongCollect.Buf(0L, new ArrayBuffer[Long])

  override def update(b: CappedLongCollect.Buf, input: InternalRow): CappedLongCollect.Buf = {
    val v = child.eval(input)
    if (v != null) {
      b.n += 1
      if (b.n <= cap) b.xs += v.asInstanceOf[Long]
      else if (b.xs.nonEmpty) b.xs.clear()
    }
    b
  }

  override def merge(b: CappedLongCollect.Buf, o: CappedLongCollect.Buf): CappedLongCollect.Buf = {
    b.n += o.n
    if (b.n <= cap) b.xs ++= o.xs
    else if (b.xs.nonEmpty) b.xs.clear()
    b
  }

  override def eval(b: CappedLongCollect.Buf): Any =
    if (b.n == 0 || b.n > cap) null
    else new GenericArrayData(b.xs.sorted.toArray)

  override def serialize(b: CappedLongCollect.Buf): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + 8 * b.xs.length)
    out.putLong(b.n)
    b.xs.foreach(out.putLong)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongCollect.Buf = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getLong()
    val xs = new ArrayBuffer[Long]((bytes.length - 8) / 8)
    while (in.remaining() >= 8) xs += in.getLong()
    new CappedLongCollect.Buf(n, xs)
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedLongCollect =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedLongCollect =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CappedLongCollect =
    copy(child = l, capExpr = r)
}

object CappedLongCollect {
  /** n = true group count; xs = the ids, kept only while n ≤ cap. */
  final class Buf(var n: Long, val xs: ArrayBuffer[Long])
}
