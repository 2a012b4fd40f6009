package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Bounded collect buffer: exact running count, element storage capped
  * at `cap` — the first `cap` long values seen (any order; callers sort
  * at eval). Storage GROWS geometrically up to the cap instead of
  * eagerly allocating `cap` longs: a hash aggregate holds one buffer
  * PER GROUP, and the common shape (LSH buckets) is millions of groups
  * of 1–2 members — eager allocation would cost cap·8 bytes per bucket
  * (8 KB each at the default, gigabytes across a partition's hash
  * table) for storage that is almost never used, and would make a
  * deliberately-huge "effectively unbounded" cap an instant OOM. */
final class BoundedCollectBuffer(val cap: Int) {
  var n: Long = 0L
  var items = new Array[Long](math.min(cap, 4))
  var m: Int = 0

  private def ensure(k: Int): Unit =
    if (k > items.length) {
      val next = math.min(cap.toLong,
        math.max(k.toLong, items.length * 2L)).toInt
      items = java.util.Arrays.copyOf(items, next)
    }

  def add(v: Long): Unit = {
    n += 1
    if (m < cap) { ensure(m + 1); items(m) = v; m += 1 }
  }

  def mergeInto(other: BoundedCollectBuffer): BoundedCollectBuffer = {
    n += other.n
    ensure(math.min(cap.toLong, m.toLong + other.m).toInt)
    var i = 0
    while (i < other.m && m < cap) { items(m) = other.items(i); m += 1; i += 1 }
    this
  }
}

/** `bounded_collect(id, cap)` → struct<n: bigint, items: array<bigint>>
  * — an EXACT group count plus the group's elements, element storage
  * HARD-CAPPED at `cap` (sorted ascending at eval for deterministic
  * downstream expansion).
  *
  * Purpose: groups that need their members enumerated ONLY when the
  * group is small (LSH buckets, blocking keys). `collect_list` buffers
  * a pathological group in full before any size filter can drop it —
  * the classic web-dedup OOM. A census-then-semi-join two-phase avoids
  * that but costs two extra shuffles and a persisted relation. This
  * aggregate does both jobs in ONE map-side-partial shuffle: `n` is
  * always exact, so an oversized group is detected and dropped
  * downstream, while its buffer never held more than `cap` longs no
  * matter how degenerate the group (the guard lives IN the aggregate,
  * not in a preceding pass).
  */
case class BoundedCollectLong(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedCollectBuffer]
    with UnaryLike[Expression] {

  require(cap > 0, s"bounded_collect needs cap > 0, got $cap")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_collect needs a bigint input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): BoundedCollectBuffer =
    new BoundedCollectBuffer(cap)

  override def update(buf: BoundedCollectBuffer, input: InternalRow): BoundedCollectBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedCollectBuffer, other: BoundedCollectBuffer): BoundedCollectBuffer =
    buf.mergeInto(other)

  override def eval(buf: BoundedCollectBuffer): Any = {
    val out = java.util.Arrays.copyOf(buf.items, buf.m)
    java.util.Arrays.sort(out)
    InternalRow(buf.n, new GenericArrayData(out))
  }

  override def serialize(buf: BoundedCollectBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 8 * buf.m)
    bb.putLong(buf.n).putInt(buf.m)
    var i = 0
    while (i < buf.m) { bb.putLong(buf.items(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BoundedCollectBuffer(cap)
    buf.n = bb.getLong
    val m = bb.getInt
    buf.items = new Array[Long](math.max(m, 4))
    buf.m = m
    var i = 0
    while (i < m) { buf.items(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectLong =
    copy(child = newChild)
}

object BoundedCollectLong {
  /** Column form: `boundedCollect(cap)(id)`. */
  def boundedCollect(cap: Int)(id: Column): Column =
    Bridge.column(
      BoundedCollectLong(Bridge.expression(id.cast("long")), cap)
        .toAggregateExpression())
}
