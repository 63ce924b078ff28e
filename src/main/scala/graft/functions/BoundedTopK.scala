package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/**
 * Native bounded top-k aggregate: keeps the k LARGEST values of `child`
 * (any orderable type; pass a struct for multi-key ordering with the
 * tie-break inside) in a size-k min-heap per aggregation buffer, returning
 * them as a descending array.
 *
 * Why a custom aggregate (SURVEY §7.5 ladder, level b): the standard per-key
 * top-k — `row_number() OVER (PARTITION BY key ORDER BY ...) <= k` — plans a
 * full LOCAL SORT of every input row (O(N log N)) beneath Spark 4's partial
 * WindowGroupLimit before anything is pruned; this aggregate replaces that
 * sort with O(N log k) heap updates and carries at most k values per
 * (mapper, key) through the partial/final pair as ONE array row — k-fold
 * fewer shuffled rows than even the group-limited window form, measured on
 * task metrics in `TopKShuffleSpec` (1 500 vs 15 000 rows at sf0.1,
 * 15 000 vs 150 000 at 10×; both far below N thanks to the group limit,
 * which pre-3.5 folklore said shuffles all N).
 *
 * Buffers serialize via a single-field UnsafeProjection (count-prefixed
 * frames), which is what crosses the partial→final exchange.
 */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[Any]]
    with UnaryLike[Expression] {

  require(k > 0, "topk_by requires k > 0")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  // reverse ordering → the queue's head is the SMALLEST kept value, so one
  // peek decides admission and one dequeue evicts
  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[Any] =
    scala.collection.mutable.PriorityQueue.empty[Any](ordering.reverse)

  override def update(buf: scala.collection.mutable.PriorityQueue[Any],
      input: InternalRow): scala.collection.mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) {
      if (buf.size < k) buf.enqueue(InternalRow.copyValue(v))
      else if (ordering.compare(v, buf.head) > 0) {
        buf.dequeue(); buf.enqueue(InternalRow.copyValue(v))
      }
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.PriorityQueue[Any],
      other: scala.collection.mutable.PriorityQueue[Any]): scala.collection.mutable.PriorityQueue[Any] = {
    other.foreach { v =>
      if (buf.size < k) buf.enqueue(v)
      else if (ordering.compare(v, buf.head) > 0) { buf.dequeue(); buf.enqueue(v) }
    }
    buf
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering.reverse))

  override def serialize(buf: scala.collection.mutable.PriorityQueue[Any]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach { v =>
      val bytes = proj.apply(InternalRow(v)).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val frame = new Array[Byte](in.readInt())
      in.readFully(frame)
      val row = new UnsafeRow(1)
      row.pointTo(frame, frame.length)
      buf.enqueue(InternalRow.copyValue(row.get(0, child.dataType)))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by"
  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)
}
