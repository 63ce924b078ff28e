package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native Misra-Gries frequent-items sketch: one bounded counter map per
 * aggregation buffer (at most `capacity` keys), merged across partitions with
 * the Agarwal et al. "Mergeable Summaries" reduction, evaluating to the
 * candidate key array.
 *
 * Guarantee (the reason this is the 100 TB heavy-hitters path): after any
 * sequence of updates and merges over n rows, EVERY key with true frequency
 * > n/(capacity+1) is present in the summary, and each surviving counter
 * under-estimates its key's true count by at most n/(capacity+1). Which
 * LOW-frequency keys also survive depends on arrival/merge order — so the
 * candidate set is a deterministic SUPERSET of the frequent keys, not a
 * deterministic set. Callers that need an exact, partition-invariant answer
 * run the two-pass shape (see `events_frequent_users`): sketch → exact
 * recount of the ≤`capacity` candidates → threshold filter. The recount
 * makes the final result independent of arrival order while the shuffle
 * stays O(partitions·capacity) instead of O(distinct keys) — the difference
 * that matters when a billion-key column holds twenty heavy hitters.
 *
 * Update path: hit → increment; miss with room → insert at 1; miss when full
 * → decrement ALL counters by 1 and drop zeros (the classic MG step, O(cap)
 * amortized over the ≥cap rows that funded it). Merge: sum counters, then if
 * over capacity subtract the (capacity+1)-th largest counter value from all
 * and drop non-positives — exactly the offset that preserves the error bound.
 */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
    with UnaryLike[Expression] {

  require(capacity > 0, "mg_candidates requires capacity > 0")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val proj =
    UnsafeProjection.create(Array(child.dataType, LongType))

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty[Any, Long]

  override def update(buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.get(v) match {
        case Some(c) => buf.update(v, c + 1L)
        case None if buf.size < capacity =>
          buf.update(InternalRow.copyValue(v), 1L)
        case None => // decrement-all; drop zeros
          val dead = mutable.ArrayBuffer.empty[Any]
          buf.mapValuesInPlace { (_, c) => c - 1L }
          buf.foreach { case (k, c) => if (c <= 0L) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything: at most
      // `capacity` keys stay strictly positive, error grows by that offset
      // (still bounded by n/(capacity+1) overall per Mergeable Summaries)
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val offset = counts(counts.length - (capacity + 1))
      val dead = mutable.ArrayBuffer.empty[Any]
      buf.mapValuesInPlace { (_, c) => c - offset }
      buf.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Candidate keys, sorted by (estimated count desc, key asc) for a stable
    * display order; the ESTIMATES are order-dependent so they are not
    * returned — recount exactly downstream. */
  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val entries = buf.toArray
    java.util.Arrays.sort(entries, new java.util.Comparator[(Any, Long)] {
      override def compare(a: (Any, Long), b: (Any, Long)): Int = {
        val byCount = java.lang.Long.compare(b._2, a._2)
        if (byCount != 0) byCount else ordering.compare(a._1, b._1)
      }
    })
    new GenericArrayData(entries.map(_._1))
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = proj.apply(InternalRow(k, c)).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val frame = new Array[Byte](in.readInt())
      in.readFully(frame)
      val row = new UnsafeRow(2)
      row.pointTo(frame, frame.length)
      buf.update(InternalRow.copyValue(row.get(0, child.dataType)), row.getLong(1))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_candidates"
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
