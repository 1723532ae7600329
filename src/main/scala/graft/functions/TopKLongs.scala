package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * Top-k per group as a MERGEABLE aggregate — `graft_topk(x, k)` returns
 * the k largest long values of the group, sorted descending (a multiset:
 * duplicates kept).
 *
 * The scale contract, and why this exists next to the window form
 * (`row_number() OVER (...) <= k`, WindowGroupLimit): the window still
 * SORTS each partition's rows; this aggregate keeps a size-k min-heap
 * per group in the hash-aggregate buffer, so partial aggregation bounds
 * each task's state to O(groups x k) regardless of row count, partials
 * merge heap-into-heap on the reduce side, and NO sort of the input
 * ever happens. At 100 TB that is the difference between shuffling and
 * sorting every row versus shuffling at most k values per group per
 * task. The same TypedImperativeAggregate shape SURVEY §2.11 notes as
 * the fallback for the reference's dense-array partial aggregation.
 *
 * Deterministic: the result is the k largest VALUES (ties are equal
 * values), so any partitioning and merge order yields the same array.
 * NULL inputs are skipped; an all-NULL/empty group yields an empty
 * array.
 */
@ExpressionDescription(
  usage = "graft_topk(x, k) - the k largest long values of the group, sorted descending.")
case class TopKLongs(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKLongs.Heap] {

  require(k > 0, s"graft_topk: k must be positive, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  require(child.dataType == LongType || child.dataType == IntegerType,
    s"graft_topk input must be int/long, got ${child.dataType}")

  override def createAggregationBuffer(): TopKLongs.Heap = new TopKLongs.Heap(k)

  @transient private lazy val toLong: Any => Long =
    if (child.dataType == IntegerType) v => v.asInstanceOf[Int].toLong
    else v => v.asInstanceOf[Long]

  override def update(h: TopKLongs.Heap, input: InternalRow): TopKLongs.Heap = {
    val v = child.eval(input)
    if (v != null) h.add(toLong(v))
    h
  }

  override def merge(a: TopKLongs.Heap, b: TopKLongs.Heap): TopKLongs.Heap = {
    var i = 0
    while (i < b.size) { a.add(b.values(i)); i += 1 }
    a
  }

  override def eval(h: TopKLongs.Heap): Any =
    new GenericArrayData(h.sortedDesc)

  override def serialize(h: TopKLongs.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * h.size)
    bb.putInt(h.size)
    var i = 0
    while (i < h.size) { bb.putLong(h.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKLongs.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKLongs.Heap(k)
    var i = 0
    while (i < n) { h.add(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongs =
    copy(child = newChildren.head)
}

object TopKLongs {
  /** Bounded min-heap over a primitive array: root (index 0) is the
   * smallest retained value, so an incoming value only displaces the
   * root when it beats the current k-th largest. */
  final class Heap(k: Int) {
    val values = new Array[Long](k)
    var size = 0

    def add(v: Long): Unit = {
      if (size < k) {
        values(size) = v; size += 1; siftUp(size - 1)
      } else if (v > values(0)) {
        values(0) = v; siftDown(0)
      }
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && values((i - 1) / 2) > values(i)) {
        val p = (i - 1) / 2
        val t = values(p); values(p) = values(i); values(i) = t
        i = p
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      var continue = true
      while (continue) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && values(l) < values(m)) m = l
        if (r < size && values(r) < values(m)) m = r
        if (m == i) continue = false
        else {
          val t = values(m); values(m) = values(i); values(i) = t
          i = m
        }
      }
    }

    def sortedDesc: Array[Long] = {
      val out = java.util.Arrays.copyOf(values, size)
      java.util.Arrays.sort(out)
      // ascending -> descending in place
      var i = 0; var j = out.length - 1
      while (i < j) { val t = out(i); out(i) = out(j); out(j) = t; i += 1; j -= 1 }
      out
    }
  }
}
