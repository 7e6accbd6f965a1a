package graft.sim

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded-state distributed top-k: keep the `k` LARGEST struct values
  * (struct natural/lexicographic order), returned as an array sorted
  * descending.
  *
  * This is the single-pass replacement for the two-window top-k (local
  * row_number per partition, then global row_number): as a
  * TypedImperativeAggregate it gets map-side partial aggregation, so
  * each input partition reduces to ≤ k rows of state BEFORE the
  * shuffle and the merge is k·log k per partition — one shuffle of
  * k×partitions tiny buffers instead of two window sorts over all
  * candidate rows. At 100 TB (ANN scoring emits |queries|×nprobe·|cell|
  * candidates) the window form shuffles every candidate twice; this
  * never shuffles a candidate at all.
  *
  * State is a bounded min-heap (head = smallest kept value — the
  * eviction point). Ties in the struct order keep an arbitrary winner;
  * make the struct total (e.g. include a unique id column) for
  * deterministic output, as the ANN callers do with (score, -nn_id).
  */
case class TopKStruct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[UnsafeRow]] {

  require(k >= 1, s"topk_struct: k must be >= 1, got $k")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType).asInstanceOf[Ordering[InternalRow]]
  private lazy val project = UnsafeProjection.create(structType)

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "topk_struct"

  override def createAggregationBuffer(): java.util.PriorityQueue[UnsafeRow] =
    new java.util.PriorityQueue[UnsafeRow](k,
      (a: UnsafeRow, b: UnsafeRow) => ordering.compare(a, b))

  private def insert(buf: java.util.PriorityQueue[UnsafeRow], row: InternalRow): Unit = {
    // merge-path rows are ALREADY UnsafeRows of the buffer schema —
    // re-running UnsafeProjection would re-encode field by field and
    // then copy again; a plain copy suffices (update-path rows from
    // child.eval may be generic and still project)
    def enc(r: InternalRow): UnsafeRow = r match {
      case u: UnsafeRow => u.copy()
      case _ => project(r).copy()
    }
    if (buf.size < k) {
      buf.add(enc(row))
    } else if (ordering.compare(row, buf.peek) > 0) {
      buf.poll()
      buf.add(enc(row))
    }
  }

  override def update(buf: java.util.PriorityQueue[UnsafeRow],
                      input: InternalRow): java.util.PriorityQueue[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[InternalRow])
    buf
  }

  override def merge(buf: java.util.PriorityQueue[UnsafeRow],
                     other: java.util.PriorityQueue[UnsafeRow]): java.util.PriorityQueue[UnsafeRow] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[UnsafeRow]): Any = {
    // MUST NOT mutate the buffer: running-frame window aggregation calls
    // eval repeatedly on the same buffer as rows accumulate — draining
    // the heap here would silently empty every later frame's result.
    val arr: Array[AnyRef] = buf.toArray(new Array[UnsafeRow](buf.size))
      .sortWith((a, b) => ordering.compare(a, b) > 0) // descending
      .asInstanceOf[Array[AnyRef]]
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[UnsafeRow]): Array[Byte] = {
    var total = 4
    val it = buf.iterator()
    while (it.hasNext) total += 4 + it.next().getSizeInBytes
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.size)
    val it2 = buf.iterator()
    while (it2.hasNext) {
      val r = it2.next()
      val bytes = r.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[UnsafeRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rowBytes, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStruct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStruct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStruct =
    copy(child = newChildren.head)
}
