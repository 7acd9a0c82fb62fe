package org.apache.spark.sql.graftshim

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score DESC, id ASC) entries
  * in a fixed-size heap per aggregation buffer, each carrying one opaque
  * long `payload` (e.g. a label or cell id) that rides along without
  * affecting the ordering.
  *
  * This is the scale-correct form of "top-k per key": the window
  * formulation (`row_number over (partition by key order by score)`)
  * sorts EVERY scored row through the shuffle; this aggregate keeps k
  * candidates per partition map-side and merges k-sized heaps — for a
  * 100 TB corpus scan with 10^5 queries the shuffle shrinks from
  * |corpus|×|queries| rows to k×partitions×|queries|. The payload slot
  * exists so consumers (retrieval eval carrying the neighbor's label)
  * don't need a corpus re-join to recover per-winner attributes.
  *
  * eval() emits the winners best-first as `array<struct<score,id,payload>>`.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    payload: Expression = Literal(0L),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with ExpectsInputTypes {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(score, id, payload)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("payload", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val p = payload.eval(input)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long],
        if (p == null) 0L else p.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    b.foreach((s, i, p) => a.insert(s, i, p))
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (s, i, p) =>
      val row = new GenericInternalRow(3)
      row.setDouble(0, s); row.setLong(1, i); row.setLong(2, p); row
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val entries = buf.sortedBestFirst
    val bb = ByteBuffer.allocate(4 + entries.length * 24)
    bb.putInt(entries.length)
    entries.foreach { case (s, i, p) => bb.putDouble(s); bb.putLong(i); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    (0 until n).foreach(_ => buf.insert(bb.getDouble, bb.getLong, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), payload = newChildren(2))
}

/** Fixed-capacity worst-out heap over (score, id, payload); "better"
  * means higher score, ties broken by smaller id. The payload never
  * participates in ordering.
  */
final class TopKBuffer(k: Int) {
  // min-heap ordered so the WORST element is at the head
  private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long, Long)](
    Ordering.by[(Double, Long, Long), (Double, Long)] { case (s, i, _) => (-s, i) })
  // PriorityQueue dequeues the MAX of the ordering; with (-score, id) the
  // max is the lowest score / largest id — i.e. the worst entry.

  private def better(a: (Double, Long, Long), b: (Double, Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def insert(s: Double, i: Long, p: Long = 0L): Unit = {
    val e = (s, i, p)
    if (heap.size < k) heap.enqueue(e)
    else if (better(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
  }

  def foreach(f: (Double, Long, Long) => Unit): Unit =
    heap.foreach(e => f(e._1, e._2, e._3))

  def sortedBestFirst: Array[(Double, Long, Long)] =
    heap.toArray.sortWith(better)
}
