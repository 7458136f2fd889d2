package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Deterministic exact-n per-group sample as a TypedImperativeAggregate:
  * keeps the `k` ids whose sha256(decimal string) rank lowest — a pure
  * function of the id SET, so the result is independent of partitioning,
  * merge order, and engine (DuckDB replays it as a row_number window over
  * `sha256(CAST(id AS VARCHAR))`).
  *
  * This is the aggregate-function form of the TopKPerKey physical
  * operator's contract, demonstrating the remaining Catalyst extension
  * mechanism (custom aggregate with partial aggregation): the bounded
  * buffer holds ≤ k entries PER GROUP PER PARTITION map-side, so the
  * shuffle carries k·groups rows instead of the full table — unlike the
  * window/sort formulation, which shuffles and sorts everything. Because
  * it is a real AggregateFunction it composes anywhere an aggregate can
  * appear (groupBy, cube, rollup, AQE re-plans), where the custom
  * physical operator needs its own planner strategy.
  *
  * A classic seeded reservoir sample is merge-order dependent and thus
  * unreproducible under distributed execution; ranking by a hash of the
  * id is the standard determinism fix (same move as q48/q52's hash
  * sampling, lifted into an aggregate).
  */
case class HashReservoir(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Long)]]
  with ExpectsInputTypes {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HashReservoir =
    copy(child = newChildren.head)

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hash_reservoir"

  private def hashOf(id: Long): String = {
    val d = MessageDigest.getInstance("SHA-256")
    d.digest(id.toString.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  // max-first ordering: the queue head is the WORST (largest) kept entry,
  // so a bounded insert is one head comparison
  private val ord: Ordering[(String, Long)] = Ordering.Tuple2[String, Long]

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Long)] =
    mutable.PriorityQueue.empty[(String, Long)](ord)

  private def insert(buf: mutable.PriorityQueue[(String, Long)],
      e: (String, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (ord.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(String, Long)],
      input: InternalRow): mutable.PriorityQueue[(String, Long)] = {
    val v = child.eval(input)
    if (v != null) insert(buf, (hashOf(v.asInstanceOf[Long]), v.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(String, Long)],
      other: mutable.PriorityQueue[(String, Long)]): mutable.PriorityQueue[(String, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  /** Selected ids, ascending — a canonical order for the SET the hash
    * rank picked (callers explode this; the hash itself never surfaces). */
  override def eval(buf: mutable.PriorityQueue[(String, Long)]): Any =
    new GenericArrayData(buf.toArray.map(_._2).sorted)

  override def serialize(buf: mutable.PriorityQueue[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, id) => out.writeUTF(h); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readUTF(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HashReservoir =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HashReservoir =
    copy(inputAggBufferOffset = newOffset)
}

object HashReservoir {
  /** `hash_reservoir(idCol, k)` as a Column for DataFrame `.agg(...)`. */
  def of(idCol: Column, k: Int): Column =
    ExpressionUtils.column(
      HashReservoir(ExpressionUtils.expression(idCol), k).toAggregateExpression())

  /** ArrayData helper for tests. */
  def ids(a: ArrayData): Seq[Long] = a.toLongArray().toSeq
}
