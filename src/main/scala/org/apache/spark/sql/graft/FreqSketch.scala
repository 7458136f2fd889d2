package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a TypedImperativeAggregate: a
  * bounded map of ≤ `m` counters whose survivors are a guaranteed SUPERSET
  * of every item with true frequency > n/(m+1) (Misra & Gries 1982; the
  * merge rule — sum counters, subtract the (m+1)-th largest, drop
  * non-positives — preserves that bound under arbitrary merge trees,
  * Agarwal et al. PODS'12). The candidate SET depends on partitioning, so
  * the sketch alone is rows-only; the exact-heavy-hitters OPERATOR built
  * on it (q95) is deterministic: a second pass recounts the candidates
  * exactly and applies the threshold, and the guarantee makes that output
  * equal to the full GROUP BY ... HAVING — which is exactly what the
  * DuckDB oracle runs.
  *
  * Why not q30's plain groupBy at 100 TB: a token-frequency groupBy
  * shuffles the full distinct domain (billions of keys for web-scale
  * text). Here the map side emits ≤ m counters per partition for pass 1,
  * and pass 2 shuffles only rows matching the ≤ m candidates — with
  * map-side partial aggregation absorbing their (by construction) huge
  * per-key row counts before the exchange, the classic skew shape this
  * sketch exists to find (the hot-key detector feeding q80's salting).
  */
case class FreqSketch(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with ExpectsInputTypes {

  require(m > 0, s"capacity m must be positive, got $m")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren.head)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < m => buf.update(key, 1L)
        case None =>
          // classic MG step: a full map and an unseen item decrement ALL
          // counters by 1 (the new item's 1 cancels against the shared
          // decrement). O(m) when it fires, amortized O(1): each firing
          // consumes m prior increments.
          buf.filterInPlace { case (_, c) => c > 1 }
          buf.mapValuesInPlace { case (_, c) => c - 1 }
      }
    }
    buf
  }

  /** Bound a merged map back to ≤ m entries: subtract the (m+1)-th
    * largest counter from every counter and drop non-positives. */
  private def prune(buf: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    if (buf.size > m) {
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(m)
      buf.filterInPlace { case (_, c) => c > cut }
      buf.mapValuesInPlace { case (_, c) => c - cut }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    prune(buf)
  }

  /** Candidate items, sorted — a canonical order for the surviving set
    * (estimated counts stay internal: they undercount by up to n/(m+1)
    * and callers must recount exactly, per the operator contract). */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
}

object FreqSketch {
  /** `freq_sketch(col, m)` as a Column for DataFrame `.agg(...)`. */
  def of(c: Column, m: Int): Column =
    ExpressionUtils.column(
      FreqSketch(ExpressionUtils.expression(c), m).toAggregateExpression())
}
