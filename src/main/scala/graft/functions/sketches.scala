package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a mergeable
  * `TypedImperativeAggregate` — the bounded-memory way to find frequent
  * items at 100 TB: each task keeps at most `k` counters regardless of
  * cardinality, partial sketches merge associatively, and any item with
  * true frequency > n/(k+1) is GUARANTEED to survive (Misra & Gries 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS'12).
  * Estimates undercount by at most n/(k+1), so the scalable exact
  * pipeline is: sketch → candidate set → semi-join → exact recount
  * (see [[graft.operators.TextAnalysis.heavyHitters]]).
  *
  * A plain `groupBy(token).count()` shuffles the full vocabulary; the
  * sketch shuffles ≤ k rows per task, independent of data size.
  */
/** Misra–Gries buffer: bounded counter map plus the TOTAL ingested count
  * `n` (merges by addition). `n` is what makes the sketch's guarantee
  * checkable downstream: the candidate set is a superset of the items
  * with true count ≥ m only while m > n/(k+1).
  */
final class MGBuffer(
    val counters: mutable.HashMap[UTF8String, Long],
    var n: Long)

case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("candidates", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("min_count", LongType, nullable = false))),
      containsNull = false), nullable = false)))
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MGBuffer =
    new MGBuffer(new mutable.HashMap[UTF8String, Long](), 0L)

  /** Classic MG step: increment if tracked, insert if room, otherwise
    * decrement every counter (dropping zeros) — the "pay one from each"
    * amortization that bounds memory at k counters.
    */
  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      val cnt = buf.counters
      val item = v.asInstanceOf[UTF8String]
      cnt.get(item) match {
        case Some(c) => cnt.update(item, c + 1)
        case None if cnt.size < k => cnt.update(item.clone(), 1L)
        case None =>
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          cnt.mapValuesInPlace((_, c) => c - 1)
          cnt.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(cnt.remove)
      }
    }
    buf
  }

  /** Mergeable-summaries rule: add counters pointwise, then if more than
    * k survive, subtract the (k+1)-th largest count from every counter
    * and drop the non-positive ones — the merged sketch keeps the same
    * error bound as if it had seen the whole stream.
    */
  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    buf.n += other.n
    val cnt = buf.counters
    other.counters.foreach { case (item, c) =>
      cnt.update(item, cnt.getOrElse(item, 0L) + c)
    }
    if (cnt.size > k) {
      val counts = cnt.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      cnt.mapValuesInPlace((_, c) => c - cut)
      cnt.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(cnt.remove)
    }
    buf
  }

  /** Deterministic output: `(n, candidates)` with candidates sorted by
    * estimate desc, item asc. */
  override def eval(buf: MGBuffer): Any = {
    val rows = buf.counters.toArray
      .sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) => InternalRow(item, c) }
    InternalRow(buf.n, new GenericArrayData(rows.asInstanceOf[Array[Any]]))
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counters.size)
    buf.counters.foreach { case (item, c) =>
      val bytes = item.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val total = in.readLong()
    val n = in.readInt()
    val cnt = new mutable.HashMap[UTF8String, Long]()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      cnt.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    new MGBuffer(cnt, total)
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object sketches {
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** Aggregate column: Misra–Gries sketch of a string column, returning
    * `struct<n: bigint, candidates: array<struct<item, min_count>>>` —
    * `n` is the total ingested count, candidates contain every item with
    * true count > n/(k+1). */
  def misra_gries(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(item), k)
        .toAggregateExpression())
}
