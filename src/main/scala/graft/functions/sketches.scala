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

/** Vector-sum buffer: per-dimension double sums plus the row count.
  * `sums` is null until the first non-null input fixes the dimension.
  */
final class VecSumBuffer(var sums: Array[Double], var n: Long)

/** Elementwise mean of a `array<float>` column as ONE mergeable
  * aggregate expression — the scale shape for k-means centroid
  * recomputation at real embedding dims. The per-dimension
  * `avg(element_at(e, i))` fan-out plans `dim` independent aggregate
  * expressions (each re-walking the array); this kernel is a single
  * buffer of `dim` doubles per task, merged pointwise, so the plan has
  * one aggregate regardless of dimension and the shuffle carries
  * nlist·dim doubles per task either way.
  *
  * Contract: dense vectors — all non-null inputs must share one length
  * (mixed lengths throw); null ELEMENTS contribute 0 to their dimension
  * but the row still counts (embeddings are dense by contract, this
  * only pins behavior). Null ROWS are skipped like every Spark
  * aggregate. Arithmetic is double sums / row count cast to float —
  * the same as `avg(element_at).cast("float")` on dense input.
  */
case class FloatVecMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "fvec_mean"

  // the buffer reads 4-byte float slots; an array<double> input would
  // not error on UnsafeArrayData, it would yield plausible garbage —
  // reject anything but array<float> at analysis time
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fvec_mean requires array<float>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): VecSumBuffer =
    new VecSumBuffer(null, 0L)

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (buf.sums == null) buf.sums = new Array[Double](arr.numElements())
      else require(buf.sums.length == arr.numElements(),
        s"fvec_mean: mixed vector lengths " +
          s"(${buf.sums.length} vs ${arr.numElements()})")
      var i = 0
      while (i < buf.sums.length) {
        if (!arr.isNullAt(i)) buf.sums(i) += arr.getFloat(i).toDouble
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    if (other.sums != null) {
      if (buf.sums == null) {
        buf.sums = other.sums.clone()
      } else {
        require(buf.sums.length == other.sums.length,
          s"fvec_mean: mixed vector lengths " +
            s"(${buf.sums.length} vs ${other.sums.length})")
        var i = 0
        while (i < buf.sums.length) {
          buf.sums(i) += other.sums(i)
          i += 1
        }
      }
    }
    buf.n += other.n
    buf
  }

  override def eval(buf: VecSumBuffer): Any =
    if (buf.n == 0L || buf.sums == null) null
    else new GenericArrayData(buf.sums.map(s => (s / buf.n).toFloat))

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    if (buf.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buf.sums.length)
      buf.sums.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val len = in.readInt()
    val sums =
      if (len < 0) null
      else Array.fill(len)(in.readDouble())
    new VecSumBuffer(sums, n)
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): FloatVecMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): FloatVecMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FloatVecMeanAgg =
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

  /** Aggregate column: elementwise mean of an `array<float>` vector
    * column as one mergeable aggregate (see [[FloatVecMeanAgg]]). */
  def fvec_mean(vec: Column): Column =
    ColumnBridge.column(
      FloatVecMeanAgg(ColumnBridge.expression(vec))
        .toAggregateExpression())
}
