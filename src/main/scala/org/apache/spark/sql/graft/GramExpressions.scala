package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DecimalType, Decimal, LongType, StructField, StructType}

/**
 * Exact Gram / co-moment aggregate over micro-quantized embedding
 * components — the kernel behind `Similarity.covarianceMatrix` (q188)
 * and the PCA family (q196/q199/q208).
 *
 * The built-in route fanned each vector out to d(d+1)/2 ROWS
 * (posexplode × slice-posexplode — 2,080 rows per vector at d = 64)
 * before partial aggregation collapsed them: exchange volume was fine
 * (d²·partitions) but every vector paid a ~2,000× arithmetic-row
 * constant through the whole-stage-codegen row machinery. This
 * aggregate walks each vector ONCE, accumulating the upper-triangle
 * products into a flat per-partition Long array — the d(d+1)/2 cells
 * are touched with two array reads and one multiply-add each, no row
 * overhead — so per-vector cost drops to the arithmetic lower bound.
 *
 * Exactness: the hot loop accumulates in Long and spills to BigInt
 * before any addition could overflow. The buffer tracks `headroom` —
 * the remaining additive budget, decremented by max(rowMax², 1) per
 * row (an upper bound on every cell's |increment|) — and flushes the
 * Long lanes into the BigInt lanes when a row might not fit. A row
 * whose own components exceed √Long.MaxValue (impossible for the
 * micro-quantized unit-scale embeddings, but the kernel doesn't trust
 * that) bypasses the Long lane entirely and multiplies in BigInt.
 * Partial buffers serialize flushed (BigInt lanes only), so merged
 * totals are exact at ANY corpus size — the old DECIMAL(38,0) sums
 * hold integers < 10³⁸; BigInt holds anything.
 *
 * Output: one ARRAY row of d(d+1)/2 structs
 * (i, j, n_vecs, _sx, _sy, _sxy, _com) with the sums and the exact
 * co-moment n·Σxy − Σx·Σy as DECIMAL(38,0) — the same columns the
 * posexplode plan produced, built driver-free in the final aggregate.
 *
 * Scale shape: one corpus scan; partial aggregation reduces each
 * partition to ONE buffer of d(d+1)/2 BigInts; the exchange carries
 * `partitions` buffers (d²-bounded each), the final merge adds them.
 * Rectangularity is enforced loudly (ragged input was previously a
 * silent per-group n_vecs skew).
 */
final class GramBuffer extends Serializable {
  var d: Int = -1
  var n: Long = 0L
  // Hot Long lanes (partition-local, never serialized) + exact BigInt
  // spill lanes. sx is indexed by dim; sxy by the (i ≤ j) triangle in
  // row-major order: k = i·d − i(i−1)/2 + (j − i).
  @transient var sxL: Array[Long] = _
  @transient var sxyL: Array[Long] = _
  var sxB: Array[BigInt] = _
  var sxyB: Array[BigInt] = _
  @transient var headroom: Long = 0L
}

object GramKernel {

  /** floor(√Long.MaxValue): a product of two values ≤ this fits Long. */
  private val SafeMax = 3037000499L

  private def init(b: GramBuffer, d: Int): Unit = {
    require(d > 0, "gram kernel: empty embedding")
    b.d = d
    b.sxL = new Array[Long](d)
    b.sxyL = new Array[Long](d * (d + 1) / 2)
    b.sxB = Array.fill(d)(BigInt(0))
    b.sxyB = Array.fill(d * (d + 1) / 2)(BigInt(0))
    b.headroom = Long.MaxValue
  }

  /** Move the Long lanes into the BigInt lanes and reset the budget. */
  private def flush(b: GramBuffer): Unit = if (b.d >= 0 && b.sxL != null) {
    var i = 0
    while (i < b.d) {
      if (b.sxL(i) != 0L) { b.sxB(i) += b.sxL(i); b.sxL(i) = 0L }
      i += 1
    }
    var k = 0
    while (k < b.sxyL.length) {
      if (b.sxyL(k) != 0L) { b.sxyB(k) += b.sxyL(k); b.sxyL(k) = 0L }
      k += 1
    }
    b.headroom = Long.MaxValue
  }

  def update(b: GramBuffer, xq: Array[Long]): Unit = {
    if (b.d < 0) init(b, xq.length)
    require(xq.length == b.d,
      s"gram kernel requires rectangular embeddings: saw dims ${b.d} and ${xq.length}")
    b.n += 1L
    var rowMax = 0L
    var i = 0
    while (i < b.d) {
      val a = math.abs(xq(i))
      if (a > rowMax) rowMax = a
      i += 1
    }
    if (rowMax > SafeMax) {
      // xi·xj could overflow Long — take this row exactly in BigInt.
      var k = 0
      i = 0
      while (i < b.d) {
        val xi = BigInt(xq(i))
        b.sxB(i) += xi
        var j = i
        while (j < b.d) { b.sxyB(k) += xi * BigInt(xq(j)); k += 1; j += 1 }
        i += 1
      }
    } else {
      val rowBound = math.max(rowMax * rowMax, 1L)
      if (b.headroom < rowBound) flush(b)
      b.headroom -= rowBound
      var k = 0
      i = 0
      while (i < b.d) {
        val xi = xq(i)
        b.sxL(i) += xi
        var j = i
        while (j < b.d) { b.sxyL(k) += xi * xq(j); k += 1; j += 1 }
        i += 1
      }
    }
  }

  def merge(a: GramBuffer, b: GramBuffer): GramBuffer = {
    if (b.d < 0) return a
    if (a.d < 0) return b
    require(a.d == b.d,
      s"gram kernel requires rectangular embeddings: saw dims ${a.d} and ${b.d}")
    flush(a); flush(b)
    a.n += b.n
    var i = 0
    while (i < a.d) { a.sxB(i) += b.sxB(i); i += 1 }
    var k = 0
    while (k < a.sxyB.length) { a.sxyB(k) += b.sxyB(k); k += 1 }
    a
  }

  def result(b: GramBuffer): GenericArrayData = {
    if (b.d < 0) return new GenericArrayData(Array.empty[Any])
    flush(b)
    val n = BigInt(b.n)
    val out = new Array[Any](b.d * (b.d + 1) / 2)
    var k = 0
    var i = 0
    while (i < b.d) {
      var j = i
      while (j < b.d) {
        val sx = b.sxB(i)
        val sy = b.sxB(j)
        val sxy = b.sxyB(k)
        val com = n * sxy - sx * sy
        out(k) = new GenericInternalRow(Array[Any](
          i.toLong, j.toLong, b.n, dec(sx), dec(sy), dec(sxy), dec(com)))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  private def dec(v: BigInt): Decimal = Decimal(scala.math.BigDecimal(v), 38, 0)

  def serialize(b: GramBuffer): Array[Byte] = {
    flush(b)
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeInt(b.d)
    oos.writeLong(b.n)
    oos.writeObject(b.sxB)
    oos.writeObject(b.sxyB)
    oos.close()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): GramBuffer = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val b = new GramBuffer
    b.d = ois.readInt()
    b.n = ois.readLong()
    b.sxB = ois.readObject().asInstanceOf[Array[BigInt]]
    b.sxyB = ois.readObject().asInstanceOf[Array[BigInt]]
    ois.close()
    if (b.d >= 0) {
      b.sxL = new Array[Long](b.d)
      b.sxyL = new Array[Long](b.d * (b.d + 1) / 2)
      b.headroom = Long.MaxValue
    }
    b
  }
}

case class GramMoments(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = GramMoments.Schema

  override def nullable: Boolean = false

  override def prettyName: String = "graft_gram_moments"

  override def createAggregationBuffer(): GramBuffer = new GramBuffer

  override def update(b: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val ad = v.asInstanceOf[ArrayData]
      val m = ad.numElements()
      val xq = new Array[Long](m)
      var i = 0
      while (i < m) {
        require(!ad.isNullAt(i), "gram kernel: null embedding component")
        xq(i) = ad.getLong(i)
        i += 1
      }
      GramKernel.update(b, xq)
    }
    b
  }

  override def merge(b: GramBuffer, o: GramBuffer): GramBuffer =
    GramKernel.merge(b, o)

  override def eval(b: GramBuffer): Any = GramKernel.result(b)

  override def serialize(b: GramBuffer): Array[Byte] = GramKernel.serialize(b)

  override def deserialize(bytes: Array[Byte]): GramBuffer =
    GramKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): GramMoments =
    copy(mutableAggBufferOffset = n)

  override def withNewInputAggBufferOffset(n: Int): GramMoments =
    copy(inputAggBufferOffset = n)

  override protected def withNewChildInternal(newChild: Expression): GramMoments =
    copy(child = newChild)
}

object GramMoments {
  /** Field order is part of the contract — see GramKernel.result. */
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("n_vecs", LongType, nullable = false),
    StructField("_sx", DecimalType(38, 0), nullable = false),
    StructField("_sy", DecimalType(38, 0), nullable = false),
    StructField("_sxy", DecimalType(38, 0), nullable = false),
    StructField("_com", DecimalType(38, 0), nullable = false))),
    containsNull = false)
}

object GramFunctions {
  /** Aggregate an array<long> (micro-quantized components) column into
    * the exact upper-triangle co-moment rows — one array result of
    * d(d+1)/2 (i, j, n_vecs, _sx, _sy, _sxy, _com) structs. */
  def gramMoments(xq: Column): Column =
    ColumnBridge.column(
      GramMoments(ColumnBridge.expression(xq)).toAggregateExpression())
}
