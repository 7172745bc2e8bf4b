package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/**
 * Codegen-native vector kernel. The similarity tier's hot loop is a dot
 * product over `array<double>` pairs; the built-in route
 * (`aggregate(zip_with(...))`) runs interpreted lambda functions with
 * per-element boxing, which dominates wall-clock on O(n²) pair scoring.
 * This expression stays inside whole-stage codegen: a primitive fused
 * multiply-add loop over the two `ArrayData` buffers, no allocation.
 *
 * Lives in the sql package space because `AbstractDataType` (the
 * `inputTypes` contract) is `private[sql]`.
 *
 * Null elements inside the arrays are not expected (embedding columns are
 * dense); a null element reads as 0.0, matching the engines' cast
 * behavior on the test tables.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/**
 * Σ min(aᵢ, bᵢ) over two `array<long>` columns — the weighted-Jaccard
 * intersection kernel over dense tf vectors. Same rationale as
 * [[DotProduct]], sharpened by where it runs: the all-pairs tier's
 * threshold filter is pushed INTO the nested-loop join condition,
 * where codegen does no subexpression elimination — the kernel
 * evaluates up to 3× per candidate pair, so per-evaluation cost is
 * everything. The built-in `aggregate(zip_with(...))` route allocates
 * an intermediate array per evaluation (measured: q146 at 56 s on
 * sf0.1); this is an allocation-free primitive loop.
 */
case class MinSum(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_min_sum"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.min(x.getLong(i), y.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Math.min($a.getLong($i), $b.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinSum =
    copy(left = newLeft, right = newRight)
}

/**
 * Σ aᵢ·bᵢ over two `array<long>` columns — the integer-exact dot the
 * hashed-cosine tier's dense route runs per candidate pair (same
 * rationale as [[MinSum]]: an allocation-free primitive loop where the
 * built-in higher-order route boxes per element). Long arithmetic keeps
 * the sparse route's exact-integer `_dot` contract.
 */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

/**
 * The deterministic random-hyperplane sign matrix shared by every LSH /
 * binary-signature path: r_h[j] ∈ {−1, +1} from hex digit (j mod 16) of
 * md5("h:j") — byte-for-byte the rule `Similarity.signRow` established
 * (and the oracle SQL mirrors), computed ONCE per JVM and cached.
 *
 * Why it lives here: the previous plan shape shipped each hyperplane as
 * a 1024-double `typedLit` — 48 bits × 1024 doubles ≈ 400 KB of literal
 * arrays PER lshBucketCol call site, paid on every optimizer pass
 * (canonicalization hashes the full array), every task-binary broadcast
 * ("Broadcasting large task binary with size 3.0 MiB"), and every
 * codegen compile. [[SignBits]] replaces the whole per-bit
 * when/dot/add chain with ONE expression holding two ints; the matrix
 * rides as JVM state, not plan state.
 */
object SignMatrix {
  val MaxDim = 1024
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()

  /** Hyperplane `h`'s sign row (length [[MaxDim]]). */
  def row(h: Int): Array[Double] =
    cache.computeIfAbsent(h, { hh =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Double](MaxDim)
      var j = 0
      while (j < MaxDim) {
        val hex = md.digest(s"$hh:$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        out(j) = if (hex.charAt(j % 16) >= '8') 1.0 else -1.0
        j += 1
      }
      out
    })

  /** Packed sign bits: bit h (relative) is 1 iff
    * Σᵢ emb[i]·row(offset+h)[i] > 0 — the identical fused-multiply-add
    * order, min-length bound and strict `> 0` comparison as the
    * previous `when(dotProduct(emb, typedLit(signRow(h))) > 0, 1L<<h)`
    * chain, so the packed long is bit-identical by construction. */
  def packBits(emb: ArrayData, offset: Int, bits: Int): Long = {
    var acc = 0L
    var h = 0
    while (h < bits) {
      val r = row(offset + h)
      val n = math.min(emb.numElements(), r.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += emb.getDouble(i) * r(i)
        i += 1
      }
      if (s > 0) acc += (1L << h)
      h += 1
    }
    acc
  }
}

/**
 * `bits` random-hyperplane sign bits of an `array<double>` embedding,
 * packed into one long — the plan-light form of the per-bit
 * `when(dot > 0, 1<<h)` chain (see [[SignMatrix]] for why). `offset`
 * selects the hyperplane family (table t of the multi-table LSH tier
 * starts at t·bits). Codegen is a single static call; the expression
 * carries two int literals instead of bits × MaxDim doubles.
 */
case class SignBits(child: Expression, offset: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = s"graft_sign_bits_${offset}_$bits"

  override protected def nullSafeEval(a: Any): Any =
    SignMatrix.packBits(a.asInstanceOf[ArrayData], offset, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.SignMatrix.packBits($a, $offset, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}

object VectorFunctions {
  /** Σ aᵢ·bᵢ over two array<double> columns — whole-stage-codegen native. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Σ min(aᵢ, bᵢ) over two array<long> columns — codegen native,
    * allocation-free (the weighted-Jaccard intersection). */
  def minSum(a: Column, b: Column): Column =
    ColumnBridge.column(MinSum(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Σ aᵢ·bᵢ over two array<long> columns — codegen native, integer
    * exact (the hashed-cosine dense-route dot). */
  def longDot(a: Column, b: Column): Column =
    ColumnBridge.column(LongDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Packed random-hyperplane sign bits (bit h = sign of the dot with
    * hyperplane offset+h) — bit-identical to the literal-array chain it
    * replaces, with the sign matrix as JVM state instead of plan state. */
  def signBits(emb: Column, offset: Int, bits: Int): Column =
    ColumnBridge.column(SignBits(ColumnBridge.expression(emb), offset, bits))
}
