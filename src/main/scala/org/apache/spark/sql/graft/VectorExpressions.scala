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

object VectorFunctions {
  /** Σ aᵢ·bᵢ over two array<double> columns — whole-stage-codegen native. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Σ min(aᵢ, bᵢ) over two array<long> columns — codegen native,
    * allocation-free (the weighted-Jaccard intersection). */
  def minSum(a: Column, b: Column): Column =
    ColumnBridge.column(MinSum(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
