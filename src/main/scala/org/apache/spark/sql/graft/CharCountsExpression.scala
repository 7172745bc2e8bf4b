package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass per-character statistics over a fixed alphabet — the
 * kernel behind `TextAnalysis.charEntropy` (q116).
 *
 * The built-in route computes each character's count as
 * `length(text) − length(replace(text, c, ''))`: |alphabet| full
 * string scans AND |alphabet| string materializations per row —
 * O(|alphabet|·len) work where one read of the text suffices. This
 * expression walks the chars ONCE, bumping a counter per alphabet
 * position through a precomputed char→index table, and returns a
 * struct of (counts array in alphabet order, their sum, the distinct
 * count), so the caller's fixed-order float-sum contract (the q116
 * entropy chain) is built from `getField`/`getItem` projections over
 * one value.
 *
 * Why a STRUCT and not a bare array: the row filter (`n_counted > 0`)
 * gets predicate-pushed below the projection with the expression
 * substituted in, and `FilterExec` — unlike `ProjectExec` — performs
 * no subexpression elimination, so a filter over a SUM of 27
 * `getItem`s would invoke the kernel 27 times per scanned row. With
 * the sum precomputed as a struct field, the pushed filter costs ONE
 * kernel call and the projection (CSE-deduplicated) one more —
 * TextAnalysisSpec pins this call-site count in the generated code.
 *
 * Codegen: the lookup table ships as a codegen reference object and
 * the generated code calls the static kernel — same shipping contract
 * as [[CmsEstimateLong]]; stays inside whole-stage codegen.
 *
 * Semantics: counts are per UTF-16 code unit, exact for any BMP
 * alphabet (surrogate halves can never equal a BMP alphabet char), and
 * identical to the replace-based route for the ASCII alphabets the
 * entropy tier uses.
 */
case class CharCounts(child: Expression, alphabet: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(alphabet.nonEmpty && alphabet.distinct == alphabet,
    "alphabet must be non-empty with distinct characters")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = CharCounts.Schema

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_char_counts"

  @transient private lazy val lookup: Array[Int] =
    CharCountsKernel.lookupFor(alphabet)

  override protected def nullSafeEval(s: Any): Any =
    CharCountsKernel.compute(s.asInstanceOf[UTF8String], lookup, alphabet.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCharLookup", lookup, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CharCountsKernel.compute($c, $ref, ${alphabet.length})")
  }

  override protected def withNewChildInternal(newChild: Expression): CharCounts =
    copy(child = newChild)
}

object CharCounts {
  /** Field order is part of the contract — see CharCountsKernel.compute. */
  val Schema: StructType = StructType(Seq(
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("n_counted", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
}

object CharCountsKernel {

  /** char → alphabet index table (65536 ints, −1 = not in alphabet). */
  def lookupFor(alphabet: String): Array[Int] = {
    val t = Array.fill(Char.MaxValue.toInt + 1)(-1)
    var i = 0
    while (i < alphabet.length) {
      t(alphabet.charAt(i).toInt) = i
      i += 1
    }
    t
  }

  def compute(line: UTF8String, lookup: Array[Int], n: Int): InternalRow = {
    val counts = new Array[Long](n)
    val s = line.toString
    var i = 0
    while (i < s.length) {
      val idx = lookup(s.charAt(i).toInt)
      if (idx >= 0) counts(idx) += 1L
      i += 1
    }
    var total = 0L
    var distinct = 0L
    var j = 0
    while (j < n) {
      total += counts(j)
      if (counts(j) > 0) distinct += 1L
      j += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(counts), total, distinct))
  }
}

object CharCountsFunctions {
  /** One-pass per-`alphabet`-character stats over a string column —
    * struct(counts array in alphabet order, n_counted, n_distinct);
    * whole-stage-codegen compatible. */
  def charCounts(line: Column, alphabet: String): Column =
    ColumnBridge.column(CharCounts(ColumnBridge.expression(line), alphabet))
}
