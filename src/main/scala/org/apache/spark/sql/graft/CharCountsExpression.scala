package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass per-character occurrence counts over a fixed alphabet —
 * the kernel behind `TextAnalysis.charEntropy` (q116).
 *
 * The built-in route computes each character's count as
 * `length(text) − length(replace(text, c, ''))`: |alphabet| full
 * string scans AND |alphabet| string materializations per row —
 * O(|alphabet|·len) work where one read of the text suffices. This
 * expression walks the chars ONCE, bumping a counter per alphabet
 * position through a precomputed char→index table, and returns the
 * counts as `array<bigint>` in alphabet order, so the caller's
 * fixed-order float-sum contract (the q116 entropy chain) is built
 * from `getItem(i)` projections over one array instead of 27 scans.
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

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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

  def compute(line: UTF8String, lookup: Array[Int], n: Int): GenericArrayData = {
    val counts = new Array[Long](n)
    val s = line.toString
    var i = 0
    while (i < s.length) {
      val idx = lookup(s.charAt(i).toInt)
      if (idx >= 0) counts(idx) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }
}

object CharCountsFunctions {
  /** Occurrence count of each `alphabet` character (alphabet order) in
    * one pass over a string column — whole-stage-codegen compatible. */
  def charCounts(line: Column, alphabet: String): Column =
    ColumnBridge.column(CharCounts(ColumnBridge.expression(line), alphabet))
}
