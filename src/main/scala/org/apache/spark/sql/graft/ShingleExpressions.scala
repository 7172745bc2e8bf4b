package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Table-generating expression: distinct word n-gram shingles from a token
 * array. Replaces the interpreted higher-order chain
 * `array_distinct(transform(sequence(...), i => array_join(slice(toks, i, n))))`
 * — which allocates three intermediate arrays per input row and runs
 * lambda interpretation per element — with one pass and one fresh
 * `UTF8String` per emitted shingle (`concatWs` copies bytes, so outputs
 * never alias the input row buffer).
 *
 * Dedup tier hot path: shingling feeds MinHash, LSH, and n-gram Jaccard
 * (SURVEY.md §7.4); on the bench corpus the HOF chain was the single
 * largest cost of the dedup queries.
 */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"WordShingles expects array<string>, got ${other.catalogString}")
  }

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val m = arr.numElements()
    if (m < n) return Nil
    val sep = UTF8String.fromString(" ")
    val out = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        window(j) = arr.getUTF8String(i + j)
        j += 1
      }
      out.add(UTF8String.concatWs(sep, window: _*))
      i += 1
    }
    val it = out.iterator()
    new Iterator[InternalRow] {
      override def hasNext: Boolean = it.hasNext
      override def next(): InternalRow = InternalRow(it.next())
    }
  }

  override def prettyName: String = "graft_word_shingles"

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object ShingleFunctions {
  /** Distinct word n-gram shingles of a token-array column (generator). */
  def wordShingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), n))
}
