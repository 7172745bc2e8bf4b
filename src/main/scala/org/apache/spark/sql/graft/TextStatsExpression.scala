package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass text-statistics kernel. The text-analysis tier needs token
 * count, distinct-token count, total token length, stopword hits, and
 * per-language marker hits — built-in routes evaluate a separate
 * interpreted higher-order filter (or regex scan) per metric, re-reading
 * the string five-to-eight times with per-token boxing. This expression
 * computes ALL of them in ONE scan of the UTF-8 bytes and stays inside
 * whole-stage codegen (the generated code calls the static kernel, like
 * Spark's own string expressions call StringUtils).
 *
 * Token semantics MATCH `filter(split(line, "\\s+"), _ != "")`:
 * separators are exactly Java regex `\s` = [ \t\n\u000B\f\r]; token
 * length is the Spark `length()` character count. (Marker words are
 * ASCII, so byte-wise comparison against them is exact.)
 */
case class TextStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = TextStats.Schema

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_text_stats"

  override protected def nullSafeEval(s: Any): Any =
    TextStatsKernel.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextStatsKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  /** Field order is part of the contract — see TextStatsKernel.compute. */
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("hits_en", LongType, nullable = false),
    StructField("hits_de", LongType, nullable = false),
    StructField("hits_es", LongType, nullable = false),
    StructField("hits_fr", LongType, nullable = false)))
}

object TextStatsKernel {

  /** Marker lists (must stay in sync with TextAnalysis.LangMarkers). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "los", "y", "es", "en"),
    "fr" -> Seq("le", "la", "les", "et", "en", "est", "un")
  )

  private val langSets: Array[java.util.HashSet[String]] =
    LangMarkers.map { case (_, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray

  private val unionSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    LangMarkers.foreach(_._2.foreach(s.add))
    s
  }

  /** Java regex \s exactly: space, \t, \n, \u000B, \f, \r. */
  private def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(line: UTF8String): InternalRow = {
    val s = line.toString
    val len = s.length
    var nTokens = 0L
    var sumLen = 0L
    var stopHits = 0L
    val hits = new Array[Long](langSets.length)
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < len) {
      while (i < len && isSep(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSep(s.charAt(i))) i += 1
        val tok = s.substring(start, i)
        nTokens += 1
        // length() semantics = character count (code units suffice for
        // BMP text; the marker sets are ASCII either way)
        sumLen += tok.codePointCount(0, tok.length)
        distinct.add(tok)
        if (unionSet.contains(tok)) {
          stopHits += 1
          var l = 0
          while (l < langSets.length) {
            if (langSets(l).contains(tok)) hits(l) += 1
            l += 1
          }
        }
      }
    }
    InternalRow(nTokens, distinct.size.toLong, sumLen, stopHits,
      hits(0), hits(1), hits(2), hits(3))
  }
}

object TextStatsFunctions {
  /** One-pass (n_tokens, n_distinct, sum_tok_len, stop_hits, hits_*) over
    * a string column — whole-stage-codegen compatible. */
  def textStats(line: Column): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(line)))
}
