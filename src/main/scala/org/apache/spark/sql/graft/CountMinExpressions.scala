package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/**
 * Codegen-native count-min-sketch frequency probe over a long-hash
 * column — the counting sibling of [[BloomMightContainLong]].
 *
 * The hot-key screen (`HotKeys.hotKeysSketched`) filters rows whose
 * key's ESTIMATED count clears the heavy-hitter threshold before any
 * shuffle happens: the sketch only ever over-counts (every increment
 * lands in all depth rows; collisions add, never subtract), so the
 * screened set is a superset of the true heavy keys and the exact
 * confirm aggregation downstream restores the exact answer. What the
 * screen buys at 100 TB is shuffle volume: the groupBy sees only rows
 * of candidate keys — a sliver when heavy keys are rare — while the
 * sketch itself is fixed-size (depth × width counters) regardless of
 * key cardinality, unlike an exact count which shuffles every key.
 *
 * Same shipping contract as the Bloom probe: serialized sketch bytes in
 * the case-class field ride the expression tree to executors, the lazy
 * `sketch` deserializes once, and generated code probes through a
 * codegen reference object inside whole-stage codegen.
 */
case class CmsEstimateLong(child: Expression, cmsBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_cms_estimate"

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(cmsBytes)

  override protected def nullSafeEval(v: Any): Any =
    sketch.estimateCount(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCms", sketch,
      classOf[CountMinSketch].getName)
    // Boxing is explicit (Long.valueOf) so Janino needs no autoboxing;
    // estimateCount dispatches boxed longs to its long-hash path — the
    // same family addLong used at build time.
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.estimateCount(java.lang.Long.valueOf($v));")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimateLong =
    copy(child = newChild)
}

object CmsFunctions {
  /** Estimated occurrence count of a bigint column's value under a
    * serialized `org.apache.spark.util.sketch.CountMinSketch` — always
    * ≥ the true count of the hashes inserted. */
  def estimateLong(hash: Column, cmsBytes: Array[Byte]): Column =
    ColumnBridge.column(
      CmsEstimateLong(ColumnBridge.expression(hash), cmsBytes))
}
