package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Codegen-native Bloom-filter membership probe over a long-hash column.
 *
 * The incremental-dedup accelerator (`Dedup.exactDedupAgainstBloom`)
 * screens a small delta against a corpus-scale history: rows the filter
 * rules out ("definitely never seen") skip the history anti-join
 * entirely, so only the maybe-seen fraction shuffles against 100 TB of
 * fingerprints. A Bloom filter has NO false negatives, which is what
 * makes the screen sound — a false POSITIVE merely sends a genuinely
 * new row through the exact confirm join, which then keeps it.
 *
 * The sketch is carried as the serialized filter bytes (the case-class
 * field, so the expression tree ships it to executors) and
 * deserialized once per task via the lazy `filter`; generated code
 * probes through a codegen reference object — one `mightContainLong`
 * call per row, no allocation, inside whole-stage codegen.
 */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def dataType: DataType = BooleanType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The reference object is the DESERIALIZED filter: it rides the
    // codegen references array to executors, so generated code probes
    // it directly without per-task readFrom.
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomFunctions {
  /** Membership probe of a bigint column against a serialized
    * `org.apache.spark.util.sketch.BloomFilter` — true = maybe seen,
    * false = definitely never inserted. */
  def mightContainLong(hash: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(hash), bloomBytes))
}
