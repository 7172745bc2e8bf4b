package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SQL registration for graft's custom Catalyst expressions, so the
 * engine's kernels are first-class in `spark.sql(...)` too:
 *
 *   - `graft_dot(array<double>, array<double>) -> double`
 *   - `graft_min_sum(array<bigint>, array<bigint>) -> bigint`
 *   - `graft_word_shingles(array<string>, n)` (table-generating)
 *
 * Use either as a session extension —
 *   `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
 * — or imperatively: `GraftExtensions.register(spark)`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {

  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def intArg(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(
        s"$fn expects a literal int, got: $other")
  }

  private val descriptors: Seq[Descriptor] = Seq(
    (
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      { args =>
        require(args.length == 2, s"graft_dot takes 2 arguments, got ${args.length}")
        DotProduct(args.head, args(1))
      }
    ),
    (
      FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
      { args =>
        require(args.length == 2,
          s"graft_word_shingles takes 2 arguments, got ${args.length}")
        WordShingles(args.head, intArg(args(1), "graft_word_shingles"))
      }
    ),
    (
      FunctionIdentifier("graft_text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "graft_text_stats"),
      { args =>
        require(args.length == 1,
          s"graft_text_stats takes 1 argument, got ${args.length}")
        TextStats(args.head)
      }
    ),
    (
      FunctionIdentifier("graft_min_sum"),
      new ExpressionInfo(classOf[MinSum].getName, "graft_min_sum"),
      { args =>
        require(args.length == 2,
          s"graft_min_sum takes 2 arguments, got ${args.length}")
        MinSum(args.head, args(1))
      }
    ),
    (
      FunctionIdentifier("graft_gram_moments"),
      new ExpressionInfo(classOf[GramMoments].getName, "graft_gram_moments"),
      { args =>
        require(args.length == 1,
          s"graft_gram_moments takes 1 argument, got ${args.length}")
        GramMoments(args.head).toAggregateExpression()
      }
    )
  )

  /** Imperative registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    descriptors.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
