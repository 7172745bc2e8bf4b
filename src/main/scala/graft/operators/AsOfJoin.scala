package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scalable as-of join (an operator Spark lacks natively): for each left
 * row, attach the value of the LATEST right row with right.ts ≤ left.ts
 * for the same key — the "join events to the most recent prior feature
 * snapshot" primitive of a training-data pipeline.
 *
 * Implementation is the union + running last-non-null window idiom, not
 * a range join and not `mapPartitions`: tag both sides, union, and take
 * `last(value, ignoreNulls)` over (key, ts) with right rows ordered
 * BEFORE left rows at equal ts (so ≤ holds). Cost at any scale is ONE
 * shuffle on the key and a streaming window pass — no per-key state
 * collection, no O(|L|·|R|) candidate pairs (a naive theta-join), and
 * Tungsten spills the sort, so a hot key degrades to disk, not OOM.
 *
 * Contract: `right` must be unique per (keys, tsCol) — dedupe upstream
 * (e.g. the snapshot aggregate already is).
 */
object AsOfJoin {

  /**
   * @param left    any shape carrying `keys` + `tsCol`
   * @param right   (keys, tsCol, valCol) — unique per (keys, tsCol)
   * @param as      output column name for the as-of value (null when no
   *                right row matches on the chosen side)
   * @param forward false (default): LATEST right with ts ≤ left.ts —
   *                "most recent prior snapshot". true: EARLIEST right
   *                with ts ≥ left.ts — "next event after", the funnel /
   *                time-to-conversion primitive. Same single-shuffle
   *                union+window plan either way (forward just reverses
   *                the traversal order).
   * @param toleranceMs staleness bound: a match farther than this many
   *                milliseconds from left.ts yields null instead — the
   *                "don't join to an ancient snapshot" guard of a
   *                feature-store lookup. The as-of match is the CLOSEST
   *                one on the chosen side, so nulling it is exhaustive
   *                (no other within-tolerance row can exist). None =
   *                unbounded (the original contract).
   * @return left's columns + `as`
   */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valCol: String,
      as: String = "asof_value",
      forward: Boolean = false,
      toleranceMs: Option[Long] = None): DataFrame = {
    require(!left.columns.contains(as), s"left already has a '$as' column")
    require(toleranceMs.forall(_ >= 0),
      s"toleranceMs must be >= 0, got $toleranceMs")
    Seq("_is_right", "_r", "_m").foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"'$c' is reserved by asOfJoin internals — rename that input column")
    }
    val valType = right.schema(valCol).dataType
    // The carried match is a (right ts, value) STRUCT so the window's
    // last() keeps the pair consistent even when valCol itself is null
    // on some right rows (two independent last(ignoreNulls) calls could
    // pick different rows).
    val lTagged = left
      .withColumn("_is_right", lit(0))
      // null of the right-struct type (the false branch never evaluates)
      .withColumn("_r", when(lit(false),
        struct(col(tsCol).as("_rts"), lit(null).cast(valType).as("_rv"))))
    val rTagged = right.select(
      left.columns.toSeq.map { c =>
        if (keys.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(lit(1).as("_is_right"),
        struct(col(tsCol).as("_rts"), col(valCol).cast(valType).as("_rv"))
          .as("_r")): _*)
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("_is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_is_right") === 0)
    val value = toleranceMs match {
      case None => col("_m._rv")
      case Some(ms) =>
        val delta =
          if (forward) unix_micros(col("_m._rts")) - unix_micros(col(tsCol))
          else unix_micros(col(tsCol)) - unix_micros(col("_m._rts"))
        when(delta <= ms * 1000L, col("_m._rv"))
    }
    matched
      .withColumn(as, value)
      .drop("_is_right", "_r", "_m")
  }
}
