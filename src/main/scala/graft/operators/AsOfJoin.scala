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
   * @return left's columns + `as`
   */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valCol: String,
      as: String = "asof_value",
      forward: Boolean = false): DataFrame = {
    require(!left.columns.contains(as), s"left already has a '$as' column")
    Seq("_is_right", "_rv").foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"'$c' is reserved by asOfJoin internals — rename that input column")
    }
    val valType = right.schema(valCol).dataType
    val lTagged = left
      .withColumn("_is_right", lit(0))
      .withColumn("_rv", lit(null).cast(valType))
    val rTagged = right.select(
      left.columns.toSeq.map { c =>
        if (keys.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(lit(1).as("_is_right"), col(valCol).cast(valType).as("_rv")): _*)
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("_is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn(as, last(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_is_right") === 0)
      .drop("_is_right", "_rv")
  }
}
