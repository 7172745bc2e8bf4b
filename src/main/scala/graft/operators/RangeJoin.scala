package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Point-in-interval range join (an operator Spark lacks natively — its
 * planner would run the inequality condition as a broadcast nested-loop
 * theta join): both sides bucket to fixed-width bins — an interval
 * explodes to every bin it overlaps, a point maps to its single bin —
 * the join becomes an equi-join on the bin, and an exact [lo, hi)
 * filter removes boundary false positives.
 *
 * Scale shape: the shuffle key is the bin, cost is
 * O(|points| + |intervals| · span/binWidth) rows through one hash join —
 * never the O(|P|·|I|) pair space. Pick binWidth near the typical
 * interval span: smaller bins inflate interval fan-out, larger bins
 * inflate per-bucket false positives.
 */
object RangeJoin {

  /**
   * @param points    carries `valCol`
   * @param intervals carries `loCol` (inclusive) and `hiCol` (exclusive);
   *                  column names must not collide with `points`
   * @return matched (point × interval) rows, all columns of both sides
   */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      valCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("_bin", floor(col(valCol) / binWidth).cast("long"))
    val i = intervals.withColumn("_bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, Seq("_bin"))
      .where(col(valCol) >= col(loCol) && col(valCol) < col(hiCol))
      .drop("_bin")
  }
}
