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

  /** Per-row well-formedness assert: a descending interval would make
    * `sequence(loBin, hiBin)` count DOWN and bucket garbage — fail
    * loudly instead (codegen'd; coalesce keeps the predicate row-true). */
  private def wellFormed(lo: String, hi: String) =
    coalesce(assert_true(col(lo) <= col(hi),
      concat(lit(s"malformed interval: $lo="), col(lo),
        lit(s" > $hi="), col(hi))), lit(true))

  /**
   * Interval × interval OVERLAP join (CLOSED intervals: a pair matches
   * iff lo1 ≤ hi2 AND lo2 ≤ hi1 — closed so zero-length intervals, e.g.
   * one-event sessions, still participate). Same bin trick as
   * [[pointInInterval]]: both sides explode to covered bins, the join
   * is an equi-join on the bin, and a pair is counted exactly once — in
   * the FIRST bin both sides cover, `max(⌊lo1/w⌋, ⌊lo2/w⌋)`, decidable
   * row-locally from the carried bounds (the SimHash first-matching-
   * band trick) — so there is no distinct exchange over duplicated
   * candidates. Cost is O(Σ per-bin |L_bin|·|R_bin|), never |L|·|R|.
   *
   * @param left  carries `lo1`/`hi1` (numeric, lo ≤ hi — asserted)
   * @param right carries `lo2`/`hi2`; names must not collide with left
   * @return matched rows, all columns of both sides
   */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lo1: String,
      hi1: String,
      lo2: String,
      hi2: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bins(lo: String, hi: String) =
      explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long")))
    val l = left.where(wellFormed(lo1, hi1)).withColumn("_bin", bins(lo1, hi1))
    val r = right.where(wellFormed(lo2, hi2)).withColumn("_bin", bins(lo2, hi2))
    l.join(r, Seq("_bin"))
      .where(col("_bin") === greatest(
        floor(col(lo1) / binWidth).cast("long"),
        floor(col(lo2) / binWidth).cast("long")))
      .where(col(lo1) <= col(hi2) && col(lo2) <= col(hi1))
      .drop("_bin")
  }
}
