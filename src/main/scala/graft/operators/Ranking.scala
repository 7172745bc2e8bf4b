package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Caching

/**
 * Two-stage parallel global rank — the shared machinery behind
 * [[Vocab.rankVocab]]'s token ids and [[Dedup.sortedNeighborhoodPairs]]'
 * neighbor blocks: assign each row its 0-based position in a total
 * order WITHOUT a single-partition sort.
 *
 * Shape: RANGE-partition on the sort key and sort within partitions,
 * so every partition holds a contiguous slice of the global order;
 * global position = partition offset + intra-partition index. The
 * offsets come from a per-partition row histogram — ≤
 * `spark.sql.shuffle.partitions` rows collected to the driver, a
 * sizing decision of AQE's magnitude, not a data collect. The old
 * `row_number over Window.orderBy(...)` shape would have planned a
 * single-partition exchange — the well-known scale cliff.
 */
private[graft] object Ranking {

  /** Intra-partition bits of `monotonically_increasing_id` (its layout
    * is partitionId << 33 | recordNumber — a documented Spark contract). */
  private val MidPartitionShift = 33
  private val MidRecordMask = (1L << MidPartitionShift) - 1

  /**
   * The input plus `rankCol` = 0-based global rank by `sortCols`.
   * `sortCols` must be a TOTAL order (unique tie-break) or ranks within
   * ties are partitioning-dependent. The returned frame is persisted
   * (release via the enclosing [[graft.Caching]] scope); `errorHint`
   * names the caller in the recomputation-guard failure message.
   */
  def withGlobalRank(
      df: DataFrame,
      sortCols: Seq[Column],
      rankCol: String,
      errorHint: String): DataFrame = {
    // monotonically_increasing_id is nondeterministic-flagged, so
    // Catalyst will not push this projection below the sort: ids are
    // assigned in sorted order within each range partition.
    val sorted = Caching.persist(
      df.repartitionByRange(sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn("_mid", monotonically_increasing_id()))
    val partSizes = sorted
      .groupBy(shiftright(col("_mid"), MidPartitionShift).as("_pid"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets: Map[Long, Long] = {
      var acc = 0L
      partSizes.map { case (pid, n) => val o = acc; acc += n; pid -> o }.toMap
    }
    val sizes: Map[Long, Long] = partSizes.toMap
    // RECOMPUTATION GUARD: the offsets are only valid against the
    // materialization the histogram saw. If the persisted range
    // exchange is ever re-executed (cache + shuffle loss on a real
    // cluster), the RangePartitioner re-samples and can redistribute
    // rows — total row count is preserved, so any redistribution makes
    // SOME partition exceed its recorded size (or introduces an
    // unknown pid, where element_at misses). Both trip the per-row
    // assert below: loud failure, never silently corrupted ranks. For
    // full fault tolerance checkpoint the input frame first.
    val pid = shiftright(col("_mid"), MidPartitionShift)
    val idx = col("_mid").bitwiseAND(lit(MidRecordMask))
    // unknown pid → size coalesces to -1 so the comparison is FALSE,
    // not null (assert_true only raises on false)
    val guard = coalesce(assert_true(
      idx < coalesce(element_at(typedLit(sizes), pid), lit(-1L)),
      lit(s"global rank invalidated: the ranked partitioning was " +
        s"recomputed after the offset histogram (partition grew or " +
        s"appeared) — $errorHint")),
      lit(true))
    sorted
      .where(guard)
      .withColumn(rankCol, element_at(typedLit(offsets), pid) + idx)
      .drop("_mid")
  }
}
