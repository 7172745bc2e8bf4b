package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Keyed-state maintenance for incremental ingest (SURVEY.md §7.4, the
 * q40/q52/q91 daily-increment family): MERGE-style latest-wins upsert of
 * a delta into a keyed history, and fingerprint-based snapshot diffing.
 *
 * Both operators are designed around the 100 TB asymmetry of an ingest
 * pipeline — the history is corpus-scale, the delta is a day's worth —
 * so the expensive work must scale with the DELTA, never with history.
 */
object Merge {

  /**
   * Latest-wins keyed UPSERT — the batch equivalent of `MERGE INTO`
   * with "update if newer, insert if absent" semantics: each key's
   * surviving row is the max of its (history row ∪ delta rows) under
   * the `ordCols` order, so an out-of-order delta (older than the
   * state it targets) is a NO-OP rather than a silent regression — the
   * idempotent/replay-safe semantics a retried ingest job needs.
   *
   * CONTRACT: `history` is a keyed state table — at most ONE row per
   * `keyCols` value (what this operator itself outputs; seed an empty
   * history for the first batch). `ordCols` must totally order rows
   * within a key (e.g. (ts, event_id)) or the winner is ambiguous.
   * `delta` may carry many rows per key.
   *
   * Scale shape: history splits on a semi/anti join against the
   * delta's distinct keys — a frame bounded by |delta|, broadcast when
   * the delta is a daily increment — so unmatched history rows pass
   * through MAP-SIDE and the row_number window shuffles only the
   * touched slice (|delta| + matched history rows). The plain
   * alternative — window over the full union — would hash-exchange
   * the entire 100 TB state to update a day of keys.
   *
   * The split is provably invisible in the answer: with a keyed
   * history, untouched ∪ winner(touched) ≡ latest-per-key over
   * (history ∪ delta) — which is exactly what the oracle computes as
   * one flat window, the q81 plain-SQL pattern.
   */
  def upsertLatest(
      history: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      ordCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "upsertLatest needs at least one key column")
    require(ordCols.nonEmpty, "upsertLatest needs at least one order column")
    val keys = delta.select(keyCols.map(col): _*).distinct()
    val untouched = history.join(keys, keyCols, "left_anti")
    val touched = history.join(keys, keyCols, "left_semi")
      .unionByName(delta)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordCols.map(c => col(c).desc): _*)
    val winner = touched
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
    untouched.unionByName(winner)
      // the USING-column joins moved keyCols to the front; hand the
      // caller back their own column order
      .select(history.columns.map(col): _*)
  }

  /**
   * SNAPSHOT DIFF — the change feed between two corpus snapshots (the
   * audit/invalidation step before any incremental recompute): per key,
   * `added` (only in `b`), `removed` (only in `a`), `changed` (both,
   * payload fingerprint differs), `unchanged` (both, identical).
   *
   * Scale shape: each side collapses to (key, md5 fingerprint) at the
   * scan — the full-outer join exchanges 32-byte fingerprints keyed by
   * the join key, never payloads, and text comparison is a hex-string
   * equality. One key-hash shuffle per side, output one row per key in
   * either snapshot (filter `change <> 'unchanged'` BEFORE any
   * downstream join so the change feed, not the corpus, flows on).
   *
   * CONTRACT: at most one row per key per snapshot (it is a snapshot);
   * duplicate keys would cross-multiply in the join. Compose with
   * [[Dedup.exactDedup]] upstream if that can't be guaranteed.
   *
   * Null payloads are legal: the fingerprint is null-guarded with a
   * sentinel (a NUL byte no md5 hex string can collide with), so a
   * key whose payload is NULL in one snapshot and non-NULL in the
   * other reports `changed` — presence stays keyed on the join, never
   * on the fingerprint.
   */
  def snapshotDiff(
      a: DataFrame,
      b: DataFrame,
      keyCol: String,
      payloadCol: String): DataFrame = {
    val fp = (payload: Column) =>
      coalesce(md5(payload), lit("\u0000null"))
    val af = a.select(col(keyCol).as("key"), fp(col(payloadCol)).as("_fp_a"))
    val bf = b.select(col(keyCol).as("key"), fp(col(payloadCol)).as("_fp_b"))
    af.join(bf, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("_fp_a").isNull, "added")
          .when(col("_fp_b").isNull, "removed")
          .when(col("_fp_a") =!= col("_fp_b"), "changed")
          .otherwise("unchanged").as("change"))
  }

  /**
   * CDC APPLY — materialize the current state from a change log with
   * TOMBSTONES: per key, last-writer-wins under `ordCols`, and a key
   * whose LATEST entry satisfies `isDelete` is absent from the result
   * (an older delete superseded by a later write is correctly a no-op
   * — the filter runs AFTER winner selection, which is the part naive
   * "filter deletes first, then take latest" implementations get
   * wrong: they resurrect the pre-delete row).
   *
   * [[upsertLatest]] is the two-table (history ⊕ delta) maintenance
   * step; this is the from-scratch replay of a whole log — the bulk
   * backfill / disaster-recovery path, and the oracle for upsert
   * chains (replaying a log in any batch split through upsertLatest
   * with a tombstone column lands on this result).
   *
   * Scale shape: ONE key-hash shuffle + per-key window (log rows per
   * key are ingest-bounded); no joins, nothing collects.
   *
   * CONTRACT: `ordCols` must totally order entries within a key or
   * the winner is ambiguous.
   */
  def cdcApply(
      log: DataFrame,
      keyCols: Seq[String],
      ordCols: Seq[String],
      isDelete: Column): DataFrame = {
    require(keyCols.nonEmpty, "cdcApply needs at least one key column")
    require(ordCols.nonEmpty, "cdcApply needs at least one order column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordCols.map(c => col(c).desc): _*)
    log.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
      .where(!isDelete)
  }

  /**
   * SCD TYPE-2 HISTORIZATION — turn a change log into a full version
   * history with validity intervals: per key, each entry is valid from
   * its own `validCol` until the NEXT entry's (half-open
   * [valid_from, valid_to)), and the last entry per key is the open
   * current version (null valid_to, is_current = true). Where
   * [[cdcApply]] answers "what is the state NOW?", this answers
   * "what was the state AT time t?" — the point-in-time dimension
   * table behind as-of joins, audit trails, and training-data
   * time-travel ("rebuild the corpus exactly as it stood on March 3").
   *
   * Determinism: valid_to is the lead of `validCol` under the total
   * `ordCols` order — pure column motion, no arithmetic.
   *
   * Scale shape: identical to [[cdcApply]] — ONE key-hash shuffle +
   * per-key window (versions per key are ingest-bounded); no joins,
   * nothing collects. At 100 TB the log partitions by key hash and
   * each key's version chain is processed entirely inside its
   * partition.
   *
   * CONTRACT: `ordCols` must totally order entries within a key
   * (lead is ambiguous otherwise), and `validCol` must be
   * non-decreasing along that order for the intervals to nest
   * sensibly (true when `validCol` leads `ordCols`, the usual case).
   *
   * @param validCol event-time column the intervals are cut on
   * @return log columns + valid_from, valid_to, is_current
   */
  def scd2Historize(
      log: DataFrame,
      keyCols: Seq[String],
      ordCols: Seq[String],
      validCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2Historize needs at least one key column")
    require(ordCols.nonEmpty, "scd2Historize needs at least one order column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordCols.map(col): _*)
    log.withColumn("valid_from", col(validCol))
      .withColumn("valid_to", lead(col(validCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
