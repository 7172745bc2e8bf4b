package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-ORDER DATA LAYOUT — multi-column clustering for min/max file
 * skipping.
 *
 * The reference engine writes its outputs as insert-ordered HDFS text
 * (`TFIDF.java`, `Rank.java` sinks) — a layout where a range predicate
 * on ANY column still scans every file. At 100 TB the dominant cost of
 * most queries is the scan, and the dominant scan lever is skipping
 * whole files via footer min/max statistics; that only works when rows
 * that are close in the filtered dimensions are close in file order.
 * A Z-order (Morton) curve interleaves the bits of several dimensions
 * into one sort key, so files cover small bounding BOXES instead of
 * thin full-width stripes — a box predicate then touches O(box area)
 * files instead of all of them.
 *
 * Everything here is deterministic and in-plan:
 *  - per-dimension min/max come from ONE 1-row aggregate broadcast
 *    into the scan (no driver collect);
 *  - bucketing is an explicit floor formula (not `ntile`, whose
 *    assignment depends on a global sort), identical in the DuckDB
 *    oracle down to IEEE double semantics;
 *  - file granules ("cells") are fixed-width zval ranges — top
 *    `cellBits` bits — NOT `repartitionByRange`, whose sampled
 *    boundaries are nondeterministic across runs.
 *
 * The interleave itself is pure shift/and/or arithmetic: whole-stage
 * codegen, no UDF, no allocation.
 */
object Layout {

  /** Bits per dimension; a zval occupies `2*bits` bits. 8 bits ⇒ a
    * 256×256 grid — enough resolution that cell boxes, not bucket
    * granularity, bound the skipping precision at any file count a
    * single table realistically has. */
  val DefaultBits = 8

  /** File granules = top `cellBits` bits of the zval: 6 ⇒ 64 cells.
    * At 100 TB this is the knob to match the target file size (a cell
    * maps to one file/row-group); the grid under it stays 256×256. */
  val DefaultCellBits = 6

  /** Min–max bucket of an integral column into [0, 2^bits):
    * `floor((v - mn) · 2^bits / (mx - mn + 1))`. The double division
    * is exact while `(mx - mn) · 2^bits < 2^53` — epoch seconds over a
    * century × 256 sits four orders inside the bound — and the DuckDB
    * oracle mirrors the same casts, so both engines floor the same
    * IEEE quotient. A degenerate dimension (mn = mx) buckets to 0. */
  def minMaxBucket(v: Column, mn: Column, mx: Column, bits: Int): Column =
    floor((v - mn).cast("double") * (1L << bits) /
      (mx - mn + lit(1L)).cast("double")).cast("long")

  /** Morton interleave of two bucket columns: x on even bits, y on
    * odd. Unrolled shift/and/or — stays inside whole-stage codegen. */
  def zInterleave(xb: Column, yb: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** The same interleave as DuckDB SQL over bucket expressions `xb` /
    * `yb` — generated from the same loop so engine and oracle cannot
    * drift. */
  def zInterleaveSql(xb: String, yb: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($xb) >> $i) & 1) << ${2 * i}) | (((($yb) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")

  /** Attach (zval, cell) from two integral columns. Column mins/maxes
    * ride the plan as a 1-row broadcast — whitelisted with the other
    * 1-row stat crosses in PlanAuditSpec. */
  def withZCells(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = DefaultBits,
      cellBits: Int = DefaultCellBits): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    require(cellBits >= 1 && cellBits <= 2 * bits,
      s"cellBits must be in [1, 2*bits=${2 * bits}], got $cellBits")
    val stats = df.agg(
      min(col(xCol)).as("x_mn"), max(col(xCol)).as("x_mx"),
      min(col(yCol)).as("y_mn"), max(col(yCol)).as("y_mx"))
    df.crossJoin(broadcast(stats))
      .withColumn("zval", zInterleave(
        minMaxBucket(col(xCol), col("x_mn"), col("x_mx"), bits),
        minMaxBucket(col(yCol), col("y_mn"), col("y_mx"), bits), bits))
      .withColumn("cell", shiftright(col("zval"), 2 * bits - cellBits))
      .drop("x_mn", "x_mx", "y_mn", "y_mx")
  }

  /** The strawman layout an insert-ordered write produces: the same
    * number of cells, but cut along the id column — each cell spans
    * the FULL range of every other dimension. */
  def linearCells(
      df: DataFrame,
      idCol: String,
      cellBits: Int = DefaultCellBits): DataFrame = {
    require(cellBits >= 1 && cellBits <= 16,
      s"cellBits must be in [1,16], got $cellBits")
    val stats = df.agg(min(col(idCol)).as("i_mn"), max(col(idCol)).as("i_mx"))
    df.crossJoin(broadcast(stats))
      .withColumn("cell",
        minMaxBucket(col(idCol), col("i_mn"), col("i_mx"), cellBits))
      .drop("i_mn", "i_mx")
  }

  /** Per-cell footer statistics — row count plus the (x, y) bounding
    * box parquet would record as column min/max. One grouped
    * aggregation with map-side partials; cells ≪ rows. */
  def cellStats(dfWithCell: DataFrame, xCol: String, yCol: String): DataFrame =
    dfWithCell.groupBy(col("cell")).agg(
      count(lit(1)).as("n_rows"),
      min(col(xCol)).as("x_lo"), max(col(xCol)).as("x_hi"),
      min(col(yCol)).as("y_lo"), max(col(yCol)).as("y_hi"))

  /** 1-row scan estimate for a box predicate against footer stats: a
    * cell is read iff its bounding box intersects the query box —
    * exactly the pruning decision a min/max-skipping reader makes. */
  def scanEstimate(
      stats: DataFrame,
      xLo: Column, xHi: Column,
      yLo: Column, yHi: Column): DataFrame = {
    val hit = col("x_lo") <= xHi && col("x_hi") >= xLo &&
      col("y_lo") <= yHi && col("y_hi") >= yLo
    stats.agg(
      count(lit(1)).as("n_cells"),
      sum(when(hit, lit(1L)).otherwise(lit(0L))).as("cells_scanned"),
      sum(when(hit, col("n_rows")).otherwise(lit(0L))).as("rows_scanned"))
  }

  /** Physical layout write: one directory per cell, rows z-sorted
    * within — the file tree a skipping reader prunes. Deterministic
    * (hash repartition on the cell id, not sampled ranges). */
  def zorderWrite(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      bits: Int = DefaultBits,
      cellBits: Int = DefaultCellBits): Unit =
    withZCells(df, xCol, yCol, bits, cellBits)
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("zval"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /**
   * COMPACTION PLAN — the small-files OPTIMIZE step planned as a
   * deterministic query: within each table partition, files are laid
   * out largest-first and grouped into target-size bins by their
   * cumulative preceding mass — bin = ⌊cum_before / targetBytes⌋ —
   * next-fit-decreasing, the greedy compactors (Delta OPTIMIZE,
   * Iceberg rewriteDataFiles) actually run. Each bin is one rewrite
   * task; a bin whose n_files = 1 and bytes ≥ target is already
   * compact and skipped by the executor.
   *
   * Determinism: the order (size DESC, file id) is total, and the bin
   * id is integer floor division of an exact integer prefix sum — no
   * ntile, no sampling, engine-exact.
   *
   * Scale shape: rows here are FILES (table metadata, ~10⁶ per table
   * at 100 TB), 5+ orders below data rows — one partition-keyed
   * window over metadata is noise. The plan never touches data; the
   * rewrite it drives is the expensive part.
   *
   * @param files    one row per file: partition cols + id + size
   * @param partCols table-partition columns files are grouped under
   * @return files + bin — the rewrite-task assignment
   */
  def compactionPlan(
      files: DataFrame,
      partCols: Seq[String],
      fileCol: String,
      sizeCol: String,
      targetBytes: Long): DataFrame = {
    require(partCols.nonEmpty, "compactionPlan needs partition columns")
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(col(sizeCol).desc, col(fileCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files
      .withColumn("_cum_before",
        coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"_cum_before div ${targetBytes}L"))
      .drop("_cum_before")
  }
}
