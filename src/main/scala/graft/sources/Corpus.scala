package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Corpus sources and sinks (SURVEY.md §2 O1/O12).
 *
 * The reference reads a directory of text files and uses the file basename
 * as the document identity (DocWordCount.java:54,
 * `((FileSplit) ctx.getInputSplit()).getPath().getName()`); its only sink is
 * `TextOutputFormat` (`key \t value` lines). We support both that parity
 * surface and the engine-native columnar path (parquet in/out).
 *
 * Scale note: `spark.read.text` over a directory is a distributed scan;
 * `input_file_name()` is evaluated per-partition with no shuffle. Parquet
 * reads go through the vectorized reader with column pruning + predicate
 * pushdown — always prefer parquet at 100 TB.
 */
object Corpus {

  /**
   * O1 — text-directory scan with doc-id attach.
   * Returns (doc: String, line: String), doc = file basename.
   */
  def textDir(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .text(dir)
      .select(
        regexp_extract(input_file_name(), "[^/]+$", 0).as("doc"),
        col("value").as("line")
      )

  /**
   * Parquet documents table (driver testdata layout: doc_id bigint,
   * text string, lang string, source string, n_chars bigint).
   * Normalized to (doc, line) so every downstream operator is
   * source-agnostic.
   */
  def documentsParquet(spark: SparkSession, path: String): DataFrame =
    spark.read
      .parquet(path)
      .select(col("doc_id").cast("string").as("doc"), col("text").as("line"))

  /** Generic table loader for the driver testdata dirs. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /**
   * JSON-lines documents source (one object per line, doc_id/text fields),
   * normalized to (doc, line). The schema is EXPLICIT — schema inference
   * is a full extra pass over the data, unaffordable at 100 TB.
   */
  def documentsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("doc_id STRING, text STRING")
      .json(path)
      .select(col("doc_id").as("doc"), col("text").as("line"))

  /** CSV documents source (header row, doc_id/text columns), normalized to
    * (doc, line). Explicit schema for the same reason as JSONL. */
  def documentsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema("doc_id STRING, text STRING")
      .csv(path)
      .select(col("doc_id").as("doc"), col("text").as("line"))

  /**
   * O12 parity text sink: `key \t value` lines like Hadoop's
   * TextOutputFormat. Caller chooses the two columns. `coalesce(1)` is NOT
   * applied — at scale you want many output files; tests may coalesce.
   */
  def writeTabText(df: DataFrame, keyCol: String, valueCol: String, out: String): Unit =
    df.select(concat_ws("\t", col(keyCol), col(valueCol).cast("string")).as("value"))
      .write
      .mode("overwrite")
      .text(out)

  /** Engine-native sink. */
  def writeParquet(df: DataFrame, out: String): Unit =
    df.write.mode("overwrite").parquet(out)

  /** ORC documents source (doc_id/text columns), normalized to
    * (doc, line). Same vectorized-reader + pushdown class as parquet —
    * supported for corpora that arrive ORC-shaped. */
  def documentsOrc(spark: SparkSession, path: String): DataFrame =
    spark.read
      .orc(path)
      .select(col("doc_id").cast("string").as("doc"), col("text").as("line"))

  /** ORC sink (columnar alternative when the downstream stack is
    * ORC-native). */
  def writeOrc(df: DataFrame, out: String): Unit =
    df.write.mode("overwrite").orc(out)

  /**
   * Hive-style PARTITIONED parquet sink: one directory per value of
   * `partitionCols` (e.g. lang=en/, source=web/). At 100 TB this is the
   * single biggest scan lever — a later read filtering on a partition
   * column prunes whole directories at PLANNING time (the plan shows
   * `PartitionFilters`, and unselected partitions are never listed,
   * opened, or read). Partition by LOW-cardinality columns only
   * (lang/source/date); high-cardinality partitioning produces the
   * million-small-files failure mode.
   */
  def writePartitionedParquet(
      df: DataFrame,
      partitionCols: Seq[String],
      out: String): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(out)

  /**
   * Bucketed + sorted parquet table via the session catalog: data is
   * hash-partitioned into `numBuckets` files per partition on
   * `bucketCols` at WRITE time, so every later equi-join or aggregation
   * on those keys between same-bucketed tables runs WITHOUT a shuffle
   * (and without a sort, thanks to sortBy) — the co-located-join
   * strategy for tables that are joined repeatedly at 100 TB. Read back
   * with `spark.table(name)`.
   */
  def writeBucketedTable(
      df: DataFrame,
      name: String,
      bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)
}
