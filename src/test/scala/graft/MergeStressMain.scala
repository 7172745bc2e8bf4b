package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// One-off stress for the incremental keyed-upsert economics
// (BASELINE.md scale-stress table): a 1M-key synthetic state table
// takes a 10k-row delta through Merge.upsertLatest (the delta-bounded
// semi/anti split) vs the naive flat latest-per-key window over the
// full union — the shape the split exists to avoid. Both paths must
// agree row-for-row; the interesting number is the wall-clock gap and
// its scaling direction (the naive window re-shuffles the WHOLE state
// per batch; the split's window touches only |delta| keys).
object MergeStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Merge

    val nKeys = 1000000L
    val nDelta = 10000L
    // keyed history: one row per key (the state-table contract)
    val hist = spark.range(nKeys).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1700000000000000L) + col("id")).as("ts"),
      col("id").as("user_id"),
      lit("state").as("event_type"),
      col("id").cast("double").as("value"))
    // delta touches nDelta scattered keys with NEWER timestamps
    val delta = spark.range(nDelta).select(
      (lit(2000000L) + col("id")).as("event_id"),
      timestamp_micros(lit(1800000000000000L) + col("id")).as("ts"),
      (col("id") * (nKeys / nDelta)).as("user_id"),
      lit("state").as("event_type"),
      lit(-1.0).as("value"))
    hist.persist(); delta.persist()
    println(s"HIST: ${hist.count()} keys, DELTA: ${delta.count()} rows")

    val keys = Seq("user_id", "event_type")
    val ord = Seq("ts", "event_id")

    var t0 = System.nanoTime()
    val split = Merge.upsertLatest(hist, delta, keys, ord)
    val nSplit = split.count()
    val tSplit = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord.map(c => col(c).desc): _*)
    val naive = hist.unionByName(delta)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
    val nNaive = naive.count()
    val tNaive = (System.nanoTime() - t0) / 1e9

    println(f"UPSERT_SPLIT: $tSplit%.1f s, rows=$nSplit")
    println(f"UPSERT_NAIVE_WINDOW: $tNaive%.1f s, rows=$nNaive")
    // equality audit: both paths produce the identical state
    val diff = split.exceptAll(naive).count() + naive.exceptAll(split).count()
    println(s"STATE_DIFF_ROWS: $diff (must be 0)")
    // updated keys took the delta row; untouched kept history
    val updated = split.where(col("value") === -1.0).count()
    println(s"UPDATED_KEYS: $updated (expect $nDelta)")
    spark.stop()
  }
}
