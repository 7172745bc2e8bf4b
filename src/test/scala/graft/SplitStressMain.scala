package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off 10x replication stress for the split/classify tier
// (BASELINE.md scale-stress table): history = sf0.1 docs salted x10
// (50k docs, dense 10-sibling near-dup families), delta = one more
// salted copy (5k docs, every one a near-dup of a 10-doc history
// family) — the worst realistic inherit-rate case. NB trains on the
// same 50k corpus with the source label.
object SplitStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val hist = base.crossJoin(spark.range(10).toDF("copy"))
      .select((col("doc_id") * 16 + col("copy")).as("doc"),
        concat(col("text"), lit(" salt"), col("copy")).as("line"))
    val delta = base
      .select((col("doc_id") * 16 + 10).as("doc"),
        concat(col("text"), lit(" salt10")).as("line"))
    println("HIST: " + hist.count() + " DELTA: " + delta.count())

    // one scope over the whole measurement: leakageSafeSplit's label
    // caches require it, and every internal persist releases on exit
    graft.Caching.scoped {
    var t0 = System.nanoTime()
    val hsp = graft.Caching.persist(
      graft.operators.Dedup.leakageSafeSplit(hist, valPerMille = 100))
    val valShare = hsp.agg(
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("v"),
      count(lit(1)).as("n")).collect().head
    var secs = (System.nanoTime() - t0) / 1e9
    println(f"SPLIT_10X: $secs%.1f s, val=${valShare.getLong(0)}/${valShare.getLong(1)}")

    t0 = System.nanoTime()
    val inc = graft.operators.Dedup.leakageSafeSplitAgainst(
      delta, hist, hsp.select(col("doc"), col("split")), valPerMille = 100)
    val matched = inc.agg(
      sum(when(col("anchor").isNotNull, 1L).otherwise(0L)).as("m"),
      count(lit(1)).as("n")).collect().head
    secs = (System.nanoTime() - t0) / 1e9
    println(f"SPLIT_INC_10X: $secs%.1f s, inherited=${matched.getLong(0)}/${matched.getLong(1)}")

    val labeled = hist.withColumn("source",
      concat(lit("src"), pmod(col("doc"), lit(16))))
    t0 = System.nanoTime()
    val preds = graft.operators.Classify.naiveBayes(labeled, "source")
    val acc = preds.agg(
      sum(when(col("predicted") === col("source"), 1L).otherwise(0L)).as("c"),
      count(lit(1)).as("n")).collect().head
    secs = (System.nanoTime() - t0) / 1e9
    println(f"NB_DIST_10X: $secs%.1f s, resub_acc=${acc.getLong(0)}/${acc.getLong(1)}")

    t0 = System.nanoTime()
    val model = graft.operators.Classify.fit(labeled, "source")
    val fitSecs = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val nScored = graft.operators.Classify.scoreRowLocal(hist, model).count()
    secs = (System.nanoTime() - t0) / 1e9
    println(f"NB_FIT_10X: $fitSecs%.1f s; NB_SCORE_ROWLOCAL_10X: $secs%.1f s, scored=$nScored")
    }
    spark.stop()
  }
}
