package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off 10x replication stress for the search/fingerprint tier
// (BASELINE.md scale-stress table): each sf0.1 doc copied 10x with a
// per-copy salt, so winnow pairs face a dense 10-sibling near-dup
// corpus and BM25/index ops face 50k docs.
object SearchStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs = base.crossJoin(spark.range(10).toDF("copy"))
      .select((col("doc_id") * 10 + col("copy")).as("doc"),
        concat(col("text"), lit(" salt"), col("copy")).as("line"))
    println("DOCS: " + docs.count())

    // materialize BEFORE reading the clock: these plans are lazy.
    var t0 = System.nanoTime()
    val nFps = graft.functions.TextAnalysis.winnowFingerprints(docs).count()
    var secs = (System.nanoTime() - t0) / 1e9
    println(f"WINNOW_FP_10X: $secs%.1f s, fps=$nFps")

    t0 = System.nanoTime()
    // salted 10-copy corpus: every doc has 9 true near-dup siblings.
    // maxDocsPerFp=50 keeps the 10-sibling families pairable while
    // still guarding corpus-wide boilerplate.
    val nPairs = graft.functions.TextAnalysis
      .winnowPairs(docs, minShared = 2).count()
    secs = (System.nanoTime() - t0) / 1e9
    println(f"WINNOW_PAIRS_10X: $secs%.1f s, pairs=$nPairs")

    t0 = System.nanoTime()
    val nHits = graft.operators.Search
      .searchBm25(docs, "spark stream window").count()
    secs = (System.nanoTime() - t0) / 1e9
    println(f"BM25_10X: $secs%.1f s, hits=$nHits")

    t0 = System.nanoTime()
    val idx = s"${System.getProperty("java.io.tmpdir")}/graft_stress_index"
    graft.operators.Search.buildIndex(docs, idx)
    secs = (System.nanoTime() - t0) / 1e9
    println(f"INDEX_BUILD_10X: $secs%.1f s")
    t0 = System.nanoTime()
    val nIdxHits = graft.operators.Search
      .searchIndexed(spark, idx, "spark stream window").count()
    secs = (System.nanoTime() - t0) / 1e9
    println(f"INDEX_PROBE_10X: $secs%.1f s, hits=$nIdxHits")
    spark.stop()
  }
}
