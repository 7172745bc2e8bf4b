package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// 10x scale smoke for the Bloom-screened incremental dedup (BASELINE.md
// scale-stress table): 50 k-doc history vs a 5 k delta (half dups),
// Bloom screen vs the plain anti-join on identical inputs.
object BloomStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val history = base.crossJoin(spark.range(10).toDF("copy"))
      .select((col("doc_id") * 10 + col("copy")).as("doc"),
        concat(col("text"), lit(" salt"), col("copy")).as("line"))
    // delta: every doc's copy-0 payload (a dup) plus a fresh variant
    val delta = base
      .select((col("doc_id") + 1000000).as("doc"),
        concat(col("text"), lit(" salt0")).as("line"))
      .unionByName(base.select((col("doc_id") + 2000000).as("doc"),
        concat(col("text"), lit(" fresh")).as("line")))
    println("HISTORY: " + history.count() + "  DELTA: " + delta.count())

    var t0 = System.nanoTime()
    val plain = graft.operators.Dedup.exactDedupAgainst(
      delta, history.select(md5(col("line")).as("fp"))).count()
    val tPlain = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val bloomed = graft.operators.Dedup.exactDedupAgainstBloom(
      delta, history, expectedItems = 50000L).count()
    val tBloom = (System.nanoTime() - t0) / 1e9
    println(f"DEDUP_BLOOM_10X: plain=$tPlain%.1f s bloom=$tBloom%.1f s " +
      s"kept_plain=$plain kept_bloom=$bloomed (must be equal)")
    assert(plain == bloomed, s"bloom path diverged: $plain != $bloomed")
    spark.stop()
  }
}
