package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off 10x replication stress for the round-4 ops (BASELINE.md
// scale-stress table): each sf0.1 doc copied 10x with a per-copy salt.
object SubstrStressMain {
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
    var t0 = System.nanoTime()
    val out = graft.operators.Dedup.substringDedup(docs, spanTokens = 8)
    val removed = out.agg(sum("n_removed"), sum("n_kept")).collect()(0)
    println(f"SUBSTR_10X: ${(System.nanoTime() - t0) / 1e9}%.1f s, removed=${removed.getLong(0)}, kept=${removed.getLong(1)}")
    t0 = System.nanoTime()
    val mix = base.crossJoin(spark.range(10).toDF("copy"))
      .select((col("doc_id") * 10 + col("copy")).as("doc"), col("text").as("line"), col("source"))
    val rep = graft.operators.Pipeline.mixtureSample(mix,
        shares = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2), budgetTokens = 500000L)
      .groupBy(col("source")).agg(count(lit(1)), sum(col("n_tokens"))).collect()
    println(f"MIXTURE_10X: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      rep.map(r => s"${r.getString(0)}=${r.getLong(2)}tok").sorted.mkString(","))
    spark.stop()
  }
}
