package graft

import org.apache.spark.sql.SparkSession

// Scratch timing harness for the learnMerges acceptance measurements.
object BpeTimingMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("bpe-timing")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .selectExpr("doc_id AS doc", "text AS line")
    val t0 = System.nanoTime()
    val m = graft.operators.Bpe.learnMergesLocal(docs, numMerges = 1000)
    println(f"LOCAL_EXHAUST: ${m.length} merges (cnt>=2 exhausted) in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    val m1k = graft.operators.Bpe.learnMergesLocal(docs, numMerges = 1000, minPairCount = 1)
    println(f"LOCAL_1000: ${m1k.length} merges in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    println("PREFIX_CONSISTENT: " + (m1k.take(m.length) == m))
    val t2 = System.nanoTime()
    val d = graft.operators.Bpe.learnMerges(docs, numMerges = 89, batchSize = 8)
    println(f"DIST_EXHAUST_B8: ${d.length} merges in ${(System.nanoTime() - t2) / 1e9}%.2f s")
    println("DIST_MATCHES_LOCAL: " + (d == m))
    spark.stop()
  }
}
// appended stress runner
object BpeStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("bpe-stress")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 200k distinct 32-char hex words: a rich pair structure that does
    // not exhaust — exercises 1000+ genuine merges.
    val synth = spark.range(200000)
      .selectExpr("cast(id % 1000 as string) AS doc", "md5(cast(id as string)) AS line")
    val t0 = System.nanoTime()
    val m = graft.operators.Bpe.learnMergesLocal(synth, numMerges = 1000)
    println(f"STRESS_LOCAL_1000: ${m.length} merges over 200k distinct words in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    val m32k = graft.operators.Bpe.learnMergesLocal(synth, numMerges = 32000)
    println(f"STRESS_LOCAL_32K: ${m32k.length} merges in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
