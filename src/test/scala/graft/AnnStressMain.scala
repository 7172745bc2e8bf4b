package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off 10x replication stress for the round-5 ANN tiers (BASELINE.md
// scale-stress table): the sf0.1 embedding table copied 10x (20k
// vectors) with a tiny per-copy perturbation on one dimension so copies
// are near- but not exact duplicates. Measures: PQ encode (map-only),
// flat ADC scan, IVF-PQ probe scan, and incremental index append vs
// full rebuild.
object AnnStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val n0 = base.count()
    val corpus = base.crossJoin(spark.range(10).toDF("copy"))
      .select((col("vec_id") * 10 + col("copy")).as("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i === 0, col("copy").cast("double") * 1e-3)
            .otherwise(lit(0.0))).as("embedding"))
    corpus.persist(); println("VECS: " + corpus.count() + s" (base $n0)")
    val queries = corpus.where(col("vec_id") < 5)

    var t0 = System.nanoTime()
    val codes = Similarity.pqEncode(corpus, stride = 250)
    println(f"PQ_ENCODE_10X: ${(System.nanoTime() - t0) / 1e9}%.1f s, rows=${codes.count()}")

    t0 = System.nanoTime()
    val adc = Similarity.pqAdcTopK(corpus, queries, kTop = 10, stride = 250)
    println(f"PQ_ADC_10X: ${(System.nanoTime() - t0) / 1e9}%.1f s, rows=${adc.count()}")

    t0 = System.nanoTime()
    val ivfpq = Similarity.ivfPqTopK(corpus, queries, kTop = 10,
      stride = 1000, nProbe = 2, pqStride = 250)
    println(f"IVFPQ_10X: ${(System.nanoTime() - t0) / 1e9}%.1f s, rows=${ivfpq.count()}")

    val tmp = java.nio.file.Files.createTempDirectory("graft-ann-stress").toString
    val hist = corpus.where(col("vec_id") < 18000)
    val delta = corpus.where(col("vec_id") >= 18000)
    t0 = System.nanoTime()
    Similarity.buildAnnIndex(hist, s"$tmp/idx", stride = 1000)
    val tBuild = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    Similarity.appendAnnIndex(spark, delta, s"$tmp/idx")
    val tAppend = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val hits = Similarity.searchAnnIndexed(spark, s"$tmp/idx", queries,
      k = 10, nProbe = 2).count()
    println(f"INDEX_10X: build $tBuild%.1f s (18k vecs), append $tAppend%.1f s " +
      f"(2k vecs), probe ${(System.nanoTime() - t0) / 1e9}%.1f s, rows=$hits")
    spark.stop()
  }
}
