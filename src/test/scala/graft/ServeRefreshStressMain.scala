package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/**
 * Measures the O(delta) claim of the four-tier serve REFRESH at stress
 * scale: corpus = sf0.1 embeddings ×50 salted copies (~100k vectors,
 * dim 64), delta ≈ 10% of base — the daily-growth shape. Per tier
 * (float / pq / hamming / int8), three timed arms over parquet-backed
 * artifacts (the artifact convention):
 *   1. BUILD-ONCE:   annServe*State(base index)        → artifact A
 *   2. REFRESH:      refreshAnnServeState(A) post-append
 *   3. FULL REBUILD: annServe*State(grown index)
 * plus the law the spec pins at unit scale, re-asserted here at stress
 * scale: the serving screen over the REFRESHED artifact is
 * row-identical to the screen over the REBUILT one, and
 * serveStateStats agrees on the member population. Delta ids sit past
 * the PQ seed ceiling (k·pqStride = 400), so the frozen-codebook patch
 * and the rebuild derive the same codebook. Results land in
 * BASELINE.md.
 */
object ServeRefreshStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    def timed[T](label: String)(body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-46s ${sec}%8.2f s")
      (r, sec)
    }
    def tmp(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString

    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    // ids: base = vec_id*50 + copy(0..44) — yields EXACTLY the 16 PQ
    // codebook seeds {0,25,…,375} (ids ≡ 0 mod 25 below k·pqStride =
    // 400) plus the stride-100 coarse seeds; delta = 500000 + vec_id*50
    // + copy(45..49) — copies 45..49 are ≢ 0 (mod 25), so no delta row
    // sits at a seed position and the frozen-codebook patch is exact
    val base = e.crossJoin(spark.range(45).toDF("copy"))
      .select((col("vec_id") * 50 + col("copy")).as("vec_id"),
        col("embedding"), col("label"))
      .persist()
    val delta = e.crossJoin(spark.range(45, 50).toDF("copy"))
      .select((lit(500000L) + col("vec_id") * 50 + col("copy")).as("vec_id"),
        col("embedding"), col("label"))
      .persist()
    println(s"base=${base.count()} delta=${delta.count()}")

    def roundtrip(df: DataFrame, prefix: String): DataFrame = {
      val dir = tmp(prefix)
      df.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    def screenRows(tier: String, state: DataFrame, q: DataFrame) =
      (tier match {
        case "pq" => StreamingOps.annSearchStreamPq(q, state, 10, 2)
        case "hamming" => StreamingOps.annSearchStreamHamming(q, state, 10, 2)
        case "int8" => StreamingOps.annSearchStreamInt8(q, state, 10, 2)
        case _ => StreamingOps.annSearchStream(q, state, 10, 2)
      }).collect().map(_.toSeq).toSet

    for (tier <- Seq("float", "pq", "hamming", "int8")) {
      val idx = tmp(s"serve_stress_${tier}_")
      Similarity.buildAnnIndex(
        base.select(col("vec_id"), col("embedding")), idx, stride = 100)
      def build() = tier match {
        case "pq" => StreamingOps.annServePqState(spark, idx)
        case "hamming" => StreamingOps.annServeHammingState(spark, idx)
        case "int8" => StreamingOps.annServeInt8State(spark, idx)
        case _ => StreamingOps.annServeState(spark, idx)
      }
      val (st0, _) = timed(s"$tier  serve build+write (base)") {
        roundtrip(build(), s"serve_stress_st_${tier}_")
      }
      Similarity.appendAnnIndex(spark,
        delta.select(col("vec_id"), col("embedding")), idx)
      val (refreshed, tRefresh) = timed(s"$tier  REFRESH post-append") {
        roundtrip(StreamingOps.refreshAnnServeState(spark, idx, st0),
          s"serve_stress_rf_${tier}_")
      }
      val (rebuilt, tRebuild) = timed(s"$tier  FULL REBUILD (grown)") {
        roundtrip(build(), s"serve_stress_rb_${tier}_")
      }
      StreamingOps.requireServeStateCurrent(spark, idx, refreshed)
      val q = base.limit(3).select(col("vec_id"), col("embedding"))
      assert(screenRows(tier, refreshed, q) == screenRows(tier, rebuilt, q),
        s"$tier: refreshed screen != rebuilt screen")
      val mRefreshed = StreamingOps.serveStateStats(refreshed)
        .head().getAs[Long]("n_members")
      val mRebuilt = StreamingOps.serveStateStats(rebuilt)
        .head().getAs[Long]("n_members")
      assert(mRefreshed == mRebuilt,
        s"$tier: member population $mRefreshed != $mRebuilt")
      println(f"$tier%-8s refresh/rebuild = ${tRefresh / tRebuild}%.2f× " +
        f"(members=$mRefreshed)")
    }
    spark.stop()
  }
}
