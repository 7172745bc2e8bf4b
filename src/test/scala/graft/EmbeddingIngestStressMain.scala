package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off 10x stress for the EMBEDDING-side daily ingest (q225's
// family — the only round-10 surface without a stress row;
// BASELINE.md scale-stress table): history = sf0.1 embeddings salted
// x10 (positive per-copy scaling, so every copy keeps cosine 1.0 and
// the SAME hyperplane buckets as its base — dense near-dup families)
// plus ONE degenerate direction with 6,000 extra copies (> the 5,000
// hot-bucket bound, so its (t, bucket) rows drop WHOLE in all four
// tables — the guard's skip mass made observable). Delta mixes all
// four stages by construction:
//   - vec_id % 3 == 0: verbatim copy-0 values      -> dropped_exact
//   - vec_id % 3 == 1: an 11th salted copy (x1.010) -> dropped_near_dup
//     (EXCEPT the degenerate direction, whose hot buckets skip it —
//     the declared recall trade, asserted observable below)
//   - vec_id % 3 == 2: alternate-sign flip          -> kept
//   - 50 scaled copies of the (history-disjoint) bench slice
//                                                   -> dropped_contaminated
// Measures: 1x vs 10x composed-ingest wall clock (the linear-ish
// verdict), per-stage routing asserted not eyeballed, the hot-bucket
// skip mass, and the streaming twin's prebuilt-state serve cost vs
// the derive-per-start path.
object EmbeddingIngestStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val histBase = base.where(col("vec_id") >= 100)
    val bench = base.where(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"))

    // salted copy c of a base vector: x * (1 + c/1000) — positive
    // scaling keeps cosine 1.0 and every LSH bucket, changes the values
    def salted(src: org.apache.spark.sql.DataFrame, copies: Int) = src
      .crossJoin(spark.range(copies).toDF("copy"))
      .select((col("vec_id") * 16 + col("copy")).as("vec_id"),
        transform(col("embedding"),
          x => x * (lit(1.0) + col("copy") * lit(0.001))).as("embedding"))
    // the degenerate direction: nCopies more of base vec_id 100 —
    // multipliers in (1, 1.006], disjoint from the delta classes' x1.0
    // (exact) and x1.010 (near-dup) values
    def degenerate(n: Int) = base.where(col("vec_id") === 100)
      .crossJoin(spark.range(n).toDF("copy"))
      .select((lit(400000L) + col("copy")).as("vec_id"),
        transform(col("embedding"),
          x => x * (lit(1.0) + (col("copy") + 1) * lit(0.000001))).as("embedding"))

    val hist1 = salted(histBase, 1).unionByName(degenerate(600)).persist()
    val hist10 = salted(histBase, 10).unionByName(degenerate(6000)).persist()
    val third = pmod(col("vec_id"), lit(3))
    val delta = histBase
      .select(col("vec_id"),
        when(third === 0, col("embedding").cast("array<double>"))      // exact
          .when(third === 1, transform(col("embedding"), x => x * lit(1.010))) // near-dup
          .otherwise(transform(col("embedding"),                       // novel
            (x, j) => when(j % 2 === 0, x).otherwise(-x))).as("embedding"))
      .unionByName(bench                                               // contaminated
        .select((col("vec_id") + 2000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.005)).as("embedding")))
      .persist()
    val nDelta = delta.count()
    val bits = Similarity.deriveLshBits(hist10.count())
    println(s"HIST_1X: ${hist1.count()}  HIST_10X: ${hist10.count()}  " +
      s"DELTA: $nDelta  BITS: $bits")

    def stagesOf(hist: org.apache.spark.sql.DataFrame): (Map[String, Long], Double) = {
      val t0 = System.nanoTime()
      val m = Caching.scoped {
        Similarity.embeddingIngest(delta, hist, bench, bits = bits)
          .groupBy(col("stage")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      spark.catalog.clearCache()
      (m, (System.nanoTime() - t0) / 1e9)
    }
    val (st1, t1) = stagesOf(hist1)
    println(f"INGEST_1X: $t1%.1f s, stages=$st1")
    val (st10, t10) = stagesOf(hist10)
    println(f"INGEST_10X: $t10%.1f s, stages=$st10  (${t10 / t1}%.2fx time for 10x history)")

    // ── routing asserted, not eyeballed ─────────────────────────────────
    require(st10.values.sum == nDelta, s"log must cover every arrival: $st10")
    val nExact = histBase.where(third === 0).count()
    val nNd = histBase.where(third === 1).count()
    val nNovel = histBase.where(third === 2).count()
    require(st10("dropped_exact") == nExact,
      s"exact screen: ${st10("dropped_exact")} vs planted $nExact")
    // the degenerate direction's arrival (vec_id 100, class 1) is the
    // ONE near-dup the hot-bucket guard skips at 10x — it falls through
    // to kept (its flip-free copy scores ~0 against bench)
    require(st10("dropped_near_dup") == nNd - 1,
      s"near-dup screen: ${st10("dropped_near_dup")} vs planted $nNd minus 1 hot-skipped")
    require(st10("dropped_contaminated") == 50,
      s"contamination screen: ${st10("dropped_contaminated")} vs 50 planted")
    require(st10("kept") == nNovel + 1, s"kept: ${st10("kept")}")
    // at 1x the degenerate family (600 copies) is under the bound — the
    // guard has not kicked in yet, all planted near-dups match
    require(st1("dropped_near_dup") == nNd,
      s"1x near-dup screen: ${st1("dropped_near_dup")} vs planted $nNd")

    // ── the skip mass, observable (the lshSkippedBuckets convention) ───
    val bucketRows = hist10
      .select(explode(org.apache.spark.sql.functions.array(
        (0 until 4).map(t => struct(lit(t.toLong).as("t"),
          Similarity.lshTableBucketCol(
            col("embedding").cast("array<double>"), t, bits).as("bucket"))): _*)).as("tb"))
      .groupBy(col("tb.t").as("t"), col("tb.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val hot = bucketRows.where(col("n") > Similarity.MaxPairBucket)
      .agg(coalesce(sum(col("n")), lit(0L)).as("rows"), count(lit(1)).as("buckets"))
      .head()
    println(s"HOT_HISTORY_BUCKETS_10X: ${hot.getLong(1)} buckets, " +
      s"${hot.getLong(0)} band rows skipped whole " +
      s"(bound ${Similarity.MaxPairBucket})")
    require(hot.getLong(1) >= 4L,
      "the degenerate direction must be hot in every table")

    // ── streaming twin: prebuilt ONE-artifact state vs derive-per-start ─
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val deltaRows = delta.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toIndexedSeq
    val nBatches = 5

    def runStream(name: String,
        mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): (Map[String, Long], Double) = {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      val t0 = System.nanoTime()
      val q = mk(input.toDF().toDF("vec_id", "embedding"))
        .writeStream.format("memory").queryName(name)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .start()
      deltaRows.grouped((deltaRows.length + nBatches - 1) / nBatches)
        .foreach { chunk => input.addData(chunk: _*); q.processAllAvailable() }
      val m = spark.table(name).groupBy(col("stage"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      q.stop()
      (m, (System.nanoTime() - t0) / 1e9)
    }

    var t0 = System.nanoTime()
    val stateDir = java.nio.file.Files
      .createTempDirectory("emb_ingest_state_10x").toString
    graft.streaming.StreamingOps.embeddingIngestState(hist10, bits = bits)
      .write.mode("overwrite").parquet(stateDir)
    println(f"STATE_BUILD_10X: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      "(exact index + near-dup index + meta, written once per snapshot)")
    t0 = System.nanoTime()
    val state = spark.read.parquet(stateDir).persist()
    println(f"STATE_LOAD_10X: ${state.count()}%,d state rows in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    val (fromState, tServe) = runStream("emb_stress_from_state",
      s => graft.streaming.StreamingOps.embeddingIngestScreenFromState(
        s, state, bench))
    println(f"STREAM_FROM_STATE_10X: $tServe%.1f s over $nBatches batches, stages=$fromState")
    require(fromState == st10,
      s"stream decision log diverged from batch: $fromState vs $st10")

    val (derived, tDerive) = runStream("emb_stress_derived",
      s => graft.streaming.StreamingOps.embeddingIngestScreen(
        s, hist10, bench, bits = bits))
    println(f"STREAM_DERIVE_10X: $tDerive%.1f s over $nBatches batches " +
      f"(index re-derived at stream start), stages=$derived")
    require(derived == st10,
      s"derived-state stream diverged from batch: $derived vs $st10")
    println(f"PREBUILT_VS_DERIVE: ${tDerive / tServe}%.2fx")
    spark.stop()
  }
}
