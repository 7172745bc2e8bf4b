package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off 10x stress for the WINDOW-level media near-dup tier
// (BASELINE.md scale-stress table): history = sf0.1 documents encoded
// as real WAV audio (one asset per doc; x10 = salted copies), delta =
// 500 arrivals in two deliberate classes — half REUSE a window-aligned
// span of a history clip (the segment-reuse prey the tier exists for),
// half are genuinely novel. Measures the PRODUCTION state split for
// the streaming screen (STATE_BUILD once per snapshot vs per-batch
// serve off the loaded artifact) at 1x and 10x history, pins the
// stream rollup row-identical to the batch operator at both scales,
// and records the batch operator's own cost for reference.
object MediaWindowStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.multimodal.Multimodal
    import graft.streaming.StreamingOps
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .persist()
    base.count()

    for (scale <- Seq(1, 10)) {
      // history: every doc an AUDIO asset (id ≡ 1 mod 3); salted copies
      // perturb the tail so copies are near- but not byte-identical
      val histDocs = base.crossJoin(spark.range(scale).toDF("copy"))
        .select(((col("doc_id") * 16 + col("copy")) * 3 + 1).cast("string")
            .as("doc"),
          concat(col("text"), lit(" salt"), col("copy")).as("line"))
      var t0 = System.nanoTime()
      val histWindows = Caching.persist(Multimodal.audioAHashWindows(
        Multimodal.encodeAssets(histDocs), windowSamples = 64))
      val nHistWindows = histWindows.count()
      println(f"HIST_WINDOWS_${scale}X: $nHistWindows%,d window rows " +
        f"(hash build ${(System.nanoTime() - t0) / 1e9}%.1f s)")

      // delta: 500 arrivals — half reuse the first 3 windows (192
      // samples) of a history clip verbatim, half are novel
      val deltaDocs = base.where(col("doc_id") < 500)
        .select(((col("doc_id") * 16 + 11) * 3 + 1).cast("string").as("doc"),
          when(pmod(col("doc_id"), lit(2)) === 0,
            concat(substring(concat(col("text"), lit(" salt0")), 1, 192),
              lit(" novel continuation zq"), col("doc_id")))
            .otherwise(concat(lit("entirely novel arrival zv"), col("doc_id"),
              lit(" with private vocabulary nothing shared at all "),
              col("doc_id"))).as("line"))
      val deltaWindows = Caching.persist(Multimodal.audioAHashWindows(
        Multimodal.encodeAssets(deltaDocs), windowSamples = 64))
      deltaWindows.count()

      // batch reference: the incremental window operator end to end
      t0 = System.nanoTime()
      val batch = Multimodal.ahashWindowNearDupAgainst(
          deltaWindows, histWindows, maxDist = 6)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      println(f"BATCH_AGAINST_${scale}X: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"(${batch.size}%,d matched arrivals)")

      // PRODUCTION state split: build+write once per snapshot…
      t0 = System.nanoTime()
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"media_window_state_${scale}x").toString
      // allowSaturated: the 10x arm DELIBERATELY builds the saturated
      // 7x8 state to measure the recall collapse the guard now blocks
      StreamingOps.mediaWindowScreenState(histWindows, allowSaturated = true)
        .write.mode("overwrite").parquet(stateDir)
      println(f"STATE_BUILD_${scale}X: ${(System.nanoTime() - t0) / 1e9}%.1f s")

      // …then load-and-serve: raw history untouched from here on
      t0 = System.nanoTime()
      val state = spark.read.parquet(stateDir).persist()
      println(f"STATE_LOAD_${scale}X: ${state.count()}%,d state rows in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")

      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long)]
      val q = StreamingOps.mediaWindowNearDupScreenFromState(
          input.toDF().toDF("asset_id", "window_id", "ahash"), state)
        .writeStream.format("memory").queryName(s"media_stream_${scale}x")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .start()
      val deltaRows = deltaWindows
        .select(col("asset_id"), col("window_id"), col("ahash")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val nBatches = 5
      deltaRows.grouped((deltaRows.length + nBatches - 1) / nBatches)
        .zipWithIndex.foreach { case (chunk, i) =>
          val tb = System.nanoTime()
          input.addData(chunk.toIndexedSeq: _*)
          q.processAllAvailable()
          println(f"STREAM_BATCH_${scale}X_$i%d: ${chunk.length}%,d window " +
            f"rows in ${(System.nanoTime() - tb) / 1e9}%.1f s")
        }
      val pairs = spark.table(s"media_stream_${scale}x").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      q.stop()
      // asset verdict = plain rollup over the emitted pairs — must be
      // row-identical to the batch operator at this scale
      val rollup = pairs.groupBy(p => (p._1, p._3)).map { case ((a, m), g) =>
        (a, m, g.map(_._5).min, g.size.toLong)
      }.groupBy(_._1).map { case (_, vs) => vs.minBy(v => (v._3, v._2)) }.toSet
      require(rollup == batch,
        s"stream rollup diverged from batch at ${scale}x: " +
          s"${rollup.size} vs ${batch.size}")
      println(s"STREAM_ROLLUP_${scale}X: identical to batch " +
        s"(${rollup.size} verdicts)")

      // ── the WIDE-layout escape hatch at the same scale ───────────────
      // 7×8 banding has 1,792 possible bucket keys; at 10x the window
      // volume saturates the key space and the hot-bucket guard drops
      // most buckets WHOLE (answer-invariantly on both engines — but
      // recall collapses). 4×14 banding spreads the same rows over
      // 65,536 keys at the price of maxDist ≤ 3 — and the guard BOUND
      // scales with the known duplication factor (10 salted copies pile
      // identical hashes into one bucket; a bound sized for unique
      // corpora would drop exactly the reuse mass the tier exists to
      // find). The reuse class is hamming-0, so it must recover fully.
      val wideBound = 2000 * scale
      t0 = System.nanoTime()
      val batchWide = Multimodal.ahashWindowNearDupAgainst(
          deltaWindows, histWindows, maxDist = 3,
          maxBucketSize = wideBound, nBands = 4, bandBits = 14)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      println(f"BATCH_WIDE_${scale}X: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"(${batchWide.size}%,d matched arrivals)")
      t0 = System.nanoTime()
      val wideDir = java.nio.file.Files
        .createTempDirectory(s"media_window_state_wide_${scale}x").toString
      StreamingOps.mediaWindowScreenState(histWindows,
          maxBucketDocs = wideBound, nBands = 4, bandBits = 14)
        .write.mode("overwrite").parquet(wideDir)
      val wideState = spark.read.parquet(wideDir).persist()
      println(f"STATE_BUILD_WIDE_${scale}X: ${wideState.count()}%,d state " +
        f"rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val inputW = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long)]
      val qw = StreamingOps.mediaWindowNearDupScreenFromState(
          inputW.toDF().toDF("asset_id", "window_id", "ahash"), wideState,
          maxDist = 3)
        .writeStream.format("memory").queryName(s"media_stream_wide_${scale}x")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .start()
      deltaRows.grouped((deltaRows.length + nBatches - 1) / nBatches)
        .zipWithIndex.foreach { case (chunk, i) =>
          val tb = System.nanoTime()
          inputW.addData(chunk.toIndexedSeq: _*)
          qw.processAllAvailable()
          println(f"STREAM_BATCH_WIDE_${scale}X_$i%d: ${chunk.length}%,d " +
            f"window rows in ${(System.nanoTime() - tb) / 1e9}%.1f s")
        }
      val pairsW = spark.table(s"media_stream_wide_${scale}x").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      qw.stop()
      val rollupW = pairsW.groupBy(p => (p._1, p._3)).map { case ((a, m), g) =>
        (a, m, g.map(_._5).min, g.size.toLong)
      }.groupBy(_._1).map { case (_, vs) => vs.minBy(v => (v._3, v._2)) }.toSet
      require(rollupW == batchWide,
        s"wide stream rollup diverged from batch at ${scale}x")
      println(s"STREAM_ROLLUP_WIDE_${scale}X: identical to batch " +
        s"(${rollupW.size} verdicts)")
      // the reuse class (250 hamming-0 arrivals) must be fully matched
      // under the wide layout at EVERY scale — the escape hatch works
      require(rollupW.size >= 250,
        s"reuse class under-matched on wide layout at ${scale}x: ${rollupW.size}")
      wideState.unpersist()
      state.unpersist(); histWindows.unpersist(); deltaWindows.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
