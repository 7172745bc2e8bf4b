package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off 10x stress for the COMPOSED daily-ingest bookend
// (BASELINE.md scale-stress table): history = sf0.1 docs salted x10
// (50k docs, dense near-dup families), delta = 5k docs in three
// deliberate classes — ~1/3 verbatim copies of history rows (the exact
// screen's prey), ~1/3 one extra salted copy of a history family (the
// near-dup screen's prey), ~1/3 genuinely novel synthetic lines (must
// reach the split stage). Measures the COMPOSED Pipeline.dailyIngest
// against the three component operators run separately (each paying
// its own shingle/band derivation over the same inputs) — the number
// the shared-derivation claim stands on — and asserts the decision
// log routes every class to its stage.
object IngestStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Pipeline}

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val hist = base.crossJoin(spark.range(10).toDF("copy"))
      .select((col("doc_id") * 16 + col("copy")).as("doc"),
        concat(col("text"), lit(" salt"), col("copy")).as("line"))
      .persist()
    val third = when(pmod(col("doc_id"), lit(3)) === 0, 0)
      .when(pmod(col("doc_id"), lit(3)) === 1, 1).otherwise(2)
    val delta = base
      .select((col("doc_id") * 16 + 10).as("doc"),
        when(third === 0, concat(col("text"), lit(" salt0")))        // exact dup
          .when(third === 1, concat(col("text"), lit(" salt10")))    // near-dup
          .otherwise(concat(lit("novel zq"), col("doc_id"),          // novel
            lit(" completely fresh arrival with private vocabulary "),
            col("doc_id"))).as("line"))
      .persist()
    println(s"HIST: ${hist.count()} DELTA: ${delta.count()}")

    // COMPONENTS, each rebuilding its own derivations
    var t0 = System.nanoTime()
    val sep = Caching.scoped {
      val surv = Dedup.exactDedupAgainstBloom(delta, hist)
      val nSurv = surv.count()
      val nNd = Dedup.minhashNearDupsAgainst(surv, hist)
        .select(col("doc")).distinct().count()
      val hsp = Dedup.leakageSafeSplit(hist, valPerMille = 100)
      val nSplit = Dedup.leakageSafeSplitAgainst(
        delta, hist, hsp.select(col("doc"), col("split")),
        valPerMille = 100).count()
      (nSurv, nNd, nSplit)
    }
    spark.catalog.clearCache()
    val tSep = (System.nanoTime() - t0) / 1e9
    println(f"SEPARATE_10X: $tSep%.1f s (surv=${sep._1}, nd=${sep._2}, split=${sep._3})")

    // COMPOSED decision log over shared derivations
    t0 = System.nanoTime()
    val stages = Caching.scoped {
      Pipeline.dailyIngest(delta, hist)
        .groupBy(col("stage")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    spark.catalog.clearCache()
    val tComp = (System.nanoTime() - t0) / 1e9
    println(f"COMPOSED_10X: $tComp%.1f s, stages=$stages")

    val total = stages.values.sum
    require(total == delta.count(),
      s"decision log must cover every delta doc: $total")
    // every class routed: the verbatim third dies at the exact screen,
    // the salted third at the near-dup screen, the novel third is kept
    require(stages.getOrElse("dropped_exact", 0L) > 1500L,
      s"exact screen missed its prey: $stages")
    require(stages.getOrElse("dropped_near_dup", 0L) > 1500L,
      s"near-dup screen missed its prey: $stages")
    require(stages.getOrElse("kept", 0L) > 1500L,
      s"novel arrivals not kept: $stages")
    println(f"COMPOSED_VS_SEPARATE: ${tSep / tComp}%.2fx")

    // ── streaming twin at the same scale: the PRODUCTION shape ─────────
    // (ONE persisted state artifact — the round-9 49.4 s history-prep
    // line split into BUILD-ONCE vs LOAD-AND-SERVE: raw history is
    // scanned only while building/writing the state; the stream start
    // reads the artifact back and never touches historyDocs) — and
    // pins the stage counts against the batch decision log above.
    t0 = System.nanoTime()
    val hsp2 = graft.Caching.scoped {
      val f = Dedup.leakageSafeSplit(hist, valPerMille = 100)
        .select(col("doc"), col("split")).persist()
      f.count(); f
    }
    val stateDir = java.nio.file.Files
      .createTempDirectory("ingest_state_10x").toString
    graft.streaming.StreamingOps.ingestState(hist, hsp2)
      .write.mode("overwrite").parquet(stateDir)
    println(f"STATE_BUILD_10X: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      "(split fit + index + fp frame + bloom, written once per snapshot)")

    t0 = System.nanoTime()
    val state = spark.read.parquet(stateDir).persist()
    println(f"STATE_LOAD_10X: ${state.count()}%,d state rows in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s (load-and-serve — raw " +
      "history untouched from here on)")

    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.ingestScreenFromState(
        input.toDF().toDF("doc", "line"), state)
      .writeStream.format("memory").queryName("ingest_stream_10x")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    val deltaRows = delta.collect().map(r => (r.getLong(0), r.getString(1)))
    val nBatches = 5
    deltaRows.grouped((deltaRows.length + nBatches - 1) / nBatches)
      .zipWithIndex.foreach { case (chunk, i) =>
        val tb = System.nanoTime()
        input.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
        println(f"STREAM_BATCH_$i%d: ${chunk.length}%,d docs in " +
          f"${(System.nanoTime() - tb) / 1e9}%.1f s")
      }
    val streamStages = spark.table("ingest_stream_10x")
      .groupBy(col("stage")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    println(s"STREAM_STAGES_10X: $streamStages")
    // the live screen must route every class exactly like the batch log
    require(streamStages == stages,
      s"stream decision log diverged from batch: $streamStages vs $stages")
    hsp2.unpersist(); state.unpersist()
    spark.stop()
  }
}
