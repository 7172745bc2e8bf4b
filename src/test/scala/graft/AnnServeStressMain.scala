package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off 10x stress for STREAMING ANN QUERY SERVING (round 11's new
// surface — stressed in the round it shipped, the "no new surface
// without a stress row" convention): corpus = sf0.1 embeddings x10
// (re-keyed, independently scaled so every copy is a distinct vector
// and cell sizes actually grow 10x), materialized IVF index built
// once, then the serve state split measured: build-once, load, and
// per-micro-batch serve cost at 1x vs 10x cell sizes — the number
// that says whether a probe's row-local candidate scan survives the
// corpus growing under a FROZEN stride. Parity with the batch probe
// is asserted at both scales (not eyeballed), including after a
// delete folded at state build.
object AnnServeStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    // x10: each copy re-keyed and scaled by a copy-specific factor —
    // distinct values, same directions (cells grow 10x in MEMBERS, the
    // load the per-cell candidate arrays must carry)
    def corpusOf(copies: Int) = base
      .crossJoin(spark.range(copies).toDF("copy"))
      .select((col("vec_id") * 16 + col("copy")).as("vec_id"),
        transform(col("embedding"),
          x => x * (lit(1.0) + col("copy") * lit(0.001))).as("embedding"))
      .persist()
    val queries = base.where(col("vec_id") < 32)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val qRows = queries.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toIndexedSeq

    def runScale(tag: String, copies: Int): Unit = {
      val corpus = corpusOf(copies)
      println(s"CORPUS_$tag: ${corpus.count()} vectors")
      val idx = java.nio.file.Files.createTempDirectory(s"ann_serve_stress_$tag").toString
      var t0 = System.nanoTime()
      Similarity.buildAnnIndex(corpus, idx, stride = 100)
      println(f"INDEX_BUILD_$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      // fold a delete so the state build exercises the anti-join arm
      Similarity.deleteFromAnnIndex(
        spark, corpus.where(pmod(col("vec_id"), lit(16)) === 7), idx)

      t0 = System.nanoTime()
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"ann_serve_state_$tag").toString
      graft.streaming.StreamingOps.annServeState(spark, idx)
        .write.mode("overwrite").parquet(stateDir)
      println(f"STATE_BUILD_$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        "(per-cell candidate arrays, tombstones folded, written once)")
      t0 = System.nanoTime()
      val state = spark.read.parquet(stateDir).persist()
      println(f"STATE_LOAD_$tag: ${state.count()}%,d state rows in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")

      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      val name = s"ann_serve_stress_$tag"
      val q = graft.streaming.StreamingOps.annSearchStream(
          input.toDF().toDF("vec_id", "embedding"), state, k = 10, nProbe = 2)
        .writeStream.format("memory").queryName(name)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
      val nBatches = 4
      qRows.grouped((qRows.length + nBatches - 1) / nBatches)
        .zipWithIndex.foreach { case (chunk, i) =>
          val tb = System.nanoTime()
          input.addData(chunk: _*)
          q.processAllAvailable()
          println(f"SERVE_BATCH_${tag}_$i: ${chunk.length} queries in " +
            f"${(System.nanoTime() - tb) / 1e9}%.2f s")
        }
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      q.stop()
      // parity with the batch probe over the SAME index — asserted, and
      // the tombstoned slice must be absent from both
      val batch = Similarity.searchAnnIndexed(spark, idx, queries, k = 10, nProbe = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      require(got == batch,
        s"stream/batch diverged at $tag: ${got.size} vs ${batch.size} rows")
      require(got.nonEmpty && !got.exists(_._2 % 16 == 7),
        s"tombstoned ids served at $tag")
      println(s"PARITY_$tag: ${got.size} result rows, stream == batch, deletes folded")
      state.unpersist(); corpus.unpersist()
    }

    runScale("1X", 1)
    runScale("10X", 10)
    spark.stop()
  }
}
