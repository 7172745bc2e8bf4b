package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/**
 * Measures the O(delta) claim of the round-12 screen-state EXTENSION
 * tier at stress scale (the IngestStressMain corpus): history = sf0.1
 * documents ×10 salted copies, delta ≈ history/10 — the daily-growth
 * shape. Three timed arms per tier:
 *   1. BUILD-ONCE:    ingestState(history)            → artifact A
 *   2. EXTEND:        extendIngestState(A, delta)     → artifact B
 *   3. FULL REBUILD:  ingestState(history ∪ delta)    → artifact C
 * plus the equivalence audit the spec pins at unit scale, re-asserted
 * here at stress scale through the artifacts' own identities: B and C
 * carry the SAME meta row (the composed checksum must equal the fresh
 * scan's — 60-bit sums over ~66k rows, digit for digit) and the same
 * per-section row counts. A second arm runs the embedding tier.
 * Results land in BASELINE.md.
 */
object ExtendStateStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-42s ${sec}%8.2f s")
      (r, sec)
    }
    def tmp(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString
    def sectionCounts(st: DataFrame): Map[String, Long] =
      st.groupBy(col("section")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    def metaOf(st: DataFrame, metaCol: String): String =
      st.where(col("section") === "meta").select(col(metaCol))
        .head().getString(0)

    // ── text tier ───────────────────────────────────────────────────
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val hist = base.crossJoin(spark.range(10).toDF("copy"))
      .select((col("doc_id") * 16 + col("copy")).as("doc"),
        concat(col("text"), lit(" salt"), col("copy")).as("line"))
      .persist()
    val delta = base
      .select((col("doc_id") * 16 + 10).as("doc"),
        concat(col("text"), lit(" growth"), col("doc_id")).as("line"))
      .persist()
    def splitsOf(d: DataFrame) = d.select(col("doc"), lit("train").as("split"))
    println(s"TEXT  hist=${hist.count()} delta=${delta.count()}")

    val dirA = tmp("ext_stress_a")
    val (_, tBuild) = timed("ingestState(history) build+write") {
      StreamingOps.ingestState(hist, splitsOf(hist))
        .write.mode("overwrite").parquet(dirA)
    }
    val dirB = tmp("ext_stress_b")
    val (_, tExtend) = timed("extendIngestState(A, delta) +write") {
      StreamingOps.extendIngestState(
          spark.read.parquet(dirA), delta, splitsOf(delta))
        .write.mode("overwrite").parquet(dirB)
    }
    val union = hist.unionByName(delta).persist()
    val dirC = tmp("ext_stress_c")
    val (_, tRebuild) = timed("ingestState(history ∪ delta) rebuild") {
      StreamingOps.ingestState(union, splitsOf(union))
        .write.mode("overwrite").parquet(dirC)
    }
    val b = spark.read.parquet(dirB)
    val c = spark.read.parquet(dirC)
    val (metaB, metaC) = (metaOf(b, "fp"), metaOf(c, "fp"))
    require(metaB == metaC,
      s"extended meta diverged from rebuilt meta:\n  B: $metaB\n  C: $metaC")
    val (cntB, cntC) = (sectionCounts(b), sectionCounts(c))
    require(cntB == cntC,
      s"extended section counts diverged: $cntB vs $cntC")
    StreamingOps.requireScreenStateHistoryCurrent(b, union)
    println(f"TEXT  extend/rebuild = ${tExtend / tRebuild}%.2fx " +
      f"(build $tBuild%.1f, extend $tExtend%.1f, rebuild $tRebuild%.1f); " +
      s"meta identical, counts $cntB")

    // ── embedding tier ──────────────────────────────────────────────
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val ehist = e.crossJoin(spark.range(10).toDF("copy"))
      .select((col("vec_id") * 16 + col("copy")).as("vec_id"),
        col("embedding")).persist()
    val edelta = e
      .select((col("vec_id") * 16 + 10).as("vec_id"), col("embedding"))
      .persist()
    println(s"EMB   hist=${ehist.count()} delta=${edelta.count()}")
    val eDirA = tmp("ext_stress_ea")
    val (_, etBuild) = timed("embeddingIngestState(history) build") {
      // ×10 identical copies pile every vector's buckets ×10 — scale
      // the guard to the declared duplication (the BASELINE.md rule)
      StreamingOps.embeddingIngestState(ehist,
          maxBucketSize = graft.operators.Similarity.MaxPairBucket * 11)
        .write.mode("overwrite").parquet(eDirA)
    }
    val eDirB = tmp("ext_stress_eb")
    val (_, etExtend) = timed("extendEmbeddingIngestState(A, delta)") {
      StreamingOps.extendEmbeddingIngestState(
          spark.read.parquet(eDirA), edelta)
        .write.mode("overwrite").parquet(eDirB)
    }
    val eUnion = ehist.unionByName(edelta).persist()
    val eDirC = tmp("ext_stress_ec")
    val (_, etRebuild) = timed("embeddingIngestState(union) rebuild") {
      StreamingOps.embeddingIngestState(eUnion,
          maxBucketSize = graft.operators.Similarity.MaxPairBucket * 11)
        .write.mode("overwrite").parquet(eDirC)
    }
    val eb = spark.read.parquet(eDirB)
    val ec = spark.read.parquet(eDirC)
    require(metaOf(eb, "meta") == metaOf(ec, "meta"),
      "embedding extended meta diverged from rebuilt meta")
    val (ecntB, ecntC) = (sectionCounts(eb), sectionCounts(ec))
    require(ecntB == ecntC,
      s"embedding extended section counts diverged: $ecntB vs $ecntC")
    StreamingOps.requireScreenStateHistoryCurrent(eb, eUnion)
    println(f"EMB   extend/rebuild = ${etExtend / etRebuild}%.2fx " +
      f"(build $etBuild%.1f, extend $etExtend%.1f, rebuild $etRebuild%.1f); " +
      s"meta identical, counts $ecntB")

    spark.stop()
  }
}
