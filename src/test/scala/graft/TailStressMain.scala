package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off 10x scale stress for the two heaviest local-bench tails that
// had no BASELINE.md stress row (round-9 verdict item 6): q153c
// (hashed-cosine INCREMENTAL — delta probes history's inverted index)
// and q164 (per-source n-gram diversity). Each phase measures the same
// operator at 1x and 10x input and prints a linear-ish verdict row
// (time ratio vs the 10x work ratio); the q153c phase additionally
// observes the hot-bucket guard at 10x — candidate-mass accounting
// (sum over buckets of df_hist x df_delta, open vs cold) plus the
// answer contract (every delta doc finds exactly its own group's
// history docs through COLD buckets; the guarded-out stop-head mass
// contributes cos ~ 0.1 << tau, the regime where the guard is safe).
//
// Corpus shape: the HashedStressMain recipe — a 5-token stop-word head
// shared by EVERY doc over per-group private vocabularies, dims sized
// to the vocabulary (65 536). History = nGroups x 2 near-copies; delta
// = one further near-copy for every 4th group. At 10x the head buckets
// hold 20k+ docs (the quadratic the guard exists for) while private
// buckets hold ~2-3.
object TailStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Vocab}

    val dims = 65536
    val tau = 0.8
    val head = "the of and to in"

    def histOf(nGroups: Long) = spark.range(nGroups).toDF("g")
      .crossJoin(spark.range(2).toDF("c"))
      .select((col("g") * 2 + col("c")).as("doc"),
        concat(
          lit(head + " "),
          concat_ws(" ", flatten(transform(sequence(lit(0), lit(9)),
            i => transform(sequence(lit(0), i % 3),
              _ => concat(lit("w"), col("g"), lit("_"), i))))),
          when(col("c") === 1, concat(lit(" w"), col("g"), lit("_0")))
            .otherwise(lit(""))).as("line"))
    // delta: one more near-copy for every 4th group (ids offset so the
    // within-group check is pure arithmetic)
    def deltaOf(nGroups: Long) = spark.range(nGroups / 4).toDF("q")
      .select((col("q") * 4).as("g"))
      .select((col("g") + 100000000L).as("doc"),
        concat(
          lit(head + " "),
          concat_ws(" ", flatten(transform(sequence(lit(0), lit(9)),
            i => transform(sequence(lit(0), i % 3),
              _ => concat(lit("w"), col("g"), lit("_"), i))))),
          lit(" w"), col("g"), lit("_1")).as("line"))

    def runIncr(nGroups: Long, label: String): Double = {
      val hist = histOf(nGroups).persist()
      val delta = deltaOf(nGroups).persist()
      println(s"$label HIST: ${hist.count()} DELTA: ${delta.count()}")
      val t0 = System.nanoTime()
      val (nPairs, crossGroup) = Caching.scoped {
        val pairs = Dedup.hashedCosineAgainst(delta, hist, dims, tau,
            maxBucketDocs = 64L)
          .select(col("doc"), col("hist_doc")).collect()
        // delta doc d belongs to group g = d − 1e8; its history partners
        // are docs 2g and 2g+1 — any other match crossed groups
        (pairs.length.toLong,
          pairs.count(r => r.getLong(1) / 2 != r.getLong(0) - 100000000L))
      }
      val t = (System.nanoTime() - t0) / 1e9
      // every delta doc's group has 2 history members within tau through
      // its COLD private buckets; head-only similarity is ~0.1 << tau
      val expected = (nGroups / 4) * 2
      require(crossGroup == 0L, s"$label: $crossGroup cross-group pairs")
      require(nPairs == expected,
        s"$label: expected $expected within-group pairs, got $nPairs")
      println(f"INCR_$label: $t%.1f s, pairs=$nPairs")
      hist.unpersist(); delta.unpersist()
      t
    }

    // guard accounting at 10x: the candidate mass the cold screen skips
    def guardAccounting(nGroups: Long): Unit = Caching.scoped {
      val fh = Caching.persist(Dedup.hashedFeatures(histOf(nGroups), dims))
        .groupBy(col("bucket")).agg(count(lit(1)).as("dfh"))
      val fd = Dedup.hashedFeatures(deltaOf(nGroups), dims)
        .groupBy(col("bucket")).agg(count(lit(1)).as("dfd"))
      val j = fh.join(fd, Seq("bucket"))
        .select(col("dfh"), col("dfd"))
        .agg(sum(col("dfh") * col("dfd")).as("open"),
          sum(when(col("dfh") <= 64, col("dfh") * col("dfd"))
            .otherwise(lit(0L))).as("cold"))
        .head()
      println(s"CANDIDATE_ROWS_10X open: ${j.getLong(0)}; " +
        s"guarded(cold<=64): ${j.getLong(1)}")
    }

    // warmup (JIT/codegen), then 1x, then 10x — warm 1x only INFLATES
    // the reported ratio, so the linear-ish verdict is conservative
    runIncr(500L, "WARMUP")
    val t1 = runIncr(2500L, "1X")
    guardAccounting(25000L)
    val t10 = runIncr(25000L, "10X")
    println(f"INCR_SCALING: ${t10 / t1}%.1f x time for 10.0 x input")
    require(t10 / t1 < 25.0,
      f"hashed-cosine incremental is not scaling linearly: ${t10 / t1}%.1f x")

    // ── q164: per-source n-gram diversity at 1x and 10x ────────────────
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("source"), col("text").as("line")).persist()
    val big = base.crossJoin(spark.range(10).toDF("copy"))
      .select(col("source"),
        concat(col("line"), lit(" salt"), col("copy")).as("line"))
      .persist()
    println(s"NGRAM DOCS 1x: ${base.count()} 10x: ${big.count()}")
    def runDiversity(df: org.apache.spark.sql.DataFrame, label: String): Double = {
      val t0 = System.nanoTime()
      val rows = Caching.scoped { Vocab.ngramDiversity(df, "source", n = 3).collect() }
      val t = (System.nanoTime() - t0) / 1e9
      println(f"NGRAM_$label: $t%.1f s, ${rows.length} source rows")
      t
    }
    runDiversity(base, "WARMUP")
    val d1 = runDiversity(base, "1X")
    val d10 = runDiversity(big, "10X")
    println(f"NGRAM_SCALING: ${d10 / d1}%.1f x time for 10.0 x input")
    require(d10 / d1 < 25.0,
      f"ngram diversity is not scaling linearly: ${d10 / d1}%.1f x")
    base.unpersist(); big.unpersist()
    spark.stop()
  }
}
