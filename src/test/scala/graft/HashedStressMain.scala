package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off scale stress for the HASHED sparse-cosine tier (q153 family;
// BASELINE.md scale-stress table): an 8k-doc corpus with the vocabulary
// shape the hot-bucket guard exists for — a 5-token stop-word head
// shared by EVERY document over per-group private vocabularies. At
// dims sized to the vocabulary (65 536 — the hashing trick needs
// dims ≳ vocab to separate features; 64 is a correctness-fixture
// setting, not a scale setting), every private token's bucket holds
// ~2 docs while each head bucket holds all N — so with the guard wide
// open the inverted-index join degenerates to N²/2 pairs THROUGH the
// head buckets, and with the guard at 64 the same operator generates
// near-linear candidates from the cold private buckets only.
//
// The contract being measured: the guard is ANSWER-INVISIBLE here —
// every true pair (copies 2g/2g+1, cos ≈ 0.98 ≫ τ) shares its group's
// cold buckets, so the guarded run returns the IDENTICAL pair set
// while skipping the quadratic candidate mass. The honest limit: a
// pair similar ONLY through guarded-out stop-mass would be missed —
// that pair's cosine is head_dot/norms ≈ 0.11 ≪ τ by construction of
// any corpus where the head is a small share of each doc, which is
// exactly when the guard is safe (and why maxBucketDocs is a caller
// knob, not hardcoded).
object HashedStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val nGroups = 4000L
    val dims = 65536
    val threshold = 0.8
    val head = "the of and to in"
    val corpus = spark.range(nGroups).toDF("g")
      .crossJoin(spark.range(2).toDF("c"))
      .select((col("g") * 2 + col("c")).as("doc"),
        concat(
          lit(head + " "),
          concat_ws(" ", flatten(transform(sequence(lit(0), lit(9)),
            i => transform(sequence(lit(0), i % 3),
              _ => concat(lit("w"), col("g"), lit("_"), i))))),
          when(col("c") === 1, concat(lit(" w"), col("g"), lit("_0")))
            .otherwise(lit(""))).as("line"))
    corpus.persist()
    println(s"DOCS: ${corpus.count()}")

    // candidate-mass accounting: bucket df tells the whole story
    val bucketDf = Dedup.hashedFeatures(corpus, dims)
      .groupBy(col("bucket")).agg(count(lit(1)).as("df"))
    val openPairs = bucketDf.agg(sum(col("df") * col("df"))).head().getLong(0)
    val coldPairs = bucketDf.where(col("df") <= 64)
      .agg(sum(col("df") * col("df"))).head().getLong(0)
    println(s"CANDIDATE_ROWS open (sum df^2): $openPairs; guarded: $coldPairs")

    var t0 = System.nanoTime()
    val guarded = Dedup.hashedCosinePairs(corpus, dims, threshold,
      maxBucketDocs = 64L)
    val gPairs = guarded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tGuarded = (System.nanoTime() - t0) / 1e9
    println(f"HASHED_GUARDED (tau=$threshold, maxBucketDocs=64): $tGuarded%.1f s, pairs=${gPairs.size}")

    t0 = System.nanoTime()
    val open = Dedup.hashedCosinePairs(corpus, dims, threshold,
      maxBucketDocs = nGroups * 2)
    val oPairs = open.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tOpen = (System.nanoTime() - t0) / 1e9
    println(f"HASHED_OPEN: $tOpen%.1f s, pairs=${oPairs.size}")

    require(gPairs == oPairs,
      s"guard must be answer-invisible here: guarded=${gPairs.size} open=${oPairs.size}")
    require(gPairs.size == nGroups,
      s"expected one pair per group, got ${gPairs.size}")
    println(f"SPEEDUP: ${tOpen / tGuarded}%.1f x, identical answers")
    spark.stop()
  }
}
