package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off scale stress for the WEIGHTED (tf-weighted) Jaccard tier
// (BASELINE.md scale-stress table): a 12k-doc corpus with a REALISTIC
// vocabulary shape — a 5-token stop-word head shared by every document
// (df = N, which makes the brute all-pairs term self-join Σ df² ≈ 5·N²
// — quadratic in the corpus) over per-group private vocabularies with
// genuine weight structure (token i repeated i%3+1 times). Docs 2g and
// 2g+1 differ by ONE extra occurrence of one token: Σmin = 20,
// Σmax = 21 ⇒ J_w = 20/21 ≈ 0.952 — a pure WEIGHT perturbation that
// plain set machinery cannot see. Cross-group pairs share only the
// head: J_w = 5/45 ≈ 0.11, far below τ.
//
// The banded path's claim at this shape: cross-group pairs sit far
// below the b=4/r=4 s-curve, so candidates stay near-linear while the
// brute tier pays the head-dominated Σ df² join. Recall follows the
// DESIGNED band curve, not 1.0: at J = 20/21, per-pair miss prob is
// (1 − J⁴)⁴ ≈ 1.0e-3 ⇒ ~6 of 6 000 true pairs expected missed — the
// assertion pins that curve (±5σ), exactly the recall contract the
// q147 oracle replicates instead of assuming. The honest limit stays
// recorded too: on the sf0.01 31-term corpus the baseline J_w ≈ 0.5
// sits ABOVE the s-curve knee, so candidates are quadratic THERE for
// any LSH — weighted near-dup, like all banding, needs a vocabulary
// where the cross-pair J-mass falls below the curve.
object WeightedStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val nGroups = 6000L
    val head = "the of and to in"
    val corpus = spark.range(nGroups).toDF("g")
      .crossJoin(spark.range(2).toDF("c"))
      .select((col("g") * 2 + col("c")).as("doc"),
        concat(
          lit(head + " "),
          // token i of group g, repeated i%3+1 times (the weights)
          concat_ws(" ", flatten(transform(sequence(lit(0), lit(9)),
            i => transform(sequence(lit(0), i % 3),
              _ => concat(lit("w"), col("g"), lit("_"), i))))),
          // copy 1 repeats token 0 once more: J_w = 20/21
          when(col("c") === 1, concat(lit(" w"), col("g"), lit("_0")))
            .otherwise(lit(""))).as("line"))
    corpus.persist()
    println(s"DOCS: ${corpus.count()}")

    val tf = Dedup.termWeights(corpus)
    val bruteRows = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * col("df"))).head().getLong(0)
    println(s"BRUTE_JOIN_ROWS (sum df^2): $bruteRows")

    val threshold = 0.8
    var t0 = System.nanoTime()
    val nBanded = graft.Caching.scoped {
      Dedup.weightedNearDups(corpus, threshold = threshold).count()
    }
    val tBanded = (System.nanoTime() - t0) / 1e9
    println(f"WEIGHTED_BANDED (tau=$threshold): $tBanded%.1f s, pairs=$nBanded")

    // hot-bucket guard measurement, for the record (0 here: the 5-token
    // head is too small a share of each doc's ~25 elements to
    // concentrate whole bands; the guard is for boilerplate-dominated
    // corpora where it isn't)
    val bands = Dedup.lshBands(
      Dedup.minhashSignatures(Dedup.weightedElems(tf)))
    val skipped = Dedup.lshSkippedBuckets(bands).count()
    println(s"SKIPPED_HOT_BUCKETS: $skipped")

    t0 = System.nanoTime()
    val brute = Dedup.weightedJaccardPairs(corpus, threshold = threshold)
    val nBrute = brute.count()
    val tBrute = (System.nanoTime() - t0) / 1e9
    println(f"WEIGHTED_BRUTE (tau=$threshold): $tBrute%.1f s, pairs=$nBrute")

    require(nBrute == nGroups,
      s"brute must find every seeded pair: got $nBrute of $nGroups")
    // banded recall follows the band curve: miss ≈ n·(1−J⁴)⁴ ≈ 6,
    // σ = √(n·p(1−p)) ≈ 2.5 ⇒ accept n − 6 ± 5σ, and never > brute
    println(f"BANDED_RECALL: ${nBanded.toDouble / nBrute}%.4f")
    require(nBanded <= nBrute && nBanded >= nGroups - 19,
      s"banded recall off the designed curve: $nBanded of $nBrute")

    // HOT-TF ADVERSARIAL BOUND (the truncated-weighted-Jaccard clip):
    // one doc with a single term repeated 10⁶× must expand to
    // MaxElemTf copies, not 10⁶ — the fan-out bound lives AT the
    // expansion, before any signature or bucket guard runs.
    val hot = spark.range(1).select(lit("hot").as("doc"),
      concat_ws(" ", transform(sequence(lit(1), lit(1000000)),
        _ => lit("x"))).as("line"))
    t0 = System.nanoTime()
    val hotRows = Dedup.weightedElems(Dedup.termWeights(hot)).count()
    val tHot = (System.nanoTime() - t0) / 1e9
    println(f"HOT_TF_ELEMS (tf=1e6): $hotRows rows in $tHot%.1f s")
    require(hotRows == Dedup.MaxElemTf,
      s"hot-tf fan-out not clipped: $hotRows rows")
    spark.stop()
  }
}
