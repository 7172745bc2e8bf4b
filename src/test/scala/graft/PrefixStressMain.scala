package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off 10x stress for the prefix-filtered exact similarity join
// (BASELINE.md scale-stress table): the sf0.1 corpus replicated 10x
// (~50k docs) with a per-copy suffix so copies are near- but not
// exact duplicates. The brute-force tier is NOT run at this scale —
// its shingle self-join size Σ df² is computed instead (cheaply, from
// the df table) and compared against the candidate rows the prefix
// tier actually joined: the pruning factor IS the operator's claim.
object PrefixStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id").as("doc"), col("text").as("line"))
    val corpus = base.crossJoin(spark.range(10).toDF("copy"))
      .select((col("doc") * 10 + col("copy")).as("doc"),
        concat(col("line"), lit(" u"), col("copy"),
          lit(" m"), pmod(col("doc"), lit(7))).as("line"))
    corpus.persist()
    println(s"DOCS: ${corpus.count()}")

    val threshold = 0.8
    val sh = Dedup.shingles(corpus, 3)
    // what the brute-force all-pairs shingle self-join would materialize
    val bruteRows = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * col("df"))).head().getLong(0)
    println(s"BRUTE_JOIN_ROWS (sum df^2): $bruteRows")

    var t0 = System.nanoTime()
    val pairs = Dedup.prefixFilterJaccardPairs(corpus, threshold = threshold,
      verifyViaArrays = true)
    val nPairs = pairs.count()
    val tPrefix = (System.nanoTime() - t0) / 1e9
    println(f"PREFIX_10X (tau=$threshold): $tPrefix%.1f s, pairs=$nPairs")

    t0 = System.nanoTime()
    val brute = Dedup.ngramJaccardPairs(corpus, threshold = threshold)
    val nBrute = brute.count()
    val tBrute = (System.nanoTime() - t0) / 1e9
    println(f"BRUTE_10X (tau=$threshold): $tBrute%.1f s, pairs=$nBrute")

    // ── ZIPF-shaped fixture ───────────────────────────────────────────
    // The corpus shape prefixFilterJaccardPairs EXISTS for (the 10x
    // fixture above is adversarial to it and the brute tier wins there —
    // both results stay recorded): a stop-phrase HEAD shared by every
    // document (8 internal 3-shingles with df = N, which make the brute
    // self-join's Σ df² ≈ 8·N² — quadratic in the corpus) over per-pair
    // RARE bodies (df ≤ 2 shingles, which are exactly what the
    // ascending-df prefix order probes — candidates stay near-linear).
    // Docs 2g/2g+1 differ by one appended token: J = 23/24 ≈ 0.958.
    corpus.unpersist()
    val nPairsZ = 6000L
    val head = "the of and to in is was for on with"
    val zipf = spark.range(nPairsZ).toDF("g")
      .crossJoin(spark.range(2).toDF("c"))
      .select((col("g") * 2 + col("c")).as("doc"),
        concat(
          lit(head + " "),
          concat_ws(" ", transform(sequence(lit(0), lit(14)),
            i => concat(lit("w"), col("g"), lit("_"), i))),
          when(col("c") === 1, concat(lit(" x"), col("g")))
            .otherwise(lit(""))).as("line"))
    zipf.persist()
    println(s"ZIPF_DOCS: ${zipf.count()}")
    val shZ = Dedup.shingles(zipf, 3)
    val bruteRowsZ = shZ.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * col("df"))).head().getLong(0)
    println(s"ZIPF_BRUTE_JOIN_ROWS (sum df^2): $bruteRowsZ")

    t0 = System.nanoTime()
    val pz = Dedup.prefixFilterJaccardPairs(zipf, threshold = threshold,
      verifyViaArrays = true)
    val nPz = pz.count()
    val tPz = (System.nanoTime() - t0) / 1e9
    println(f"ZIPF_PREFIX (tau=$threshold): $tPz%.1f s, pairs=$nPz")

    t0 = System.nanoTime()
    val bz = Dedup.ngramJaccardPairs(zipf, threshold = threshold)
    val nBz = bz.count()
    val tBz = (System.nanoTime() - t0) / 1e9
    println(f"ZIPF_BRUTE (tau=$threshold): $tBz%.1f s, pairs=$nBz")
    require(nPz == nBz, s"answer mismatch: prefix=$nPz brute=$nBz")

    // ── containment tier, same Zipf fixture (q158b's economics) ──────
    // True directed pairs: 2g ⊂ 2g+1 at 1.0 and the reverse at 23/24 —
    // 2 per group. Every doc is SAFE at maxDf = 4 (hot = the 8 head
    // shingles < sz·τ − 1 ≈ 17.4), so the screen probes rare shingles
    // only; the brute tier pays the same Σ df² as jaccard, doubled by
    // the missing d1 < d2 symmetry cut.
    var t1 = System.nanoTime()
    val nCs = graft.Caching.scoped {
      Dedup.containmentPairsScreened(zipf, threshold = threshold,
        maxDf = 4L).count()
    }
    val tCs = (System.nanoTime() - t1) / 1e9
    println(f"ZIPF_CONTAIN_SCREENED (tau=$threshold, maxDf=4): $tCs%.1f s, pairs=$nCs")

    t1 = System.nanoTime()
    val cb = Dedup.containmentPairs(zipf, threshold = threshold)
    val nCb = cb.count()
    val tCb = (System.nanoTime() - t1) / 1e9
    println(f"ZIPF_CONTAIN_BRUTE: $tCb%.1f s, pairs=$nCb")
    require(nCs == nCb, s"answer mismatch: screened=$nCs brute=$nCb")
    spark.stop()
  }
}
