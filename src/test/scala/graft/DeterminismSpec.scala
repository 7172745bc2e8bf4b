package graft

/**
 * Determinism under PARALLELISM: the cross-engine exactness story
 * (integer quantize-before-sum, order-free checksums, seed-free md5
 * decisions) rests on answers being independent of partitioning — a
 * float sum that only matches the oracle at 8 shuffle partitions is a
 * latent wrong answer at 800. This spec replays representative queries
 * from each exactness convention at two very different parallelism
 * points (2 fat partitions vs 32 partitions over splintered input
 * files) and requires IDENTICAL multisets.
 *
 * Representatives: floor-idf tf-idf (integer division), MinHash+LSH
 * verify (banded candidates + exact ratio), DSIR (micro-nat ln
 * quantization), Naive Bayes (integer micro-nat scores), term PageRank
 * (driver-tier radar must fire identically at any input split count),
 * order-free corpus checksums, the Gram co-moment kernel (partition
 * count changes the Long-lane flush pattern — the sums must not), the
 * driver-eigensolve PCA, and the weighted-Jaccard dense route.
 */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def runAt(name: String, parts: Int, maxBytes: String): Seq[Seq[String]] = {
    val conf = spark.conf
    val oldParts = conf.get("spark.sql.shuffle.partitions")
    val oldBytes = conf.get("spark.sql.files.maxPartitionBytes")
    conf.set("spark.sql.shuffle.partitions", parts.toString)
    conf.set("spark.sql.files.maxPartitionBytes", maxBytes)
    try Caching.scoped { rowsOf(SparkEntry.queries(name)(spark, dir)) }
    finally {
      conf.set("spark.sql.shuffle.partitions", oldParts)
      conf.set("spark.sql.files.maxPartitionBytes", oldBytes)
      spark.catalog.clearCache()
    }
  }

  private val representatives = Seq(
    "q5_tfidf",
    "q13_minhash_lsh",
    "q86_importance_resample",
    "q88_naive_bayes",
    "q117_term_pagerank",
    "q134_corpus_checksum",
    "q146_weighted_jaccard",
    "q188_embedding_covariance",
    "q196_principal_component",
    // round 9: partition-local container walks must not let the input
    // split pattern reach the fold (per-asset work is row-local), and
    // the banded join + literal-filter dedup is exchange-order-free
    "q217_audio_ahash",
    "q218b_video_neardup",
    "q219_image_resize")

  test("representative queries are bit-identical at 2 and 32 partitions") {
    representatives.foreach { q =>
      withClue(s"$q differs across parallelism points:") {
        // 2 fat shuffle partitions over whole files vs 32 partitions
        // over 16 KiB input splits
        runAt(q, 2, "134217728") shouldBe runAt(q, 32, "16384")
      }
    }
  }
}
