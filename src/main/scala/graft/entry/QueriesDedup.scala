package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.multimodal.Multimodal
import graft.operators.{Clustering, Dedup, Events, HotKeys, Layout, Rank, Search, Similarity, TfIdf}
import graft.entry.EntryShared._

/** Per-domain slice of the driver-contract query/oracle maps:
  * exact/MinHash/SimHash/weighted/hashed-cosine dedup, containment, splits, and their incremental screens. Entry text and oracle SQL are byte-identical to the
  * pre-split SparkEntry (the round-10 module split). */
private[graft] object QueriesDedup {
  val queries: scala.collection.immutable.ListMap[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(

    // ── Dedup tier (SURVEY.md §7.4 / builder-prompt extensions) ─────────

    // Exact dedup: md5 fingerprint groups with deterministic keeper.
    "q11_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir))
        .select(col("fp"), col("n_dups"), col("keeper"))
        .orderBy(col("fp"))),


    // Exact word-3-gram Jaccard near-dup pairs (verification tier).
    "q12_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), n = 3, threshold = 0.5)
        .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("d1"), col("d2"))),


    // MinHash(16) + LSH(4×4 bands) candidates, exact-Jaccard verified.
    "q13_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashNearDups(docs(s, dir))
        .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("d1"), col("d2"))),


    // Sorted-neighborhood blocking: candidates = the 8 successors in
    // (text, doc) order — O(N·w) by construction, no bucket to guard;
    // the verify is q13's exact-Jaccard join verbatim.
    "q180_sorted_neighborhood" -> ((s, dir) =>
      Dedup.sortedNeighborhoodPairs(docs(s, dir), window = 8)
        .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("d1"), col("d2"))),


    // Signature-only Jaccard ESTIMATE for the LSH candidates — the
    // verify stage that reads 16 minima per side instead of re-joining
    // shingle tables (Broder's matching-minima estimator).
    "q102_minhash_estimate" -> ((s, dir) =>
      Dedup.minhashJaccardEstimates(docs(s, dir))
        .orderBy(col("d1"), col("d2"))),


    // Estimator-quality CONTRACT: est vs exact Jaccard on the SAME
    // candidate pairs — mean/max absolute error with asserted bounds
    // (σ = √(J(1−J)/16) ≈ 0.125 per pair; a broken hash family or a
    // minima/shingle mismatch blows past them immediately).
    "q102b_estimate_quality" -> ((s, dir) => {
      val d = docs(s, dir)
      val sh = graft.Caching.persist(Dedup.shingles(d, 3))
      // est feeds BOTH the error aggregate and the exact verify's pair
      // list — persist the candidate-bounded frame so the banding +
      // estimator subtree runs once, not twice (measured r13: the
      // un-persisted shape recomputed candidate generation per branch)
      val est = graft.Caching.persist(
        Dedup.minhashJaccardEstimates(d, precomputedShingles = Some(sh)))
      val exact = Dedup.jaccardFor(est.select(col("d1"), col("d2")), sh)
      est.join(exact, Seq("d1", "d2"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(abs(col("est") - col("jaccard"))), 6).as("mean_abs_err"),
          round(max(abs(col("est") - col("jaccard"))), 6).as("max_abs_err"))
        .select(col("n_pairs"), col("mean_abs_err"), col("max_abs_err"),
          (col("mean_abs_err") <= 0.12).as("mean_ok"),
          (col("max_abs_err") <= 0.5).as("max_ok"))
    }),


    // Incremental exact dedup: second corpus half anti-joined against
    // the first half's fingerprints (the daily-increment path).
    "q40_dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.exactDedupAgainst(
          d.where(col("doc") >= 250),
          d.where(col("doc") < 250).select(md5(col("line")).as("fp")))
        .select(col("doc").as("doc_id"))
        .orderBy(col("doc_id"))
    }),


    // Same spec through the Bloom pre-screen: rows the history filter
    // rules out never join; false positives are removed by the exact
    // confirm anti-join, so the answer is q40's for ANY fpp — which is
    // exactly what lets one oracle pin both paths.
    "q40b_dedup_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.exactDedupAgainstBloom(
          d.where(col("doc") >= 250),
          d.where(col("doc") < 250))
        .select(col("doc").as("doc_id"))
        .orderBy(col("doc_id"))
    }),


    // Incremental NEAR-dup screen: new arrivals (doc >= 250) whose LSH
    // bands collide with the history corpus (doc < 250), verified by
    // exact Jaccard >= 0.5 across the two shingle sets — the daily-
    // ingest near-dup path (delta ⋈ history bands, never a self-join).
    "q52_near_dup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.minhashNearDupsAgainst(
          d.where(col("doc") >= 250), d.where(col("doc") < 250))
        .select(col("doc").as("doc_id"), col("hist_doc").as("hist_id"),
          col("jaccard"))
        .orderBy(col("doc_id"), col("hist_id"))
    }),


    // Production near-dup dedup: min-label over LSH buckets, no pair
    // materialization (survivor list).
    "q28_minhash_dedup" -> ((s, dir) =>
      Dedup.minhashDedup(docs(s, dir))
        .select(col("doc").as("doc_id"))
        .orderBy(col("doc_id"))),


    // Transitive-closure twin: ITERATED min-label (bounded connected
    // components) over the corpus seeded with the 3-doc chain — the
    // chain collapses to one survivor where one-hop q28 keeps two.
    "q28b_minhash_dedup_cc" -> ((s, dir) => {
      import s.implicits._
      val seeded = ChainDocs.toDF("doc", "line")
      Dedup.minhashDedupIterative(docs(s, dir).unionByName(seeded), maxIter = 3)
        .select(col("doc").as("doc_id"))
        .orderBy(col("doc_id"))
    }),


    // Related documents: tf-idf cosine over the df-pruned inverted index
    // (pairs only from co-occurring rare terms — never an all-pairs join).
    "q35_related_docs" -> ((s, dir) =>
      graft.operators.DocSimilarity
        .relatedDocs(docs(s, dir), maxDfFraction = 0.06, threshold = 0.0)
        .select(col("d1"), col("d2"), col("cos"))
        .orderBy(col("d1"), col("d2"))),


    // 16-bit tf-weighted SimHash fingerprints.
    "q14_simhash" -> ((s, dir) =>
      Dedup.simhash(docs(s, dir))
        .select(col("doc").as("doc_id"), col("simhash"))
        .orderBy(col("doc_id"))),


    // Banded SimHash near-dup pairs (hamming ≤ 3; equi-join, no crossJoin).
    "q14b_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Dedup.simhash(docs(s, dir)), maxHamming = 3)
        .orderBy(col("d1"), col("d2"))),


    // 32-bit SimHash pairs — the scale-realistic fingerprint width (a
    // 16-bit ball saturates once the corpus dwarfs 2^16).
    "q38_simhash32_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Dedup.simhash(docs(s, dir), bits = 32),
          maxHamming = 3, bits = 32)
        .orderBy(col("d1"), col("d2"))),


    // Leakage-safe train/val split: the split decision hashes the
    // near-dup CLUSTER label, so near-duplicates never straddle.
    "q87_leakage_safe_split" -> ((s, dir) =>
      Dedup.leakageSafeSplit(docs(s, dir), valPerMille = 100)
        .select(col("doc").as("doc_id"), col("cluster"), col("split"))
        .orderBy(col("doc_id"))),


    // Leakage-safe K-FOLD: clusters land whole in one of 5 folds —
    // the cross-validation form of q87's contamination rule.
    "q173_kfold_split" -> ((s, dir) =>
      Dedup.kFoldSplit(docs(s, dir), k = 5)
        .select(col("doc").as("doc_id"), col("cluster"), col("fold"))
        .orderBy(col("doc_id"))),


    // K-fold contract: zero LSH candidate pairs cross folds, and the
    // fold sizes (the same audit shape as q87b, per fold).
    "q173b_kfold_leakage" -> ((s, dir) => {
      val d = docs(s, dir)
      val bands = graft.Caching.persist(
        Dedup.lshBands(Dedup.minhashSignatures(Dedup.shingles(d))))
      val fd = Dedup.kFoldSplit(d, k = 5, precomputedBands = Some(bands))
      val cands = Dedup.lshCandidates(bands)
      val crossing = cands
        .join(fd.select(col("doc").as("d1"), col("fold").as("f1")), "d1")
        .join(fd.select(col("doc").as("d2"), col("fold").as("f2")), "d2")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("f1") =!= col("f2"), 1L).otherwise(0L)).as("crossing"))
      val sizes = fd.groupBy(col("fold"))
        .agg(count(lit(1)).as("n_docs"))
      sizes.join(crossing)
        .withColumn("leak_free", col("crossing") === 0L)
        .select(col("fold"), col("n_docs"), col("n_pairs"),
          col("crossing"), col("leak_free"))
        .orderBy(col("fold"))
    }),


    // Split-leakage CONTRACT: zero LSH candidate pairs cross the
    // train/val boundary (the eval-contamination failure mode measured
    // by arXiv:2107.06499 §5). Non-convergence of the bounded label
    // propagation would surface here as crossing > 0.
    "q87b_split_leakage" -> ((s, dir) => {
      val d = docs(s, dir)
      // ONE persisted band derivation feeds both the split's label
      // propagation and the candidate-pair audit (this was the most
      // expensive bench row in r4 — the shingle chain ran twice)
      val bands = graft.Caching.persist(
        Dedup.lshBands(Dedup.minhashSignatures(Dedup.shingles(d))))
      val sp = Dedup.leakageSafeSplit(d, valPerMille = 100,
        precomputedBands = Some(bands))
      val cands = Dedup.lshCandidates(bands)
      val crossing = cands
        .join(sp.select(col("doc").as("d1"), col("split").as("split1")), "d1")
        .join(sp.select(col("doc").as("d2"), col("split").as("split2")), "d2")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("split1") =!= col("split2"), 1L).otherwise(0L))
            .as("crossing"))
      sp.agg(
          sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"))
        .crossJoin(crossing)
        .select(col("n_train"), col("n_val"), col("n_pairs"),
          col("crossing"), (col("crossing") === 0L).as("leak_free"))
    }),


    // Per-source exact-duplication health dashboard.
    "q90_source_dup_stats" -> ((s, dir) =>
      graft.operators.Pipeline.sourceDupStats(
          tbl(s, dir, "documents")
            .select(col("doc_id").as("doc"), col("text").as("line"),
              col("source")))
        .orderBy(col("source"))),


    // Incremental leakage-safe split: the daily-ingest bookend — new
    // docs inherit their anchor's (smallest matched history doc's)
    // split; unmatched docs hash their own id via the same rule.
    "q91_split_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val hist = d.where(col("doc") < 250)
      val hsp = Dedup.leakageSafeSplit(hist, valPerMille = 100)
      Dedup.leakageSafeSplitAgainst(d.where(col("doc") >= 250), hist,
          hsp.select(col("doc"), col("split")), valPerMille = 100)
        .select(col("doc").as("doc_id"), col("anchor"), col("split"))
        .orderBy(col("doc_id"))
    }),


    // Incremental-split leak audit: candidate pairs (delta ⋈ history)
    // whose sides disagree. Nonzero would mean either a bridge doc
    // (documented semantics) or a broken inherit rule — observable
    // either way.
    "q91b_split_incremental_leakage" -> ((s, dir) => {
      val d = docs(s, dir)
      val hist = d.where(col("doc") < 250)
      val delta = d.where(col("doc") >= 250)
      // ONE persisted band derivation per side serves the history split,
      // the incremental assignment, AND the crossing audit (r4 paid the
      // shingle chain twice per side)
      val bHist = graft.Caching.persist(
        Dedup.lshBands(Dedup.minhashSignatures(Dedup.shingles(hist))))
      val bNew = graft.Caching.persist(
        Dedup.lshBands(Dedup.minhashSignatures(Dedup.shingles(delta))))
      val hsp = Dedup.leakageSafeSplit(hist, valPerMille = 100,
        precomputedBands = Some(bHist))
      val sp = Dedup.leakageSafeSplitAgainst(delta, hist,
        hsp.select(col("doc"), col("split")), valPerMille = 100,
        precomputedNewBands = Some(bNew), precomputedHistBands = Some(bHist))
      val ok = bHist.groupBy(col("band"), col("band_val"))
        .agg(count(lit(1)).as("bucket_n"))
        .where(col("bucket_n") <= Dedup.MaxPairBucket)
        .select(col("band"), col("band_val"))
      val cand = bNew
        .join(bHist.join(ok, Seq("band", "band_val"), "left_semi")
          .select(col("doc").as("hist_doc"), col("band"), col("band_val")),
          Seq("band", "band_val"))
        .select(col("doc"), col("hist_doc")).distinct()
      val crossing = cand
        .join(sp.select(col("doc"), col("split").as("new_split")), Seq("doc"))
        .join(hsp.select(col("doc").as("hist_doc"),
          col("split").as("hist_split")), Seq("hist_doc"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("new_split") =!= col("hist_split"), 1L).otherwise(0L))
            .as("crossing"))
      sp.agg(count(lit(1)).as("n_new"),
          sum(when(col("anchor").isNotNull, 1L).otherwise(0L)).as("n_matched"))
        .crossJoin(crossing)
        .select(col("n_new"), col("n_matched"), col("n_pairs"),
          col("crossing"), (col("crossing") === 0L).as("leak_free"))
    }),


    // Exact duplicated-substring removal (ExactSubstr, Lee et al. 2022):
    // all-but-first occurrences of duplicated 8-token spans removed
    // corpus-wide, text rebuilt from the surviving tokens.
    "q56_substring_dedup" -> ((s, dir) =>
      Dedup.substringDedup(docs(s, dir), spanTokens = 8)
        .withColumnRenamed("doc", "doc_id")
        .orderBy(col("doc_id"))),


    // CONVERGED transitive-closure dedup over corpus + the seeded chain:
    // min-label propagation to a detected FIXPOINT (not a guessed
    // iteration bound). The oracle computes TRUE connected components
    // via a recursive CTE — a stronger contract than q28b's unrolled
    // iterations: the engine's convergence must equal graph closure.
    "q96_minhash_dedup_converged" -> ((s, dir) => {
      import s.implicits._
      val seeded = ChainDocs.toDF("doc", "line")
      Dedup.minhashDedupConverged(docs(s, dir).unionByName(seeded))
        .select(col("doc").as("doc_id"))
        .orderBy(col("doc_id"))
    }),


    // The SAME closure by the large/small-star algorithm (Kiveris et
    // al., SoCC 2014): round count O(log² n) in component SIZE instead
    // of min-label's O(diameter) — the 100 TB tier for adversarial
    // chain-shaped dup graphs. Oracle is q96's recursive-CTE SQL
    // verbatim: both tiers must equal true graph closure.
    "q105_minhash_dedup_star" -> ((s, dir) => {
      import s.implicits._
      val seeded = ChainDocs.toDF("doc", "line")
      Dedup.minhashDedupStar(docs(s, dir).unionByName(seeded))
        .select(col("doc").as("doc_id"))
        .orderBy(col("doc_id"))
    }),


    // Quality-aware keeper: per CONVERGED near-dup cluster keep the
    // highest-quality member (ties to smallest id) instead of min-id —
    // the keeper rule that stops dedup from preferring truncated copies.
    "q97_dedup_best_keeper" -> ((s, dir) => {
      val d = docs(s, dir)
      val labels = Dedup.minhashClusterLabelsConverged(d)
      Dedup.dedupKeepBest(d, labels,
          graft.functions.TextAnalysis.qualityScoreCol(col("line")))
        .select(col("doc").as("doc_id"))
        .orderBy(col("doc_id"))
    }),


    // Dup-cluster size histogram over the converged components — the
    // dedup diagnostics chart, pure integers.
    "q203_dup_cluster_histogram" -> ((s, dir) =>
      graft.operators.Dedup.dupClusterHistogram(docs(s, dir))
        .orderBy(col("cluster_size"))),


    // All-pairs exact WEIGHTED (tf-weighted unigram) Jaccard ≥ 0.8 —
    // the verification tier. On this corpus's ~31-term shared
    // vocabulary PLAIN unigram Jaccard is degenerate (~every pair ≈ 1);
    // Σmin/Σmax over tf vectors discriminates on frequencies.
    "q146_weighted_jaccard" -> ((s, dir) =>
      Dedup.weightedJaccardPairs(docs(s, dir), threshold = 0.8)
        .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("d1"), col("d2"))),


    // Production weighted near-dup: MinHash+LSH over the term#i
    // weighted-element expansion (integer-weight reduction of weighted
    // to plain Jaccard) → guarded candidates → exact Σmin/Σmax verify.
    // The oracle replicates banding, so recall is pinned, not trusted.
    "q147_weighted_near_dup" -> ((s, dir) =>
      Dedup.weightedNearDups(docs(s, dir), threshold = 0.8)
        .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("d1"), col("d2"))),


    // Estimator-quality CONTRACT for the weighted tier — the HOLD-OUT
    // estimator (bands from m0..m15, estimate from the disjoint
    // m16..m31): on this tier's mid-J candidate mix the q102b recipe
    // (estimate from the banding minima) fails its own bounds by
    // selection bias ≈ 0.25·(1−J) (measured 0.153 mean abs err);
    // hold-out hashes restore E[est] = J and the Broder σ bounds —
    // a replication-trick bug (wrong element strings, dropped copies)
    // still blows past them immediately.
    "q147b_weighted_estimate_quality" -> ((s, dir) => {
      val tf = graft.Caching.persist(Dedup.termWeights(docs(s, dir)))
      // the q102b persist rationale: est feeds the aggregate AND the
      // exact tier's pair list — cache the candidate-bounded frame
      val est = graft.Caching.persist(Dedup.weightedJaccardEstimates(docs(s, dir)))
      val exact = Dedup.weightedJaccardFor(est.select(col("d1"), col("d2")), tf)
      est.join(exact, Seq("d1", "d2"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(abs(col("est") - col("jaccard"))), 6).as("mean_abs_err"),
          round(max(abs(col("est") - col("jaccard"))), 6).as("max_abs_err"))
        .select(col("n_pairs"), col("mean_abs_err"), col("max_abs_err"),
          (col("mean_abs_err") <= 0.12).as("mean_ok"),
          (col("max_abs_err") <= 0.6).as("max_ok"))
    }),


    // Incremental weighted near-dup: delta (docs ≥ 250) banded against
    // HISTORY (docs < 250) on the weighted-element signatures — the
    // q52 split, weighted semantics; banding replicated in the oracle.
    "q152_weighted_near_dup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.weightedNearDupsAgainst(
          d.where(col("doc") >= 250), d.where(col("doc") < 250))
        .select(col("doc").as("doc_id"), col("hist_doc").as("hist_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("doc_id"), col("hist_id"))
    }),


    // FEATURE-HASHED bag-of-words vectors (hashing trick, 64 dims):
    // integer signed-sum weights from the md5 bucket+sign, replicated
    // digit-exact in the oracle — no vocabulary pass at any scale.
    "q153_hashed_features" -> ((s, dir) =>
      Dedup.hashedFeatures(docs(s, dir), dims = 64)
        .select(col("doc").as("doc_id"), col("bucket"), col("weight"))
        .orderBy(col("doc_id"), col("bucket"))),


    // Sparse cosine near-dups via the inverted-index bucket join over
    // the hashed vectors, on a ~20 % doc sample (the q16 sampling
    // convention). The hot-bucket guard is wide open at this SF, so
    // the oracle is the plain all-pairs bucket join — a pair sharing
    // no bucket has dot 0 < threshold and drops on both engines.
    "q153b_hashed_cosine" -> ((s, dir) => {
      val bkt = conv(substring(
          md5(concat(lit("fhs:"), col("doc").cast("string"))), 1, 8),
        16, 10).cast("long") % 1000000L
      Dedup.hashedCosinePairs(docs(s, dir).where(bkt < 200000L),
          dims = 64, threshold = 0.85, maxBucketDocs = 1000000L)
        .orderBy(col("doc_a"), col("doc_b"))
    }),


    // AUTO-SIZED hashed cosine (the q5d pattern): dims from the
    // corpus's own distinct-term count via deriveHashedDims — resolves
    // to 64 on this sample, so the oracle is q153b's SQL verbatim.
    "q153d_hashed_cosine_auto" -> ((s, dir) => {
      val bkt = conv(substring(
          md5(concat(lit("fhs:"), col("doc").cast("string"))), 1, 8),
        16, 10).cast("long") % 1000000L
      Dedup.hashedCosinePairsAuto(docs(s, dir).where(bkt < 200000L),
          threshold = 0.85, maxBucketDocs = 1000000L)
        .orderBy(col("doc_a"), col("doc_b"))
    }),


    // LSH bucket-size histogram at 8 bits: the hot-bucket-guard
    // empirics for the ANN tier.
    "q207_lsh_bucket_histogram" -> ((s, dir) =>
      Similarity.lshBucketHistogram(tbl(s, dir, "embeddings"), bits = 8)
        .orderBy(col("bucket_size"))),


    // Incremental hashed-cosine: delta (docs ≥ 250) probes the
    // HISTORY's (docs < 250) inverted index — never a delta self-join;
    // the q52 split, sparse-cosine semantics.
    "q153c_hashed_cosine_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.hashedCosineAgainst(
          d.where(col("doc") >= 250), d.where(col("doc") < 250),
          dims = 64, threshold = 0.9, maxBucketDocs = 1000000L)
        .select(col("doc").as("doc_id"), col("hist_doc").as("hist_id"),
          col("cos"))
        .orderBy(col("doc_id"), col("hist_id"))
    }),


    // BAG-OF-WORDS dup groups: md5 of the SORTED token multiset — the
    // order-insensitive dedup key (shuffled copies of the same words
    // collapse; exact dedup q11 would miss them).
    "q154_bow_dedup" -> ((s, dir) =>
      Dedup.bowGroups(docs(s, dir))
        .orderBy(col("bow_fp"))),


    // Shingle CONTAINMENT pairs: the asymmetric near-dup relation
    // (|A∩B|/|A| — quote/wrapper detection); directed, both
    // directions emitted when both clear τ.
    "q158_containment" -> ((s, dir) =>
      Dedup.containmentPairs(docs(s, dir), n = 3, threshold = 0.5)
        .select(col("inner_doc").as("inner_id"),
          col("outer_doc").as("outer_id"), col("containment"))
        .orderBy(col("inner_id"), col("outer_id"))),


    // DF-screened exact containment: rare-shingle probes + the
    // hot-mass fallback bound — deterministic recall, oracle = q158's
    // brute SQL verbatim (ContainmentProperties re-proves equality).
    // Screened containment on a ~30 % doc sample (the q153b sampling
    // convention): this row demonstrates EXACTNESS vs the brute SQL on
    // the same relation; the screen's economics are measured where its
    // corpus shape exists (PrefixStressMain's Zipf fixture, 10.6×) —
    // on THIS flat-vocab fixture nearly every doc takes the full
    // fallback, the same recorded loss as the prefix filter's.
    "q158b_containment_screened" -> ((s, dir) => {
      val bkt = conv(substring(
          md5(concat(lit("cns:"), col("doc").cast("string"))), 1, 8),
        16, 10).cast("long") % 1000000L
      Dedup.containmentPairsScreened(docs(s, dir).where(bkt < 300000L),
          n = 3, threshold = 0.5, maxDf = 10L)
        .select(col("inner_doc").as("inner_id"),
          col("outer_doc").as("outer_id"), col("containment"))
        .orderBy(col("inner_id"), col("outer_id"))
    }),


    // Incremental BOW dedup: the q40 anti-join on the order-
    // insensitive fingerprint — delta (docs ≥ 250) vs history.
    "q154b_bow_dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.bowDedupAgainst(
          d.where(col("doc") >= 250),
          Dedup.bowFingerprints(d.where(col("doc") < 250)))
        .select(col("doc").as("doc_id"))
        .orderBy(col("doc_id"))
    }),


    // Cross-source duplication matrix: q13's near-dup pairs rolled up
    // by unordered source pair — the feed-mirroring governance view.
    "q163_cross_source_dups" -> ((s, dir) =>
      graft.operators.Pipeline.crossSourceDupMatrix(
          tbl(s, dir, "documents")
            .select(col("doc_id").as("doc"), col("text").as("line"),
              col("source")))
        .orderBy(col("s1"), col("s2"))),


    // PREFIX-FILTERED exact set-similarity join (All-Pairs/PPJoin):
    // every pair at Jaccard ≥ 0.8 with deterministic recall, from
    // rare-shingle prefix probes (~20 % of each doc's shingles at
    // τ=0.8 — the high-τ near-dup operating point the filter is FOR)
    // instead of the full shingle self-join. Oracle is the q12
    // brute-force SQL at the same τ: any false negative fails the
    // hash compare.
    "q121_jaccard_prefix" -> ((s, dir) =>
      Dedup.prefixFilterJaccardPairs(docs(s, dir), n = 3, threshold = 0.8)
        .orderBy(col("d1"), col("d2"))),


    // EDIT-DISTANCE verified near-dups: the guarded LSH candidates
    // re-verified by normalized Levenshtein — the character-level
    // duplication band word-shingle Jaccard under-scores.
    "q137_edit_distance_pairs" -> ((s, dir) =>
      Dedup.editDistancePairs(docs(s, dir), n = 3, maxRatio = 0.3)
        .orderBy(col("d1"), col("d2")))
  )

  val sql: Map[String, String] = Map(

    "q11_dedup_exact" ->
      """SELECT md5(text) AS fp, count(*) AS n_dups, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,


    "q12_ngram_jaccard" -> ngramJaccardSql(0.5),


    "q13_minhash_lsh" ->
      s"""WITH $ShingleCtes,
         |$MinhashSigCte,
         |bands AS ($MinhashBandsSql),
         |bok AS (
         |  SELECT band, band_val FROM bands GROUP BY 1, 2
         |  HAVING count(*) <= ${Dedup.MaxPairBucket}),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
         |  JOIN bok ON a.band = bok.band AND a.band_val = bok.band_val),
         |inter AS (
         |  SELECT c.d1, c.d2, count(*) AS i
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.d1
         |  JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
         |  GROUP BY 1, 2)
         |SELECT d1, d2, round(i * 1.0 / (x.sz + y.sz - i), 6) AS jaccard
         |FROM inter JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
         |WHERE i * 1.0 / (x.sz + y.sz - i) >= 0.5
         |ORDER BY d1, d2""".stripMargin,


    // SNM mirror: rank-adjacent candidates (row_number over the same
    // (text, doc_id) total order), then q12's exact-Jaccard verify.
    "q180_sorted_neighborhood" ->
      s"""WITH $ShingleCtes,
         |r AS (SELECT doc_id, row_number() OVER (ORDER BY text, doc_id) - 1
         |        AS rn FROM documents),
         |cand AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 8),
         |inter AS (
         |  SELECT c.d1, c.d2, count(*) AS i
         |  FROM cand c JOIN sh x ON x.doc_id = c.d1
         |              JOIN sh y ON y.doc_id = c.d2 AND y.shingle = x.shingle
         |  GROUP BY 1, 2)
         |SELECT d1, d2, round(i * 1.0 / (x.sz + y.sz - i), 6) AS jaccard
         |FROM inter JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
         |WHERE i * 1.0 / (x.sz + y.sz - i) >= 0.5
         |ORDER BY d1, d2""".stripMargin,


    "q102_minhash_estimate" ->
      s"""WITH $ShingleCtes,
         |$MinhashSigCte,
         |bands AS ($MinhashBandsSql),
         |bok AS (
         |  SELECT band, band_val FROM bands GROUP BY 1, 2
         |  HAVING count(*) <= ${Dedup.MaxPairBucket}),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
         |  JOIN bok ON a.band = bok.band AND a.band_val = bok.band_val)
         |SELECT c.d1, c.d2, round(($sigMatchSql) / 16.0, 6) AS est
         |FROM cand c
         |JOIN sig s1 ON s1.doc_id = c.d1
         |JOIN sig s2 ON s2.doc_id = c.d2
         |ORDER BY d1, d2""".stripMargin,


    // Estimate vs exact on the same pairs; `jac` stays UNROUNDED like
    // the engine's jaccardFor, the error stats round after aggregation.
    "q102b_estimate_quality" ->
      s"""WITH $ShingleCtes,
         |$MinhashSigCte,
         |bands AS ($MinhashBandsSql),
         |bok AS (
         |  SELECT band, band_val FROM bands GROUP BY 1, 2
         |  HAVING count(*) <= ${Dedup.MaxPairBucket}),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
         |  JOIN bok ON a.band = bok.band AND a.band_val = bok.band_val),
         |est AS (
         |  SELECT c.d1, c.d2, round(($sigMatchSql) / 16.0, 6) AS est
         |  FROM cand c
         |  JOIN sig s1 ON s1.doc_id = c.d1
         |  JOIN sig s2 ON s2.doc_id = c.d2),
         |inter AS (
         |  SELECT c.d1, c.d2, count(*) AS i
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.d1
         |  JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
         |  GROUP BY 1, 2),
         |joined AS (
         |  SELECT e.est, i * 1.0 / (x.sz + y.sz - i) AS jac
         |  FROM est e
         |  JOIN inter USING (d1, d2)
         |  JOIN sz x ON e.d1 = x.doc_id JOIN sz y ON e.d2 = y.doc_id)
         |SELECT count(*)::BIGINT AS n_pairs,
         |       round(avg(abs(est - jac)), 6) AS mean_abs_err,
         |       round(max(abs(est - jac)), 6) AS max_abs_err,
         |       round(avg(abs(est - jac)), 6) <= 0.12 AS mean_ok,
         |       round(max(abs(est - jac)), 6) <= 0.5 AS max_ok
         |FROM joined""".stripMargin,


    "q40_dedup_incremental" ->
      """SELECT doc_id FROM documents
        |WHERE doc_id >= 250
        |  AND md5(text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id < 250)
        |ORDER BY doc_id""".stripMargin,


    // Bloom screen changes the plan, never the answer — q40's SQL.
    "q40b_dedup_bloom" ->
      """SELECT doc_id FROM documents
        |WHERE doc_id >= 250
        |  AND md5(text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id < 250)
        |ORDER BY doc_id""".stripMargin,


    "q52_near_dup_incremental" ->
      s"""WITH ${shingleCtesSfx("(SELECT * FROM documents WHERE doc_id >= 250)", "_n")},
         |${shingleCtesSfx("(SELECT * FROM documents WHERE doc_id < 250)", "_h")},
         |${minhashSigCteSfx("_n")},
         |${minhashSigCteSfx("_h")},
         |bands_n AS (${minhashBandsSqlSfx("_n")}),
         |bands_h AS (${minhashBandsSqlSfx("_h")}),
         |bok AS (
         |  SELECT band, band_val FROM bands_h GROUP BY 1, 2
         |  HAVING count(*) <= ${Dedup.MaxPairBucket}),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS hist_id
         |  FROM bands_n a JOIN bands_h b
         |    ON a.band = b.band AND a.band_val = b.band_val
         |  JOIN bok ON a.band = bok.band AND a.band_val = bok.band_val),
         |inter AS (
         |  SELECT c.doc_id, c.hist_id, count(*) AS i
         |  FROM cand c
         |  JOIN sh_n a ON a.doc_id = c.doc_id
         |  JOIN sh_h b ON b.doc_id = c.hist_id AND b.shingle = a.shingle
         |  GROUP BY 1, 2)
         |SELECT it.doc_id, it.hist_id,
         |       round(it.i * 1.0 / (x.sz + y.sz - it.i), 6) AS jaccard
         |FROM inter it
         |JOIN sz_n x ON it.doc_id = x.doc_id
         |JOIN sz_h y ON it.hist_id = y.doc_id
         |WHERE it.i * 1.0 / (x.sz + y.sz - it.i) >= 0.5
         |ORDER BY it.doc_id, it.hist_id""".stripMargin,


    "q28_minhash_dedup" ->
      s"""WITH $ShingleCtes,
         |$MinhashSigCte,
         |bands AS ($MinhashBandsSql),
         |bmin AS (
         |  SELECT band, band_val, min(doc_id) AS bucket_min
         |  FROM bands GROUP BY 1, 2),
         |dropped AS (
         |  SELECT b.doc_id FROM bands b
         |  JOIN bmin USING (band, band_val)
         |  GROUP BY b.doc_id HAVING min(bucket_min) < b.doc_id)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
         |ORDER BY doc_id""".stripMargin,


    "q28b_minhash_dedup_cc" ->
      s"""WITH seeded AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES $chainValuesSql) v(doc_id, text)),
         |${shingleCtesFrom("seeded")},
         |$MinhashSigCte,
         |bands AS ($MinhashBandsSql),
         |l0 AS (SELECT DISTINCT doc_id, doc_id AS lbl FROM bands),
         |${minLabelIterSql(3)}
         |SELECT doc_id FROM seeded
         |WHERE doc_id NOT IN (SELECT doc_id FROM l3 WHERE lbl < doc_id)
         |ORDER BY doc_id""".stripMargin,


    "q35_related_docs" ->
      s"""WITH $TokCte,
         |cnt AS (SELECT term, doc_id, count(*) AS cnt FROM tok GROUP BY 1, 2),
         |n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
         |dft AS (SELECT term, count(*) AS df FROM cnt GROUP BY 1),
         |pr AS (
         |  SELECT c.term, c.doc_id,
         |         round((1 + log10(cnt)) * log10(1 + floor(nd / df)), 6) AS w
         |  FROM cnt c JOIN dft USING (term) CROSS JOIN n
         |  WHERE df <= 0.06 * nd),
         |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM pr GROUP BY 1),
         |dots AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, sum(a.w * b.w) AS dot
         |  FROM pr a JOIN pr b ON a.term = b.term AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, round(dot / (x.nrm * y.nrm), 6) AS cos
         |FROM dots JOIN nrm x ON d1 = x.doc_id JOIN nrm y ON d2 = y.doc_id
         |WHERE round(dot / (x.nrm * y.nrm), 6) >= 0.0
         |ORDER BY d1, d2""".stripMargin,


    "q14_simhash" ->
      s"""WITH $SimhashCtes
         |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin,


    // All-pairs hamming ≤ 3 is the oracle spec; the Spark side's 4-band
    // pigeonhole join must lose nothing at this radius.
    "q14b_simhash_pairs" ->
      s"""WITH $SimhashCtes
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY d1, d2""".stripMargin,


    "q38_simhash32_pairs" ->
      s"""WITH ${simhashCtes(32)}
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY d1, d2""".stripMargin,


    // Leakage-safe split: the oracle replays the same bounded min-label
    // closure the engine runs (shared CTEs with q28b), then hashes the
    // cluster label through the same md5 permille bucket.
    "q87_leakage_safe_split" ->
      s"""WITH $ShingleCtes,
         |$MinhashSigCte,
         |bands AS ($MinhashBandsSql),
         |l0 AS (SELECT DISTINCT doc_id, doc_id AS lbl FROM bands),
         |${minLabelIterSql(3)},
         |${splitAssignCtes()}
         |SELECT doc_id, cluster, split FROM sp ORDER BY doc_id""".stripMargin,


    // K-fold mirror: the q87 label chain with fold = md5 bucket mod 5.
    "q173_kfold_split" ->
      s"""WITH $ShingleCtes,
         |$MinhashSigCte,
         |bands AS ($MinhashBandsSql),
         |l0 AS (SELECT DISTINCT doc_id, doc_id AS lbl FROM bands),
         |${minLabelIterSql(3)},
         |fd AS (
         |  SELECT d.doc_id, coalesce(l.lbl, d.doc_id) AS cluster,
         |         ((${duckMd5Bucket("'fold:' || coalesce(l.lbl, d.doc_id)")})
         |          % 5)::BIGINT AS fold
         |  FROM documents d LEFT JOIN l3 l USING (doc_id))
         |SELECT doc_id, cluster, fold FROM fd ORDER BY doc_id""".stripMargin,


    // K-fold leakage contract mirror: q87b's candidate audit against
    // the fold assignment, one row per fold.
    "q173b_kfold_leakage" ->
      s"""WITH $ShingleCtes,
         |$MinhashSigCte,
         |bands AS ($MinhashBandsSql),
         |l0 AS (SELECT DISTINCT doc_id, doc_id AS lbl FROM bands),
         |${minLabelIterSql(3)},
         |fd AS (
         |  SELECT d.doc_id, coalesce(l.lbl, d.doc_id) AS cluster,
         |         ((${duckMd5Bucket("'fold:' || coalesce(l.lbl, d.doc_id)")})
         |          % 5)::BIGINT AS fold
         |  FROM documents d LEFT JOIN l3 l USING (doc_id)),
         |bok AS (
         |  SELECT band, band_val FROM bands GROUP BY 1, 2
         |  HAVING count(*) <= ${Dedup.MaxPairBucket}),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
         |  JOIN bok ON a.band = bok.band AND a.band_val = bok.band_val),
         |x AS (
         |  SELECT count(*)::BIGINT AS n_pairs,
         |         coalesce(sum(CASE WHEN f1.fold <> f2.fold THEN 1 ELSE 0 END),
         |                  0)::BIGINT AS crossing
         |  FROM cand JOIN fd f1 ON cand.d1 = f1.doc_id
         |            JOIN fd f2 ON cand.d2 = f2.doc_id),
         |fsz AS (SELECT fold, count(*)::BIGINT AS n_docs FROM fd GROUP BY 1)
         |SELECT fsz.fold, fsz.n_docs, x.n_pairs, x.crossing,
         |       (x.crossing = 0) AS leak_free
         |FROM fsz CROSS JOIN x ORDER BY fold""".stripMargin,


    "q87b_split_leakage" ->
      s"""WITH $ShingleCtes,
         |$MinhashSigCte,
         |bands AS ($MinhashBandsSql),
         |l0 AS (SELECT DISTINCT doc_id, doc_id AS lbl FROM bands),
         |${minLabelIterSql(3)},
         |${splitAssignCtes()},
         |bok AS (
         |  SELECT band, band_val FROM bands GROUP BY 1, 2
         |  HAVING count(*) <= ${Dedup.MaxPairBucket}),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
         |  JOIN bok ON a.band = bok.band AND a.band_val = bok.band_val),
         |x AS (
         |  SELECT count(*)::BIGINT AS n_pairs,
         |         coalesce(sum(CASE WHEN s1.split <> s2.split THEN 1 ELSE 0 END),
         |                  0)::BIGINT AS crossing
         |  FROM cand JOIN sp s1 ON cand.d1 = s1.doc_id
         |            JOIN sp s2 ON cand.d2 = s2.doc_id),
         |c AS (
         |  SELECT sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)::BIGINT
         |           AS n_train,
         |         sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)::BIGINT
         |           AS n_val
         |  FROM sp)
         |SELECT n_train, n_val, n_pairs, crossing, (crossing = 0) AS leak_free
         |FROM c CROSS JOIN x""".stripMargin,


    "q90_source_dup_stats" ->
      """WITH g AS (
        |  SELECT source, md5(text) AS fp, count(*)::BIGINT AS n
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, sum(n)::BIGINT AS n_docs, count(*)::BIGINT AS n_unique,
        |       sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END)::BIGINT AS n_dup_rows,
        |       round(1.0 - count(*)::DOUBLE / sum(n)::DOUBLE, 6) AS dup_rate
        |FROM g GROUP BY source ORDER BY source""".stripMargin,


    // Incremental split: history's bounded min-label closure + split,
    // then delta docs inherit the smallest matched anchor's side.
    "q91_split_incremental" ->
      s"""WITH $incrementalSplitCtes
         |SELECT doc_id, anchor, split FROM nsp ORDER BY doc_id""".stripMargin,


    "q91b_split_incremental_leakage" ->
      s"""WITH $incrementalSplitCtes,
         |cand AS (
         |  SELECT DISTINCT a.doc_id, b.doc_id AS hist_doc
         |  FROM bands_n a JOIN bands b
         |    ON a.band = b.band AND a.band_val = b.band_val
         |  JOIN bok ON a.band = bok.band AND a.band_val = bok.band_val),
         |x AS (
         |  SELECT count(*)::BIGINT AS n_pairs,
         |         coalesce(sum(CASE WHEN n.split <> h.split THEN 1 ELSE 0 END),
         |                  0)::BIGINT AS crossing
         |  FROM cand c JOIN nsp n ON n.doc_id = c.doc_id
         |              JOIN sp h ON h.doc_id = c.hist_doc),
         |c2 AS (
         |  SELECT count(*)::BIGINT AS n_new,
         |         sum(CASE WHEN anchor IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |           AS n_matched
         |  FROM nsp)
         |SELECT n_new, n_matched, n_pairs, crossing, (crossing = 0) AS leak_free
         |FROM c2 CROSS JOIN x""".stripMargin,


    // ExactSubstr mirror: span occurrences keyed by md5 of the 8-token
    // span, keep-first per span (row_number), covered positions removed,
    // text rebuilt — lockstep with Dedup.substringDedup(spanTokens = 8).
    "q56_substring_dedup" ->
      """WITH tokl AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |occ AS (
        |  SELECT doc_id, (i - 1)::BIGINT AS pos,
        |         md5(list_aggr(toks[i:i+7], 'string_agg', ' ')) AS span
        |  FROM tokl, unnest(range(1, len(toks) - 6)) AS t(i)
        |  WHERE len(toks) >= 8),
        |rem AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |           row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
        |    FROM occ) WHERE rn > 1),
        |rp AS (
        |  SELECT DISTINCT doc_id, pos + o.off AS tp
        |  FROM rem, unnest(range(0, 8)) AS o(off)),
        |tpos AS (
        |  SELECT doc_id, (i - 1)::BIGINT AS tp, toks[i] AS term
        |  FROM tokl, unnest(range(1, len(toks) + 1)) AS t(i)),
        |kept AS (
        |  SELECT t.doc_id, t.tp, t.term
        |  FROM tpos t LEFT JOIN rp ON t.doc_id = rp.doc_id AND t.tp = rp.tp
        |  WHERE rp.doc_id IS NULL),
        |agg AS (
        |  SELECT doc_id, string_agg(term, ' ' ORDER BY tp) AS clean_text,
        |         count(*)::BIGINT AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT l.doc_id, coalesce(a.clean_text, '') AS clean_text,
        |       coalesce(a.n_kept, 0)::BIGINT AS n_kept,
        |       (len(l.toks) - coalesce(a.n_kept, 0))::BIGINT AS n_removed
        |FROM tokl l LEFT JOIN agg a USING (doc_id)
        |ORDER BY l.doc_id""".stripMargin,


    // TRUE connected components via a recursive CTE over the band graph
    // — the stronger contract the converged engine loop must equal:
    // reach(doc, lbl) closes doc↔bucket adjacency to a fixpoint, each
    // doc's label is the minimum over its whole component, survivors
    // are the component minima. (q28b's oracle unrolls 3 bounded
    // iterations; this one has no iteration bound at all.)
    "q96_minhash_dedup_converged" -> convergedDedupSql,


    // SAME oracle verbatim for the large/small-star closure: true
    // connected components don't care which converged algorithm the
    // engine ran — q105 green proves star ≡ min-label ≡ graph closure.
    "q105_minhash_dedup_star" -> convergedDedupSql,


    // Quality-aware keeper over the SAME recursive-CTE components as
    // q96 (corpus only, no seeded chain): per cluster keep the max
    // q18-quality member, ties to the smallest doc id; docs with no
    // shingles are singleton clusters of themselves.
    "q97_dedup_best_keeper" ->
      s"""WITH RECURSIVE $ShingleCtes,
         |$MinhashSigCte,
         |bands AS ($MinhashBandsSql),
         |edges AS (
         |  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_val = b.band_val),
         |reach(doc_id, lbl) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT e2.v, r.lbl FROM reach r JOIN edges e2 ON r.doc_id = e2.u),
         |cc AS (SELECT doc_id, min(lbl) AS lbl FROM reach GROUP BY doc_id),
         |t AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    len(toks)::BIGINT AS n_tokens,
         |    len(list_distinct(toks))::BIGINT AS n_distinct,
         |    round(len(list_filter(toks, x -> x IN (
         |      'the','a','of','and','to','in','is','der','die','das','und','ist',
         |      'ein','zu','el','la','de','los','y','es','en','le','les','et','est','un'
         |    ))) * 1.0 / greatest(len(toks), 1), 6) AS stopword_ratio
         |  FROM t),
         |qs AS (
         |  SELECT doc_id,
         |    round(least(n_tokens / 50.0, 1.0) * 0.4 +
         |          (n_distinct * 1.0 / greatest(n_tokens, 1)) * 0.4 +
         |          least(stopword_ratio * 4.0, 1.0) * 0.2, 6) AS quality_score
         |  FROM m),
         |k AS (
         |  SELECT d.doc_id,
         |         row_number() OVER (PARTITION BY coalesce(cc.lbl, d.doc_id)
         |                            ORDER BY qs.quality_score DESC, d.doc_id) AS rn
         |  FROM documents d
         |  LEFT JOIN cc ON cc.doc_id = d.doc_id
         |  JOIN qs ON qs.doc_id = d.doc_id)
         |SELECT doc_id FROM k WHERE rn = 1 ORDER BY doc_id""".stripMargin,


    // Cluster-histogram mirror: the converged-closure reach relation
    // (self-edges make singletons size-1 clusters), two rollups.
    "q203_dup_cluster_histogram" ->
      s"""WITH RECURSIVE $ShingleCtes,
         |$MinhashSigCte,
         |bands AS ($MinhashBandsSql),
         |edges AS (
         |  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_val = b.band_val),
         |reach(doc_id, lbl) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT e2.v, r.lbl FROM reach r JOIN edges e2 ON r.doc_id = e2.u),
         |cc AS (SELECT doc_id, min(lbl) AS lbl FROM reach GROUP BY doc_id),
         |sizes AS (SELECT lbl, count(*)::BIGINT AS cluster_size
         |          FROM cc GROUP BY 1)
         |SELECT cluster_size, count(*)::BIGINT AS n_clusters
         |FROM sizes GROUP BY 1 ORDER BY cluster_size""".stripMargin,


    // All-pairs exact weighted Jaccard: Σ min(tf) over shared terms;
    // Σ max = tot1 + tot2 − Σ min (min+max identity).
    "q146_weighted_jaccard" ->
      s"""WITH $WeightedCtes,
         |inter AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, sum(least(a.tf, b.tf)) AS smin
         |  FROM tfw a JOIN tfw b ON a.term = b.term AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, round(smin * 1.0 / (x.tot + y.tot - smin), 6) AS jaccard
         |FROM inter JOIN wtot x ON d1 = x.doc_id JOIN wtot y ON d2 = y.doc_id
         |WHERE smin * 1.0 / (x.tot + y.tot - smin) >= 0.8
         |ORDER BY d1, d2""".stripMargin,


    // Weighted near-dup: the oracle replicates the banding over the
    // term#i expansion, so LSH recall is pinned, not trusted.
    "q147_weighted_near_dup" ->
      s"""WITH $WeightedCtes,
         |${minhashSigCteSfx("w")},
         |bands AS (${minhashBandsSqlSfx("w")}),
         |$LshCandCtes,
         |inter AS (
         |  SELECT c.d1, c.d2, sum(least(a.tf, b.tf)) AS smin
         |  FROM cand c
         |  JOIN tfw a ON a.doc_id = c.d1
         |  JOIN tfw b ON b.doc_id = c.d2 AND b.term = a.term
         |  GROUP BY 1, 2)
         |SELECT d1, d2, round(smin * 1.0 / (x.tot + y.tot - smin), 6) AS jaccard
         |FROM inter JOIN wtot x ON d1 = x.doc_id JOIN wtot y ON d2 = y.doc_id
         |WHERE smin * 1.0 / (x.tot + y.tot - smin) >= 0.8
         |ORDER BY d1, d2""".stripMargin,


    // Weighted-estimator contract: HOLD-OUT est (minima 16..31; the
    // sigw CTE computes 32, bands read only m0..m15) vs exact weighted
    // Jaccard on the SAME candidates; `jac` stays unrounded like
    // weightedJaccardFor.
    "q147b_weighted_estimate_quality" ->
      s"""WITH $WeightedCtes,
         |${minhashSigCteSfx("w", numHashes = 32)},
         |bands AS (${minhashBandsSqlSfx("w")}),
         |$LshCandCtes,
         |est AS (
         |  SELECT c.d1, c.d2, round((${sigMatchSqlRange(16, 32)}) / 16.0, 6) AS est
         |  FROM cand c
         |  JOIN sigw s1 ON s1.doc_id = c.d1
         |  JOIN sigw s2 ON s2.doc_id = c.d2),
         |inter AS (
         |  SELECT c.d1, c.d2, sum(least(a.tf, b.tf)) AS smin
         |  FROM cand c
         |  JOIN tfw a ON a.doc_id = c.d1
         |  JOIN tfw b ON b.doc_id = c.d2 AND b.term = a.term
         |  GROUP BY 1, 2),
         |joined AS (
         |  SELECT e.est, smin * 1.0 / (x.tot + y.tot - smin) AS jac
         |  FROM est e
         |  JOIN inter USING (d1, d2)
         |  JOIN wtot x ON e.d1 = x.doc_id JOIN wtot y ON e.d2 = y.doc_id)
         |SELECT count(*)::BIGINT AS n_pairs,
         |       round(avg(abs(est - jac)), 6) AS mean_abs_err,
         |       round(max(abs(est - jac)), 6) AS max_abs_err,
         |       round(avg(abs(est - jac)), 6) <= 0.12 AS mean_ok,
         |       round(max(abs(est - jac)), 6) <= 0.6 AS max_ok
         |FROM joined""".stripMargin,


    // Incremental weighted near-dup: the weighted CTE family per
    // sub-corpus; the guard bounds HISTORY buckets like the engine.
    "q152_weighted_near_dup_incremental" ->
      s"""WITH $TokCte,
         |tfwd AS (SELECT doc_id, term, count(*) AS tf FROM tok
         |         WHERE doc_id >= 250 GROUP BY 1, 2),
         |tfwh AS (SELECT doc_id, term, count(*) AS tf FROM tok
         |         WHERE doc_id < 250 GROUP BY 1, 2),
         |shwd AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(least(tf, ${Dedup.MaxElemTf})),
         |                i -> term || '#' || i::VARCHAR)) AS shingle
         |  FROM tfwd),
         |shwh AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(least(tf, ${Dedup.MaxElemTf})),
         |                i -> term || '#' || i::VARCHAR)) AS shingle
         |  FROM tfwh),
         |${minhashSigCteSfx("wd")},
         |${minhashSigCteSfx("wh")},
         |bandsd AS (${minhashBandsSqlSfx("wd")}),
         |bandsh AS (${minhashBandsSqlSfx("wh")}),
         |bok AS (
         |  SELECT band, band_val FROM bandsh GROUP BY 1, 2
         |  HAVING count(*) <= ${Dedup.MaxPairBucket}),
         |cand AS (
         |  SELECT DISTINCT d.doc_id AS doc_id, h.doc_id AS hist_id
         |  FROM bandsd d
         |  JOIN bandsh h ON d.band = h.band AND d.band_val = h.band_val
         |  JOIN bok ON h.band = bok.band AND h.band_val = bok.band_val),
         |wtd AS (SELECT doc_id, sum(tf) AS tot FROM tfwd GROUP BY 1),
         |wth AS (SELECT doc_id, sum(tf) AS tot FROM tfwh GROUP BY 1),
         |inter AS (
         |  SELECT c.doc_id, c.hist_id, sum(least(a.tf, b.tf)) AS smin
         |  FROM cand c
         |  JOIN tfwd a ON a.doc_id = c.doc_id
         |  JOIN tfwh b ON b.doc_id = c.hist_id AND b.term = a.term
         |  GROUP BY 1, 2)
         |SELECT doc_id, hist_id,
         |       round(smin * 1.0 / (x.tot + y.tot - smin), 6) AS jaccard
         |FROM inter
         |JOIN wtd x USING (doc_id)
         |JOIN wth y ON hist_id = y.doc_id
         |WHERE smin * 1.0 / (x.tot + y.tot - smin) >= 0.8
         |ORDER BY doc_id, hist_id""".stripMargin,


    // Hashing-trick mirror: the duckMd5Bucket fold mod 64 for the
    // bucket, hex digit 9 parity for the ±1 sign.
    "q153_hashed_features" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |         unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tk GROUP BY 1, 2),
         |hf AS (
         |  SELECT doc_id, tf,
         |    (list_sum(list_transform(range(1, 9), i ->
         |        (strpos('0123456789abcdef',
         |                substr(md5('fh:' || term), i::INTEGER, 1)) - 1)::BIGINT
         |          << ((8 - i)::INTEGER * 4))) % 64)::BIGINT AS bucket,
         |    (1 - 2 * ((strpos('0123456789abcdef',
         |                      substr(md5('fh:' || term), 9, 1)) - 1) % 2))::BIGINT AS sign
         |  FROM tf)
         |SELECT doc_id, bucket, sum(sign * tf)::BIGINT AS weight
         |FROM hf GROUP BY 1, 2
         |HAVING sum(sign * tf) <> 0
         |ORDER BY doc_id, bucket""".stripMargin,


    // Sparse-cosine mirror: same hashed vectors on the fhs-sampled
    // docs, all-pairs join on shared buckets, integer dot over integer
    // norms, one round-6 at the end. q153d (auto-dims) gets the SAME
    // SQL verbatim: deriveHashedDims lands on 64 for any vocabulary
    // <= 32, and the sample's is 31 — the q5d resolving-to-identical
    // pattern.
    "q153b_hashed_cosine" -> hashedCosineSampleSql,

    "q153d_hashed_cosine_auto" -> hashedCosineSampleSql,


    // Bucket-histogram mirror: the q25 bucket expression, two rollups.
    "q207_lsh_bucket_histogram" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |b AS (
         |  SELECT vec_id,
         |         list_sum(list_transform(range(0, 8), h ->
         |           CASE WHEN ${duckSignDot("h", "emb")} > 0
         |                THEN (1::BIGINT << h::INTEGER) ELSE 0::BIGINT END)) AS bucket
         |  FROM e),
         |s AS (SELECT bucket, count(*)::BIGINT AS bucket_size FROM b GROUP BY 1)
         |SELECT bucket_size, count(*)::BIGINT AS n_buckets
         |FROM s GROUP BY 1 ORDER BY bucket_size""".stripMargin,


    // Incremental sparse-cosine mirror: hashed vectors over the full
    // corpus, delta×history join on shared buckets (the guard is wide
    // open at this SF; a cross-side pair sharing no bucket has dot 0).
    "q153c_hashed_cosine_incremental" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |         unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tk GROUP BY 1, 2),
         |hf AS (
         |  SELECT doc_id, tf,
         |    (list_sum(list_transform(range(1, 9), i ->
         |        (strpos('0123456789abcdef',
         |                substr(md5('fh:' || term), i::INTEGER, 1)) - 1)::BIGINT
         |          << ((8 - i)::INTEGER * 4))) % 64)::BIGINT AS bucket,
         |    (1 - 2 * ((strpos('0123456789abcdef',
         |                      substr(md5('fh:' || term), 9, 1)) - 1) % 2))::BIGINT AS sign
         |  FROM tf),
         |hw AS (
         |  SELECT doc_id, bucket, sum(sign * tf)::BIGINT AS weight
         |  FROM hf GROUP BY 1, 2 HAVING sum(sign * tf) <> 0),
         |dots AS (
         |  SELECT a.doc_id AS doc_id, b.doc_id AS hist_id,
         |         sum(a.weight * b.weight)::BIGINT AS dot
         |  FROM hw a JOIN hw b ON a.bucket = b.bucket
         |  WHERE a.doc_id >= 250 AND b.doc_id < 250
         |  GROUP BY 1, 2),
         |norms AS (SELECT doc_id, sum(weight * weight)::BIGINT AS n2 FROM hw GROUP BY 1)
         |SELECT d.doc_id, d.hist_id,
         |       round(d.dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)), 6) AS cos
         |FROM dots d
         |JOIN norms na ON na.doc_id = d.doc_id
         |JOIN norms nb ON nb.doc_id = d.hist_id
         |WHERE round(d.dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)), 6) >= 0.9
         |ORDER BY d.doc_id, d.hist_id""".stripMargin,


    // Sorted-token-multiset fingerprint groups: list_sort mirrors
    // array_sort (binary string order on ASCII tokens).
    "q154_bow_dedup" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |         md5(array_to_string(list_sort(
        |           list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')), ' ')) AS bow_fp
        |  FROM documents)
        |SELECT bow_fp, count(*)::BIGINT AS n_dups, min(doc_id) AS keeper
        |FROM fp GROUP BY 1 ORDER BY bow_fp""".stripMargin,


    // Containment mirror: the q12 shingle join without the d1 < d2
    // symmetry cut, normalized by the INNER side's shingle count.
    // q158b (the df-screened operator) gets the SAME SQL verbatim —
    // the q121/q81 invisible-optimization pattern: any screened-out
    // true pair fails the hash compare.
    "q158_containment" -> containmentSql,

    "q158b_containment_screened" -> containmentSqlFrom(
      s"""(SELECT doc_id, text FROM documents
         | WHERE (${duckMd5Bucket("'cns:' || doc_id")}) < 300000)""".stripMargin),


    // Incremental BOW mirror: NOT IN over the history fingerprint set.
    "q154b_bow_dedup_incremental" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |         md5(array_to_string(list_sort(
        |           list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')), ' ')) AS f
        |  FROM documents)
        |SELECT doc_id FROM fp
        |WHERE doc_id >= 250
        |  AND f NOT IN (SELECT f FROM fp WHERE doc_id < 250)
        |ORDER BY doc_id""".stripMargin,


    // Cross-source-matrix mirror: the q13 chain verbatim, rolled up by
    // the unordered (least, greatest) source pair.
    "q163_cross_source_dups" ->
      s"""WITH $ShingleCtes,
         |$MinhashSigCte,
         |bands AS ($MinhashBandsSql),
         |bok AS (
         |  SELECT band, band_val FROM bands GROUP BY 1, 2
         |  HAVING count(*) <= ${Dedup.MaxPairBucket}),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
         |  JOIN bok ON a.band = bok.band AND a.band_val = bok.band_val),
         |inter AS (
         |  SELECT c.d1, c.d2, count(*) AS i
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.d1
         |  JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
         |  GROUP BY 1, 2),
         |np AS (
         |  SELECT d1, d2
         |  FROM inter JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
         |  WHERE i * 1.0 / (x.sz + y.sz - i) >= 0.5)
         |SELECT least(da.source, db.source) AS s1,
         |       greatest(da.source, db.source) AS s2,
         |       count(*)::BIGINT AS n_pairs
         |FROM np
         |JOIN documents da ON da.doc_id = np.d1
         |JOIN documents db ON db.doc_id = np.d2
         |GROUP BY 1, 2
         |ORDER BY s1, s2""".stripMargin,


    // Prefix filtering is EXACT (no false negatives given the size
    // filter), so the oracle is q12's brute-force SQL at q121's own
    // τ — the q5c/q40b/q81 "optimization must be invisible" pattern.
    "q121_jaccard_prefix" -> ngramJaccardSql(0.8),


    // Edit-distance pairs: q13's guarded candidate chain re-verified
    // by the same unit-cost levenshtein.
    "q137_edit_distance_pairs" ->
      s"""WITH $ShingleCtes,
         |$MinhashSigCte,
         |bands AS ($MinhashBandsSql),
         |bok AS (
         |  SELECT band, band_val FROM bands GROUP BY 1, 2
         |  HAVING count(*) <= ${Dedup.MaxPairBucket}),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
         |  JOIN bok ON a.band = bok.band AND a.band_val = bok.band_val),
         |lev AS (
         |  SELECT c.d1, c.d2,
         |         levenshtein(x.text, y.text)::BIGINT AS dist,
         |         round(levenshtein(x.text, y.text) * 1.0 /
         |               greatest(length(x.text), length(y.text), 1), 6) AS edit_ratio
         |  FROM cand c
         |  JOIN documents x ON x.doc_id = c.d1
         |  JOIN documents y ON y.doc_id = c.d2)
         |SELECT d1, d2, dist, edit_ratio FROM lev
         |WHERE edit_ratio <= 0.3
         |ORDER BY d1, d2""".stripMargin
  )
}
