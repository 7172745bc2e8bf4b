package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.multimodal.Multimodal
import graft.operators.{Clustering, Dedup, Events, HotKeys, Layout, Rank, Search, Similarity, TfIdf}
import graft.streaming.StreamingOps
import graft.entry.EntryShared._

/** Per-domain slice of the driver-contract query/oracle maps:
  * embedding analytics - ANN tiers, quantization rungs, PCA/covariance, kNN and health checks. Entry text and oracle SQL are byte-identical to the
  * pre-split SparkEntry (the round-10 module split). */
private[graft] object QueriesSimilarity {
  val queries: scala.collection.immutable.ListMap[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(

    // ── Similarity search tier ──────────────────────────────────────────

    // Brute-force cosine top-10 for query vectors vec_id < 5.
    "q15_cosine_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.cosineTopK(e, e.where(col("vec_id") < 5), k = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // Embedding near-dup pairs: cosine ≥ 0.4 (exact all-pairs tier —
    // verification only; q16b is the bucketed production path).
    "q16_embedding_near_dup" -> ((s, dir) =>
      Similarity.nearDupPairs(tbl(s, dir, "embeddings"), threshold = 0.4)
        .orderBy(col("d1"), col("d2"))),


    // LSH-bucketed near-dup pairs (4 tables). bits is PINNED to 4 here
    // because the DuckDB oracle mirrors a fixed 4-bit hash family — the
    // static oracle SQL cannot evaluate deriveLshBits at a verify SF it
    // has never seen, so an AutoBits call would silently diverge from
    // its mirror the moment a verify corpus passes 1600 rows. Real
    // callers omit `bits` and get the corpus-sized AutoBits default
    // (SimilaritySpec covers the auto path and its 10x stress).
    "q16b_embedding_lsh_near_dup" -> ((s, dir) =>
      Similarity.lshNearDupPairs(tbl(s, dir, "embeddings"),
          threshold = 0.4, bits = 4, tables = 4)
        .orderBy(col("d1"), col("d2"))),


    // ANN: random-hyperplane LSH top-10 (approximate; bucket-restricted).
    "q25_ann_lsh_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.lshCosineTopK(e, e.where(col("vec_id") < 5), k = 10, bits = 8)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // ANN recall CONTRACT: recall@10 of the hyperplane-LSH top-k against
    // the exact top-k, per query. q25 pins determinism (the oracle
    // mirrors the same family); this pins QUALITY — a silently broken
    // hash family that still matches its own mirror shows up as a recall
    // collapse here (and SimilaritySpec asserts the pinned floor).
    // bits=4 so buckets are populated at the verify SF.
    "q25b_ann_lsh_recall" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      val exact = Similarity.cosineTopK(e, q, k = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val approx = Similarity.lshCosineTopK(e, q, k = 10, bits = 4)
        .select(col("q_vec_id"), col("n_vec_id"))
      val hits = approx.join(exact, Seq("q_vec_id", "n_vec_id"), "left_semi")
        .groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_hits"))
      q.select(col("vec_id").as("q_vec_id"))
        .join(hits, Seq("q_vec_id"), "left_outer")
        .select(col("q_vec_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall", round(col("n_hits") / lit(10.0), 6))
        .orderBy(col("q_vec_id"))
    }),


    // ANN: IVF coarse-quantizer top-10 (deterministic centroids, 2 probes).
    "q26_ann_ivf_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.ivfCosineTopK(e, e.where(col("vec_id") < 5),
          k = 10, stride = 100, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // ANN recall CONTRACT for the IVF tier — the q25b twin: recall@10 of
    // ivfCosineTopK against the exact top-k per query. q26 pins the
    // quantizer's determinism (oracle mirrors the same assign/probe
    // math); this pins QUALITY — a broken cell assignment that still
    // matches its own mirror shows up as a recall collapse here.
    "q26b_ann_ivf_recall" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      val exact = Similarity.cosineTopK(e, q, k = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val approx = Similarity.ivfCosineTopK(e, q, k = 10, stride = 100, nProbe = 2)
        .select(col("q_vec_id"), col("n_vec_id"))
      val hits = approx.join(exact, Seq("q_vec_id", "n_vec_id"), "left_semi")
        .groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_hits"))
      q.select(col("vec_id").as("q_vec_id"))
        .join(hits, Seq("q_vec_id"), "left_outer")
        .select(col("q_vec_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall", round(col("n_hits") / lit(10.0), 6))
        .orderBy(col("q_vec_id"))
    }),


    // Materialized ANN (IVF) index: honest build+probe per invocation —
    // cell-partitioned write, then a query batch whose cell join prunes
    // the scan via DYNAMIC partition pruning (asserted in
    // SimilaritySpec). Oracle is q26's SQL verbatim: the roundtrip must
    // reproduce the direct path bit-for-bit.
    "q82_ann_indexed" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_index_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e, idx, stride = 100)
      Similarity.searchAnnIndexed(s, idx, e.where(col("vec_id") < 5),
          k = 10, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // Int8 embedding quantization (exploded per-dim for scalar compare).
    "q42_embedding_quantize" -> ((s, dir) =>
      Similarity.quantizeInt8(tbl(s, dir, "embeddings").where(col("vec_id") < 20))
        .select(col("vec_id"), round(col("minv"), 6).as("minv"),
          round(col("scale"), 6).as("scale"), posexplode(col("q")))
        .withColumnRenamed("pos", "dim").withColumnRenamed("col", "qv")
        .orderBy(col("vec_id"), col("dim"))),


    // Sign-matrix random projection (64 → 16 dims), exploded per-dim
    // for scalar compare — pins the deterministic md5 sign matrix the
    // engine shares with the oracle (the LSH signRow family).
    "q80_random_projection" -> ((s, dir) =>
      Similarity.randomProject(tbl(s, dir, "embeddings"), outDim = 16)
        .select(col("vec_id"), posexplode(col("projected")))
        .select(col("vec_id"), col("pos").cast("long").as("dim"),
          round(col("col"), 6).as("val"))
        .orderBy(col("vec_id"), col("dim"))),


    // Projection QUALITY contract (the q25b/q26b recipe, but pinning
    // the JL guarantee itself): per query, mean and max |cos_orig −
    // cos_proj| over every corpus pair at outDim=32, with the tolerance
    // flags the oracle asserts. A recall@k contract would be noise here
    // — the synthetic embeddings are near-random, so top-k margins are
    // thinner than any projection's distortion; bounded cosine error is
    // what JL actually promises.
    "q80b_projection_distortion" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val proj = Similarity.randomProject(e.select(col("vec_id"),
          col("emb").as("embedding")), outDim = 32)
      def cosOf(frame: DataFrame, embc: String, out: String) = {
        val q = frame.where(col("vec_id") < 5)
          .select(col("vec_id").as("q_vec_id"), col(embc).as("q_e"))
        frame.select(col("vec_id").as("n_vec_id"), col(embc).as("n_e"))
          .join(broadcast(q), col("q_vec_id") =!= col("n_vec_id"))
          .select(col("q_vec_id"), col("n_vec_id"),
            Similarity.cosine(col("q_e"), col("n_e")).as(out))
      }
      cosOf(e, "emb", "cos_orig")
        .join(cosOf(proj, "projected", "cos_proj"), Seq("q_vec_id", "n_vec_id"))
        .groupBy(col("q_vec_id"))
        .agg(
          round(avg(abs(col("cos_orig") - col("cos_proj"))), 6).as("mean_err"),
          round(max(abs(col("cos_orig") - col("cos_proj"))), 6).as("max_err"))
        .select(col("q_vec_id"), col("mean_err"), col("max_err"),
          (col("mean_err") <= 0.25).as("mean_ok"),
          (col("max_err") <= 0.8).as("max_ok"))
        .orderBy(col("q_vec_id"))
    }),


    // ANN: MULTI-PROBE hyperplane LSH top-10 — each query probes its own
    // bucket plus every hamming-1 flip (9 buckets at bits=8), recovering
    // neighbors that landed just across one hyperplane without adding
    // tables. Oracle mirrors the same probe expansion.
    "q95_ann_multiprobe" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.lshCosineTopKMultiProbe(e, e.where(col("vec_id") < 5),
          k = 10, bits = 8)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // Multi-probe recall CONTRACT (the q25b twin at the SAME bits=8 the
    // production call uses): recall@10 vs the exact top-k. q25 at bits=8
    // probes 1/256 of the corpus per query; multi-probe makes that
    // bucket width usable — SimilaritySpec asserts its recall dominates
    // the single-probe run on the same family.
    "q95b_ann_multiprobe_recall" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      val exact = Similarity.cosineTopK(e, q, k = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val approx = Similarity.lshCosineTopKMultiProbe(e, q, k = 10, bits = 8)
        .select(col("q_vec_id"), col("n_vec_id"))
      val hits = approx.join(exact, Seq("q_vec_id", "n_vec_id"), "left_semi")
        .groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_hits"))
      q.select(col("vec_id").as("q_vec_id"))
        .join(hits, Seq("q_vec_id"), "left_outer")
        .select(col("q_vec_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall", round(col("n_hits") / lit(10.0), 6))
        .orderBy(col("q_vec_id"))
    }),


    // EMBEDDING-space DECONTAMINATION: max cosine of every corpus
    // vector against the broadcast benchmark set (vec_id < 20) + the
    // tau=0.8 verdict — the semantic twin of q44's n-gram screen,
    // catching paraphrased eval leakage n-gram overlap misses.
    "q108_embedding_decontaminate" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.embeddingContamination(
          e.where(col("vec_id") >= 20), e.where(col("vec_id") < 20),
          tau = 0.8)
        .orderBy(col("vec_id"))
    }),


    // ── PQ / incremental-index tier (round 5) ───────────────────────────

    // Product-quantization codes: 8 subspaces × 4-bit codes per vector
    // (the 32× embedding-compression lever), exploded per (vec, sub) for
    // scalar compare. MAP-ONLY — zero hash exchanges, plan-pinned.
    "q99_pq_codes" -> ((s, dir) =>
      Similarity.pqEncode(tbl(s, dir, "embeddings"))
        .select(col("vec_id"), posexplode(col("codes")))
        .select(col("vec_id"), col("pos").cast("long").as("sub"),
          col("col").cast("long").as("code"))
        .orderBy(col("vec_id"), col("sub"))),


    // ADC top-10: asymmetric-distance scan over the code table — each
    // query's m×k lookup table computed once, every corpus vector scored
    // by m table picks. The compressed-domain q15.
    "q99b_pq_adc_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.pqAdcTopK(e, e.where(col("vec_id") < 5), kTop = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // PQ quality CONTRACT (the q25b recipe): recall@10 of the ADC scan
    // against the exact top-k — a broken codebook that still matches its
    // own mirror shows up as a recall collapse here.
    "q99c_pq_recall" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      val exact = Similarity.cosineTopK(e, q, k = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val approx = Similarity.pqAdcTopK(e, q, kTop = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val hits = approx.join(exact, Seq("q_vec_id", "n_vec_id"), "left_semi")
        .groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_hits"))
      q.select(col("vec_id").as("q_vec_id"))
        .join(hits, Seq("q_vec_id"), "left_outer")
        .select(col("q_vec_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall", round(col("n_hits") / lit(10.0), 6))
        .orderBy(col("q_vec_id"))
    }),


    // HARD-NEGATIVE mining (contrastive-training data op): per anchor
    // the top-10 most-similar vectors BELOW the cos<0.5 near-dup
    // ceiling — "close but not a positive", the band that sharpens a
    // retrieval model without the false-negative trap. Exact tier.
    "q103_hard_negatives" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.hardNegatives(e, e.where(col("vec_id") < 5),
          k = 10, ceiling = 0.5)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // Production twin: the same ceiling + re-rank over multi-probe LSH
    // candidates (~(bits+1)/2^bits of the corpus per anchor, never the
    // full scan).
    "q103b_hard_negatives_lsh" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.hardNegativesMultiProbe(e, e.where(col("vec_id") < 5),
          k = 10, ceiling = 0.5, bits = 8)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // IVF-PQ: the two ANN tiers composed (probe nProbe cells, ADC-score
    // their members from codes) — the billion-scale recipe where the
    // float vector is touched by neither stage. SimilaritySpec asserts
    // tier consistency against the flat ADC scan.
    "q101_ivfpq_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.ivfPqTopK(e, e.where(col("vec_id") < 5), kTop = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // FILTERED IVF-ADC: the q222 metadata predicate composed with the
    // q101 compressed-domain scoring — candidates pruned to label = 1,
    // centroids AND PQ codebook frozen full-corpus (the two-stage
    // frozen-quantizer contract). Oracle = the q101 ADC chain with the
    // candidate clause.
    "q229_ivfpq_filtered" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.ivfPqTopKFiltered(e, e.where(col("vec_id") < 5),
          col("label") === 1, kTop = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // Filtered-ADC recall CONTRACT (the q222b harness in the
    // compressed domain): recall@10 of the filtered IVF-ADC tier
    // against the exact float top-k over the filtered slice — records
    // what quantization + cell pruning cost under the predicate
    // instead of letting it pass silently.
    "q229b_ivfpq_filtered_recall" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      val exact = Similarity.cosineTopK(e.where(col("label") === 1), q, k = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val approx = Similarity.ivfPqTopKFiltered(e, q,
          col("label") === 1, kTop = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val hits = approx.join(exact, Seq("q_vec_id", "n_vec_id"), "left_semi")
        .groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_hits"))
      q.select(col("vec_id").as("q_vec_id"))
        .join(hits, Seq("q_vec_id"), "left_outer")
        .select(col("q_vec_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall", round(col("n_hits") / lit(10.0), 6))
        .orderBy(col("q_vec_id"))
    }),


    // INCREMENTAL index ingest: build on history (vec_id < 400), append
    // the delta with the index's FROZEN centroids (no re-cluster, no
    // history rewrite), then probe the grown index. The oracle is the
    // direct IVF search over the UNION corpus with the same frozen
    // centroid set — append must be invisible to queries.
    "q100_ann_index_append" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_append_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e.where(col("vec_id") < 400), idx, stride = 100)
      Similarity.appendAnnIndex(s, e.where(col("vec_id") >= 400), idx)
      Similarity.searchAnnIndexed(s, idx, e.where(col("vec_id") < 5),
          k = 10, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // FILTERED ANN: IVF top-k under a metadata predicate (label = 1,
    // ~10% selectivity). Probes rank cells in FULL centroid space; only
    // the candidate side is filtered — the quantizer never rebuilds per
    // predicate. Oracle = the IVF SQL with the same corpus-side clause.
    "q222_ann_filtered" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.ivfCosineTopKFiltered(e, e.where(col("vec_id") < 5),
          col("label") === 1, k = 10, stride = 100, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // Filtered-ANN recall CONTRACT (the q26b twin under the predicate):
    // recall@10 of the filtered IVF search against the exact top-k over
    // the filtered slice — records the candidate-pool shrinkage cost at
    // this corpus's selectivity instead of letting it pass silently.
    "q222b_ann_filtered_recall" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      val exact = Similarity.cosineTopK(e.where(col("label") === 1), q, k = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val approx = Similarity.ivfCosineTopKFiltered(e, q,
          col("label") === 1, k = 10, stride = 100, nProbe = 2)
        .select(col("q_vec_id"), col("n_vec_id"))
      val hits = approx.join(exact, Seq("q_vec_id", "n_vec_id"), "left_semi")
        .groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_hits"))
      q.select(col("vec_id").as("q_vec_id"))
        .join(hits, Seq("q_vec_id"), "left_outer")
        .select(col("q_vec_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall", round(col("n_hits") / lit(10.0), 6))
        .orderBy(col("q_vec_id"))
    }),


    // FILTERED probe of the MATERIALIZED index: the build stores label
    // beside the vectors, the predicate pushes into the cell-file scan
    // (PushedFilters — pinned in SimilaritySpec). Shares q222's oracle
    // verbatim: the indexed filtered path must reproduce the direct one.
    "q222c_ann_filtered_indexed" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_fidx_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e, idx, stride = 100, metaCols = Seq("label"))
      Similarity.searchAnnIndexedFiltered(s, idx, e.where(col("vec_id") < 5),
          col("label") === 1, k = 10, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // INDEX DELETE: build on the full corpus, tombstone vec_id ≡ 2 mod 4
    // (which deletes centroid 200's SOURCE VECTOR — the frozen-quantizer
    // semantic is in the gate: the centroid survives, its vector stops
    // being a candidate), then probe. Oracle = direct IVF over
    // (corpus ∖ deletes) with the ORIGINAL centroid set.
    "q223_ann_index_delete" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_delete_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e, idx, stride = 100)
      Similarity.deleteFromAnnIndex(s,
        e.where(pmod(col("vec_id"), lit(4)) === 2), idx)
      Similarity.searchAnnIndexed(s, idx, e.where(col("vec_id") < 5),
          k = 10, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // EMBEDDING-side daily ingest: the vector-store upsert pipeline as
    // one decision log (exact-dup screen on the array key itself →
    // LSH near-dup screen vs history → decontamination vs the bench
    // slice → keep). Delta = a fresh slice plus PLANTED copies of
    // history vectors (re-keyed +1000) so the exact stage has real
    // prey; tauNearDup 0.4 and tau 0.2 sit inside the cosine range so
    // the near-dup and contaminated stages fire too (bits pinned to 4,
    // the q16b oracle-mirror rule).
    "q225_embedding_ingest" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val hist = e.where(col("vec_id") >= 250)
      val bench = e.where(col("vec_id") < 5)
      val delta = e.where(col("vec_id") >= 5 && col("vec_id") < 250)
        .select(col("vec_id"), col("embedding"))
        .unionByName(e.where(col("vec_id") >= 400)
          .select((col("vec_id") - 400 + 1000).as("vec_id"), col("embedding")))
      Similarity.embeddingIngest(delta, hist, bench,
          tau = 0.2, tauNearDup = 0.4)
        .orderBy(col("vec_id"))
    }),


    // INDEX OBSERVABILITY: per-cell list balance + tombstone debt after
    // the q223 delete — the table a compaction policy reads. Oracle
    // recomputes the assignment distribution from the shared IVF chain.
    "q224_ann_index_stats" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_stats_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e, idx, stride = 100)
      Similarity.deleteFromAnnIndex(s,
        e.where(pmod(col("vec_id"), lit(4)) === 2), idx)
      Similarity.annIndexStats(s, idx).orderBy(col("cell"))
    }),


    // COMPACTION answer-invariance: same build + delete as q223, but the
    // tombstones are folded into a NEW generation and committed with one
    // atomic marker (the version-pointer swap) before the probe — shares
    // q223's oracle verbatim, so a compaction that loses or resurrects a
    // row hash-mismatches the gate.
    "q223b_ann_index_compact" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_compact_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e, idx, stride = 100)
      Similarity.deleteFromAnnIndex(s,
        e.where(pmod(col("vec_id"), lit(4)) === 2), idx)
      Similarity.compactAnnIndex(s, idx)
      Similarity.searchAnnIndexed(s, idx, e.where(col("vec_id") < 5),
          k = 10, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // RE-INSERT round trip: delete a quarter of the corpus, FOLD the
    // deletes (compaction — the supported precondition appendAnnIndex's
    // re-insert guard enforces loudly), then append the same rows back.
    // Frozen centroids mean the re-appended rows reclaim their original
    // cells, so the probe equals the direct IVF over the FULL corpus —
    // q26's oracle verbatim. Pins the r10-advice fix: delete(id) then
    // append(id) can never silently lose a live row (without the
    // compact, the append fails loudly — SimilaritySpec).
    "q226_ann_reinsert" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_reinsert_")
      val e = tbl(s, dir, "embeddings")
      val dead = pmod(col("vec_id"), lit(4)) === 2
      Similarity.buildAnnIndex(e, idx, stride = 100)
      Similarity.deleteFromAnnIndex(s, e.where(dead), idx)
      Similarity.compactAnnIndex(s, idx)
      Similarity.appendAnnIndex(s, e.where(dead), idx)
      Similarity.searchAnnIndexed(s, idx, e.where(col("vec_id") < 5),
          k = 10, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // ONE-CALL MAINTENANCE over the q223 scenario: a quarter of the
    // corpus tombstoned reads debt 0.25 > bound 0.2, so the call folds
    // (generation 0 → 1) and flags every pre-call serve artifact stale.
    // Oracle recomputes the report from the corpus counts.
    "q228_ann_maintenance" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_maint_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e, idx, stride = 100)
      Similarity.deleteFromAnnIndex(s,
        e.where(pmod(col("vec_id"), lit(4)) === 2), idx)
      Similarity.maintainAnnIndex(s, idx, maxDebtFrac = 0.2)
    }),


    // The NO-OP arm of the policy bound: ten tombstones on the same
    // corpus sit far under 0.2, so the call measures, folds nothing,
    // and leaves the deletes pending (probes still honor them via the
    // anti-join — q223's contract, not this report's job).
    "q228b_ann_maintenance_noop" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_maintb_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e, idx, stride = 100)
      Similarity.deleteFromAnnIndex(s, e.where(col("vec_id") < 10), idx)
      Similarity.maintainAnnIndex(s, idx, maxDebtFrac = 0.2)
    }),


    // ADC+REFINE recall contract (the r12 verdict's #3): the filtered
    // IVF-ADC tier's recall@10 (q229b's 0.3–0.5 floor) NEXT TO the
    // refined tier's at the SAME probe budget — the ADC top-50 (5×k)
    // re-ranked by true cosine from the probed cells. Both recalls
    // against the exact float top-10 over the filtered slice; the
    // refined column existing to sit strictly above the adc one is
    // asserted in SimilaritySpec, the oracle pins the numbers.
    "q229c_ivfpq_refined_recall" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      val exact = Similarity.cosineTopK(e.where(col("label") === 1), q, k = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      def hitsOf(approx: DataFrame, name: String): DataFrame =
        approx.select(col("q_vec_id"), col("n_vec_id"))
          .join(exact, Seq("q_vec_id", "n_vec_id"), "left_semi")
          .groupBy(col("q_vec_id")).agg(count(lit(1)).as(name))
      val adc = Similarity.ivfPqTopKFiltered(e, q, col("label") === 1,
        kTop = 10)
      val refined = Similarity.ivfPqTopKFilteredRefined(e, q,
        col("label") === 1, kTop = 10, refineFactor = 5)
      q.select(col("vec_id").as("q_vec_id"))
        .join(hitsOf(adc, "_ha"), Seq("q_vec_id"), "left_outer")
        .join(hitsOf(refined, "_hr"), Seq("q_vec_id"), "left_outer")
        .select(col("q_vec_id"),
          round(coalesce(col("_ha"), lit(0L)) / lit(10.0), 6).as("recall_adc"),
          round(coalesce(col("_hr"), lit(0L)) / lit(10.0), 6)
            .as("recall_refined"))
        .orderBy(col("q_vec_id"))
    }),


    // HAMMING serve tier (the 42× rung, r12 verdict #1): build the
    // index, package the binary serve state (sign bits per live row,
    // cells + centroids + snapshot coordinates), probe it with the
    // row-local serving screen at nProbe = 2. Oracle = the IVF
    // cell-pruning CTEs composed with q135's sign-bit hamming chain.
    "q230_hamming_serve" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_hamm_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e, idx, stride = 100)
      val st = StreamingOps.annServeHammingState(s, idx, bits = 48)
      StreamingOps.annSearchStreamHamming(e.where(col("vec_id") < 5), st,
          k = 10, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // Hamming-serve recall CONTRACT: what the cell pruning costs the
    // binary tier — recall@10 of the probed-cell serve against the
    // FLAT hammingTopK over the same corpus (quantization cost is
    // q135b's contract; this isolates the pruning term, so the two
    // compose).
    "q230b_hamming_serve_recall" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_hammb_")
      val e = tbl(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      Similarity.buildAnnIndex(e, idx, stride = 100)
      val st = StreamingOps.annServeHammingState(s, idx, bits = 48)
      val approx = StreamingOps.annSearchStreamHamming(q, st,
          k = 10, nProbe = 2)
        .select(col("q_vec_id"), col("n_vec_id"))
      val flat = Similarity.hammingTopK(e, q, k = 10, bits = 48)
        .select(col("q_vec_id"), col("n_vec_id"))
      val hits = approx.join(flat, Seq("q_vec_id", "n_vec_id"), "left_semi")
        .groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_hits"))
      q.select(col("vec_id").as("q_vec_id"))
        .join(hits, Seq("q_vec_id"), "left_outer")
        .select(col("q_vec_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall", round(col("n_hits") / lit(10.0), 6))
        .orderBy(col("q_vec_id"))
    }),


    // INT8-SDC serve tier (the 4× rung): byte codes + correction stats
    // per live row packaged per cell; the serving screen quantizes the
    // query row-locally with the SHARED int8Coded expressions and
    // replays the q171 score tree. Oracle = q171's SDC CTEs restricted
    // to the probed cells.
    "q231_int8_serve" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_int8_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e, idx, stride = 100)
      val st = StreamingOps.annServeInt8State(s, idx)
      StreamingOps.annSearchStreamInt8(e.where(col("vec_id") < 5), st,
          kTop = 10, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // Int8-serve recall CONTRACT: the pruning term for the 4× rung —
    // recall@10 of the probed-cell serve against the FLAT int8SdcTopK
    // (quantization cost is q171b's contract).
    "q231b_int8_serve_recall" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_int8b_")
      val e = tbl(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      Similarity.buildAnnIndex(e, idx, stride = 100)
      val st = StreamingOps.annServeInt8State(s, idx)
      val approx = StreamingOps.annSearchStreamInt8(q, st,
          kTop = 10, nProbe = 2)
        .select(col("q_vec_id"), col("n_vec_id"))
      val flat = Similarity.int8SdcTopK(e, q, kTop = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val hits = approx.join(flat, Seq("q_vec_id", "n_vec_id"), "left_semi")
        .groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_hits"))
      q.select(col("vec_id").as("q_vec_id"))
        .join(hits, Seq("q_vec_id"), "left_outer")
        .select(col("q_vec_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall", round(col("n_hits") / lit(10.0), 6))
        .orderBy(col("q_vec_id"))
    }),


    // FILTERED-SERVE REFRESH, float tier (the predicate-serialization
    // contract end-to-end): build the index over the first 400 vectors
    // with label stored beside them, bake a FILTERED serve state
    // (label = 1 — the predicate's Catalyst SQL rendering travels in
    // the meta row), append the rest, O(delta)-refresh, probe with the
    // serving screen. Oracle = direct filtered IVF with FROZEN centroid
    // seeds: refresh ≡ rebuild ≡ direct, one SQL text pins all three.
    "q232_filtered_serve_refresh" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_fsref_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e.where(col("vec_id") < 400), idx,
        stride = 100, metaCols = Seq("label"))
      val st = StreamingOps.annServeState(s, idx, Some(col("label") === 1))
      Similarity.appendAnnIndex(s, e.where(col("vec_id") >= 400), idx)
      val refreshed = StreamingOps.refreshAnnServeState(s, idx, st)
      StreamingOps.annSearchStream(e.where(col("vec_id") < 5), refreshed,
          k = 10, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // FILTERED hamming serve + refresh (the 42× rung under a metadata
    // predicate): sign-bit candidate arrays hold label = 1 rows only,
    // the appended delta passes through the artifact's own decoded
    // predicate. Oracle = the q230 chain with the candidate clause and
    // frozen centroid seeds.
    "q233_hamming_filtered_serve" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_hfref_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e.where(col("vec_id") < 400), idx,
        stride = 100, metaCols = Seq("label"))
      val st = StreamingOps.annServeHammingState(s, idx, bits = 48,
        filter = Some(col("label") === 1))
      Similarity.appendAnnIndex(s, e.where(col("vec_id") >= 400), idx)
      val refreshed = StreamingOps.refreshAnnServeState(s, idx, st)
      StreamingOps.annSearchStreamHamming(e.where(col("vec_id") < 5),
          refreshed, k = 10, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // FILTERED int8 serve + refresh (the 4× rung under the same
    // predicate): quantized candidate stats for label = 1 rows only,
    // delta re-quantized with the SHARED int8Coded expressions at
    // refresh. Oracle = the q231 SDC chain with the candidate clause
    // and frozen centroid seeds.
    "q234_int8_filtered_serve" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_ifref_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e.where(col("vec_id") < 400), idx,
        stride = 100, metaCols = Seq("label"))
      val st = StreamingOps.annServeInt8State(s, idx,
        filter = Some(col("label") === 1))
      Similarity.appendAnnIndex(s, e.where(col("vec_id") >= 400), idx)
      val refreshed = StreamingOps.refreshAnnServeState(s, idx, st)
      StreamingOps.annSearchStreamInt8(e.where(col("vec_id") < 5),
          refreshed, kTop = 10, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // QUANTIZER RETRAIN: build on the full corpus, tombstone vec_id ≡ 2
    // (mod 4) — killing centroid 200's SOURCE VECTOR — then RETRAIN:
    // fresh centroids from the live rows (200 is no longer a seed),
    // every live row re-assigned, tombstones folded, lists + quantizer
    // committed by ONE atomic marker. Oracle = direct IVF over the live
    // rows with the LIVE seed set — retrain ≡ a fresh build on the live
    // corpus, the frozen-quantizer contract's explicit release valve.
    "q236_ann_retrain" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_retrain_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e, idx, stride = 100)
      Similarity.deleteFromAnnIndex(s,
        e.where(pmod(col("vec_id"), lit(4)) === 2), idx)
      Similarity.retrainAnnIndex(s, idx, stride = 100)
      Similarity.searchAnnIndexed(s, idx, e.where(col("vec_id") < 5),
          k = 10, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // SERVE-ARTIFACT STATS (the pre-deploy radar): one row over the
    // packaged artifact's own sections — tier, predicate population,
    // list-skew signal, snapshot coordinates. Oracle recomputes the
    // per-cell counts from the filtered IVF assignment. n_cell_files
    // is a physical layout detail DuckDB cannot see — projected out.
    "q235_serve_state_stats" -> ((s, dir) => {
      val idx = tempIndexDir("graft_ann_sstat_")
      val e = tbl(s, dir, "embeddings")
      Similarity.buildAnnIndex(e, idx, stride = 100, metaCols = Seq("label"))
      val st = StreamingOps.annServeState(s, idx, Some(col("label") === 1))
      StreamingOps.serveStateStats(st)
        .select(col("tier"), col("filtered"), col("n_cells"),
          col("n_members"), col("max_cell"), col("avg_cell"),
          col("generation"), col("n_tombstones"))
    }),


    // INT8 SDC top-k: both sides quantized, cosine expanded so scoring
    // reads byte codes + per-vector stats only — the 4× memory rung
    // between PQ (q99) and sign bits (q135).
    "q171_int8_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.int8SdcTopK(e, e.where(col("vec_id") < 5), kTop = 10)
        .orderBy(col("q_vec_id"), col("rank"))
    }),


    // Int8 tier recall contract vs the exact scan (the q99c pattern):
    // 8-bit cells should be near-lossless — the contract records it.
    "q171b_int8_recall" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      val exact = Similarity.cosineTopK(e, q, k = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val approx = Similarity.int8SdcTopK(e, q, kTop = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val hits = approx.join(exact, Seq("q_vec_id", "n_vec_id"), "left_semi")
        .groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_hits"))
      q.select(col("vec_id").as("q_vec_id"))
        .join(hits, Seq("q_vec_id"), "left_outer")
        .select(col("q_vec_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall", round(col("n_hits") / lit(10.0), 6))
        .orderBy(col("q_vec_id"))
    }),


    // Exact MAXIMUM-INNER-PRODUCT top-k: the two-tower retrieval
    // scoring order (dot, not cosine — document norms carry learned
    // relevance mass). The q15 broadcast-scan shape ranking on the
    // rounded dot.
    "q130_mips_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.mipsTopK(e, e.where(col("vec_id") < 5), k = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // MIPS→cosine REDUCTION contract (Bachrach 2014): corpus augmented
    // with √(M²−‖x‖²), queries with 0 — augmented cosine is a monotone
    // transform of the dot, so the cosine ANN stack answers MIPS; the
    // contract asserts per-query rank-set agreement with q130.
    "q130b_mips_reduction" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val qv = e.where(col("vec_id") < 5)
      val aug = Similarity.augmentForMips(e)
      val qa = qv.select(col("vec_id"),
        concat(col("embedding").cast("array<double>"), array(lit(0.0)))
          .as("embedding"))
      val direct = Similarity.mipsTopK(e, qv, k = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val reduced = Similarity.cosineTopK(aug, qa, k = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val hits = reduced.join(direct, Seq("q_vec_id", "n_vec_id"), "left_semi")
        .groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_hits"))
      qv.select(col("vec_id").as("q_vec_id"))
        .join(hits, Seq("q_vec_id"), "left_outer")
        .select(col("q_vec_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall", round(col("n_hits") / lit(10.0), 6))
        .withColumn("order_preserved", col("n_hits") === 10L)
        .orderBy(col("q_vec_id"))
    }),


    // k-NN classification over the embedding table: majority label of
    // the 10 exact cosine neighbors, ties to the smallest label — the
    // zero-training label propagator; swap any ANN tier in at scale.
    "q131_knn_classify" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.knnClassify(e, e.where(col("vec_id") < 5), k = 10)
        .orderBy(col("q_vec_id"))
    }),


    // LABEL-OUTLIER screen: each vector's cosine to its own label's
    // integer-exact centroid, bottom-5% tail flagged per label — the
    // mislabeled-point detector.
    "q142_label_outliers" -> ((s, dir) =>
      Similarity.labelOutliers(tbl(s, dir, "embeddings"), pLo = 0.05)
        .orderBy(col("vec_id"))),


    // EMBEDDING-HEALTH audit: one row of null/NaN/zero-vector counts,
    // dimensionality envelope, dead dims, and the micro-exact norm
    // envelope — the similarity tier's q104-style preflight.
    "q167_embedding_health" -> ((s, dir) =>
      Similarity.embeddingHealth(tbl(s, dir, "embeddings"))),


    // Dimension covariance/correlation matrix: exact integer
    // co-moments of micro-quantized components, map-side (i,j)
    // fan-out — the d×d frame a PCA/whitening fit consumes.
    "q188_embedding_covariance" -> ((s, dir) =>
      Similarity.covarianceMatrix(tbl(s, dir, "embeddings"))
        .orderBy(col("i"), col("j"))),


    // Top principal component by exact-integer power iteration over
    // the floor-quantized covariance — distributed co-moments, driver
    // BigInt eigensolve.
    "q196_principal_component" -> ((s, dir) =>
      Similarity.principalComponent(tbl(s, dir, "embeddings"), iters = 20)
        .orderBy(col("dim"))),


    // PC projection: every vector's exact integer dot with the fitted
    // micro component + cosine alignment — the per-row bias readout.
    "q199_pc_projection" -> ((s, dir) =>
      Similarity.pcProjection(tbl(s, dir, "embeddings"), iters = 20)
        .orderBy(col("vec_id"))),


    // Second principal component by deflated power iteration — PC1 +
    // PC2 are the 2-D embedding map; ortho_cos measures the deflation.
    "q208_principal_component2" -> ((s, dir) =>
      Similarity.principalComponent2(tbl(s, dir, "embeddings"), iters = 20)
        .orderBy(col("dim"))),


    // Incremental PCA: per-slice mergeable co-moment states (even/odd
    // vec_ids) merged, then the SAME driver eigensolve — must equal
    // q196's all-at-once fit (its oracle verbatim: the additive exact
    // sums make merge ≡ union by construction).
    "q214_pca_incremental" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.principalComponentFromState(
          Similarity.mergeCoMomentStates(
            Similarity.coMomentState(e.where(col("vec_id") % 2 === 0)),
            Similarity.coMomentState(e.where(col("vec_id") % 2 === 1))),
          iters = 20)
        .orderBy(col("dim"))
    }),


    // Matryoshka prefix-dim retrieval: exact cosine over the first 16
    // of 64 components — the 4× cheaper scan tier.
    "q189_matryoshka_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.matryoshkaTopK(e, e.where(col("vec_id") < 5), k = 10, dims = 16)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // Matryoshka recall contract vs the full-dim exact scan (q171b's
    // shape): measures whether THESE embeddings have the MRL property
    // before the cheap tier is trusted.
    "q189b_matryoshka_recall" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
      val exact = Similarity.cosineTopK(e, q, k = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val approx = Similarity.matryoshkaTopK(e, q, k = 10, dims = 16)
        .select(col("q_vec_id"), col("n_vec_id"))
      val hits = approx.join(exact, Seq("q_vec_id", "n_vec_id"), "left_semi")
        .groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_hits"))
      q.select(col("vec_id").as("q_vec_id"))
        .join(hits, Seq("q_vec_id"), "left_outer")
        .select(col("q_vec_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall", round(col("n_hits") / lit(10.0), 6))
        .orderBy(col("q_vec_id"))
    }),


    // EMBEDDING-CENTROID drift per label between corpus halves: the
    // embedding-space q79 — cosine between each label's two integer-
    // exact centroids (scale invariance cancels the count division).
    "q136_centroid_drift" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.centroidDrift(
          e.where(col("vec_id") < 250), e.where(col("vec_id") >= 250))
        .orderBy(col("label"))
    }),


    // BINARY-signature Hamming top-k: 48 sign bits in one long, one
    // XOR+popcount per candidate — the binary sibling of q99b's ADC
    // scan, integer-exact end to end.
    "q135_hamming_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Similarity.hammingTopK(e, e.where(col("vec_id") < 5), k = 10, bits = 48)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("q_vec_id"), col("rnk"))
    }),


    // Binary-then-exact pipeline recall CONTRACT: Hamming top-100
    // candidates re-ranked by true cosine, recall@10 vs the exact q15
    // ranking — the coarse tier touches floats only for 100 rows per
    // query.
    "q135b_hamming_recall" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val qv = e.where(col("vec_id") < 5)
      val cand = Similarity.hammingTopK(e, qv, k = 100, bits = 48)
        .select(col("q_vec_id"), col("n_vec_id"))
      val exact = Similarity.cosineTopK(e, qv, k = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      val hits = exact.join(cand, Seq("q_vec_id", "n_vec_id"), "left_semi")
        .groupBy(col("q_vec_id")).agg(count(lit(1)).as("n_hits"))
      qv.select(col("vec_id").as("q_vec_id"))
        .join(hits, Seq("q_vec_id"), "left_outer")
        .select(col("q_vec_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall", round(col("n_hits") / lit(10.0), 6))
        .orderBy(col("q_vec_id"))
    })
  )

  /** The filtered IVF-ADC chain shared by q229/q229b: the q101 CTEs
    * with the candidate side restricted to label = 1 (probes,
    * centroids, codebook, codes all unfiltered — the two-stage
    * frozen-quantizer contract). Ends with `adcp` = (q_vec_id,
    * n_vec_id, adc). */
  private def ivfPqFilteredCtes: String =
    s"""$pqCtes,
       |lbl AS (SELECT vec_id, label FROM embeddings),
       |n AS (SELECT e.vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm,
       |             label
       |      FROM e JOIN lbl ON e.vec_id = lbl.vec_id),
       |c AS (SELECT vec_id AS cent_id, emb AS c_emb, nrm AS c_nrm
       |      FROM n WHERE vec_id % 100 = 0),
       |assign AS (
       |  SELECT vec_id, cent_id AS cell FROM (
       |    SELECT n.vec_id, c.cent_id,
       |           row_number() OVER (
       |             PARTITION BY n.vec_id
       |             ORDER BY list_dot_product(n.emb, c.c_emb) / (n.nrm * c.c_nrm)
       |               DESC, c.cent_id) AS rn
       |    FROM n CROSS JOIN c WHERE n.label = 1) WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS q_vec_id, cent_id AS cell FROM (
       |    SELECT n.vec_id, c.cent_id,
       |           row_number() OVER (
       |             PARTITION BY n.vec_id
       |             ORDER BY list_dot_product(n.emb, c.c_emb) / (n.nrm * c.c_nrm)
       |               DESC, c.cent_id) AS rn
       |    FROM n CROSS JOIN c WHERE n.vec_id < 5) WHERE rn <= 2),
       |$pqLutCte,
       |adcp AS (
       |  SELECT l.q_vec_id, cd.vec_id AS n_vec_id, round(sum(l.v), 6) AS adc
       |  FROM codes cd
       |  JOIN assign a ON a.vec_id = cd.vec_id
       |  JOIN probes p ON p.cell = a.cell
       |  JOIN lut l ON l.q_vec_id = p.q_vec_id AND l.s = cd.s AND l.j = cd.j
       |  WHERE p.q_vec_id <> cd.vec_id
       |  GROUP BY 1, 2)""".stripMargin

  /** The IVF cell machinery as CTEs over an existing source relation —
    * assign + the vec_id < 5 probes at nProbe = 2, the q26 definitions
    * verbatim; shared by the serve-tier oracles (q230/q231 families
    * and their filtered/refreshed q233/q234 twins). `src` must carry
    * (vec_id, emb [, metadata…]); `candPred` prunes the CANDIDATE side
    * only (n2.* in scope — probes and centroids always read the
    * unfiltered corpus, the frozen-quantizer contract); `centPred`
    * bounds the centroid seeds to the pre-append history (the q100
    * frozen-centroid clause for refresh lifecycles). */
  private def ivfCellCtes(
      src: String = "e",
      candPred: String = "TRUE",
      centPred: String = "TRUE"): String =
    s"""n2 AS (SELECT *, sqrt(list_dot_product(emb, emb)) AS nrm
      |       FROM $src),
      |c2 AS (SELECT vec_id AS cent_id, emb AS c_emb, nrm AS c_nrm
      |       FROM n2 WHERE vec_id % 100 = 0 AND ($centPred)),
      |assign AS (
      |  SELECT vec_id, cent_id AS cell FROM (
      |    SELECT n2.vec_id, c2.cent_id,
      |           row_number() OVER (
      |             PARTITION BY n2.vec_id
      |             ORDER BY list_dot_product(n2.emb, c2.c_emb) /
      |               (n2.nrm * c2.c_nrm) DESC, c2.cent_id) AS rn
      |    FROM n2 CROSS JOIN c2 WHERE ($candPred)) WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS q_vec_id, cent_id AS cell FROM (
      |    SELECT n2.vec_id, c2.cent_id,
      |           row_number() OVER (
      |             PARTITION BY n2.vec_id
      |             ORDER BY list_dot_product(n2.emb, c2.c_emb) /
      |               (n2.nrm * c2.c_nrm) DESC, c2.cent_id) AS rn
      |    FROM n2 CROSS JOIN c2 WHERE n2.vec_id < 5) WHERE rn <= 2)""".stripMargin

  /** q135's 48-bit sign-signature CTE over an existing `e` — ends
    * with `sig` = (vec_id, sg). */
  private def hammingSigCte: String =
    s"""sig AS (
       |  SELECT vec_id,
       |         list_sum(list_transform(range(0, 48), h ->
       |           CASE WHEN ${duckSignDot("h", "emb")} > 0
       |                THEN (1::BIGINT << h::INTEGER) ELSE 0::BIGINT END)) AS sg
       |  FROM e)""".stripMargin

  val sql: Map[String, String] = Map(

    "q15_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.vec_id AS q_vec_id, e.vec_id AS n_vec_id,
        |         round(list_dot_product(q.emb, e.emb) /
        |               (sqrt(list_dot_product(q.emb, q.emb)) *
        |                sqrt(list_dot_product(e.emb, e.emb))), 6) AS cos
        |  FROM q JOIN e ON q.vec_id <> e.vec_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
        |                               ORDER BY cos DESC, n_vec_id) AS rnk
        |  FROM scored)
        |SELECT q_vec_id, n_vec_id, cos, rnk FROM ranked
        |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    "q16_embedding_near_dup" ->
      """SELECT d1, d2, cos FROM (
        |  SELECT a.vec_id AS d1, b.vec_id AS d2,
        |         round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |               (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |                sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |WHERE cos >= 0.4 ORDER BY d1, d2""".stripMargin,


    "q16b_embedding_lsh_near_dup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |tb AS (
         |  SELECT vec_id, t,
         |         list_sum(list_transform(range(0, 4), i ->
         |           CASE WHEN ${duckSignDot("t * 4 + i", "emb")} > 0
         |                THEN (1::BIGINT << i::INTEGER) ELSE 0::BIGINT END)) AS bucket
         |  FROM e CROSS JOIN range(4) r(t)),
         |bok AS (
         |  SELECT t, bucket FROM tb GROUP BY 1, 2
         |  HAVING count(*) <= ${Similarity.MaxPairBucket}),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
         |  FROM tb a JOIN tb b
         |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  JOIN bok ON a.t = bok.t AND a.bucket = bok.bucket),
         |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e)
         |SELECT d1, d2, cos FROM (
         |  SELECT d1, d2,
         |         round(list_dot_product(x.emb, y.emb) / (x.nrm * y.nrm), 6) AS cos
         |  FROM cand JOIN n x ON d1 = x.vec_id JOIN n y ON d2 = y.vec_id)
         |WHERE cos >= 0.4 ORDER BY d1, d2""".stripMargin,


    "q25_ann_lsh_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |b AS (
         |  SELECT vec_id, emb,
         |         list_sum(list_transform(range(0, 8), h ->
         |           CASE WHEN ${duckSignDot("h", "emb")} > 0
         |                THEN (1::BIGINT << h::INTEGER) ELSE 0::BIGINT END)) AS bucket,
         |         sqrt(list_dot_product(emb, emb)) AS nrm
         |  FROM e),
         |q AS (SELECT * FROM b WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
         |         round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cos
         |  FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |                               ORDER BY cos DESC, n_vec_id) AS rnk
         |  FROM scored)
         |SELECT q_vec_id, n_vec_id, cos, rnk FROM ranked
         |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    "q25b_ann_lsh_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |b AS (
         |  SELECT vec_id, emb,
         |         list_sum(list_transform(range(0, 4), h ->
         |           CASE WHEN ${duckSignDot("h", "emb")} > 0
         |                THEN (1::BIGINT << h::INTEGER) ELSE 0::BIGINT END)) AS bucket,
         |         sqrt(list_dot_product(emb, emb)) AS nrm
         |  FROM e),
         |q AS (SELECT * FROM b WHERE vec_id < 5),
         |approx AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |             round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6)
         |               DESC, c.vec_id) AS rnk
         |    FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id)
         |  WHERE rnk <= 10),
         |exact AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |             round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6)
         |               DESC, c.vec_id) AS rnk
         |    FROM q JOIN b c ON q.vec_id <> c.vec_id)
         |  WHERE rnk <= 10),
         |hits AS (
         |  SELECT a.q_vec_id, count(*) AS n_hits
         |  FROM approx a JOIN exact x
         |    ON a.q_vec_id = x.q_vec_id AND a.n_vec_id = x.n_vec_id
         |  GROUP BY 1)
         |SELECT v.vec_id AS q_vec_id,
         |       coalesce(n_hits, 0)::BIGINT AS n_hits,
         |       round(coalesce(n_hits, 0) / 10.0, 6) AS recall
         |FROM (SELECT vec_id FROM e WHERE vec_id < 5) v
         |LEFT JOIN hits ON v.vec_id = hits.q_vec_id
         |ORDER BY q_vec_id""".stripMargin,


    "q26_ann_ivf_topk" -> ivfTopKSql,


    "q26b_ann_ivf_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
        |c AS (SELECT vec_id AS cent_id, emb AS c_emb, nrm AS c_nrm
        |      FROM n WHERE vec_id % 100 = 0),
        |assign AS (
        |  SELECT vec_id, emb, nrm, cent_id AS cell FROM (
        |    SELECT n.vec_id, n.emb, n.nrm, c.cent_id,
        |           row_number() OVER (
        |             PARTITION BY n.vec_id
        |             ORDER BY list_dot_product(n.emb, c.c_emb) / (n.nrm * c.c_nrm)
        |               DESC, c.cent_id) AS rn
        |    FROM n CROSS JOIN c) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS q_vec_id, emb AS q_emb, nrm AS q_nrm, cent_id AS cell
        |  FROM (
        |    SELECT n.vec_id, n.emb, n.nrm, c.cent_id,
        |           row_number() OVER (
        |             PARTITION BY n.vec_id
        |             ORDER BY list_dot_product(n.emb, c.c_emb) / (n.nrm * c.c_nrm)
        |               DESC, c.cent_id) AS rn
        |    FROM n CROSS JOIN c WHERE n.vec_id < 5) WHERE rn <= 2),
        |approx AS (
        |  SELECT q_vec_id, n_vec_id FROM (
        |    SELECT p.q_vec_id, a.vec_id AS n_vec_id,
        |           row_number() OVER (PARTITION BY p.q_vec_id ORDER BY
        |             round(list_dot_product(p.q_emb, a.emb) / (p.q_nrm * a.nrm), 6)
        |               DESC, a.vec_id) AS rnk
        |    FROM probes p JOIN assign a
        |      ON p.cell = a.cell AND p.q_vec_id <> a.vec_id)
        |  WHERE rnk <= 10),
        |exact AS (
        |  SELECT q_vec_id, n_vec_id FROM (
        |    SELECT q.vec_id AS q_vec_id, t.vec_id AS n_vec_id,
        |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |             round(list_dot_product(q.emb, t.emb) / (q.nrm * t.nrm), 6)
        |               DESC, t.vec_id) AS rnk
        |    FROM (SELECT * FROM n WHERE vec_id < 5) q
        |    JOIN n t ON q.vec_id <> t.vec_id)
        |  WHERE rnk <= 10),
        |hits AS (
        |  SELECT a.q_vec_id, count(*) AS n_hits
        |  FROM approx a JOIN exact x
        |    ON a.q_vec_id = x.q_vec_id AND a.n_vec_id = x.n_vec_id
        |  GROUP BY 1)
        |SELECT v.vec_id AS q_vec_id,
        |       coalesce(n_hits, 0)::BIGINT AS n_hits,
        |       round(coalesce(n_hits, 0) / 10.0, 6) AS recall
        |FROM (SELECT vec_id FROM e WHERE vec_id < 5) v
        |LEFT JOIN hits ON v.vec_id = hits.q_vec_id
        |ORDER BY q_vec_id""".stripMargin,


    // Materialized-index probe — identical assignment/probe/re-rank
    // definitions as the direct path, so the index roundtrip must
    // reproduce q26 exactly (the q71 search-index contract for ANN).
    "q82_ann_indexed" -> ivfTopKSql,


    "q42_embedding_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |           FROM embeddings WHERE vec_id < 20),
        |m AS (SELECT vec_id, emb, list_min(emb) AS mn,
        |             (list_max(emb) - list_min(emb)) / 255.0 AS sc
        |      FROM e)
        |SELECT vec_id, round(mn, 6) AS minv, round(sc, 6) AS scale,
        |       (p - 1)::INTEGER AS dim,
        |       CASE WHEN sc = 0 THEN 0
        |            ELSE least(greatest(
        |                   floor((emb[p::INTEGER] - mn) / sc + 0.5), 0), 255)
        |       END::INTEGER AS qv
        |FROM m, unnest(range(1, len(emb) + 1)) r(p)
        |ORDER BY vec_id, dim""".stripMargin,


    "q80_random_projection" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
         |SELECT vec_id, p::BIGINT AS dim,
         |       round(${duckSignDot("p", "emb")} / sqrt(16.0), 6) AS val
         |FROM e CROSS JOIN range(16) r(p)
         |ORDER BY vec_id, dim""".stripMargin,


    "q80b_projection_distortion" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |pe AS (SELECT vec_id, list_transform(range(0, 32), p ->
         |         ${duckSignDot("p", "emb")} / sqrt(32.0)) AS emb FROM e),
         |n  AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
         |pn AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM pe),
         |err AS (
         |  SELECT q.vec_id AS q_vec_id,
         |         abs(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm)
         |           - list_dot_product(pq.emb, pc.emb) / (pq.nrm * pc.nrm)) AS e
         |  FROM (SELECT * FROM n WHERE vec_id < 5) q
         |  JOIN n c ON q.vec_id <> c.vec_id
         |  JOIN pn pq ON pq.vec_id = q.vec_id
         |  JOIN pn pc ON pc.vec_id = c.vec_id)
         |SELECT q_vec_id, round(avg(e), 6) AS mean_err, round(max(e), 6) AS max_err,
         |       round(avg(e), 6) <= 0.25 AS mean_ok,
         |       round(max(e), 6) <= 0.8 AS max_ok
         |FROM err GROUP BY 1 ORDER BY q_vec_id""".stripMargin,


    // Multi-probe LSH (q25's family at bits=8): the probe expansion is
    // mirrored exactly — each query's bucket list is its own bucket plus
    // every one-bit XOR flip, then the same bucket equi-join + rounded
    // cosine re-rank as q25.
    "q95_ann_multiprobe" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |b AS (
         |  SELECT vec_id, emb,
         |         list_sum(list_transform(range(0, 8), h ->
         |           CASE WHEN ${duckSignDot("h", "emb")} > 0
         |                THEN (1::BIGINT << h::INTEGER) ELSE 0::BIGINT END)) AS bucket,
         |         sqrt(list_dot_product(emb, emb)) AS nrm
         |  FROM e),
         |q AS (
         |  SELECT vec_id, emb, nrm, unnest(probes) AS bucket FROM (
         |    SELECT vec_id, emb, nrm,
         |           list_prepend(bucket, list_transform(range(0, 8),
         |             i -> xor(bucket, 1::BIGINT << i::INTEGER))) AS probes
         |    FROM b WHERE vec_id < 5)),
         |scored AS (
         |  SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
         |         round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cos
         |  FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |                               ORDER BY cos DESC, n_vec_id) AS rnk
         |  FROM scored)
         |SELECT q_vec_id, n_vec_id, cos, rnk FROM ranked
         |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    // Multi-probe recall contract at the SAME bits=8 the production call
    // uses: approx = the probe-expanded run above, exact = the
    // brute-force top-10, recall = |approx ∩ exact| / 10 per query.
    "q95b_ann_multiprobe_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |b AS (
         |  SELECT vec_id, emb,
         |         list_sum(list_transform(range(0, 8), h ->
         |           CASE WHEN ${duckSignDot("h", "emb")} > 0
         |                THEN (1::BIGINT << h::INTEGER) ELSE 0::BIGINT END)) AS bucket,
         |         sqrt(list_dot_product(emb, emb)) AS nrm
         |  FROM e),
         |qb AS (SELECT * FROM b WHERE vec_id < 5),
         |q AS (
         |  SELECT vec_id, emb, nrm, unnest(probes) AS bucket FROM (
         |    SELECT vec_id, emb, nrm,
         |           list_prepend(bucket, list_transform(range(0, 8),
         |             i -> xor(bucket, 1::BIGINT << i::INTEGER))) AS probes
         |    FROM qb)),
         |approx AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |             round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6)
         |               DESC, c.vec_id) AS rnk
         |    FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id)
         |  WHERE rnk <= 10),
         |exact AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |             round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6)
         |               DESC, c.vec_id) AS rnk
         |    FROM qb q JOIN b c ON q.vec_id <> c.vec_id)
         |  WHERE rnk <= 10),
         |hits AS (
         |  SELECT a.q_vec_id, count(*) AS n_hits
         |  FROM approx a JOIN exact x
         |    ON a.q_vec_id = x.q_vec_id AND a.n_vec_id = x.n_vec_id
         |  GROUP BY 1)
         |SELECT v.vec_id AS q_vec_id,
         |       coalesce(n_hits, 0)::BIGINT AS n_hits,
         |       round(coalesce(n_hits, 0) / 10.0, 6) AS recall
         |FROM (SELECT vec_id FROM e WHERE vec_id < 5) v
         |LEFT JOIN hits ON v.vec_id = hits.q_vec_id
         |ORDER BY q_vec_id""".stripMargin,


    // Embedding decontamination: per-corpus-vector max rounded cosine
    // against the bench set, same rounding point as the engine.
    "q108_embedding_decontaminate" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
        |c AS (SELECT * FROM n WHERE vec_id >= 20),
        |q AS (SELECT * FROM n WHERE vec_id < 20),
        |sc AS (
        |  SELECT c.vec_id,
        |         max(round(list_dot_product(c.emb, q.emb) / (c.nrm * q.nrm), 6))
        |           AS max_cos
        |  FROM c CROSS JOIN q GROUP BY 1)
        |SELECT vec_id, max_cos, max_cos >= 0.8 AS contaminated
        |FROM sc ORDER BY vec_id""".stripMargin,


    "q99_pq_codes" ->
      s"""WITH $pqCtes
         |SELECT vec_id, s::BIGINT AS sub, j::BIGINT AS code FROM codes
         |ORDER BY vec_id, sub""".stripMargin,


    // ADC: per-query m×k inner-product LUT over the codebook, score =
    // Σ_s lut[s][code_s], rounded after the sum like every score column.
    "q99b_pq_adc_topk" ->
      s"""WITH $pqCtes,
         |$pqAdcCtes
         |SELECT q_vec_id, n_vec_id, adc, rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |                               ORDER BY adc DESC, n_vec_id) AS rnk
         |  FROM adc)
         |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    "q99c_pq_recall" ->
      s"""WITH $pqCtes,
         |$pqAdcCtes,
         |approx AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |                                 ORDER BY adc DESC, n_vec_id) AS rnk
         |    FROM adc) WHERE rnk <= 10),
         |exact AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT q.vec_id AS q_vec_id, c2.vec_id AS n_vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |             round(list_dot_product(q.emb, c2.emb) /
         |                   (sqrt(list_dot_product(q.emb, q.emb)) *
         |                    sqrt(list_dot_product(c2.emb, c2.emb))), 6)
         |               DESC, c2.vec_id) AS rnk
         |    FROM (SELECT * FROM e WHERE vec_id < 5) q
         |    JOIN e c2 ON q.vec_id <> c2.vec_id)
         |  WHERE rnk <= 10),
         |hits AS (
         |  SELECT a.q_vec_id, count(*) AS n_hits
         |  FROM approx a JOIN exact x
         |    ON a.q_vec_id = x.q_vec_id AND a.n_vec_id = x.n_vec_id
         |  GROUP BY 1)
         |SELECT v.vec_id AS q_vec_id,
         |       coalesce(n_hits, 0)::BIGINT AS n_hits,
         |       round(coalesce(n_hits, 0) / 10.0, 6) AS recall
         |FROM (SELECT vec_id FROM e WHERE vec_id < 5) v
         |LEFT JOIN hits ON v.vec_id = hits.q_vec_id
         |ORDER BY q_vec_id""".stripMargin,


    // q15's exact scan + the hard-negative ceiling before ranking.
    "q103_hard_negatives" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.vec_id AS q_vec_id, e.vec_id AS n_vec_id,
        |         round(list_dot_product(q.emb, e.emb) /
        |               (sqrt(list_dot_product(q.emb, q.emb)) *
        |                sqrt(list_dot_product(e.emb, e.emb))), 6) AS cos
        |  FROM q JOIN e ON q.vec_id <> e.vec_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
        |                               ORDER BY cos DESC, n_vec_id) AS rnk
        |  FROM scored WHERE cos < 0.5)
        |SELECT q_vec_id, n_vec_id, cos, rnk FROM ranked
        |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    // q95's multi-probe candidate set + the same ceiling and re-rank.
    "q103b_hard_negatives_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |b AS (
         |  SELECT vec_id, emb,
         |         list_sum(list_transform(range(0, 8), h ->
         |           CASE WHEN ${duckSignDot("h", "emb")} > 0
         |                THEN (1::BIGINT << h::INTEGER) ELSE 0::BIGINT END)) AS bucket,
         |         sqrt(list_dot_product(emb, emb)) AS nrm
         |  FROM e),
         |q AS (
         |  SELECT vec_id, emb, nrm, unnest(probes) AS bucket FROM (
         |    SELECT vec_id, emb, nrm,
         |           list_prepend(bucket, list_transform(range(0, 8),
         |             i -> xor(bucket, 1::BIGINT << i::INTEGER))) AS probes
         |    FROM b WHERE vec_id < 5)),
         |scored AS (
         |  SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
         |         round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cos
         |  FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |                               ORDER BY cos DESC, n_vec_id) AS rnk
         |  FROM scored WHERE cos < 0.5)
         |SELECT q_vec_id, n_vec_id, cos, rnk FROM ranked
         |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    // IVF-PQ composition: the q26 cell/probe math over the q99 code/LUT
    // math, scored only inside probed cells.
    "q101_ivfpq_topk" ->
      s"""WITH $pqCtes,
         |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
         |c AS (SELECT vec_id AS cent_id, emb AS c_emb, nrm AS c_nrm
         |      FROM n WHERE vec_id % 100 = 0),
         |assign AS (
         |  SELECT vec_id, cent_id AS cell FROM (
         |    SELECT n.vec_id, c.cent_id,
         |           row_number() OVER (
         |             PARTITION BY n.vec_id
         |             ORDER BY list_dot_product(n.emb, c.c_emb) / (n.nrm * c.c_nrm)
         |               DESC, c.cent_id) AS rn
         |    FROM n CROSS JOIN c) WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS q_vec_id, cent_id AS cell FROM (
         |    SELECT n.vec_id, c.cent_id,
         |           row_number() OVER (
         |             PARTITION BY n.vec_id
         |             ORDER BY list_dot_product(n.emb, c.c_emb) / (n.nrm * c.c_nrm)
         |               DESC, c.cent_id) AS rn
         |    FROM n CROSS JOIN c WHERE n.vec_id < 5) WHERE rn <= 2),
         |$pqLutCte,
         |adcp AS (
         |  SELECT l.q_vec_id, cd.vec_id AS n_vec_id, round(sum(l.v), 6) AS adc
         |  FROM codes cd
         |  JOIN assign a ON a.vec_id = cd.vec_id
         |  JOIN probes p ON p.cell = a.cell
         |  JOIN lut l ON l.q_vec_id = p.q_vec_id AND l.s = cd.s AND l.j = cd.j
         |  WHERE p.q_vec_id <> cd.vec_id
         |  GROUP BY 1, 2)
         |SELECT q_vec_id, n_vec_id, adc, rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |                               ORDER BY adc DESC, n_vec_id) AS rnk
         |  FROM adcp)
         |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    // Filtered IVF-ADC mirror: the q101 chain with the candidate side
    // restricted to label = 1 (probes, centroids, codebook, codes all
    // stay unfiltered — the two-stage frozen-quantizer contract).
    "q229_ivfpq_filtered" ->
      s"""WITH $ivfPqFilteredCtes
         |SELECT q_vec_id, n_vec_id, adc, rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |                               ORDER BY adc DESC, n_vec_id) AS rnk
         |  FROM adcp)
         |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    // Filtered-ADC recall mirror: the q222b harness with the approx arm
    // in the compressed domain and the exact arm the float top-k over
    // the filtered slice.
    "q229b_ivfpq_filtered_recall" ->
      s"""WITH $ivfPqFilteredCtes,
         |approx AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |                                 ORDER BY adc DESC, n_vec_id) AS rnk
         |    FROM adcp) WHERE rnk <= 10),
         |exact AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT q.vec_id AS q_vec_id, t.vec_id AS n_vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |             round(list_dot_product(q.emb, t.emb) / (q.nrm * t.nrm), 6)
         |               DESC, t.vec_id) AS rnk
         |    FROM (SELECT * FROM n WHERE vec_id < 5) q
         |    JOIN n t ON q.vec_id <> t.vec_id AND t.label = 1)
         |  WHERE rnk <= 10),
         |hits AS (
         |  SELECT a.q_vec_id, count(*) AS n_hits
         |  FROM approx a JOIN exact x
         |    ON a.q_vec_id = x.q_vec_id AND a.n_vec_id = x.n_vec_id
         |  GROUP BY 1)
         |SELECT v.vec_id AS q_vec_id,
         |       coalesce(n_hits, 0)::BIGINT AS n_hits,
         |       round(coalesce(n_hits, 0) / 10.0, 6) AS recall
         |FROM (SELECT vec_id FROM e WHERE vec_id < 5) v
         |LEFT JOIN hits ON v.vec_id = hits.q_vec_id
         |ORDER BY q_vec_id""".stripMargin,


    // Incremental append contract: the grown index must answer exactly
    // like the direct IVF search over the union corpus with the FROZEN
    // pre-append centroid set (seeds bounded to the history slice).
    "q100_ann_index_append" -> ivfTopKSqlWith("vec_id < 400"),


    // Filtered ANN: same IVF chain, candidate side restricted to the
    // predicate (probes/centroids stay unfiltered — the engine's
    // full-centroid-space contract).
    "q222_ann_filtered" -> ivfTopKSqlWith("TRUE", "n.label = 1"),


    // Filtered recall contract: the q26b harness with both arms under
    // the predicate — approx = the filtered IVF chain, exact = the
    // brute-force top-k over the filtered slice.
    "q222b_ann_filtered_recall" ->
      s"""WITH ${ivfRankedCtes("TRUE", "n.label = 1")},
        |approx AS (SELECT q_vec_id, n_vec_id FROM ranked WHERE rnk <= 10),
        |exact AS (
        |  SELECT q_vec_id, n_vec_id FROM (
        |    SELECT q.vec_id AS q_vec_id, t.vec_id AS n_vec_id,
        |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |             round(list_dot_product(q.emb, t.emb) / (q.nrm * t.nrm), 6)
        |               DESC, t.vec_id) AS rnk
        |    FROM (SELECT * FROM n WHERE vec_id < 5) q
        |    JOIN n t ON q.vec_id <> t.vec_id AND t.label = 1)
        |  WHERE rnk <= 10),
        |hits AS (
        |  SELECT a.q_vec_id, count(*) AS n_hits
        |  FROM approx a JOIN exact x
        |    ON a.q_vec_id = x.q_vec_id AND a.n_vec_id = x.n_vec_id
        |  GROUP BY 1)
        |SELECT v.vec_id AS q_vec_id,
        |       coalesce(n_hits, 0)::BIGINT AS n_hits,
        |       round(coalesce(n_hits, 0) / 10.0, 6) AS recall
        |FROM (SELECT vec_id FROM e WHERE vec_id < 5) v
        |LEFT JOIN hits ON v.vec_id = hits.q_vec_id
        |ORDER BY q_vec_id""".stripMargin,


    // Indexed filtered probe reproduces the direct filtered path.
    "q222c_ann_filtered_indexed" -> ivfTopKSqlWith("TRUE", "n.label = 1"),


    // Delete contract: direct IVF over (corpus ∖ tombstones) with the
    // ORIGINAL centroid set — a deleted centroid-source vector stops
    // being a candidate but its cell survives (frozen quantizer).
    "q223_ann_index_delete" -> ivfTopKSqlWith("TRUE", "n.vec_id % 4 <> 2"),


    // Compaction shares the delete oracle verbatim — folding tombstones
    // into the lists must be invisible to queries.
    "q223b_ann_index_compact" -> ivfTopKSqlWith("TRUE", "n.vec_id % 4 <> 2"),

    // q226 round-trips delete → compact → re-append: the grown index
    // holds the FULL corpus again under the original frozen centroids,
    // so the oracle is the direct IVF search — q26's SQL verbatim.
    "q226_ann_reinsert" -> ivfTopKSql,


    // Embedding ingest: exact stage = list-equality join vs history;
    // near-dup stage = the q16b 4-bit/4-table hyperplane buckets
    // (delta probes history per (t, bucket), hot history buckets
    // excluded, exact round-6 cosine >= tauNearDup, min history id);
    // contamination stage = best bench cosine over exact-screen
    // survivors ((round-6 cos desc, id) tie-break, >= tau); priority
    // exact > near_dup > contaminated > kept, anchors coalesced.
    "q225_embedding_ingest" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm
        |      FROM e),
        |delta AS (
        |  SELECT vec_id, emb, nrm FROM n WHERE vec_id >= 5 AND vec_id < 250
        |  UNION ALL
        |  SELECT vec_id - 400 + 1000, emb, nrm FROM n WHERE vec_id >= 400),
        |hist AS (SELECT * FROM n WHERE vec_id >= 250),
        |bench AS (SELECT * FROM n WHERE vec_id < 5),
        |ex AS (SELECT d.vec_id, min(h.vec_id) AS ex_anchor
        |       FROM delta d JOIN hist h ON d.emb = h.emb GROUP BY 1),
        |surv AS (SELECT * FROM delta
        |         WHERE vec_id NOT IN (SELECT vec_id FROM ex)),
        |stb AS (
        |  SELECT vec_id, emb, nrm, t,
        |         list_sum(list_transform(range(0, 4), i ->
        |           CASE WHEN ${duckSignDot("t * 4 + i", "emb")} > 0
        |                THEN (1::BIGINT << i::INTEGER) ELSE 0::BIGINT END))
        |           AS bucket
        |  FROM surv CROSS JOIN range(4) r(t)),
        |htb AS (
        |  SELECT vec_id, emb, nrm, t,
        |         list_sum(list_transform(range(0, 4), i ->
        |           CASE WHEN ${duckSignDot("t * 4 + i", "emb")} > 0
        |                THEN (1::BIGINT << i::INTEGER) ELSE 0::BIGINT END))
        |           AS bucket
        |  FROM hist CROSS JOIN range(4) r(t)),
        |hok AS (
        |  SELECT t, bucket FROM htb GROUP BY 1, 2
        |  HAVING count(*) <= ${Similarity.MaxPairBucket}),
        |nd AS (
        |  SELECT s.vec_id, min(hh.vec_id) AS nd_anchor
        |  FROM stb s
        |  JOIN htb hh ON s.t = hh.t AND s.bucket = hh.bucket
        |  JOIN hok ON hh.t = hok.t AND hh.bucket = hok.bucket
        |  WHERE round(list_dot_product(s.emb, hh.emb) / (s.nrm * hh.nrm), 6)
        |          >= 0.4
        |  GROUP BY 1),
        |ct AS (
        |  SELECT vec_id, q_vec_id AS ct_anchor FROM (
        |    SELECT s.vec_id, b.vec_id AS q_vec_id,
        |           round(list_dot_product(s.emb, b.emb) / (s.nrm * b.nrm), 6)
        |             AS cos,
        |           row_number() OVER (PARTITION BY s.vec_id ORDER BY
        |             round(list_dot_product(s.emb, b.emb) / (s.nrm * b.nrm), 6)
        |               DESC, b.vec_id) AS rn
        |    FROM surv s JOIN bench b ON b.vec_id <> s.vec_id)
        |  WHERE rn = 1 AND cos >= 0.2)
        |SELECT d.vec_id,
        |       CASE WHEN ex_anchor IS NOT NULL THEN 'dropped_exact'
        |            WHEN nd_anchor IS NOT NULL THEN 'dropped_near_dup'
        |            WHEN ct_anchor IS NOT NULL THEN 'dropped_contaminated'
        |            ELSE 'kept' END AS stage,
        |       coalesce(ex_anchor, nd_anchor, ct_anchor) AS anchor
        |FROM delta d
        |LEFT JOIN ex USING (vec_id) LEFT JOIN nd USING (vec_id)
        |LEFT JOIN ct USING (vec_id)
        |ORDER BY vec_id""".stripMargin,


    // Index stats: the assignment distribution recomputed from the
    // shared IVF chain, tombstone debt = the q223 delete set.
    "q224_ann_index_stats" ->
      s"""WITH ${ivfRankedCtes("TRUE")}
        |SELECT cell, count(*)::BIGINT AS n_vecs,
        |       sum(CASE WHEN vec_id % 4 = 2 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_tombstoned,
        |       (count(*) - sum(CASE WHEN vec_id % 4 = 2 THEN 1 ELSE 0 END))
        |         ::BIGINT AS n_live
        |FROM assign GROUP BY cell ORDER BY cell""".stripMargin,


    // Maintenance report over the q223 delete scenario: debt =
    // |vec_id ≡ 2 mod 4| / |corpus| ≈ 0.25 > bound 0.2 → the call
    // folds (generation 0 → 1) and flags pre-call serve states stale.
    "q228_ann_maintenance" ->
      """SELECT count(*)::BIGINT AS n_vecs,
        |       sum(CASE WHEN vec_id % 4 = 2 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_tombstoned,
        |       round(sum(CASE WHEN vec_id % 4 = 2 THEN 1 ELSE 0 END)::DOUBLE
        |             / count(*), 6) AS debt,
        |       0.2::DOUBLE AS debt_bound,
        |       TRUE AS compacted, FALSE AS vacuumed,
        |       0::BIGINT AS generation_before, 1::BIGINT AS generation_after,
        |       TRUE AS serve_state_stale
        |FROM embeddings""".stripMargin,


    // The below-bound arm: ten tombstones measure far under 0.2, so
    // nothing folds and the generation pointer never moves.
    "q228b_ann_maintenance_noop" ->
      """SELECT count(*)::BIGINT AS n_vecs,
        |       sum(CASE WHEN vec_id < 10 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_tombstoned,
        |       round(sum(CASE WHEN vec_id < 10 THEN 1 ELSE 0 END)::DOUBLE
        |             / count(*), 6) AS debt,
        |       0.2::DOUBLE AS debt_bound,
        |       FALSE AS compacted, FALSE AS vacuumed,
        |       0::BIGINT AS generation_before, 0::BIGINT AS generation_after,
        |       FALSE AS serve_state_stale
        |FROM embeddings""".stripMargin,


    // ADC + refine recall contract: both recall columns replayed from
    // the shared filtered IVF-ADC chain — the ADC top-10 and the
    // ADC-top-50 re-ranked by true cosine, each hit-counted against
    // the exact float top-10 over the filtered slice.
    "q229c_ivfpq_refined_recall" ->
      s"""WITH $ivfPqFilteredCtes,
         |a10 AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |        ORDER BY adc DESC, n_vec_id) AS rnk
         |    FROM adcp) WHERE rnk <= 10),
         |r50 AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |        ORDER BY adc DESC, n_vec_id) AS rnk
         |    FROM adcp) WHERE rnk <= 50),
         |ref AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT r.q_vec_id, r.n_vec_id,
         |           row_number() OVER (PARTITION BY r.q_vec_id ORDER BY
         |             round(list_dot_product(qn.emb, cn.emb) /
         |                   (qn.nrm * cn.nrm), 6) DESC, r.n_vec_id) AS rnk
         |    FROM r50 r
         |    JOIN n qn ON qn.vec_id = r.q_vec_id
         |    JOIN n cn ON cn.vec_id = r.n_vec_id)
         |  WHERE rnk <= 10),
         |exact AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT q.vec_id AS q_vec_id, x.vec_id AS n_vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |             round(list_dot_product(q.emb, x.emb) /
         |                   (q.nrm * x.nrm), 6) DESC, x.vec_id) AS rnk
         |    FROM (SELECT * FROM n WHERE vec_id < 5) q
         |    JOIN (SELECT * FROM n WHERE label = 1) x
         |      ON q.vec_id <> x.vec_id)
         |  WHERE rnk <= 10),
         |ha AS (
         |  SELECT a.q_vec_id, count(*) AS nh
         |  FROM a10 a JOIN exact x
         |    ON a.q_vec_id = x.q_vec_id AND a.n_vec_id = x.n_vec_id
         |  GROUP BY 1),
         |hr AS (
         |  SELECT a.q_vec_id, count(*) AS nh
         |  FROM ref a JOIN exact x
         |    ON a.q_vec_id = x.q_vec_id AND a.n_vec_id = x.n_vec_id
         |  GROUP BY 1)
         |SELECT v.vec_id AS q_vec_id,
         |       round(coalesce(ha.nh, 0) / 10.0, 6) AS recall_adc,
         |       round(coalesce(hr.nh, 0) / 10.0, 6) AS recall_refined
         |FROM (SELECT vec_id FROM e WHERE vec_id < 5) v
         |LEFT JOIN ha ON v.vec_id = ha.q_vec_id
         |LEFT JOIN hr ON v.vec_id = hr.q_vec_id
         |ORDER BY q_vec_id""".stripMargin,


    // Hamming serve: the IVF cell pruning composed with q135's
    // sign-bit hamming — candidates from the two probed cells only,
    // XOR + bit_count, ascending rank with id tie-break.
    "q230_hamming_serve" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |${ivfCellCtes()},
         |$hammingSigCte,
         |scored AS (
         |  SELECT p.q_vec_id, a.vec_id AS n_vec_id,
         |         bit_count(xor(qs.sg, cs.sg))::BIGINT AS hamming
         |  FROM probes p
         |  JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.q_vec_id
         |  JOIN sig qs ON qs.vec_id = p.q_vec_id
         |  JOIN sig cs ON cs.vec_id = a.vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |      ORDER BY hamming, n_vec_id) AS rnk
         |  FROM scored)
         |SELECT q_vec_id, n_vec_id, hamming, rnk FROM ranked
         |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    // Hamming-serve recall: the probed-cell top-10 vs the flat q135
    // ranking — the pruning term in isolation.
    "q230b_hamming_serve_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |${ivfCellCtes()},
         |$hammingSigCte,
         |approx AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT p.q_vec_id, a.vec_id AS n_vec_id,
         |           row_number() OVER (PARTITION BY p.q_vec_id
         |             ORDER BY bit_count(xor(qs.sg, cs.sg)), a.vec_id) AS rnk
         |    FROM probes p
         |    JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.q_vec_id
         |    JOIN sig qs ON qs.vec_id = p.q_vec_id
         |    JOIN sig cs ON cs.vec_id = a.vec_id)
         |  WHERE rnk <= 10),
         |flat AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY bit_count(xor(q.sg, c.sg)), c.vec_id) AS rnk
         |    FROM (SELECT * FROM sig WHERE vec_id < 5) q
         |    JOIN sig c ON q.vec_id <> c.vec_id)
         |  WHERE rnk <= 10),
         |hits AS (
         |  SELECT a.q_vec_id, count(*) AS n_hits
         |  FROM approx a JOIN flat f
         |    ON a.q_vec_id = f.q_vec_id AND a.n_vec_id = f.n_vec_id
         |  GROUP BY 1)
         |SELECT v.vec_id AS q_vec_id,
         |       coalesce(n_hits, 0)::BIGINT AS n_hits,
         |       round(coalesce(n_hits, 0) / 10.0, 6) AS recall
         |FROM (SELECT vec_id FROM e WHERE vec_id < 5) v
         |LEFT JOIN hits ON v.vec_id = hits.q_vec_id
         |ORDER BY q_vec_id""".stripMargin,


    // Int8 serve: q171's SDC chain restricted to the probed cells —
    // same score tree, same NULLS LAST + id ordering.
    "q231_int8_serve" ->
      s"""WITH $int8Ctes,
         |${ivfCellCtes()},
         |scored AS (
         |  SELECT s.q_vec_id, s.n_vec_id, s.cos_sdc
         |  FROM sdc s
         |  JOIN assign a ON a.vec_id = s.n_vec_id
         |  JOIN probes p ON p.cell = a.cell AND p.q_vec_id = s.q_vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |      ORDER BY cos_sdc DESC NULLS LAST, n_vec_id) AS rnk
         |  FROM scored)
         |SELECT q_vec_id, n_vec_id, cos_sdc, rnk FROM ranked
         |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    // Filtered-serve refresh, float tier: direct filtered IVF with the
    // centroid seeds frozen to the pre-append history — the refresh ≡
    // rebuild ≡ direct contract in one SQL text (q100's centPred clause
    // composed with q222's candidate clause).
    "q232_filtered_serve_refresh" ->
      ivfTopKSqlWith("vec_id < 400", "n.label = 1"),


    // Filtered hamming serve + refresh: the q230 chain with the
    // candidate side restricted to label = 1 and the centroid seeds
    // frozen to the pre-append history.
    "q233_hamming_filtered_serve" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
         |           FROM embeddings),
         |${ivfCellCtes("e", "n2.label = 1", "vec_id < 400")},
         |$hammingSigCte,
         |scored AS (
         |  SELECT p.q_vec_id, a.vec_id AS n_vec_id,
         |         bit_count(xor(qs.sg, cs.sg))::BIGINT AS hamming
         |  FROM probes p
         |  JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.q_vec_id
         |  JOIN sig qs ON qs.vec_id = p.q_vec_id
         |  JOIN sig cs ON cs.vec_id = a.vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |      ORDER BY hamming, n_vec_id) AS rnk
         |  FROM scored)
         |SELECT q_vec_id, n_vec_id, hamming, rnk FROM ranked
         |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    // Filtered int8 serve + refresh: the q231 SDC chain with the
    // candidate clause and frozen centroid seeds.
    "q234_int8_filtered_serve" ->
      s"""WITH $int8Ctes,
         |el AS (SELECT e.vec_id, l.label, e.emb
         |       FROM e JOIN (SELECT vec_id, label FROM embeddings) l
         |         ON e.vec_id = l.vec_id),
         |${ivfCellCtes("el", "n2.label = 1", "vec_id < 400")},
         |scored AS (
         |  SELECT s.q_vec_id, s.n_vec_id, s.cos_sdc
         |  FROM sdc s
         |  JOIN assign a ON a.vec_id = s.n_vec_id
         |  JOIN probes p ON p.cell = a.cell AND p.q_vec_id = s.q_vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |      ORDER BY cos_sdc DESC NULLS LAST, n_vec_id) AS rnk
         |  FROM scored)
         |SELECT q_vec_id, n_vec_id, cos_sdc, rnk FROM ranked
         |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    // Quantizer retrain: direct IVF over the live rows with the live
    // seed set — centroids AND candidates both read corpus ∖ deletes.
    "q236_ann_retrain" ->
      ivfTopKSqlWith("vec_id % 4 <> 2", "n.vec_id % 4 <> 2"),


    // Serve-artifact stats: per-cell member counts of the filtered IVF
    // assignment, folded to the one observability row.
    "q235_serve_state_stats" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
         |           FROM embeddings),
         |${ivfCellCtes("e", "n2.label = 1")},
         |pc AS (SELECT cell, count(*) AS n FROM assign GROUP BY cell)
         |SELECT 'float' AS tier, TRUE AS filtered,
         |       count(*)::BIGINT AS n_cells, sum(n)::BIGINT AS n_members,
         |       max(n)::BIGINT AS max_cell, round(avg(n), 6) AS avg_cell,
         |       0::BIGINT AS generation, 0::BIGINT AS n_tombstones
         |FROM pc""".stripMargin,


    // Int8-serve recall: probed-cell SDC top-10 vs the flat q171
    // ranking.
    "q231b_int8_serve_recall" ->
      s"""WITH $int8Ctes,
         |${ivfCellCtes()},
         |approx AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT s.q_vec_id, s.n_vec_id,
         |           row_number() OVER (PARTITION BY s.q_vec_id
         |             ORDER BY s.cos_sdc DESC NULLS LAST, s.n_vec_id) AS rnk
         |    FROM sdc s
         |    JOIN assign a ON a.vec_id = s.n_vec_id
         |    JOIN probes p ON p.cell = a.cell AND p.q_vec_id = s.q_vec_id)
         |  WHERE rnk <= 10),
         |flat AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT q_vec_id, n_vec_id,
         |           row_number() OVER (PARTITION BY q_vec_id
         |             ORDER BY cos_sdc DESC NULLS LAST, n_vec_id) AS rnk
         |    FROM sdc)
         |  WHERE rnk <= 10),
         |hits AS (
         |  SELECT a.q_vec_id, count(*) AS n_hits
         |  FROM approx a JOIN flat f
         |    ON a.q_vec_id = f.q_vec_id AND a.n_vec_id = f.n_vec_id
         |  GROUP BY 1)
         |SELECT v.vec_id AS q_vec_id,
         |       coalesce(n_hits, 0)::BIGINT AS n_hits,
         |       round(coalesce(n_hits, 0) / 10.0, 6) AS recall
         |FROM (SELECT vec_id FROM e WHERE vec_id < 5) v
         |LEFT JOIN hits ON v.vec_id = hits.q_vec_id
         |ORDER BY q_vec_id""".stripMargin,


    // Int8 SDC mirror: byte-code quantization + the expanded-cosine
    // score CTEs; per-query rank with NULLS LAST + id tie-break.
    "q171_int8_topk" ->
      s"""WITH $int8Ctes
         |SELECT q_vec_id, n_vec_id, cos_sdc, rnk AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |      ORDER BY cos_sdc DESC NULLS LAST, n_vec_id) AS rnk
         |  FROM sdc)
         |WHERE rnk <= 10 ORDER BY q_vec_id, rank""".stripMargin,


    // Int8 recall mirror: approx top-10 from the sdc CTE vs the exact
    // float-cosine top-10 (the q99c construction).
    "q171b_int8_recall" ->
      s"""WITH $int8Ctes,
         |approx AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |        ORDER BY cos_sdc DESC NULLS LAST, n_vec_id) AS rnk
         |    FROM sdc) WHERE rnk <= 10),
         |exact AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT q.vec_id AS q_vec_id, c2.vec_id AS n_vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |             round(list_dot_product(q.emb, c2.emb) /
         |                   (sqrt(list_dot_product(q.emb, q.emb)) *
         |                    sqrt(list_dot_product(c2.emb, c2.emb))), 6)
         |               DESC, c2.vec_id) AS rnk
         |    FROM (SELECT * FROM e WHERE vec_id < 5) q
         |    JOIN e c2 ON q.vec_id <> c2.vec_id)
         |  WHERE rnk <= 10),
         |hits AS (
         |  SELECT a.q_vec_id, count(*) AS n_hits
         |  FROM approx a JOIN exact x
         |    ON a.q_vec_id = x.q_vec_id AND a.n_vec_id = x.n_vec_id
         |  GROUP BY 1)
         |SELECT v.vec_id AS q_vec_id,
         |       coalesce(n_hits, 0)::BIGINT AS n_hits,
         |       round(coalesce(n_hits, 0) / 10.0, 6) AS recall
         |FROM (SELECT vec_id FROM e WHERE vec_id < 5) v
         |LEFT JOIN hits ON v.vec_id = hits.q_vec_id
         |ORDER BY q_vec_id""".stripMargin,


    // Exact MIPS top-k: the q15 scan ranking on the rounded dot.
    "q130_mips_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.vec_id AS q_vec_id, e.vec_id AS n_vec_id,
        |         round(list_dot_product(q.emb, e.emb), 6) AS dot
        |  FROM q JOIN e ON q.vec_id <> e.vec_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
        |                               ORDER BY dot DESC, n_vec_id) AS rnk
        |  FROM scored)
        |SELECT q_vec_id, n_vec_id, dot, rnk FROM ranked
        |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    // MIPS→cosine reduction contract: both rankings replayed, set
    // agreement per query.
    "q130b_mips_reduction" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 5),
        |dscored AS (
        |  SELECT q.vec_id AS q_vec_id, e.vec_id AS n_vec_id,
        |         round(list_dot_product(q.emb, e.emb), 6) AS dot
        |  FROM q JOIN e ON q.vec_id <> e.vec_id),
        |d10 AS (
        |  SELECT q_vec_id, n_vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_vec_id
        |                                 ORDER BY dot DESC, n_vec_id) AS rnk
        |    FROM dscored) WHERE rnk <= 10),
        |mx AS (SELECT max(sqrt(list_dot_product(emb, emb))) AS m FROM e),
        |ea AS (
        |  SELECT vec_id,
        |         list_append(emb, sqrt(greatest(
        |           m * m - list_dot_product(emb, emb), 0.0))) AS emb
        |  FROM e, mx),
        |qa AS (SELECT vec_id, list_append(emb, 0.0) AS emb FROM q),
        |ascored AS (
        |  SELECT qa.vec_id AS q_vec_id, ea.vec_id AS n_vec_id,
        |         round(list_dot_product(qa.emb, ea.emb) /
        |               (sqrt(list_dot_product(qa.emb, qa.emb)) *
        |                sqrt(list_dot_product(ea.emb, ea.emb))), 6) AS cos
        |  FROM qa JOIN ea ON qa.vec_id <> ea.vec_id),
        |a10 AS (
        |  SELECT q_vec_id, n_vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_vec_id
        |                                 ORDER BY cos DESC, n_vec_id) AS rnk
        |    FROM ascored) WHERE rnk <= 10),
        |hits AS (
        |  SELECT a.q_vec_id, count(*)::BIGINT AS n_hits
        |  FROM a10 a JOIN d10 d
        |    ON a.q_vec_id = d.q_vec_id AND a.n_vec_id = d.n_vec_id
        |  GROUP BY 1)
        |SELECT v.vec_id AS q_vec_id,
        |       coalesce(n_hits, 0)::BIGINT AS n_hits,
        |       round(coalesce(n_hits, 0) / 10.0, 6) AS recall,
        |       coalesce(n_hits, 0) = 10 AS order_preserved
        |FROM (SELECT vec_id FROM e WHERE vec_id < 5) v
        |LEFT JOIN hits ON v.vec_id = hits.q_vec_id
        |ORDER BY q_vec_id""".stripMargin,


    // kNN classification: the q15 ranking joined to labels, majority
    // vote with ties to the smallest label.
    "q131_knn_classify" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.vec_id AS q_vec_id, e.vec_id AS n_vec_id,
        |         round(list_dot_product(q.emb, e.emb) /
        |               (sqrt(list_dot_product(q.emb, q.emb)) *
        |                sqrt(list_dot_product(e.emb, e.emb))), 6) AS cos
        |  FROM q JOIN e ON q.vec_id <> e.vec_id),
        |top AS (
        |  SELECT q_vec_id, n_vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_vec_id
        |                                 ORDER BY cos DESC, n_vec_id) AS rnk
        |    FROM scored) WHERE rnk <= 10),
        |votes AS (
        |  SELECT t.q_vec_id, x.label::BIGINT AS label, count(*)::BIGINT AS n
        |  FROM top t JOIN embeddings x ON x.vec_id = t.n_vec_id
        |  GROUP BY 1, 2)
        |SELECT q_vec_id, label AS predicted, n AS n_votes FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
        |                               ORDER BY n DESC, label) AS rn
        |  FROM votes) WHERE rn = 1
        |ORDER BY q_vec_id""".stripMargin,


    // Label outliers: q136's integer centroid sums assembled into
    // per-label arrays, one cosine per vector, per-label exact
    // percentile cut.
    "q142_label_outliers" ->
      """WITH e AS (
        |  SELECT vec_id, label::BIGINT AS label, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |d AS (
        |  SELECT label, i - 1 AS dim,
        |         sum(CAST(round(emb[i::INTEGER] * 1e6) AS BIGINT)) AS s
        |  FROM e, unnest(range(1, len(emb) + 1)) r(i) GROUP BY 1, 2),
        |c AS (
        |  SELECT label, list(s::DOUBLE ORDER BY dim) AS cvec
        |  FROM d GROUP BY 1),
        |scored AS (
        |  SELECT e.vec_id, e.label,
        |         round(list_dot_product(e.emb, c.cvec) /
        |               (sqrt(list_dot_product(e.emb, e.emb)) *
        |                sqrt(list_dot_product(c.cvec, c.cvec))), 6) AS cos
        |  FROM e JOIN c USING (label)),
        |cuts AS (
        |  SELECT label, round(quantile_cont(cos, 0.05), 6) AS thr
        |  FROM scored GROUP BY 1)
        |SELECT s.vec_id, s.label, s.cos, s.cos <= c.thr AS is_outlier
        |FROM scored s JOIN cuts c USING (label)
        |ORDER BY s.vec_id""".stripMargin,


    // Health-audit mirror: the q136 dim-unnest for dead dims, norms
    // via list_dot_product + sqrt micro-quantized before min/mean/max.
    "q167_embedding_health" ->
      """WITH e AS (SELECT embedding::DOUBLE[] AS emb FROM embeddings),
        |c AS (
        |  SELECT emb,
        |    (emb IS NULL OR len(emb) = 0) AS bad,
        |    CASE WHEN emb IS NOT NULL THEN len(emb)::BIGINT END AS dims,
        |    CASE WHEN emb IS NOT NULL AND len(emb) > 0 THEN
        |      len(list_filter(emb, x -> isnan(x))) > 0 END AS has_nan
        |  FROM e),
        |n AS (
        |  SELECT *,
        |    CASE WHEN NOT bad AND NOT has_nan THEN
        |      len(list_filter(emb, x -> x <> 0)) = 0 END AS zero_vec,
        |    CASE WHEN NOT bad AND NOT has_nan THEN
        |      CAST(round(sqrt(list_dot_product(emb, emb)) * 1e6) AS BIGINT)
        |      END AS norm_micro
        |  FROM c),
        |agg AS (
        |  SELECT count(*)::BIGINT AS n_vecs,
        |    coalesce(sum(CASE WHEN bad THEN 1 END), 0)::BIGINT AS n_null_or_empty,
        |    coalesce(sum(CASE WHEN has_nan THEN 1 END), 0)::BIGINT AS n_nan_vecs,
        |    coalesce(sum(CASE WHEN zero_vec THEN 1 END), 0)::BIGINT AS n_zero_vecs,
        |    min(dims)::BIGINT AS dims_min,
        |    max(dims)::BIGINT AS dims_max,
        |    round(min(norm_micro)::DOUBLE / 1e6, 6) AS min_norm,
        |    round(max(norm_micro)::DOUBLE / 1e6, 6) AS max_norm,
        |    round(sum(norm_micro)::DOUBLE / 1e6 / count(norm_micro)::DOUBLE, 6)
        |      AS mean_norm
        |  FROM n),
        |dd AS (
        |  SELECT coalesce(sum(CASE WHEN m = 0 THEN 1 END), 0)::BIGINT AS dead_dims
        |  FROM (
        |    SELECT i - 1 AS dim,
        |           max(abs(CAST(round(emb[i::INTEGER] * 1e6) AS BIGINT))) AS m
        |    FROM (SELECT emb FROM e WHERE emb IS NOT NULL) t,
        |         unnest(range(1, len(emb) + 1)) r(i)
        |    WHERE NOT isnan(emb[i::INTEGER])
        |    GROUP BY 1))
        |SELECT n_vecs, n_null_or_empty, n_nan_vecs, n_zero_vecs,
        |       dims_min, dims_max, dead_dims, min_norm, max_norm, mean_norm
        |FROM agg, dd""".stripMargin,


    // Covariance mirror: the same micro-quantized components, exact
    // HUGEINT co-moments n·Σxy − Σx·Σy, diagonal joined back for corr.
    "q188_embedding_covariance" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |x AS (SELECT vec_id, (i - 1)::BIGINT AS i,
        |             CAST(round(emb[i::INTEGER] * 1e6) AS BIGINT) AS v
        |      FROM e, unnest(range(1, len(emb) + 1)) r(i)),
        |p AS (SELECT a.i AS i, b.i AS j, count(*)::BIGINT AS n_vecs,
        |             sum(a.v::HUGEINT) AS sx, sum(b.v::HUGEINT) AS sy,
        |             sum(a.v::HUGEINT * b.v::HUGEINT) AS sxy
        |      FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.i >= a.i
        |      GROUP BY 1, 2),
        |c AS (SELECT *, n_vecs::HUGEINT * sxy - sx * sy AS com FROM p),
        |d AS (SELECT i AS dd, com AS vv FROM c WHERE i = j)
        |SELECT c.i, c.j, c.n_vecs,
        |       round(c.com::DOUBLE /
        |             (c.n_vecs::HUGEINT * c.n_vecs)::DOUBLE / 1e12, 6)
        |         + 0.0 AS cov,
        |       CASE WHEN di.vv > 0 AND dj.vv > 0 THEN
        |         round(c.com::DOUBLE /
        |               (sqrt(di.vv::DOUBLE) * sqrt(dj.vv::DOUBLE)), 6) + 0.0
        |       END AS corr
        |FROM c JOIN d di ON di.dd = c.i JOIN d dj ON dj.dd = c.j
        |ORDER BY i, j""".stripMargin,


    // PCA mirror: the unrolled exact-integer power iteration.
    "q196_principal_component" -> pc1Sql(20),


    // Projection mirror: the same fit, per-vector HUGEINT dots.
    "q199_pc_projection" -> pcProjectionSql(20),


    // PC2 mirror: the unrolled deflated rounds.
    "q208_principal_component2" -> pc2Sql(20),


    // Incremental PCA answers to q196's oracle VERBATIM (the q96/q105
    // shared-oracle contract): merged per-slice exact sums ≡ the
    // all-at-once co-moments.
    "q214_pca_incremental" -> pc1Sql(20),


    // Matryoshka mirror: q15's cosine recipe on the 16-component
    // prefix slice.
    "q189_matryoshka_topk" ->
      """WITH e AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS emb
        |           FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.vec_id AS q_vec_id, e.vec_id AS n_vec_id,
        |         round(list_dot_product(q.emb, e.emb) /
        |               (sqrt(list_dot_product(q.emb, q.emb)) *
        |                sqrt(list_dot_product(e.emb, e.emb))), 6) AS cos
        |  FROM q JOIN e ON q.vec_id <> e.vec_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
        |                               ORDER BY cos DESC, n_vec_id) AS rnk
        |  FROM scored)
        |SELECT q_vec_id, n_vec_id, cos, rnk FROM ranked
        |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    // Matryoshka recall mirror: prefix-slice top-10 vs the full-dim
    // exact top-10 (the q171b construction).
    "q189b_matryoshka_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |t AS (SELECT vec_id, emb[1:16] AS emb16 FROM e),
        |approx AS (
        |  SELECT q_vec_id, n_vec_id FROM (
        |    SELECT q.vec_id AS q_vec_id, c2.vec_id AS n_vec_id,
        |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |             round(list_dot_product(q.emb16, c2.emb16) /
        |                   (sqrt(list_dot_product(q.emb16, q.emb16)) *
        |                    sqrt(list_dot_product(c2.emb16, c2.emb16))), 6)
        |               DESC, c2.vec_id) AS rnk
        |    FROM (SELECT * FROM t WHERE vec_id < 5) q
        |    JOIN t c2 ON q.vec_id <> c2.vec_id)
        |  WHERE rnk <= 10),
        |exact AS (
        |  SELECT q_vec_id, n_vec_id FROM (
        |    SELECT q.vec_id AS q_vec_id, c2.vec_id AS n_vec_id,
        |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |             round(list_dot_product(q.emb, c2.emb) /
        |                   (sqrt(list_dot_product(q.emb, q.emb)) *
        |                    sqrt(list_dot_product(c2.emb, c2.emb))), 6)
        |               DESC, c2.vec_id) AS rnk
        |    FROM (SELECT * FROM e WHERE vec_id < 5) q
        |    JOIN e c2 ON q.vec_id <> c2.vec_id)
        |  WHERE rnk <= 10),
        |hits AS (
        |  SELECT a.q_vec_id, count(*) AS n_hits
        |  FROM approx a JOIN exact x
        |    ON a.q_vec_id = x.q_vec_id AND a.n_vec_id = x.n_vec_id
        |  GROUP BY 1)
        |SELECT v.vec_id AS q_vec_id,
        |       coalesce(n_hits, 0)::BIGINT AS n_hits,
        |       round(coalesce(n_hits, 0) / 10.0, 6) AS recall
        |FROM (SELECT vec_id FROM e WHERE vec_id < 5) v
        |LEFT JOIN hits ON v.vec_id = hits.q_vec_id
        |ORDER BY q_vec_id""".stripMargin,


    // Centroid drift: identical micro-quantized integer sums per
    // (label, dim), exact HUGEINT products, the same fp tree.
    "q136_centroid_drift" ->
      """WITH ea AS (
        |  SELECT label::BIGINT AS label, embedding::DOUBLE[] AS emb
        |  FROM embeddings WHERE vec_id < 250),
        |eb AS (
        |  SELECT label::BIGINT AS label, embedding::DOUBLE[] AS emb
        |  FROM embeddings WHERE vec_id >= 250),
        |da AS (
        |  SELECT label, i - 1 AS dim,
        |         sum(CAST(round(emb[i::INTEGER] * 1e6) AS BIGINT)) AS s_a
        |  FROM ea, unnest(range(1, len(emb) + 1)) r(i) GROUP BY 1, 2),
        |db AS (
        |  SELECT label, i - 1 AS dim,
        |         sum(CAST(round(emb[i::INTEGER] * 1e6) AS BIGINT)) AS s_b
        |  FROM eb, unnest(range(1, len(emb) + 1)) r(i) GROUP BY 1, 2),
        |red AS (
        |  SELECT label,
        |         sum(s_a * s_b) AS dot,
        |         sum(s_a * s_a) AS na2,
        |         sum(s_b * s_b) AS nb2
        |  FROM da JOIN db USING (label, dim) GROUP BY 1),
        |ca AS (SELECT label::BIGINT AS label, count(*)::BIGINT AS n_a
        |       FROM embeddings WHERE vec_id < 250 GROUP BY 1),
        |cb AS (SELECT label::BIGINT AS label, count(*)::BIGINT AS n_b
        |       FROM embeddings WHERE vec_id >= 250 GROUP BY 1)
        |SELECT label, n_a, n_b,
        |       round(dot::DOUBLE / (sqrt(na2::DOUBLE) * sqrt(nb2::DOUBLE)), 6)
        |         AS cos
        |FROM red JOIN ca USING (label) JOIN cb USING (label)
        |ORDER BY label""".stripMargin,


    // Hamming top-k over 48 packed sign bits: the q25 bucket formula
    // widened, XOR + bit_count, ascending rank.
    "q135_hamming_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |b AS (
         |  SELECT vec_id,
         |         list_sum(list_transform(range(0, 48), h ->
         |           CASE WHEN ${duckSignDot("h", "emb")} > 0
         |                THEN (1::BIGINT << h::INTEGER) ELSE 0::BIGINT END)) AS sig
         |  FROM e),
         |q AS (SELECT * FROM b WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
         |         bit_count(xor(q.sig, c.sig))::BIGINT AS hamming
         |  FROM q JOIN b c ON q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |                               ORDER BY hamming, n_vec_id) AS rnk
         |  FROM scored)
         |SELECT q_vec_id, n_vec_id, hamming, rnk FROM ranked
         |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,


    // Binary-then-exact recall: Hamming top-100 ∩ exact cosine top-10.
    "q135b_hamming_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |b AS (
         |  SELECT vec_id, emb,
         |         list_sum(list_transform(range(0, 48), h ->
         |           CASE WHEN ${duckSignDot("h", "emb")} > 0
         |                THEN (1::BIGINT << h::INTEGER) ELSE 0::BIGINT END)) AS sig,
         |         sqrt(list_dot_product(emb, emb)) AS nrm
         |  FROM e),
         |q AS (SELECT * FROM b WHERE vec_id < 5),
         |cand AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY bit_count(xor(q.sig, c.sig)), c.vec_id) AS rnk
         |    FROM q JOIN b c ON q.vec_id <> c.vec_id) WHERE rnk <= 100),
         |exact AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT q.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY round(list_dot_product(q.emb, c.emb) /
         |                            (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rnk
         |    FROM q JOIN b c ON q.vec_id <> c.vec_id) WHERE rnk <= 10),
         |hits AS (
         |  SELECT x.q_vec_id, count(*)::BIGINT AS n_hits
         |  FROM exact x JOIN cand c
         |    ON x.q_vec_id = c.q_vec_id AND x.n_vec_id = c.n_vec_id
         |  GROUP BY 1)
         |SELECT v.vec_id AS q_vec_id,
         |       coalesce(n_hits, 0)::BIGINT AS n_hits,
         |       round(coalesce(n_hits, 0) / 10.0, 6) AS recall
         |FROM (SELECT vec_id FROM e WHERE vec_id < 5) v
         |LEFT JOIN hits ON v.vec_id = hits.q_vec_id
         |ORDER BY q_vec_id""".stripMargin
  )
}
