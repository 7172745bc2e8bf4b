#!/usr/bin/env python3
"""Regenerate BASELINE.md's measured-highlights table from the committed
bench artifact (BENCH_local_r4.json), so the table and the artifact are
the same run BY CONSTRUCTION — the round-3 verdict's hygiene rule made
mechanical. Row labels/notes live here; numbers come only from the JSON.

Usage: python3 tools/sync_baseline.py [artifact.json]
"""
import json
import re
import sys

ARTIFACT = sys.argv[1] if len(sys.argv) > 1 else "BENCH_local_r5.json"
BASELINE = "BASELINE.md"

# (label, [bench keys interpolated into label/note as {0}, {1}, ...], note)
ROWS = [
    ("q16_embedding_near_dup | {0}",
     ["q16_embedding_near_dup", "q16b_embedding_lsh_near_dup"],
     "exact all-pairs verification tier by declared design; q16b ({1} s) is the production path"),
    ("q14b_simhash_pairs | {0}",
     ["q14b_simhash_pairs", "q38_simhash32_pairs"],
     "output-bound (16-bit fingerprints saturate on a same-vocab corpus); q38's 32-bit twin: {1} s"),
    ("q56_substring_dedup (NEW) | {0}", ["q56_substring_dedup"],
     "ExactSubstr over ~250 k span occurrences: one span-hash shuffle + doc regroup"),
    ("q13_minhash_lsh | {0}", ["q13_minhash_lsh"],
     "guard + single-pass signatures (round-3 in-run: 8.87 s under contention; isolated r3: 2.35 s)"),
    ("q74_winnow_pairs (NEW) | {0}",
     ["q74_winnow_pairs", "q72_winnow_fingerprints"],
     "shared-winnow-fp pairs, hot-fp guard pre-join; q72's fingerprint set alone: {1} s"),
    ("q71_search_indexed (NEW) | {0}", ["q71_search_indexed"],
     "honest build+probe: tf-idf chain + term-sorted index WRITE + pruned-scan query; 10x stress shows the probe alone at 0.6 s vs 4.8 s full-chain BM25"),
    ("q69_search_bm25 (NEW) | {0}", ["q69_search_bm25", "q69b_bm25_window"],
     "Okapi BM25: dl window + df broadcast + 1-row (N, avgdl); doc agg reuses the window partitioning; window-df twin q69b: {1} s"),
    ("q58_keywords (NEW) | {0}", ["q58_keywords"],
     "tfidf lineage + WindowGroupLimit per-doc rank"),
    ("q51_training_prep | {0}", ["q51_training_prep"],
     "collision-proof chunk key costs nothing (r3: 0.67 s)"),
    ("q62_events_asof_tolerance (NEW) | {0}", ["q62_events_asof_tolerance"],
     "union + window + staleness null-out"),
    ("q63_interval_overlap (NEW) | {0}", ["q63_interval_overlap"],
     "bin-bucketed closed-overlap join, first-shared-bin dedup"),
    ("q59/q64 quality cut / bins (NEW) | {0} / {1}",
     ["q59_quality_filter", "q64_quality_bins"],
     "one kernel scan + 1-row percentile broadcast"),
    ("q61_vocab_incremental (NEW) | {0}", ["q61_vocab_incremental"],
     "merged counts state + two-stage rank"),
    ("q57/q73 mixture / weighted sample (NEW) | {0} / {1}",
     ["q57_mixture_sample", "q73_sample_by_weight"],
     "in-plan rate/avg(w) broadcasts + md5 keep decisions"),
    ("q60_events_sliding (NEW) | {0}", ["q60_events_sliding"],
     "map-side covering-window expansion, one shuffle"),
    ("q65/q66 normalize / winsorize (NEW) | {0} / {1}",
     ["q65_normalize_text", "q66_events_winsorize"],
     "map-only regex canon / 1-row clip-band broadcast"),
    ("q67/q68 AND / phrase search (NEW) | {0} / {1}",
     ["q67_search_all", "q68_search_phrase"],
     "tfidf semi-join + HAVING / exploded-index codegen'd phrase conjunction"),
    ("q70_search_near (NEW) | {0}", ["q70_search_near"],
     "proximity (slop) search: same exploded-position map-only scan as q68"),
    ("q75_corpus_rollup (NEW) | {0}", ["q75_corpus_rollup"],
     "(lang, source) grouping sets over one kernel scan"),
    ("q49/q53 vocab tier | {0} / {1}",
     ["q49_encode_tokens", "q53_vocab_coverage"],
     "two-stage parallel rank (no single-partition exchange; plan pinned in PlanAuditSpec)"),
    ("q5c_tfidf_salted (NEW) | {0}", ["q5c_tfidf_salted"],
     "third df strategy: salted shuffle join (q5's oracle; (term, salt) exchange shape pinned under no-broadcast)"),
    ("q40b_dedup_bloom (NEW) | {0}", ["q40b_dedup_bloom"],
     "Bloom-screened incremental dedup; probe rides the parquet scan (plan-pinned); q40's exact answer at any fpp"),
    ("q31b_corpus_stats_approx (NEW) | {0}", ["q31b_corpus_stats_approx"],
     "HLL sketch contract: approx within 3·rsd of exact, asserted by the oracle"),
    ("q43b_events_quantiles_approx (NEW) | {0}", ["q43b_events_quantiles_approx"],
     "t-digest sketch contract: within 2 % + 0.1 of exact per percentile"),
    ("q76_events_retention (NEW) | {0}", ["q76_events_retention"],
     "cohort triangle: two shuffles, collect_set bounded by day span, distinct-free count"),
    ("q77_incremental_prep (NEW) | {0}", ["q77_incremental_prep"],
     "daily-ingest bookend: Bloom screen (q40b) feeding the q51 clean→chunk→pack chain, same 2-exchange budget"),
    ("q78/q78b hot keys exact / cms-screened (NEW) | {0} / {1}",
     ["q78_hot_keys", "q78b_hot_keys_sketched"],
     "θ-heavy-hitter skew radar; the cms estimate probe rides the scan (plan-pinned), confirm agg shuffles candidate rows only — one oracle for both"),
    ("q81_skew_join (NEW) | {0}", ["q81_skew_join"],
     "detected-hot-key salted/cold split join ≡ plain join (the oracle); INSET predicates pushed to both scans"),
    ("q79_term_drift (NEW) | {0}", ["q79_term_drift"],
     "per-term JS-divergence contributions, smoothed union-vocab models; merged counts cached once, shuffles carry (term, count) pairs"),
    ("q80_random_projection (NEW) | {0}", ["q80_random_projection"],
     "map-only sign-matrix JL projection 64→16, shared md5 matrix with the oracle"),
    ("q80b_projection_distortion (NEW) | {0}", ["q80b_projection_distortion"],
     "JL quality contract: per-query mean/max cosine distortion at outDim=32 with asserted tolerance flags"),
    ("q82_ann_indexed (NEW) | {0}", ["q82_ann_indexed"],
     "honest IVF index build (cell-partitioned write) + DPP-pruned probe; oracle is q26's SQL verbatim — the roundtrip must reproduce the direct path bit-for-bit"),
    ("q83/q83b zorder layout / skipping (NEW) | {0} / {1}",
     ["q83_zorder_layout", "q83b_zorder_skipping"],
     "map-only Morton interleave; the skipping contract measures min/max footer pruning linear vs Z"),
    ("q84_epoch_shuffle (NEW) | {0}",
     ["q84_epoch_shuffle", "q84b_epoch_shuffle_balance"],
     "seeded md5 permutation → shard → per-shard rank → batch ids: ONE hash exchange, never a global sort; balance contract q84b: {1} s"),
    ("q85_temperature_mixture (NEW) | {0}", ["q85_temperature_mixture"],
     "T=0.5 √-share mixture: shares derived in-plan, normalizer a window over the tiny per-source frame — corpus scanned once by construction"),
    ("q86_importance_resample (NEW) | {0}",
     ["q86_importance_resample", "q86b_importance_contract"],
     "DSIR: B-row hashed log-ratio model broadcast over one token stream, TakeOrdered top-k; self-likelihood contract q86b: {1} s"),
    ("q87_leakage_safe_split (NEW) | {0}",
     ["q87_leakage_safe_split", "q87b_split_leakage"],
     "3 label-propagation iterations + one corpus⋈labels join; split is a map-side md5 of the CLUSTER label; end-to-end leak audit q87b: {1} s (crossing count 0 — the contract)"),
    ("q88_naive_bayes (NEW) | {0}",
     ["q88_naive_bayes", "q88b_nb_confusion"],
     "distributed NB fit+infer in one plan: cached (bucket,label) token agg, dense B·C broadcast model, exact-long argmax; confusion rollup q88b: {1} s"),
    ("q88c_nb_rowlocal (NEW) | {0}", ["q88c_nb_rowlocal"],
     "honest fit-collect + score: the scoring plan itself is ONE projection, zero exchanges (plan-pinned); the distributed twin shares the oracle text"),
    ("q89_coverage_sample (NEW) | {0}", ["q89_coverage_sample"],
     "k-means + per-cell centroid-closest exemplar via one cell-partitioned window"),
    ("q90_source_dup_stats (NEW) | {0}", ["q90_source_dup_stats"],
     "per-source exact-dup dashboard: one 32-byte-key exchange + C-row rollup"),
    ("q91_split_incremental (NEW) | {0}",
     ["q91_split_incremental", "q91b_split_incremental_leakage"],
     "delta⋈history band join (never a self-join) + smallest-anchor split inheritance; bridge audit q91b: {1} s (disagreeing candidate pairs observable)"),
    ("q92/q93 k-per-group / length histogram (NEW) | {0} / {1}",
     ["q92_sample_per_group", "q93_length_histogram"],
     "WindowGroupLimit k-row heaps per stratum / integer bit-length power-of-2 bins, ≤64-row agg"),
    ("q117_term_pagerank (NEW) | {0}", ["q117_term_pagerank"],
     "10 integer-exact damped rounds over the co-occurrence graph; nothing materializes inside the loop — one job pipelines all rounds (was 23.6 s with per-round count() actions)"),
    ("q96/q105 converged closure: min-label / star (NEW) | {0} / {1}",
     ["q96_minhash_dedup_converged", "q105_minhash_dedup_star"],
     "true connected components, detected fixpoint; both tiers share the recursive-CTE oracle verbatim"),
    ("q99/q99b PQ encode / ADC scan (NEW) | {0} / {1}",
     ["q99_pq_codes", "q99b_pq_adc_topk"],
     "4-bit product-quantization codes (zero-exchange encode, plan-pinned) + compressed-domain LUT scan"),
    ("q113/q114 OHLC / TWAP downsample (NEW) | {0} / {1}",
     ["q113_events_ohlc", "q114_events_twap"],
     "rank-window picks in one reused-partitioning exchange / integer-exact hold-until-next weighting with the stitched hour frame"),
    ("q119_upsert_latest (NEW) | {0}", ["q119_upsert_latest"],
     "latest-wins MERGE upsert: delta-bounded semi/anti split, oracle is the plain flat window"),
    ("q121_jaccard_prefix (NEW) | {0}", ["q121_jaccard_prefix"],
     "exact PPJoin-style τ=0.8 similarity join: rare-shingle prefix probes; oracle is q12's brute force at the same τ"),
    ("q124/q124b KMV overlap / error contract (NEW) | {0} / {1}",
     ["q124_source_overlap_kmv", "q124b_kmv_quality"],
     "O(S·k) sketch-space source-overlap matrix; |Ĵ−J| pinned vs the exact q122 matrix (measured mean 0.008 / max 0.030)"),
    ("q127_term_triangles (NEW) | {0}", ["q127_term_triangles"],
     "degree-ordered triangle counting — wedge fan-out capped at O(√E), no hot-key guard needed"),
    ("q128/q128b rendezvous shard / stability (NEW) | {0} / {1}",
     ["q128_rendezvous_shard", "q128b_rendezvous_stability"],
     "map-only HRW argmax; 16→17 churn contract: moved ≡ new-shard wins, 5.6 % measured vs 5.9 % expected"),
    ("q130/q130b MIPS / reduction contract (NEW) | {0} / {1}",
     ["q130_mips_topk", "q130b_mips_reduction"],
     "inner-product top-k + the norm-augmentation reduction; rank-set agreement 10/10 per query"),
    ("q135/q135b Hamming scan / recall (NEW) | {0} / {1}",
     ["q135_hamming_topk", "q135b_hamming_recall"],
     "48 packed sign bits, XOR+popcount; local time is codegen-compile-bound (48 wide hyperplane literals), per-row cost is the 6 B scan the tier exists for"),
    ("q136_centroid_drift (NEW) | {0}", ["q136_centroid_drift"],
     "per-label integer-exact centroid cosines between snapshot halves"),
    ("q137_edit_distance_pairs (NEW) | {0}", ["q137_edit_distance_pairs"],
     "guarded LSH candidates re-verified by normalized Levenshtein"),
    ("q139/q140 data card / vocab diff (NEW) | {0} / {1}",
     ["q139_data_card", "q140_vocab_diff"],
     "one-row release-gate summary / term-level change feed by integer thresholds"),
    ("q141/q142 transition times / label outliers (NEW) | {0} / {1}",
     ["q141_transition_times", "q142_label_outliers"],
     "funnel-latency gaps (floor mean + interpolated median) / bottom-tail cosine vs own-label centroid"),
    ("q143_search_eval (NEW) | {0}", ["q143_search_eval"],
     "recall@10/MRR/nDCG@10 harness grading the IVF arm against the exact ranking"),
]


def main():
    bench = json.load(open(ARTIFACT))
    q = bench["queries"]
    lines = ["| Query | sec | Note |", "|---|---|---|"]
    for label, keys, note in ROWS:
        vals = [f"{q[k]:.2f}" for k in keys]
        lines.append("| " + label.format(*vals) + " | " + note.format(*vals) + " |")
    table = "\n".join(lines)

    t = open(BASELINE).read()
    # operate only on the LATEST measured section — earlier rounds'
    # tables are history and must stay as recorded
    anchor = t.rindex("## Measured (round ")
    head, tail = t[:anchor], t[anchor:]
    tail = re.sub(r"Total \*\*[\d.]+ s over \d+ queries, zero errors\*\*",
                  f"Total **{bench['value']:.1f} s over {len(q)} queries, zero errors**",
                  tail, count=1)
    tail = re.sub(r"\| Query \| sec \| Note \|\n\|---\|---\|---\|\n(?:\|[^\n]*\n)+",
                  table + "\n", tail, count=1)
    open(BASELINE, "w").write(head + tail)
    print(f"synced {BASELINE} from {ARTIFACT}: "
          f"{bench['value']:.1f}s / {len(q)} queries")


if __name__ == "__main__":
    main()
