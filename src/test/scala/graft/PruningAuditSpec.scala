package graft

/**
 * Mechanical scan audit over declared queries: column pruning and filter
 * pushdown must reach the parquet scans. A refactor that breaks pruning
 * (e.g. materializing a full-row struct before projecting) fails here
 * before it ever reaches a benchmark — at 100 TB an unpruned documents
 * scan reads the whole text column for queries that only need ids.
 */
class PruningAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** All ReadSchema column lists from the formatted plan, one entry per
    * parquet scan. */
  private def readSchemas(name: String): Seq[Set[String]] = {
    val plan = SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
      .map(_.group(1).split(",").map(_.trim.takeWhile(_ != ':')).toSet)
      .toSeq
  }

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q10 top-k scan reads exactly its three projected lineitem columns") {
    readSchemas("q10_top_k") shouldBe
      Seq(Set("l_orderkey", "l_linenumber", "l_extendedprice"))
  }

  test("q19 token stats scan reads only doc_id and text") {
    readSchemas("q19_token_stats") shouldBe Seq(Set("doc_id", "text"))
  }

  test("q36 stratified sampling scan reads only doc_id and lang — never text") {
    readSchemas("q36_sample_stratified") shouldBe Seq(Set("doc_id", "lang"))
  }

  test("q22 hourly stats scan prunes events to the three used columns") {
    readSchemas("q22_events_hourly") shouldBe
      Seq(Set("ts", "event_type", "value"))
  }

  test("q40 incremental dedup pushes both doc_id range predicates to the scans") {
    val plan = formatted("q40_dedup_incremental")
    plan should include regex "PushedFilters:.*GreaterThanOrEqual\\(doc_id,250\\)"
    plan should include regex "PushedFilters:.*LessThan\\(doc_id,250\\)"
  }

  test("q15 query-side scan pushes the vec_id predicate down") {
    formatted("q15_cosine_topk") should
      include regex "PushedFilters:.*LessThan\\(vec_id,5\\)"
  }

  test("q50 redact scan reads only the three used customer columns") {
    readSchemas("q50_redact") shouldBe
      Seq(Set("c_custkey", "c_name", "c_mktsegment"))
  }

  test("q47 chunking scan reads only doc_id and text") {
    readSchemas("q47_chunk_docs") shouldBe Seq(Set("doc_id", "text"))
  }

  test("q76 retention scans read only user_id, event_type, ts") {
    readSchemas("q76_events_retention") shouldBe
      Seq(Set("ts", "user_id", "event_type"))
  }

  test("q43b quantile-contract scans read only event_type and value") {
    readSchemas("q43b_events_quantiles_approx") shouldBe
      Seq(Set("event_type", "value"), Set("event_type", "value"))
  }

  test("q72 winnow scan reads only doc_id and text") {
    readSchemas("q72_winnow_fingerprints") shouldBe Seq(Set("doc_id", "text"))
  }

  test("q75 rollup scan prunes doc_id — only text, lang, source are read") {
    readSchemas("q75_corpus_rollup") shouldBe Seq(Set("text", "lang", "source"))
  }

  test("q71 indexed-search probe pushes the query terms into the index scan") {
    // The probe must be a FILTERED scan of the materialized index (In
    // pushdown -> row-group pruning), never a join against it.
    val plan = formatted("q71_search_indexed")
    plan should include regex "PushedFilters:.*In\\(term, \\[spark,stream,window\\]\\)"
    (plan should not).include("Join")
  }

  test("q157 entropy reads source and text ONCE (tf frame persisted)") {
    readSchemas("q157_source_entropy") shouldBe Seq(Set("source", "text"))
  }

  test("q153 hashed-features scan reads only doc_id and text") {
    readSchemas("q153_hashed_features") shouldBe Seq(Set("doc_id", "text"))
  }

  test("q153b hashed-cosine: every join is a hash join, cold-bucket set broadcast") {
    // The inverted-index tier's whole point is equi-joins on bucket —
    // a nested-loop anywhere here means the shape regressed to
    // all-pairs. The ≤dims-row cold-bucket admission list must come in
    // as a broadcast, not a shuffle.
    val plan = formatted("q153b_hashed_cosine")
    plan should include("BroadcastHashJoin")
    (plan should not).include("BroadcastNestedLoopJoin")
    (plan should not).include("CartesianProduct")
  }

  test("q156 preference-pair scan reads only doc_id, source, text") {
    readSchemas("q156_preference_pairs") shouldBe
      Seq(Set("doc_id", "source", "text"))
  }

  test("q159 correlation scan reads only ts, event_type, value") {
    readSchemas("q159_type_correlation") shouldBe
      Seq(Set("ts", "event_type", "value"))
  }

  test("q160 zipf-slope scan reads only source and text") {
    readSchemas("q160_zipf_slope") shouldBe Seq(Set("source", "text"))
  }

  test("q164 n-gram diversity scan reads only source and text") {
    readSchemas("q164_ngram_diversity") shouldBe Seq(Set("source", "text"))
  }

  test("q165 burstiness scan reads only doc_id and text; top-k is TakeOrdered") {
    readSchemas("q165_term_burstiness") shouldBe Seq(Set("doc_id", "text"))
    formatted("q165_term_burstiness") should include("TakeOrderedAndProject")
  }

  test("q170 cusum scan reads only ts, event_type, value") {
    // Both CUSUM windows and the moment window run on the hours×types
    // cell frame; the event-scale exchange is the cell aggregate only.
    readSchemas("q170_cusum_changepoints") shouldBe
      Seq(Set("ts", "event_type", "value"))
  }

  test("q170b frozen-cusum scans prune: fit side never reads ts") {
    // fit slice needs (event_id, event_type, value) only; live adds ts
    // for the ordered window — neither reads user_id or props
    readSchemas("q170b_cusum_frozen").toSet shouldBe Set(
      Set("event_id", "event_type", "value"),
      Set("event_id", "ts", "event_type", "value"))
  }

  test("q172 ahash pipeline never reads lang or source") {
    readSchemas("q172_image_ahash") shouldBe Seq(Set("doc_id", "text"))
  }

  test("q217/q218 audio+video ahash pipelines read only doc_id and text") {
    readSchemas("q217_audio_ahash") shouldBe Seq(Set("doc_id", "text"))
    readSchemas("q218_video_ahash") shouldBe Seq(Set("doc_id", "text"))
    // the banded near-dup tiers add no extra scan columns either
    readSchemas("q217b_audio_neardup").toSet shouldBe Set(Set("doc_id", "text"))
    readSchemas("q218b_video_neardup").toSet shouldBe Set(Set("doc_id", "text"))
  }

  test("q220/q221 windowed-hash pipelines read only doc_id and text") {
    readSchemas("q220_audio_ahash_windows") shouldBe Seq(Set("doc_id", "text"))
    readSchemas("q221_video_ahash_segments") shouldBe Seq(Set("doc_id", "text"))
    readSchemas("q220b_audio_window_neardup").toSet shouldBe
      Set(Set("doc_id", "text"))
    readSchemas("q221b_video_segment_neardup").toSet shouldBe
      Set(Set("doc_id", "text"))
    readSchemas("q172d_image_neardup_wide").toSet shouldBe
      Set(Set("doc_id", "text"))
    readSchemas("q220c_audio_window_neardup_incr").toSet shouldBe
      Set(Set("doc_id", "text"))
    readSchemas("q220d_audio_ahash_overlap") shouldBe Seq(Set("doc_id", "text"))
  }

  test("q175 growth scan reads only ts and user_id") {
    readSchemas("q175_user_growth") shouldBe Seq(Set("ts", "user_id"))
  }

  test("q180 SNM scans read only doc_id and text") {
    readSchemas("q180_sorted_neighborhood").toSet shouldBe
      Set(Set("doc_id", "text"))
  }

  test("q179 bloom-join scans read only join keys and selected payloads") {
    readSchemas("q179_bloom_join").toSet shouldBe Set(
      Set("o_orderkey", "o_custkey", "o_totalprice"),
      Set("c_custkey", "c_name", "c_nationkey"))
  }

  test("q175b per-slice growth scans add only the slicing key") {
    // each slice filters on event_id, so both scans read exactly
    // (event_id, ts, user_id) — the merge never touches other columns
    readSchemas("q175b_growth_incremental") shouldBe
      Seq(Set("event_id", "ts", "user_id"), Set("event_id", "ts", "user_id"))
  }

  test("q182's transition-count stage reads only the window columns") {
    // q182's final frame is the collected-model literal (no scans), so
    // the pruning contract is asserted on the corpus-scale stage it
    // collects from
    val plan = graft.operators.Events
      .typeTransitions(spark.read.parquet(s"$dir/events.parquet"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
      .map(_.group(1).split(",").map(_.trim.takeWhile(_ != ':')).toSet)
      .toSeq shouldBe Seq(Set("event_id", "ts", "user_id", "event_type"))
  }

  test("q183 decile scans read only doc_id and text") {
    readSchemas("q183_length_deciles").toSet shouldBe Set(Set("doc_id", "text"))
  }

  test("q184 trend scan reads only ts and event_type") {
    readSchemas("q184_daily_trend") shouldBe Seq(Set("ts", "event_type"))
  }

  test("q185 cdc scan reads the key, order, op, and payload columns only") {
    readSchemas("q185_cdc_apply") shouldBe
      Seq(Set("event_id", "ts", "user_id", "event_type", "value"))
  }

  test("q186 scd2 scan reads the key, order, and attribute columns only") {
    readSchemas("q186_scd2_history") shouldBe
      Seq(Set("event_id", "ts", "user_id", "event_type"))
  }

  test("q187 acf scan reads only ts and event_type, once") {
    readSchemas("q187_daily_acf") shouldBe Seq(Set("ts", "event_type"))
  }

  test("q195 active-users scan reads only ts and user_id, once") {
    readSchemas("q195_active_users") shouldBe Seq(Set("ts", "user_id"))
  }

  test("q197 gini scan reads only user_id") {
    readSchemas("q197_user_gini") shouldBe Seq(Set("user_id"))
  }

  test("q200 entry/exit scan reads only the session key, order, and type") {
    readSchemas("q200_session_entry_exit") shouldBe
      Seq(Set("event_id", "ts", "user_id", "event_type"))
  }

  test("q201 sliding-chunk scan reads only doc_id and text") {
    readSchemas("q201_chunk_sliding") shouldBe Seq(Set("doc_id", "text"))
  }

  test("q198 gap scan reads only the chain key, order, and type columns") {
    readSchemas("q198_gap_histogram") shouldBe
      Seq(Set("event_id", "ts", "user_id", "event_type"))
  }

  test("q188 covariance reads one embedding-only scan") {
    readSchemas("q188_embedding_covariance") shouldBe Seq(Set("embedding"))
  }

  test("q192 compaction scan reads only the partition, id, and size columns") {
    readSchemas("q192_compaction_plan") shouldBe
      Seq(Set("source", "doc_id", "n_chars"))
  }

  test("q193 coverage scan reads only text, once") {
    // cold cache: leftover operator-internal persists from earlier
    // query builds print their cached plans (and FileScans) into the
    // formatted explain, inflating the scan count
    spark.catalog.clearCache()
    readSchemas("q193_coverage_curve") shouldBe Seq(Set("text"))
  }

  test("q194 heaps scans read only doc_id and text") {
    readSchemas("q194_heaps_curve").toSet shouldBe
      Set(Set("doc_id", "text"), Set("doc_id"))
  }

  test("q190/q191 graph scans read only text, once") {
    spark.catalog.clearCache() // cold cache — see the q193 note
    readSchemas("q190_degree_distribution") shouldBe Seq(Set("text"))
    spark.catalog.clearCache()
    readSchemas("q191_clustering_coeff") shouldBe Seq(Set("text"))
  }

  test("q189 matryoshka query-side scan pushes the vec_id predicate down") {
    formatted("q189_matryoshka_topk") should
      include regex "PushedFilters:.*LessThan\\(vec_id,5\\)"
  }

  test("q181 attribution scans read only the join/window/value columns") {
    readSchemas("q181_attribution_linear").toSet shouldBe Set(
      Set("event_id", "ts", "user_id", "event_type", "value"),
      Set("ts", "user_id", "event_type"))
  }

  test("q175c retraction scans read only the slicing key and growth columns") {
    readSchemas("q175c_growth_retract") shouldBe
      Seq(Set("ts", "user_id"), Set("ts", "user_id"))
  }

  test("q176 concentration scan reads only event_type and user_id") {
    readSchemas("q176_top_user_share") shouldBe Seq(Set("event_type", "user_id"))
  }

  test("q169 unimax scan reads only lang and text; corpus scanned once") {
    // The waterfill windows run on the groups-bounded aggregate, never
    // on corpus rows — exactly one scan of documents feeds it.
    readSchemas("q169_unimax_allocation") shouldBe Seq(Set("lang", "text"))
  }

  test("q215 gap-regularity scan reads only user_id, ts, event_id — never value/props") {
    readSchemas("q215_gap_regularity") shouldBe
      Seq(Set("user_id", "ts", "event_id"))
  }

  test("q213 curriculum scans read only doc_id and text") {
    // two scans: the ranked-score fill (Ranking materializes it) reads
    // (doc_id, text); everything after runs on the ranked frame
    spark.catalog.clearCache()
    readSchemas("q213_curriculum").foreach { s =>
      s shouldBe Set("doc_id", "text")
    }
  }
}
