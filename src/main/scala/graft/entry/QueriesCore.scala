package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.multimodal.Multimodal
import graft.operators.{Clustering, Dedup, Events, HotKeys, Layout, Rank, Search, Similarity, TfIdf}
import graft.entry.EntryShared._

/** Per-domain slice of the driver-contract query/oracle maps:
  * the reference TF-IDF surface (q1-q7 families), search tiers, and relational sanity (joins/windows/top-k/range). Entry text and oracle SQL are byte-identical to the
  * pre-split SparkEntry (the round-10 module split). */
private[graft] object QueriesCore {
  val queries: scala.collection.immutable.ListMap[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
    "q1_tokenize" -> ((s, dir) =>
      tokens(s, dir).orderBy(col("doc_id"), col("term"))),


    // O3 — hash aggregation keyed (term, doc).
    "q2_doc_word_count" -> ((s, dir) =>
      tokens(s, dir)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("doc_id"), col("term"))),


    // O4 — tf = 1 + log10(count) (quirk Q2).
    "q3_term_frequency" -> ((s, dir) =>
      tokens(s, dir)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("tf", round(lit(1.0) + log10(col("cnt")), 6))
        .orderBy(col("doc_id"), col("term"))),


    // O6 — document frequency per term.
    "q4_doc_frequency" -> ((s, dir) =>
      tokens(s, dir)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("term"))),


    // O7 — tf·idf with floor-division idf (quirk Q3) and default
    // numDocs = corpus size (quirk Q4).
    "q5_tfidf" -> ((s, dir) =>
      tfidfScores(s, dir).orderBy(col("term"), col("doc_id"))),


    // O6 alternative strategy: df via window over term (skew-fragile on
    // hot terms — kept oracle-green; broadcast-join is the default plan).
    "q5b_tfidf_window" -> ((s, dir) =>
      TfIdf.tfidf(docs(s, dir), dfViaBroadcast = false)
        .select(col("term"), col("doc").as("doc_id"),
          round(col("tfidf"), 6).as("tfidf"))
        .orderBy(col("term"), col("doc_id"))),


    // O6 third strategy: df via the SALTED shuffle join — the
    // giant-vocabulary + hot-term corner neither broadcast nor window
    // covers; same answer, pinned by q5's oracle.
    "q5c_tfidf_salted" -> ((s, dir) =>
      TfIdf.tfidf(docs(s, dir), dfSalt = Some(8))
        .select(col("term"), col("doc").as("doc_id"),
          round(col("tfidf"), 6).as("tfidf"))
        .orderBy(col("term"), col("doc_id"))),


    // O6 strategy AUTO-SELECTED by the skew radar (q78's hot-key
    // detector on the term key): window when nothing is hot, broadcast
    // when hot terms ride a broadcastable vocabulary, salted beyond
    // that. Answer pinned to q5's oracle — the choice is invisible.
    "q5d_tfidf_auto" -> ((s, dir) =>
      TfIdf.tfidfAuto(docs(s, dir))
        .select(col("term"), col("doc").as("doc_id"),
          round(col("tfidf"), 6).as("tfidf"))
        .orderBy(col("term"), col("doc_id"))),


    // O8+O9 — query-term broadcast semi-join + per-doc sum.
    "q6_search" -> ((s, dir) =>
      Search
        .searchTokens(
          tfidfScores(s, dir).withColumnRenamed("doc_id", "doc"),
          TfIdf.tokenizeQuery(SearchQuery).distinct)
        .select(col("doc").as("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"))),


    // SNIPPETS: the result-page extract — earliest query-term hit and
    // a ±3-token window, map-only over one tokenized scan.
    "q178_search_snippets" -> ((s, dir) =>
      Search.searchSnippets(docs(s, dir), SearchQuery, window = 3)
        .select(col("doc").as("doc_id"), col("first_pos"), col("snippet"))
        .orderBy(col("doc_id"))),


    // FUZZY search: typo'd q6 terms recovered through the SymSpell
    // deletion-neighborhood join + exact Levenshtein verify — the
    // vocabulary fans out, the corpus never rescans.
    "q177_search_fuzzy" -> ((s, dir) =>
      Search
        .searchFuzzyTokens(
          tfidfScores(s, dir).withColumnRenamed("doc_id", "doc"),
          Seq("sparkk", "streem", "windo"))
        .select(col("doc").as("doc_id"), round(col("score"), 6).as("score"),
          col("n_terms_matched"))
        .orderBy(col("doc_id"))),


    // O10 — global sort desc of search hits (deterministic tie-break).
    // Conjunctive (AND) search: only docs containing EVERY query term
    // score — the search mode the reference's OR-sum cannot express.
    "q67_search_all" -> ((s, dir) =>
      Search
        .searchAllTokens(
          tfidfScores(s, dir).withColumnRenamed("doc_id", "doc"),
          TfIdf.tokenizeQuery(SearchQuery))
        .select(col("doc").as("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"))),


    // Phrase search: docs containing the query terms consecutively, in
    // order, with occurrence counts (n-gram machinery, map-only).
    "q68_search_phrase" -> ((s, dir) =>
      Search.searchPhrase(docs(s, dir), "table hash")
        .withColumnRenamed("doc", "doc_id")
        .orderBy(col("doc_id"))),


    // BM25-ranked search (per-term scores pre-rounded like q6's tfidf,
    // so the cross-engine sum is of identical addends).
    "q69_search_bm25" -> ((s, dir) =>
      Search
        .searchBm25Tokens(
          Search.bm25Scores(docs(s, dir))
            .withColumn("score", round(col("score"), 6)),
          TfIdf.tokenizeQuery(SearchQuery))
        .select(col("doc").as("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"))),


    // PMI-expanded BM25: each query term recruits its top-2 PMI
    // neighbors at weight 0.5 — vocabulary-mismatch recall from the
    // corpus's own association table, zero extra corpus exchanges.
    "q162_search_expanded" -> ((s, dir) =>
      Search.searchBm25Expanded(docs(s, dir), SearchQuery, m = 2,
          expWeight = 0.5)
        .select(col("doc").as("doc_id"), col("score_u"))
        .orderBy(col("doc_id"))),


    // Same spec via the window-df strategy — pins the skew-trade-off
    // twin to the same answer (the q5/q5b convention).
    "q69b_bm25_window" -> ((s, dir) =>
      Search
        .searchBm25Tokens(
          Search.bm25Scores(docs(s, dir), dfViaBroadcast = false)
            .withColumn("score", round(col("score"), 6)),
          TfIdf.tokenizeQuery(SearchQuery))
        .select(col("doc").as("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"))),


    // Proximity search: all query terms within one 8-token window.
    "q70_search_near" -> ((s, dir) =>
      Search.searchNear(docs(s, dir), SearchQuery, window = 8)
        .withColumnRenamed("doc", "doc_id")
        .orderBy(col("doc_id"))),


    // Materialized-index round trip: build the term-sorted score index,
    // probe it with a pruned scan — must equal q6 (same oracle SQL).
    // The build write + probe read both execute here, so the measured
    // cost is honest build+query; per-term rounding after read-back
    // mirrors q6's sum-of-rounded-addends (raw doubles round-trip
    // parquet bit-exactly).
    "q71_search_indexed" -> ((s, dir) => {
      val idx = tempIndexDir("graft_index_")
      Search.buildIndex(docs(s, dir), idx)
      Search
        .searchIndexTokens(
          Search.readIndex(s, idx).withColumn("tfidf", round(col("tfidf"), 6)),
          TfIdf.tokenizeQuery(SearchQuery))
        .select(col("doc").as("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"))
    }),


    "q7_rank" -> ((s, dir) =>
      Search
        .searchTokens(
          tfidfScores(s, dir).withColumnRenamed("doc_id", "doc"),
          TfIdf.tokenizeQuery(SearchQuery).distinct)
        .select(col("doc").as("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))),


    // O11 — global sort desc of ALL (term, doc) scores.
    "q7b_tfidf_rank" -> ((s, dir) =>
      tfidfScores(s, dir)
        .orderBy(col("tfidf").desc, col("term"), col("doc_id"))),


    // Relational sanity: join + agg (revenue per nation).
    "q8_join_agg_revenue" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer")
      val n = tbl(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6)
          .as("revenue"))
        .orderBy(col("n_name"))
    }),


    // Window: top-3 orders per customer by total price.
    "q9_window_top_orders" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),


    // Sort/limit: top-20 line items — TakeOrderedAndProject, no full sort.
    "q10_top_k" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)),


    // Range join: parts → price bands via bin-bucketed equi-join (no
    // theta join; PlanAudit enforces).
    // Interval OVERLAP join: user sessions × 10 fixed 6-hour audit
    // windows (every 3rd day, 09:00–15:00 UTC) — "which sessions were
    // live during an audit window". Bin-bucketed equi-join, pair
    // counted once in the first shared bin; closed intervals so
    // one-event sessions participate.
    "q63_interval_overlap" -> ((s, dir) => {
      val sess = Events.sessionize(events(s, dir))
        .select(col("user_id"), col("session_seq"),
          unix_micros(col("session_start")).cast("double").as("s_lo"),
          unix_micros(col("session_end")).cast("double").as("s_hi"))
      val dayUs = 86400000000.0
      val windows = s.range(0, 10).select(col("id").as("window_id"),
        (lit(1704067200000000.0) + col("id") * (3 * dayUs) + lit(9 * 3600000000.0))
          .as("w_lo"))
        .withColumn("w_hi", col("w_lo") + lit(6 * 3600000000.0))
      graft.operators.RangeJoin
        .intervalOverlap(sess, windows, "s_lo", "s_hi", "w_lo", "w_hi",
          binWidth = 6 * 3600000000.0)
        .select(col("user_id"), col("session_seq"), col("window_id"))
        .orderBy(col("user_id"), col("session_seq"), col("window_id"))
    }),


    "q33_range_join_bands" -> ((s, dir) => {
      val bands = s.range(0, 10).select(col("id").as("band_id"),
        (lit(900.0) + col("id") * 10.0).as("lo"),
        (lit(900.0) + (col("id") + 1) * 10.0).as("hi"))
      graft.operators.RangeJoin
        .pointInInterval(
          tbl(s, dir, "part").select(col("p_partkey"), col("p_retailprice")),
          bands, "p_retailprice", "lo", "hi", binWidth = 5.0)
        .select(col("p_partkey"), col("band_id"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    }),


    // Hybrid lexical+dense retrieval fused by reciprocal ranks: the
    // q69 BM25 arm + the q15 cosine arm (query = vec_id 0), both
    // top-100, contributions integer-quantized (1e9 div (60+rank)) so
    // the fused score is an exact long sum in both engines.
    "q94_hybrid_search" -> ((s, dir) =>
      Search.searchHybrid(
          docs(s, dir), tbl(s, dir, "embeddings"), SearchQuery, queryVecId = 0L)
        .select(col("doc").as("doc_id"), col("rrf_micro"), col("n_arms"))
        .orderBy(col("rrf_micro").desc, col("doc_id"))),


    // RANKING EVALUATION harness: the q26 IVF arm graded with
    // recall@10 / MRR / binary nDCG@10 against the exact cosine
    // top-10 as truth — the ad-hoc recall contracts generalized into
    // one reusable metrics operator.
    "q143_search_eval" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val qv = e.where(col("vec_id") < 5)
      val results = Similarity.ivfCosineTopK(e, qv, k = 10)
      val truth = Similarity.cosineTopK(e, qv, k = 10)
        .select(col("q_vec_id"), col("n_vec_id"))
      Search.evalRanking(results, truth, k = 10)
        .orderBy(col("q_vec_id"))
    })
  )

  val sql: Map[String, String] = Map(
    "q1_tokenize" ->
      s"""WITH $TokCte
         |SELECT doc_id, term FROM tok ORDER BY doc_id, term""".stripMargin,


    "q2_doc_word_count" ->
      s"""WITH $TokCte
         |SELECT doc_id, term, count(*) AS cnt FROM tok
         |GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,


    "q3_term_frequency" ->
      s"""WITH $TokCte
         |SELECT doc_id, term, count(*) AS cnt,
         |       round(1 + log10(count(*)), 6) AS tf
         |FROM tok GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,


    "q4_doc_frequency" ->
      s"""WITH $TokCte
         |SELECT term, count(DISTINCT doc_id) AS df FROM tok
         |GROUP BY term ORDER BY term""".stripMargin,


    "q5_tfidf" ->
      s"""$TfIdfCtes
         |SELECT term, doc_id, tfidf FROM scores
         |ORDER BY term, doc_id""".stripMargin,


    // Same spec as q5 — pins the window-strategy plan to the same answer.
    "q5b_tfidf_window" ->
      s"""$TfIdfCtes
         |SELECT term, doc_id, tfidf FROM scores
         |ORDER BY term, doc_id""".stripMargin,


    // Same spec as q5 — pins the salted-join strategy to the same answer.
    "q5c_tfidf_salted" ->
      s"""$TfIdfCtes
         |SELECT term, doc_id, tfidf FROM scores
         |ORDER BY term, doc_id""".stripMargin,


    // Same spec as q5 — pins the radar-chosen strategy to the same answer.
    "q5d_tfidf_auto" ->
      s"""$TfIdfCtes
         |SELECT term, doc_id, tfidf FROM scores
         |ORDER BY term, doc_id""".stripMargin,


    "q6_search" ->
      s"""$TfIdfCtes
         |SELECT doc_id, round(sum(tfidf), 6) AS score FROM scores
         |WHERE term IN ('spark', 'stream', 'window')
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    // Snippet mirror: list_position firsts, null-skipping least, the
    // inclusive-index slice of the same token window.
    "q178_search_snippets" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
        |           AS toks
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, toks,
        |         least(nullif(list_position(toks, 'spark'), 0),
        |               nullif(list_position(toks, 'stream'), 0),
        |               nullif(list_position(toks, 'window'), 0))::BIGINT
        |           AS first_pos
        |  FROM t)
        |SELECT doc_id, first_pos,
        |       array_to_string(list_slice(toks,
        |         greatest(1, first_pos - 3)::INTEGER,
        |         (greatest(1, first_pos - 3) + 6)::INTEGER), ' ') AS snippet
        |FROM p WHERE first_pos IS NOT NULL
        |ORDER BY doc_id""".stripMargin,


    // Fuzzy mirror: brute vocab×queries Levenshtein (the semantics the
    // engine's deletion-neighborhood join must reproduce exactly).
    "q177_search_fuzzy" ->
      s"""$TfIdfCtes,
         |qt AS (SELECT unnest(['sparkk', 'streem', 'windo']) AS q_term),
         |mt AS (
         |  SELECT DISTINCT q.q_term, v.term
         |  FROM qt q JOIN (SELECT DISTINCT term FROM scores) v
         |    ON levenshtein(q.q_term, v.term) <= 1)
         |SELECT s.doc_id, round(sum(s.tfidf), 6) AS score,
         |       count(DISTINCT m.q_term)::BIGINT AS n_terms_matched
         |FROM scores s JOIN mt m USING (term)
         |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin,


    "q67_search_all" ->
      s"""$TfIdfCtes
         |SELECT doc_id, round(sum(tfidf), 6) AS score FROM scores
         |WHERE term IN ('spark', 'stream', 'window')
         |GROUP BY doc_id HAVING count(*) = 3
         |ORDER BY doc_id""".stripMargin,


    "q68_search_phrase" ->
      """WITH tokl AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(toks)),
        |                i -> toks[i] || ' ' || toks[i+1])) AS gram
        |  FROM tokl WHERE len(toks) >= 2)
        |SELECT doc_id, count(*)::BIGINT AS n_occurrences
        |FROM g WHERE gram = 'table hash'
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    "q69_search_bm25" ->
      s"""WITH $Bm25Ctes
         |SELECT doc_id, score FROM bm ORDER BY doc_id""".stripMargin,


    // Expanded-search mirror: the q39 PMI chain filtered to the query
    // terms, (pmi DESC, term) top-2 per term, weights unioned onto the
    // q69 score lineage (the unused `bm` CTE rides along).
    "q162_search_expanded" ->
      s"""WITH $Bm25Ctes,
         |tokl AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS toks
         |  FROM documents),
         |pos AS (
         |  SELECT doc_id, p, toks[p::INTEGER] AS term
         |  FROM tokl, unnest(range(1, len(toks) + 1)) r(p)),
         |pairs AS (
         |  SELECT least(a.term, b.term) AS t1, greatest(a.term, b.term) AS t2
         |  FROM pos a JOIN pos b
         |    ON a.doc_id = b.doc_id AND b.p > a.p AND b.p <= a.p + 2),
         |tc AS (SELECT term, count(*) AS c FROM pos GROUP BY 1),
         |nt AS (SELECT count(*) AS n_tok FROM pos),
         |np AS (SELECT count(*) AS n_pair FROM pairs),
         |pc AS (SELECT t1, t2, count(*) AS pcnt FROM pairs GROUP BY 1, 2),
         |pmi AS (
         |  SELECT t1, t2,
         |         round(log10((pcnt / n_pair) / ((x.c / n_tok) * (y.c / n_tok))), 6) AS pmi
         |  FROM pc JOIN tc x ON t1 = x.term JOIN tc y ON t2 = y.term
         |  CROSS JOIN nt CROSS JOIN np
         |  WHERE pcnt >= 2),
         |nb AS (
         |  SELECT qterm, term, pmi FROM (
         |    SELECT t1 AS qterm, t2 AS term, pmi FROM pmi
         |    WHERE t1 IN ('spark', 'stream', 'window')
         |    UNION ALL
         |    SELECT t2 AS qterm, t1 AS term, pmi FROM pmi
         |    WHERE t2 IN ('spark', 'stream', 'window'))
         |  WHERE term NOT IN ('spark', 'stream', 'window')),
         |topm AS (
         |  SELECT DISTINCT term FROM (
         |    SELECT term,
         |           row_number() OVER (PARTITION BY qterm
         |                              ORDER BY pmi DESC, term) AS rk
         |    FROM nb) WHERE rk <= 2),
         |wts AS (
         |  SELECT unnest(['spark', 'stream', 'window']) AS term,
         |         1000000::BIGINT AS wmicro
         |  UNION ALL
         |  SELECT term, 500000::BIGINT AS wmicro FROM topm)
         |SELECT doc_id,
         |       sum(CAST(round(s * 1e6) AS BIGINT) * wmicro)::BIGINT AS score_u
         |FROM sc JOIN wts USING (term)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,


    // Okapi BM25, k1=1.2 b=0.75, idf = ln(1 + (N-df+0.5)/(df+0.5)).
    "q69b_bm25_window" -> // window-df twin: same spec, same SQL
      s"""WITH $Bm25Ctes
         |SELECT doc_id, score FROM bm ORDER BY doc_id""".stripMargin,


    // All three query terms inside one 8-token sliding window.
    "q70_search_near" ->
      """WITH tokl AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, greatest(len(toks) - 8, 0) + 2),
        |                i -> list_slice(toks, i, i + 7))) AS win
        |  FROM tokl WHERE len(toks) >= 3)
        |SELECT doc_id, count(*)::BIGINT AS n_windows
        |FROM w
        |WHERE list_contains(win, 'spark') AND list_contains(win, 'stream')
        |  AND list_contains(win, 'window')
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    // Index round trip must preserve q6's answer exactly: same SQL.
    "q71_search_indexed" ->
      s"""$TfIdfCtes
         |SELECT doc_id, round(sum(tfidf), 6) AS score FROM scores
         |WHERE term IN ('spark', 'stream', 'window')
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    "q7_rank" ->
      s"""$TfIdfCtes
         |SELECT doc_id, round(sum(tfidf), 6) AS score FROM scores
         |WHERE term IN ('spark', 'stream', 'window')
         |GROUP BY doc_id ORDER BY score DESC, doc_id""".stripMargin,


    "q7b_tfidf_rank" ->
      s"""$TfIdfCtes
         |SELECT term, doc_id, tfidf FROM scores
         |ORDER BY tfidf DESC, term, doc_id""".stripMargin,


    "q8_join_agg_revenue" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 6) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,


    "q9_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,


    "q10_top_k" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,


    // Overlap mirror: the q24 sessionize CTEs feed a plain closed-
    // interval overlap predicate against the same literal windows.
    "q63_interval_overlap" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts,
        |         CASE WHEN prev_ts IS NULL
        |                OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM x),
        |z AS (
        |  SELECT user_id, ts,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                                ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
        |  FROM y),
        |sess AS (
        |  SELECT user_id, session_seq,
        |         epoch_us(min(ts)) AS s_lo, epoch_us(max(ts)) AS s_hi
        |  FROM z GROUP BY 1, 2),
        |w AS (
        |  SELECT wid::BIGINT AS window_id,
        |         1704067200000000 + wid * 259200000000 + 32400000000 AS w_lo,
        |         1704067200000000 + wid * 259200000000 + 54000000000 AS w_hi
        |  FROM range(10) r(wid))
        |SELECT s.user_id, s.session_seq, w.window_id
        |FROM sess s JOIN w ON s.s_lo <= w.w_hi AND w.w_lo <= s.s_hi
        |ORDER BY s.user_id, s.session_seq, w.window_id""".stripMargin,


    "q33_range_join_bands" ->
      """WITH bands AS (
        |  SELECT band_id, 900.0 + band_id * 10.0 AS lo,
        |         900.0 + (band_id + 1) * 10.0 AS hi
        |  FROM range(10) r(band_id))
        |SELECT p_partkey, band_id, p_retailprice
        |FROM part JOIN bands
        |  ON p_retailprice >= lo AND p_retailprice < hi
        |ORDER BY p_partkey""".stripMargin,


    // Hybrid lexical+dense RRF fusion: the q69 BM25 arm (shared CTEs)
    // and the q15-style cosine arm vs vec_id 0, each top-100 ranked
    // (score desc, doc asc), fused by integer-quantized reciprocal
    // ranks — contrib = 1e9 div (60 + rank), so the fused score is a
    // sum of longs in both engines.
    "q94_hybrid_search" ->
      s"""WITH $Bm25Ctes,
         |bmr AS (
         |  SELECT doc_id,
         |         row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
         |  FROM bm),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |qv AS (SELECT * FROM e WHERE vec_id = 0),
         |cosa AS (
         |  SELECT e.vec_id AS doc_id,
         |         round(list_dot_product(qv.emb, e.emb) /
         |               (sqrt(list_dot_product(qv.emb, qv.emb)) *
         |                sqrt(list_dot_product(e.emb, e.emb))), 6) AS score
         |  FROM qv JOIN e ON qv.vec_id <> e.vec_id),
         |cosr AS (
         |  SELECT doc_id,
         |         row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
         |  FROM cosa),
         |fused AS (
         |  SELECT doc_id, 1000000000 // (60 + rnk) AS contrib
         |  FROM bmr WHERE rnk <= 100
         |  UNION ALL
         |  SELECT doc_id, 1000000000 // (60 + rnk) AS contrib
         |  FROM cosr WHERE rnk <= 100)
         |SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS rrf_micro,
         |       count(*)::BIGINT AS n_arms
         |FROM fused GROUP BY doc_id
         |ORDER BY rrf_micro DESC, doc_id""".stripMargin,


    // Search eval: q26's IVF chain as results, the exact ranking over
    // the same normed frame as truth, the metric arithmetic with a
    // list-fold idcg.
    "q143_search_eval" ->
      s"""WITH ${ivfRankedCtes("TRUE")},
         |res AS (SELECT q_vec_id, n_vec_id, rnk FROM ranked WHERE rnk <= 10),
         |truth AS (
         |  SELECT q_vec_id, n_vec_id FROM (
         |    SELECT qq.vec_id AS q_vec_id, c.vec_id AS n_vec_id,
         |           row_number() OVER (PARTITION BY qq.vec_id ORDER BY
         |             round(list_dot_product(qq.emb, c.emb) / (qq.nrm * c.nrm), 6)
         |               DESC, c.vec_id) AS rnk
         |    FROM n qq JOIN n c ON qq.vec_id < 5 AND qq.vec_id <> c.vec_id)
         |  WHERE rnk <= 10),
         |h AS (
         |  SELECT r.q_vec_id, count(*)::BIGINT AS n_hits,
         |         min(r.rnk) AS first_rank,
         |         sum(1.0 / log2(r.rnk + 1)) AS dcg
         |  FROM res r JOIN truth t
         |    ON r.q_vec_id = t.q_vec_id AND r.n_vec_id = t.n_vec_id
         |  GROUP BY 1),
         |nr AS (SELECT q_vec_id, count(*)::BIGINT AS n_rel FROM truth GROUP BY 1)
         |SELECT nr.q_vec_id, nr.n_rel,
         |       coalesce(h.n_hits, 0)::BIGINT AS n_hits,
         |       round(coalesce(h.n_hits, 0) * 1.0 / least(nr.n_rel, 10), 6) AS recall,
         |       round(coalesce(1.0 / h.first_rank, 0.0), 6) AS mrr,
         |       round(coalesce(h.dcg, 0.0) /
         |             list_sum(list_transform(range(1, least(nr.n_rel, 10)::INTEGER + 1),
         |                                     i -> 1.0 / log2(i + 1))), 6) AS ndcg
         |FROM nr LEFT JOIN h ON nr.q_vec_id = h.q_vec_id
         |ORDER BY nr.q_vec_id""".stripMargin
  )
}
