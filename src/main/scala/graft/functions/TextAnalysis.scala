package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines (builder-prompt
 * extension surface): language-ID, quality scoring, token counting,
 * document fingerprinting.
 *
 * All are single-pass column expressions over the text — no shuffle, no
 * UDF, fully whole-stage-codegen'd; at 100 TB these run at parquet-scan
 * speed and the plan is a map-only stage.
 */
object TextAnalysis {

  /** Tiny per-language stopword marker lists for the n-gram/stopword
    * language-ID heuristic. Deliberately small and fixed: the heuristic's
    * contract is determinism, not linguistic accuracy. Single source of
    * truth lives next to the native kernel that scans for them. */
  val LangMarkers: Seq[(String, Seq[String])] =
    org.apache.spark.sql.graft.TextStatsKernel.LangMarkers

  private[graft] def toks(line: Column): Column =
    filter(split(line, "\\s+"), t => length(t) > 0)

  /**
   * One-pass stats struct (n_tokens, n_distinct, sum_tok_len, stop_hits,
   * hits_en/de/es/fr) via the native `TextStats` kernel
   * (org.apache.spark.sql.graft) — ONE scan of the string serves every
   * language count plus the quality metrics; the built-in routes
   * (per-metric HOF filters / regex scans) re-read the text five-to-
   * eight times. Materialize it as a column and feed
   * `langPredFromStats`/`qualityScoreFromStats`.
   */
  def textStatsCol(line: Column): Column =
    org.apache.spark.sql.graft.TextStatsFunctions.textStats(line)

  /** Language-ID argmax (hits desc, lang asc tie-break; zero hits ⇒
    * "und") over a pre-materialized stats struct. */
  def langPredFromStats(st: Column): Column = {
    val best = array_sort(array(LangMarkers.map { case (lang, _) =>
      struct((-st.getField(s"hits_$lang")).as("neg"), lit(lang).as("lang"))
    }: _*)).getItem(0)
    when(best.getField("neg") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Column form of the language-ID argmax straight from the text. */
  def langPredCol(line: Column): Column =
    langPredFromStats(textStatsCol(line))

  /**
   * Language-ID: argmax of per-language marker-token hits, deterministic
   * tie-break on language code order; no hits at all ⇒ "und".
   * Output: doc, lang_pred, plus one hit-count column per language.
   */
  def langId(docs: DataFrame): DataFrame =
    docs
      .withColumn("_st", textStatsCol(col("line")))
      .withColumn("lang_pred", langPredFromStats(col("_st")))
      .select(col("doc") +: col("lang_pred") +:
        LangMarkers.map { case (l, _) => col(s"_st.hits_$l").as(s"hits_$l") }: _*)

  /**
   * Language-ID CONFUSION matrix — [[langId]]'s predictions graded
   * against a trusted label column: per (true lang, predicted lang)
   * cell, the doc count and the within-true-lang share. The heuristic
   * detector's eval harness: the diagonal shares ARE its per-language
   * recall, and a fat "und" column prices the marker lists' coverage
   * before any per-language pipeline cut trusts them.
   *
   * Scale shape: one map-only kernel scan + a langs²-bounded rollup;
   * the share window runs on that bounded frame.
   *
   * @param docs (doc, line, lang) — lang is the trusted label
   * @return (lang, lang_pred, n_docs, share round-6)
   */
  def langIdConfusion(docs: DataFrame): DataFrame = {
    val cells = docs
      .withColumn("lang_pred", langPredCol(col("line")))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
    cells.withColumn("share",
      round(col("n_docs").cast("double") /
        sum(col("n_docs")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))),
        6))
  }

  /**
   * Composite quality score from a pre-materialized stats struct: token
   * count, distinct-token ratio, and stopword ratio, each clamped into
   * [0, 1] (stopword ratio pre-rounded to 6, matching the metric column
   * `qualityScore` emits). The formula is the engine's own (the
   * reference has nothing comparable) — monotone in "looks like real
   * prose".
   */
  def qualityScoreFromStats(st: Column): Column = {
    val nTokens = st.getField("n_tokens")
    val nDistinct = st.getField("n_distinct")
    val stopRatio = round(
      st.getField("stop_hits").cast("double") / greatest(nTokens, lit(1)), 6)
    round(
      least(nTokens / lit(50.0), lit(1.0)) * lit(0.4) +
        (nDistinct / greatest(nTokens, lit(1))) * lit(0.4) +
        least(stopRatio * lit(4.0), lit(1.0)) * lit(0.2),
      6)
  }

  /** Column form straight from the text. */
  def qualityScoreCol(line: Column): Column =
    qualityScoreFromStats(textStatsCol(line))

  def qualityScore(docs: DataFrame): DataFrame =
    docs
      .withColumn("_st", textStatsCol(col("line")))
      .withColumn("n_tokens", col("_st.n_tokens"))
      .withColumn("n_distinct", col("_st.n_distinct"))
      .withColumn("mean_tok_len",
        round(col("_st.sum_tok_len") / greatest(col("_st.n_tokens"), lit(1)), 6))
      .withColumn("stopword_ratio",
        round(col("_st.stop_hits").cast("double") /
          greatest(col("_st.n_tokens"), lit(1)), 6))
      .withColumn("quality_score", qualityScoreFromStats(col("_st")))
      .select(col("doc"), col("n_tokens"), col("n_distinct"),
        col("mean_tok_len"), col("stopword_ratio"), col("quality_score"))

  /**
   * Token counting: whitespace tokens, a BPE-ish subword count (greedy
   * non-overlapping runs of ≤ 4 word chars — a deterministic stand-in for
   * a real BPE vocab), and character count.
   */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc"),
      size(toks(col("line"))).cast("long").as("ws_tokens"),
      regexp_count(col("line"), lit("[A-Za-z0-9]{1,4}")).cast("long").as("bpe_ish_tokens"),
      length(col("line")).cast("long").as("n_chars"))

  /**
   * Windowed token co-occurrence with PMI: pairs of tokens within
   * `window` positions (canonicalized t1 ≤ t2),
   * pmi = log10( (cnt/P) / ((c1/N)·(c2/N)) ) over corpus totals.
   *
   * Scale shape: pair generation is MAP-ONLY — each token pairs with its
   * ≤ `window` forward neighbors via a nested array transform over the
   * token array (`slice` bounds the match itself), so per-doc cost is
   * genuinely length × window with no self-join and no positional
   * shuffle; a 100k-token document emits 100k·window rows, never L²
   * intermediate pairs. Count totals join back as broadcasts (vocab- or
   * 1-row-sized).
   */
  /** Windowed co-occurrence PAIRS (t1 ≤ t2 per pair), one row per
    * positional pair — the map-only, row-local generator shared by
    * [[cooccurrencePmi]] and the term-graph operators
    * (graft.operators.Graph): token i (0-based) × its forward
    * neighbors at 1-based positions i+2 .. i+1+window; slice truncates
    * at the array end, so the last tokens emit fewer pairs, matching
    * the positional-range semantics. No positional self-join — the
    * blow-up is per-row and bounded by window·len. */
  def cooccurrencePairs(docs: DataFrame, window: Int): DataFrame = {
    val tokd = docs.select(toks(col("line")).as("toks"))
    val pairStructs = flatten(transform(col("toks"), (ta, i) =>
      transform(slice(col("toks"), i + lit(2), lit(window)), tb =>
        struct(least(ta, tb).as("t1"), greatest(ta, tb).as("t2")))))
    tokd
      .select(explode(pairStructs).as("pr"))
      .select(col("pr.t1").as("t1"), col("pr.t2").as("t2"))
  }

  def cooccurrencePmi(
      docs: DataFrame,
      window: Int = 2,
      minCount: Int = 2): DataFrame = {
    val pairs = cooccurrencePairs(docs, window)
    val terms = docs.select(explode(toks(col("line"))).as("term"))
    val termCounts = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val nTok = terms.agg(count(lit(1)).as("n_tok"))
    val nPair = pairs.agg(count(lit(1)).as("n_pair"))
    pairs
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .join(broadcast(termCounts.select(col("term").as("t1"), col("c").as("c1"))), "t1")
      .join(broadcast(termCounts.select(col("term").as("t2"), col("c").as("c2"))), "t2")
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nPair))
      .withColumn("pmi", round(
        log10((col("cnt") / col("n_pair")) /
          ((col("c1") / col("n_tok")) * (col("c2") / col("n_tok")))), 6))
      .select(col("t1"), col("t2"), col("cnt"), col("pmi"))
  }

  /**
   * Whole-corpus statistics in one aggregate: document count, distinct
   * vocabulary size, total token count. `exact = false` swaps the
   * distinct counts for HyperLogLog `approx_count_distinct` (2% rsd) —
   * at 100 TB the exact multi-distinct plans an Expand (rows × 2) while
   * the sketch is a fixed-size buffer per partition; use exact only when
   * the oracle/billing needs it.
   */
  def corpusStats(docs: DataFrame, exact: Boolean = true): DataFrame = {
    val terms = docs.select(col("doc"),
      explode(toks(col("line"))).as("term"))
    def cd(c: Column) =
      if (exact) countDistinct(c) else approx_count_distinct(c, 0.02)
    terms.agg(
      cd(col("doc")).cast("long").as("n_docs"),
      cd(col("term")).cast("long").as("n_terms"),
      count(lit(1)).as("total_tokens"))
  }

  /**
   * Corpus-wide top-k word n-grams by document frequency (each doc
   * counts an n-gram once — the `WordShingles` generator emits distinct
   * grams per doc). One partial-aggregated shuffle on the gram plus a
   * TakeOrderedAndProject top-k — no global sort materialization.
   */
  def topNgrams(docs: DataFrame, n: Int = 3, k: Int = 20): DataFrame =
    graft.operators.Dedup.shingles(docs, n)
      .groupBy(col("shingle").as("ngram"))
      .agg(count(lit(1)).as("doc_freq"))
      .select(col("ngram"), col("doc_freq"))
      .orderBy(col("doc_freq").desc, col("ngram"))
      .limit(k)

  /**
   * Repetition scoring — the boilerplate/spam quality signal: fraction
   * of REPEATED word n-grams per document (0 = all grams unique, → 1 as
   * the text degenerates into loops). Pure map-only column expressions
   * over the token array (no explode, no shuffle): at 100 TB this runs
   * at scan speed next to the other quality filters.
   */
  def repetitionScore(docs: DataFrame, n: Int = 3): DataFrame = {
    // The TOTAL gram count is pure arithmetic on the token count — only
    // the DISTINCT count needs the materialized gram array, and the
    // token array projects once so the (interpreted) HOF chain runs a
    // single time per row, not once per referencing metric.
    val grams = (t: Column) => transform(sequence(lit(0), size(t) - n),
      i => array_join(slice(t, i + 1, lit(n)), " "))
    docs
      .select(col("doc"), toks(col("line")).as("_toks"))
      .select(col("doc"),
        greatest(size(col("_toks")) - (n - 1), lit(0)).cast("long").as("n_grams"),
        when(size(col("_toks")) >= n, size(array_distinct(grams(col("_toks")))))
          .otherwise(lit(0)).cast("long").as("n_distinct_grams"))
      .withColumn("rep_ratio", round(
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("n_distinct_grams") / col("n_grams")), 6))
  }

  /** The Gopher rule-set's English stopword presence list (Rae et al.
    * 2021, arXiv:2112.11446, Table A1: "contains at least 2 of ..."). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * GOPHER QUALITY RULES (Rae et al. 2021, arXiv:2112.11446, Table A1) —
   * the named heuristic filter battery most large-corpus curation
   * pipelines start from, as a per-doc flag table: word-count bounds,
   * mean-word-length bounds, alphabetic-word fraction, stopword
   * presence, and the top-2-gram character-fraction repetition rule,
   * plus the combined `keep` verdict. Emitting the metrics (not just
   * the verdict) is deliberate: threshold tuning reads this table.
   *
   * Scale shape: every per-token metric rides ONE map-side pass (token
   * array projected once; counts/lengths/stop-hits are array HOFs —
   * no UDF, no explode). Only the top-2-gram rule needs distribution:
   * bigram explode → one (doc, gram) count shuffle → one doc-keyed
   * max(struct) agg — two bounded exchanges, join back on the doc key.
   * Line-shape rules from the paper (bullet/ellipsis line fractions)
   * are omitted: this corpus has no line structure to measure.
   */
  def gopherQualityRules(
      docs: DataFrame,
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minFracAlpha: Double = 0.8,
      minStopHits: Long = 2L,
      maxTop2Frac: Double = 0.2): DataFrame = {
    val base = docs
      .select(col("doc"), col("line"), toks(col("line")).as("_toks"))
      .select(col("doc"), col("line"), col("_toks"),
        size(col("_toks")).cast("long").as("n_words"))
      .withColumn("mean_word_len", round(
        aggregate(col("_toks"), lit(0L), (acc, t) => acc + length(t))
          .cast("double") / greatest(col("n_words"), lit(1L)), 6))
      .withColumn("frac_alpha_words", round(
        size(filter(col("_toks"), t => regexp_count(t, lit("[A-Za-z]")) > 0))
          .cast("double") / greatest(col("n_words"), lit(1L)), 6))
      .withColumn("n_stop_hits",
        size(filter(array(GopherStopwords.map(lit): _*),
          s => array_contains(col("_toks"), s))).cast("long"))
      .withColumn("n_chars", greatest(char_length(col("line")), lit(1)))
    // Top 2-gram by occurrence count (ties to the lexicographically
    // larger gram — max(struct) and the oracle's window agree on it),
    // weighted by its character share of the doc.
    val grams = docs
      .select(col("doc"), toks(col("line")).as("_toks"))
      .select(col("doc"), explode(zip_with(
        slice(col("_toks"), lit(1), greatest(size(col("_toks")) - 1, lit(0))),
        slice(col("_toks"), lit(2), greatest(size(col("_toks")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("gram"))
    val top = grams
      .groupBy(col("doc"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc"))
      .agg(max(struct(col("cnt"), col("gram"))).as("_top"))
      .select(col("doc"), col("_top.cnt").as("_tcnt"), col("_top.gram").as("_tgram"))
    base.join(top, Seq("doc"), "left")
      .withColumn("top2_frac", round(
        coalesce(col("_tcnt") * char_length(col("_tgram")), lit(0L))
          .cast("double") / col("n_chars"), 6))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanLen, maxMeanLen) &&
          col("frac_alpha_words") >= minFracAlpha &&
          col("n_stop_hits") >= minStopHits &&
          col("top2_frac") <= maxTop2Frac)
      .select(col("doc"), col("n_words"), col("mean_word_len"),
        col("frac_alpha_words"), col("n_stop_hits"), col("top2_frac"),
        col("keep"))
  }

  /**
   * ROW-LOCAL Gopher verdict — [[gopherQualityRules]]' `keep` boolean as
   * a single column expression with ZERO exchanges: the per-token rules
   * are the same array HOFs, and the top-2-gram rule runs doc-locally
   * (count each distinct gram via a filter scan — O(grams·distinct) per
   * row, fine at per-document scale; the distributed twin exists for
   * corpora of pathological single-doc lengths). Being exchange-free
   * makes this the STREAMING shape: `StreamingOps.gopherScreen` filters
   * an unbounded doc stream by exactly this column (stateless, append-
   * safe), and TextAnalysisSpec pins row-local ≡ distributed on the
   * same corpus.
   */
  def gopherKeepCol(
      line: Column,
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minFracAlpha: Double = 0.8,
      minStopHits: Long = 2L,
      maxTop2Frac: Double = 0.2): Column = {
    val t = toks(line)
    val nWords = size(t).cast("long")
    val meanLen = round(
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
        greatest(nWords, lit(1L)), 6)
    val fracAlpha = round(
      size(filter(t, x => regexp_count(x, lit("[A-Za-z]")) > 0)).cast("double") /
        greatest(nWords, lit(1L)), 6)
    val stopHits = size(filter(array(GopherStopwords.map(lit): _*),
      s => array_contains(t, s))).cast("long")
    val pairLen = greatest(size(t) - 1, lit(0))
    val grams = zip_with(
      slice(t, lit(1), pairLen), slice(t, lit(2), pairLen),
      (a, b) => concat(a, lit(" "), b))
    // max (occurrence count, gram) over distinct grams — array_max's
    // struct ordering = the distributed tier's max(struct) tie-break
    val top = array_max(transform(array_distinct(grams),
      g => struct(size(filter(grams, x => x === g)).cast("long").as("cnt"),
        g.as("gram"))))
    val top2Frac = round(
      coalesce(top.getField("cnt") * char_length(top.getField("gram")), lit(0L))
        .cast("double") / greatest(char_length(line), lit(1)), 6)
    nWords.between(minWords, maxWords) &&
      meanLen.between(minMeanLen, maxMeanLen) &&
      fracAlpha >= minFracAlpha &&
      stopHits >= minStopHits &&
      top2Frac <= maxTop2Frac
  }

  /**
   * Bigram language-model scoring — the fluency/perplexity-style quality
   * signal: score(doc) = mean log10 P(w_i | w_{i-1}) over the doc's
   * bigrams with add-one smoothing, P(b|a) = (c(a,b) + 1)/(c(a) + V),
   * against the corpus's own counts (V = vocabulary size). Low scores
   * flag token soup and shuffled text that repetition/stopword metrics
   * miss. Docs with < 2 tokens emit no row.
   *
   * Scale shape: bigram generation is a map-only array zip; the model is
   * two count aggregations joined vocab-side FIRST (c2 ⋈ c1 on w1, both
   * vocab-scale), so the big doc-bigram stream shuffles exactly once on
   * the (w1, w2) key its own count aggregation already uses; V joins as
   * a 1-row broadcast. No driver-side model state.
   */
  def bigramLmScore(docs: DataFrame): DataFrame = {
    val toksC = toks(col("line"))
    val pairLen = greatest(size(toksC) - 1, lit(0))
    val bigrams = docs.select(col("doc"),
      explode(zip_with(
        slice(toksC, lit(1), pairLen), slice(toksC, lit(2), pairLen),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val uni = docs.select(explode(toksC).as("w1"))
    val c1 = uni.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = uni.agg(countDistinct(col("w1")).as("v"))
    val model = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
    bigrams
      .join(model, Seq("w1", "w2"))
      .withColumn("logp",
        log10((col("c2") + lit(1.0)) / (col("c1") + col("v"))))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("logp")), 6).as("avg_logp"))
  }

  /**
   * N-GRAM OVERLAP F1 for given document pairs — the ROUGE-N-shaped
   * reference metric over gram MULTISETS: per (d1, d2) pair,
   * overlap = Σ_g min(c1(g), c2(g)), precision = overlap / |grams(d1)|,
   * recall = overlap / |grams(d2)|, and F1 via the exact algebraic
   * identity 2pr/(p+r) = 2·overlap/(tot1+tot2) — ONE division, no
   * compounding float steps, so the row is engine-exact at round-6 by
   * construction. The summarization/paraphrase eval harness next to the
   * set-Jaccard tiers (q12/q146): multiset counts see repetition that
   * distinct-shingle machinery deliberately ignores.
   *
   * Pairs that share no gram are DROPPED (an inner join — the metric is
   * for candidate pairs, which share by construction; a zero-overlap
   * pair would emit 0/0/0 noise). Docs shorter than n grams have no
   * gram rows and likewise drop.
   *
   * Scale shape: one (doc, gram) count aggregate over the corpus (the
   * token-table-sized shuffle the corpus pays anyway), then two
   * pair-keyed joins bounded by the PAIRS frame — at 100 TB the pairs
   * come from a banded candidate tier, never all-pairs; this operator
   * never generates pairs itself.
   *
   * @param pairs (d1, d2)
   * @param docs (doc, line)
   * @return (d1, d2, overlap, precision, recall, f1) — round-6
   */
  def ngramOverlapF1(pairs: DataFrame, docs: DataFrame, n: Int = 2): DataFrame = {
    require(n >= 1, s"gram size n must be >= 1, got $n")
    val toks = graft.operators.Dedup.tokensCol(col("line"))
    val grams = transform(
      sequence(lit(0), size(col("_toks")) - n),
      i => array_join(slice(col("_toks"), i + 1, lit(n)), " "))
    val gc = graft.Caching.persist(docs
      .select(col("doc"), toks.as("_toks"))
      .where(size(col("_toks")) >= n)
      .select(col("doc"), explode(grams).as("gram"))
      .groupBy(col("doc"), col("gram")).agg(count(lit(1)).as("c")))
    val tot = gc.groupBy(col("doc")).agg(sum(col("c")).as("tot"))
    pairs
      .join(gc.select(col("doc").as("d1"), col("gram"), col("c").as("c1")), "d1")
      .join(gc.select(col("doc").as("d2"), col("gram"), col("c").as("c2")),
        Seq("d2", "gram"))
      .groupBy(col("d1"), col("d2"))
      .agg(sum(least(col("c1"), col("c2"))).as("overlap"))
      .join(tot.select(col("doc").as("d1"), col("tot").as("tot1")), "d1")
      .join(tot.select(col("doc").as("d2"), col("tot").as("tot2")), "d2")
      .select(col("d1"), col("d2"), col("overlap"),
        round(col("overlap").cast("double") / col("tot1").cast("double"), 6)
          .as("precision"),
        round(col("overlap").cast("double") / col("tot2").cast("double"), 6)
          .as("recall"),
        round(lit(2.0) * col("overlap").cast("double") /
          (col("tot1") + col("tot2")).cast("double"), 6).as("f1"))
  }

  /**
   * Document fingerprints: md5 of whitespace-canonicalized text (exact
   * content identity), plus a 64-bit rolling-hash-style fingerprint folded
   * from the first 16 hex digits (cheap join key for dedup at scale).
   */
  def fingerprint(docs: DataFrame): DataFrame = {
    val canon = trim(regexp_replace(col("line"), "\\s+", " "))
    docs.select(
      col("doc"),
      md5(canon).as("fp_md5"),
      conv(substring(md5(canon), 1, 15), 16, 10).cast("long").as("fp64"))
  }

  /**
   * WINNOWING fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003 —
   * the MOSS algorithm): hash every k-token gram, slide a w-hash
   * window, keep each window's minimum hash; the distinct minima are
   * the document's fingerprint set. Guarantees: any shared run of
   * k + w − 1 tokens between two documents yields at least one shared
   * fingerprint (detection), and at most ~2/(w+1) of gram hashes are
   * selected (density) — local, position-robust dedup/plagiarism
   * signatures where [[fingerprint]]'s whole-doc hash breaks on any
   * edit.
   *
   * Scale shape: gram hashes build once per doc (one map-only array
   * pass), window minima via the exploded-start-position scan (stays
   * in codegen — `array_min` over a w-slice), then ONE (doc, fp)
   * distinct exchange. The min is over md5 hex STRINGS (lexicographic)
   * so engines agree without integer-conversion drift.
   */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1, s"gram size k must be >= 1, got $k")
    require(w >= 1, s"window w must be >= 1, got $w")
    val toks = graft.operators.Dedup.tokensCol(col("line"))
    val hashes = transform(
      sequence(lit(0), size(col("_toks")) - k),
      i => md5(array_join(slice(col("_toks"), i + 1, lit(k)), " ")))
    docs
      .select(col("doc"), toks.as("_toks"))
      .where(size(col("_toks")) >= k)
      .select(col("doc"), hashes.as("_h"))
      .select(col("doc"), col("_h"),
        explode(sequence(lit(0), greatest(size(col("_h")) - w, lit(0))))
          .as("_j"))
      .select(col("doc"),
        array_min(slice(col("_h"), col("_j") + 1, lit(w))).as("fp"))
      .distinct()
  }

  /**
   * Near-dup candidate pairs by SHARED WINNOW FINGERPRINTS — the pair
   * tier over [[winnowFingerprints]]: documents sharing at least
   * `minShared` window-min signatures are plagiarism/boilerplate-reuse
   * candidates (each shared fp witnesses a shared ≥ k+w−1-token run).
   * Fingerprints held by more than `maxDocsPerFp` documents are
   * EXCLUDED before the self-join — a fp in m docs costs O(m²) pairs,
   * and such fps are corpus-wide boilerplate, reported separately by
   * [[winnowHotFingerprints]]. The guard restricts the fp table BEFORE
   * pairing (both sides see the bounded frame — never relying on the
   * optimizer to push a post-join filter down), mirroring the LSH
   * hot-bucket guard; the oracle SQL mirrors the same bound.
   */
  def winnowPairs(
      docs: DataFrame,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 2,
      maxDocsPerFp: Int = 50): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDocsPerFp >= 2, s"maxDocsPerFp must be >= 2, got $maxDocsPerFp")
    val fps = winnowFingerprints(docs, k, w)
    val ok = fps.groupBy(col("fp")).agg(count(lit(1)).as("fp_n"))
      .where(col("fp_n") <= maxDocsPerFp)
      .select(col("fp"))
    val bounded = fps.join(ok, Seq("fp"))
    val a = bounded.select(col("fp"), col("doc").as("doc_a"))
    val b = bounded.select(col("fp"), col("doc").as("doc_b"))
    a.join(b, Seq("fp"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
  }

  /** Audit twin of [[winnowPairs]]'s guard: the corpus-wide boilerplate
    * fingerprints it excluded, with their document counts. */
  def winnowHotFingerprints(
      docs: DataFrame,
      k: Int = 3,
      w: Int = 4,
      maxDocsPerFp: Int = 50): DataFrame =
    winnowFingerprints(docs, k, w)
      .groupBy(col("fp")).agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") > maxDocsPerFp)

  /**
   * Default PII-redaction rules, applied IN ORDER (order matters: the
   * IP rule must fire before the bare digit-run rule eats its octets).
   * Every pattern is written in the Java-regex ∩ RE2 common subset (no
   * backreferences, no lookaround, no `\b`) so the same rules run
   * unchanged on Spark and RE2-based engines.
   */
  val RedactRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}" -> "<IP>",
    "[0-9]{2,}" -> "<NUM>")

  /** Redacted text column: rules fold left over the string, each
    * replacing ALL matches in the output of the previous rule. */
  def redactCol(text: Column, rules: Seq[(String, String)] = RedactRules): Column =
    rules.foldLeft(text) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /**
   * PII / pattern redaction — the privacy-scrub stage of a training
   * pipeline: masks each rule's matches and reports per-rule match
   * counts. Counts are SEQUENTIAL (rule i counts matches in the text
   * already redacted by rules 0..i-1), so overlapping patterns (an IP's
   * octets vs the digit-run rule) are never double-counted.
   *
   * Output: all input columns plus `redacted` and one `n_<name>` count
   * per rule. Pure map-only column expressions — no shuffle, no UDF; at
   * 100 TB this runs at parquet-scan speed inside whole-stage codegen.
   */
  def redact(
      df: DataFrame,
      text: Column,
      rules: Seq[(String, (String, String))] =
        Seq("email", "ip", "num").zip(RedactRules)): DataFrame = {
    val (finalText, countCols) =
      rules.foldLeft((text, Seq.empty[Column])) {
        case ((acc, counts), (name, (pat, repl))) =>
          (regexp_replace(acc, pat, repl),
            counts :+ size(regexp_extract_all(acc, lit(pat), lit(0)))
              .cast("long").as(s"n_$name"))
      }
    df.select((df.columns.map(col) :+ finalText.as("redacted")) ++ countCols: _*)
  }

  /**
   * Canonical text NORMALIZATION — the pre-pass that makes exact dedup
   * and shingle-based near-dup actually fire across case/punctuation
   * variants ("Hello, World!" vs "hello world" are the same document to
   * a curation pipeline): lowercase → punctuation runs to spaces →
   * whitespace runs collapsed → trimmed. Fixed order, map-only,
   * codegen'd regex in the Java∩RE2 subset (the redaction convention) —
   * so the oracle mirrors it verbatim. Normalize BEFORE fingerprinting;
   * keep the raw column for display.
   */
  def normalizeTextCol(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]+", " "),
      "\\s+", " "))

  /** Frame form of [[normalizeTextCol]]: adds `norm_text`. */
  def normalizeText(df: DataFrame, text: Column): DataFrame =
    df.withColumn("norm_text", normalizeTextCol(text))

  /**
   * Term-distribution DRIFT between two corpus snapshots — the dataset
   * monitor for a rolling ingest: per-term contribution to the
   * Jensen–Shannon divergence between the add-one-smoothed unigram
   * distributions of `corpusA` (e.g. yesterday's accepted batch) and
   * `corpusB` (today's), top-k contributors first. JS rather than KL
   * because it is symmetric and finite even for terms one side has
   * never seen; smoothing over the UNION vocabulary keeps both
   * distributions on the same support.
   *
   * Plan: one partial-aggregated term count per side, a full-outer
   * merge ON the count partitioning (both sides leave their aggregates
   * hash-partitioned by term, so the join adds no shuffle), then the
   * merged VOCABULARY-sized count table is persisted (via
   * `graft.Caching`, so `Caching.scoped` callers release it) because
   * two consumers read it — the 1-row (n_a, n_b, |V|) totals broadcast
   * and the per-term scoring; without the cache each consumer would
   * re-run the corpus scans. Finish: TakeOrderedAndProject top-k. At
   * 100 TB the shuffled data is (term, count) pairs, never documents.
   */
  def termDrift(corpusA: DataFrame, corpusB: DataFrame, k: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def termCounts(d: DataFrame, cname: String) =
      d.select(explode(toks(col("line"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as(cname))
    val merged = graft.Caching.persist(termCounts(corpusA, "cnt_a")
      .join(termCounts(corpusB, "cnt_b"), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b")))
    val tot = merged.agg(
      sum(col("cnt_a")).as("n_a"),
      sum(col("cnt_b")).as("n_b"),
      count(lit(1)).as("v"))
    val p = (col("cnt_a") + lit(1.0)) / (col("n_a") + col("v"))
    val q = (col("cnt_b") + lit(1.0)) / (col("n_b") + col("v"))
    val m = (p + q) / 2
    merged.crossJoin(broadcast(tot))
      .select(col("term"), col("cnt_a"), col("cnt_b"),
        round(lit(0.5) * p * log2(p / m) + lit(0.5) * q * log2(q / m), 9)
          .as("js_contrib"))
      .orderBy(col("js_contrib").desc, col("term"))
      .limit(k)
  }

  /** The alphabet [[charEntropy]] scores over by default — this
    * corpus's full character set (lowercase words + spaces). Shared
    * with the oracle-SQL builder so both engines iterate the SAME
    * characters in the SAME order (float-sum order is part of the
    * contract). */
  val EntropyAlphabet: Seq[Char] = ('a' to 'z') :+ ' '

  /**
   * Per-document CHARACTER ENTROPY — the cheap gibberish/boilerplate
   * detector quality pipelines pair with token heuristics: Shannon
   * entropy (nats) of the document's character distribution over a
   * fixed alphabet. Near-zero entropy flags single-character floods
   * ("aaaa…"), abnormally low values flag repeated boilerplate;
   * natural text sits in a narrow band, so both tails are screenable
   * cut points.
   *
   * Purely MAP-ONLY and ONE PASS per row: the native
   * [[org.apache.spark.sql.graft.CharCounts]] kernel walks the text
   * once and returns all |alphabet| counts as one array (the
   * replace-based route it replaced re-scanned the string per
   * character — ~36 passes per row for the default alphabet); the
   * per-character columns are `getItem` projections over that array,
   * no explode, no shuffle, no UDF. The entropy uses the algebraic
   * form `ln(n) − (Σ cᵢ·ln cᵢ)/n`, with the Σ accumulated in fixed
   * alphabet order by an explicit left-associated `+` chain — the
   * oracle mirrors the same order, so cross-engine drift is bounded
   * by ln's 1-ulp difference over ≤|alphabet| terms, far below the
   * round-6 contract.
   *
   * @return (doc, n_counted, n_distinct_chars, entropy_nats) — rows
   *         whose text has no alphabet characters are dropped
   */
  def charEntropy(
      docs: DataFrame,
      alphabet: Seq[Char] = EntropyAlphabet): DataFrame = {
    require(alphabet.nonEmpty && alphabet.distinct == alphabet,
      "alphabet must be non-empty with distinct characters")
    val ccCol = org.apache.spark.sql.graft.CharCountsFunctions
      .charCounts(col("line"), alphabet.mkString)
    val cnts: Seq[Column] =
      alphabet.indices.map(i => col("_cc").getField("counts").getItem(i))
    val nlnTerms = cnts.map { c =>
      when(c > 0, c.cast("double") * log(c.cast("double"))).otherwise(lit(0.0))
    }
    val s = nlnTerms.reduceLeft(_ + _)
    val n = col("_cc").getField("n_counted")
    docs
      .withColumn("_cc", ccCol)
      .where(n > 0)
      .select(
        col("doc"),
        n.as("n_counted"),
        col("_cc").getField("n_distinct").as("n_distinct_chars"),
        round(log(n.cast("double")) -
          s / n.cast("double"), 6).as("entropy_nats"))
  }
}
