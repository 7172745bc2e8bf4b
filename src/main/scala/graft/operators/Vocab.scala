package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Vocabulary construction and token-id encoding — the tokenize-for-
 * training tier of an LLM data pipeline: build a frequency-ranked
 * term → id dictionary over the corpus, then encode each document as
 * its id sequence.
 */
object Vocab {

  private def toks(line: Column): Column =
    filter(split(line, "\\s+"), t => length(t) > 0)

  /** Sentinel id for out-of-vocabulary terms in [[encodeTokens]]. */
  val OovId = -1L

  /**
   * Frequency-ranked vocabulary: (term, cnt, token_id) with token_id =
   * dense 0-based rank by (cnt desc, term asc) — deterministic across
   * runs and engines (the sort key is a total order: terms are distinct
   * after aggregation, so rank is independent of partitioning).
   *
   * Scale shape — a TWO-STAGE global rank, never a single-partition
   * sort: one partially-aggregated shuffle on `term` builds the counts;
   * the vocabulary is then RANGE-partitioned on (cnt desc, term) and
   * sorted within partitions, so every partition holds a contiguous
   * slice of the global order and token_id = partition offset +
   * intra-partition index. The offsets come from a per-partition row
   * histogram — ≤ `spark.sql.shuffle.partitions` rows collected to the
   * driver, a sizing decision of AQE's magnitude, not a data collect.
   * A 10⁹-term web vocabulary ranks at full cluster parallelism; the
   * old `row_number over Window.orderBy(...)` shape would have planned
   * an `Exchange SinglePartition` + one-task sort of the whole
   * vocabulary (PlanAuditSpec now forbids that plan for the encode
   * queries).
   *
   * The ranked frame persists through [[graft.Caching]] (the histogram
   * action and the caller's consumption must see the SAME materialized
   * partitioning); wrap composed runs in `Caching.scoped` to release it.
   */
  def buildVocab(docs: DataFrame, minCount: Long = 1L): DataFrame =
    rankVocab(termCounts(docs), minCount)

  /**
   * Raw (term, cnt) corpus counts — the UNPRUNED mergeable state behind
   * [[buildVocab]]. Persist THIS for incremental pipelines (not the
   * ranked vocab): minCount pruning must apply at rank time, or a term
   * sitting below threshold in the history would lose its old count and
   * never cross the threshold however often new data repeats it.
   */
  def termCounts(docs: DataFrame): DataFrame =
    docs
      .select(explode(toks(col("line"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))

  /**
   * Incremental vocabulary state update — the daily-ingest twin of
   * [[termCounts]] (the q40/q52 family): merge a persisted counts table
   * with a new document batch's counts. One partially-aggregated union
   * shuffle on `term`; `rankVocab` of the merged state is IDENTICAL to
   * `buildVocab` over the concatenated corpora (q61 pins this contract
   * against the full-corpus oracle).
   */
  def mergeTermCounts(oldCounts: DataFrame, newDocs: DataFrame): DataFrame =
    oldCounts.select(col("term"), col("cnt"))
      .unionByName(termCounts(newDocs))
      .groupBy(col("term")).agg(sum(col("cnt")).as("cnt"))

  /** Rank a (term, cnt) table into the (term, cnt, token_id) vocabulary
    * (two-stage parallel rank via [[Ranking.withGlobalRank]] — see
    * [[buildVocab]]'s scale notes). */
  def rankVocab(counts0: DataFrame, minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    Ranking.withGlobalRank(
        counts0.where(col("cnt") >= minCount),
        Seq(col("cnt").desc, col("term")),
        rankCol = "token_id",
        errorHint = "re-run buildVocab, or checkpoint its input")
      .select(col("term"), col("cnt"), col("token_id"))
  }

  /**
   * Positional token-id encoding: one row per (doc, pos) with the
   * vocabulary id, `OovId` for terms pruned by minCount. By default the
   * vocabulary joins as a BROADCAST — natural-language dictionaries are
   * tens of MB, dwarfed by the corpus. Pass `broadcastDict = false` for
   * degenerate vocabularies too big to ship to every executor (e.g.
   * ids over raw n-grams); the join then shuffles on `term`, which is
   * still one exchange of the token stream.
   */
  def encodeTokens(
      docs: DataFrame,
      vocab: DataFrame,
      broadcastDict: Boolean = true): DataFrame = {
    val dict = vocab.select(col("term"), col("token_id"))
    docs
      .select(col("doc"), posexplode(toks(col("line"))).as(Seq("pos", "term")))
      .join(if (broadcastDict) broadcast(dict) else dict,
        Seq("term"), "left_outer")
      .select(col("doc"), col("pos").cast("long").as("pos"), col("term"),
        coalesce(col("token_id"), lit(OovId)).as("token_id"))
  }

  /**
   * Vocabulary coverage — the domain-shift signal: per-doc token count,
   * OOV count, and OOV fraction against a trained vocabulary. A corpus
   * whose oov_rate distribution drifts up is out-of-domain for the
   * tokenizer/vocab that produced `vocab`. One `doc`-keyed aggregation
   * over the broadcast-dictionary encode — same scale shape as
   * [[encodeTokens]].
   */
  def oovRate(docs: DataFrame, vocab: DataFrame): DataFrame =
    encodeTokens(docs, vocab)
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("token_id") === OovId, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov") / col("n_tokens"), 6))

  /**
   * Per-group ZIPF SLOPE — the lexical-diversity diagnostic for data
   * cards: least-squares slope of ln(count) over ln(rank) across the
   * group's frequency-ranked vocabulary. Natural text sits near −1
   * (Zipf's law); a feed drifting toward 0 is template/boilerplate
   * mass (flat frequencies), one plunging far below −1 is a
   * degenerate head — both worth a look before the feed enters a mix,
   * and the measured shape behind this repo's head-dominated stress
   * fixtures.
   *
   * Determinism, the q159 moment recipe: ranks are integers from a
   * deterministic (cnt DESC, term) order, ln values lift to micro
   * longs BEFORE any aggregation, moments accumulate as exact
   * DECIMAL(38,0), and the slope evaluates once in double, round-6.
   * Groups with one distinct term have zero rank variance → null.
   *
   * Scale shape: one (group, term) count shuffle, one vocab-scale
   * rank window per group (vocabulary rows, not corpus rows), one
   * group-keyed moment aggregate. Nothing collects.
   *
   * @param docs (groupCol, line)
   * @return (groupCol, n_terms, slope)
   */
  def zipfSlope(docs: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("term"))
    docs
      .select(col(groupCol), explode(toks(col("line"))).as("term"))
      .groupBy(col(groupCol), col("term")).agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("x", round(log(col("rnk").cast("double")) * 1e6).cast("long"))
      .withColumn("y", round(log(col("cnt").cast("double")) * 1e6).cast("long"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_terms"),
        sum(dec(col("x"))).as("_sx"),
        sum(dec(col("y"))).as("_sy"),
        sum(dec(col("x")) * dec(col("x"))).as("_qx"),
        sum(dec(col("x")) * dec(col("y"))).as("_sxy"))
      .withColumn("_num",
        dec(col("n_terms")) * col("_sxy") - col("_sx") * col("_sy"))
      .withColumn("_den",
        dec(col("n_terms")) * col("_qx") - col("_sx") * col("_sx"))
      .withColumn("slope",
        when(col("_den") > 0,
          round(col("_num").cast("double") / col("_den").cast("double"), 6)))
      .select(col(groupCol), col("n_terms"), col("slope"))
  }

  /**
   * Per-group N-GRAM DIVERSITY — the self-repetition / boilerplate
   * data-card row: unigram and word-n-gram type–token ratios per
   * source. Natural prose keeps trigram TTR high (most trigrams occur
   * once); templated or machine-spun feeds collapse it long before the
   * unigram vocabulary looks suspicious, which is why corpus reports
   * (Gopher §A.2-style repetition tables, self-BLEU diagnostics) track
   * repeated-n-gram mass. The complement of [[zipfSlope]]: slope reads
   * the unigram frequency CURVE, this reads phrase-level reuse.
   *
   * Determinism: counts are exact integers; each ratio is ONE round-6
   * double division of two exact longs — engine-exact under the repo's
   * round-6 convention. Groups with no n-gram mass (every doc shorter
   * than n) get a null `ngram_ttr`.
   *
   * Scale shape — vocabulary-mass shuffles, never corpus-mass: the
   * single tokenize pass emits both gram streams (a tagged struct
   * array concat, one explode), partial aggregation collapses
   * (group, n, gram) map-side, and the second aggregate is
   * group-cardinality. No count-distinct Expand, nothing collects,
   * no window. The same two-stage shape as [[zipfSlope]].
   *
   * @param docs (groupCol, line)
   * @param n    n-gram width for the phrase-level ratio (default 3)
   * @return (groupCol, n_tokens, distinct_tokens, ttr,
   *         n_ngrams, distinct_ngrams, ngram_ttr) — ratios round-6
   */
  def ngramDiversity(docs: DataFrame, groupCol: String, n: Int = 3): DataFrame = {
    require(n >= 2, s"n-gram width must be >= 2, got $n")
    val tk = toks(col("line"))
    val uni = transform(tk, t => struct(lit(1).as("n"), t.as("gram")))
    // Guard: sequence(0, size-n) is DESCENDING when size < n (Spark
    // sequence contract) — emit the empty array instead.
    val ngrams = when(size(tk) >= n,
      transform(sequence(lit(0), size(tk) - n),
        i => struct(lit(n).as("n"),
          array_join(slice(tk, i + 1, lit(n)), " ").as("gram"))))
      .otherwise(array())
    docs
      .select(col(groupCol), explode(concat(uni, ngrams)).as("g"))
      .select(col(groupCol), col("g.n").as("gn"), col("g.gram").as("gram"))
      .groupBy(col(groupCol), col("gn"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(groupCol))
      .agg(
        coalesce(sum(when(col("gn") === 1, col("cnt"))), lit(0L)).as("n_tokens"),
        coalesce(sum(when(col("gn") === 1, 1L)), lit(0L)).as("distinct_tokens"),
        coalesce(sum(when(col("gn") === n, col("cnt"))), lit(0L)).as("n_ngrams"),
        coalesce(sum(when(col("gn") === n, 1L)), lit(0L)).as("distinct_ngrams"))
      .withColumn("ttr",
        when(col("n_tokens") > 0,
          round(col("distinct_tokens") / col("n_tokens"), 6)))
      .withColumn("ngram_ttr",
        when(col("n_ngrams") > 0,
          round(col("distinct_ngrams") / col("n_ngrams"), 6)))
      .select(col(groupCol), col("n_tokens"), col("distinct_tokens"),
        col("ttr"), col("n_ngrams"), col("distinct_ngrams"), col("ngram_ttr"))
  }

  /**
   * TERM BURSTINESS — Church–Gale within-document repetition: for each
   * term, cf/df (total corpus occurrences over containing-document
   * count), i.e. the mean repeat count inside documents that use the
   * term at all. Content words are bursty (a doc "about" a term repeats
   * it), function words are not — and in a training corpus a term whose
   * burstiness explodes is a template/spam marker that unigram counts
   * miss entirely. Returns the top-k burstiest terms above a df floor.
   *
   * Determinism: cf and df are exact longs; burstiness is one round-6
   * division, and the top-k order (burstiness DESC, term) is total
   * because terms are distinct after aggregation.
   *
   * Scale shape: the q2 (doc, term) partial-agg shuffle, then a
   * vocabulary-mass term aggregate; the top-k plans as TakeOrdered
   * (no global sort). Nothing collects.
   *
   * @param docs (doc, line)
   * @param minDf drop terms seen in fewer documents (rare-term noise)
   * @param k     rows returned
   * @return (term, cf, df, burstiness round-6) — top k
   */
  def termBurstiness(docs: DataFrame, minDf: Long = 2L, k: Int = 50): DataFrame =
    docs
      .select(col("doc"), explode(toks(col("line"))).as("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("cf"), count(lit(1)).as("df"))
      .where(col("df") >= minDf)
      .withColumn("burstiness", round(col("cf") / col("df"), 6))
      .orderBy(col("burstiness").desc, col("term"))
      .limit(k)

  /**
   * TOKENIZER FERTILITY per group (usually language) — the standard
   * tokenizer-evaluation table (chars-per-token is the "fertility"
   * metric tokenizer papers report per language): for each group,
   * document/token/char mass, the chars-per-token ratio, and the OOV
   * rate against a trained vocabulary. A language whose fertility or
   * OOV rate is an outlier is under-served by the vocab — the signal
   * that drives vocab rebalancing before a training run.
   *
   * Scale shape: one tokenize explode + broadcast vocab membership
   * join + one GROUP-cardinality aggregate (count-distinct docs rides
   * the same Expand). `n_chars` counts token characters (whitespace
   * excluded), so the ratio is a pure tokenizer property, independent
   * of the corpus's spacing conventions.
   *
   * @param docs (doc, line, groupCol)
   * @return (groupCol, n_docs, n_tokens, n_chars, n_oov,
   *         chars_per_token round-6, oov_rate round-6)
   */
  def tokenizerFertility(
      docs: DataFrame,
      vocab: DataFrame,
      groupCol: String = "lang"): DataFrame =
    docs
      .select(col(groupCol), col("doc"), explode(toks(col("line"))).as("term"))
      .join(broadcast(vocab.select(col("term"), lit(1L).as("_known"))),
        Seq("term"), "left_outer")
      .groupBy(col(groupCol))
      .agg(
        countDistinct(col("doc")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(length(col("term")).cast("long")).as("n_chars"),
        sum(when(col("_known").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("chars_per_token", round(col("n_chars") / col("n_tokens"), 6))
      .withColumn("oov_rate", round(col("n_oov") / col("n_tokens"), 6))

  /**
   * Document-level id-sequence encoding: (doc, ids) where `ids` is the
   * token-id array in document order. Built from [[encodeTokens]] with
   * a sort_array-of-struct regroup — collect_list alone has no ordering
   * guarantee, so the position rides inside the struct and is stripped
   * after the sort. One shuffle on `doc`.
   */
  def encodeDocs(docs: DataFrame, vocab: DataFrame): DataFrame =
    encodeTokens(docs, vocab)
      .groupBy(col("doc"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("token_id")))),
        s => s.getField("token_id")).as("ids"))

  /**
   * Per-source DISTINCT-TERM SKETCHES — the bounded-state twin of
   * [[termCounts]] for the vocabulary-growth dashboard: one DataSketches
   * HLL sketch per ingest source (binary, ~KB at lgK=12) instead of the
   * full (term, cnt) table. The state a 100 TB pipeline can actually
   * keep per-feed-per-day: sketches MERGE (HLL registers are per-slot
   * maxima — order-free, associative), so day N+1's estimate is
   * union(persisted, delta) with O(sources) state, never a re-scan of
   * history. Exact distinct-term counts need a term-keyed shuffle of
   * the whole corpus; the sketch collapses map-side to one row per
   * (partition, source).
   *
   * Estimates are NOT oracle-replayable (DataSketches internals), so
   * the declared queries pin them by CONTRACT (the q31b recipe): q110
   * asserts per-source estimate within tolerance of exact, q110b
   * asserts the merge INVARIANCE — estimate(union(hist, delta)) ==
   * estimate(full corpus) per source, exactly (same registers either
   * way), the q61 incremental≡batch contract in sketch space.
   */
  def termSketches(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(toks(col("line"))).as("term"))
      .groupBy(col("source"))
      .agg(hll_sketch_agg(col("term")).as("sketch"))

  /** Merge two per-source sketch states (union of HLL registers); a
    * source present on one side only passes through unchanged. */
  def mergeTermSketches(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("source"), col("sketch"))
      .unionByName(b.select(col("source"), col("sketch")))
      .groupBy(col("source"))
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** (source, n_terms_est) from a sketch state. */
  def sketchEstimates(sk: DataFrame): DataFrame =
    sk.select(col("source"),
      hll_sketch_estimate(col("sketch")).as("n_terms_est"))

  /**
   * VOCABULARY DIFF between two corpus slices — the term-level change
   * feed that explains a drift alarm (q79 says THE distribution moved;
   * this says WHICH terms did): per term above `minCount` on either
   * side, counts on both plus a status — `added` / `removed` (absent
   * from one side), `grown` / `shrunk` (count at least doubled /
   * halved), `stable`. Thresholds are integer comparisons
   * (cnt_b ≥ 2·cnt_a), so the verdict is engine-exact with no float
   * anywhere.
   *
   * Scale shape: two vocabulary aggregates (map-side partial) + one
   * term-keyed full-outer join of vocabulary-scale frames — corpus
   * rows are never exchanged. The minCount prune applies BEFORE the
   * join (a sub-threshold term on both sides never shuffles), with
   * the boundary caveat that a term crossing the threshold reports
   * the side it is visible on — the operationally right view for a
   * change FEED (it IS an appearance).
   */
  def vocabDiff(
      a: DataFrame,
      b: DataFrame,
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val ca = termCounts(a).where(col("cnt") >= minCount)
      .select(col("term"), col("cnt").as("cnt_a"))
    val cb = termCounts(b).where(col("cnt") >= minCount)
      .select(col("term"), col("cnt").as("cnt_b"))
    ca.join(cb, Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      .withColumn("status",
        when(col("cnt_a") === 0L, "added")
          .when(col("cnt_b") === 0L, "removed")
          .when(col("cnt_b") >= lit(2L) * col("cnt_a"), "grown")
          .when(lit(2L) * col("cnt_b") <= col("cnt_a"), "shrunk")
          .otherwise("stable"))
  }

  /**
   * ZIPF COVERAGE CURVE — for each power-of-two vocabulary budget V
   * (1, 2, 4, … up to the first power ≥ |vocab|), the token mass the
   * top-V terms of [[buildVocab]]'s ranking cover. THE tokenizer-sizing
   * chart: "32k entries cover 98.6% of tokens" reads straight off it,
   * and the marginal coverage between consecutive rows prices each
   * vocabulary doubling. [[zipfSlope]] summarizes the same law as one
   * exponent; this is the operational curve.
   *
   * Determinism: ranks from the two-stage [[Ranking.withGlobalRank]]
   * (total order (cnt desc, term)); budgets are literal powers of two;
   * coverage is ONE round-6 division of exact long token sums.
   *
   * Scale shape: one term-keyed count shuffle + the rank's range
   * exchange; the budget fan-out is map-side and ≤ log₂|vocab| rows
   * per term, collapsing to ≤ 41 groups by partial aggregation. The
   * vocab size and token total ride a 1-row broadcast cross.
   *
   * @return per budget: vocab_budget, n_terms (= min(budget, |vocab|)),
   *         cum_tokens, total_tokens, coverage
   */
  def coverageCurve(docs: DataFrame): DataFrame = {
    val ranked = rankVocab(termCounts(docs))
    val totals = ranked.agg(
      count(lit(1)).as("_v"), sum(col("cnt")).as("total_tokens"))
    ranked.crossJoin(broadcast(totals))
      .select(col("cnt"), col("total_tokens"),
        explode(expr(
          "filter(transform(sequence(0, 40), k -> shiftleft(1L, k)), " +
            "v -> v > token_id AND v < 2 * _v)")).as("vocab_budget"))
      .groupBy(col("vocab_budget"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("cnt")).as("cum_tokens"),
        max(col("total_tokens")).as("total_tokens"))
      .withColumn("coverage",
        round(col("cum_tokens").cast("double") / col("total_tokens"), 6))
  }

  /**
   * HEAPS CURVE — vocabulary growth against corpus size: for each
   * power-of-two document budget N (up to the first power > max doc
   * id), the number of distinct terms whose FIRST occurrence lies in
   * a document with id < N. Sublinear growth (Heaps' law V ∝ Nᵝ,
   * β ≈ 0.5) is the healthy-corpus shape; a curve that keeps rising
   * linearly means unbounded novel tokens (noise, ids, boilerplate
   * mutations) — the q126 novelty signal integrated over ingest
   * history, and the capacity planner for [[termSketches]]-style
   * vocabulary state.
   *
   * CONTRACT: doc ids must be integral and reflect ingest order (the
   * `documents.doc_id` convention); budgets threshold on the ID VALUE,
   * so sparse id spaces read as "docs with id < N".
   *
   * Scale shape: one term-keyed min-aggregate shuffle (the same
   * exchange class as [[termCounts]]), then a ≤ 41-row-per-term
   * map-side budget fan-out collapsing by partial agg; the id bound
   * rides a 1-row broadcast cross. Nothing collects.
   *
   * @param docs (doc, line) with integral doc ids
   * @return (n_docs, vocab_size) at each power-of-two budget
   */
  def heapsCurve(docs: DataFrame): DataFrame = {
    val firstSeen = docs
      .select(col("doc"), explode(toks(col("line"))).as("term"))
      .groupBy(col("term")).agg(min(col("doc")).as("first_doc"))
    val bounds = docs.agg(max(col("doc")).as("_mx"))
    firstSeen.crossJoin(broadcast(bounds))
      .select(explode(expr(
        "filter(transform(sequence(0, 40), k -> shiftleft(1L, k)), " +
          "n -> n > first_doc AND n < 2 * (_mx + 1))")).as("n_docs"))
      .groupBy(col("n_docs"))
      .agg(count(lit(1)).as("vocab_size"))
  }

}
