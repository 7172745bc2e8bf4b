package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/**
 * Composed training-data corpus cleaning (SURVEY.md §7.4): exact dedup →
 * language allowlist → quality threshold, as ONE lazy plan.
 *
 * Scale shape: the only shuffle is exact dedup's hash partition on the
 * md5 fingerprint; language-ID and quality scoring are codegen'd column
 * expressions applied map-side to the surviving rows, and the filters
 * prune before anything downstream runs. At 100 TB this is one pass over
 * the corpus plus one 32-byte-keyed exchange.
 */
object Pipeline {

  /**
   * @param langs      allowed `lang_pred` values (TextAnalysis.langPredCol)
   * @param minQuality minimum composite quality score
   *                   (TextAnalysis.qualityScoreCol, in [0, 1])
   * @return surviving (doc, line) rows + lang_pred, quality_score columns
   */
  def cleanCorpus(
      docs: DataFrame,
      langs: Seq[String],
      minQuality: Double): DataFrame =
    Dedup.exactDedup(docs)
      // the stats struct is materialized once: ONE kernel scan serves
      // both the language argmax and every quality factor
      .withColumn("_st", TextAnalysis.textStatsCol(col("line")))
      .withColumn("lang_pred", TextAnalysis.langPredFromStats(col("_st")))
      .withColumn("quality_score", TextAnalysis.qualityScoreFromStats(col("_st")))
      .where(col("lang_pred").isin(langs: _*) &&
        col("quality_score") >= minQuality)
      .drop("_st")

  /**
   * Deterministic hash sampling — the reproducible train/holdout split
   * primitive: keep a row iff the first 32 md5 bits of its key, taken
   * mod 1e6, fall under rate·1e6. Map-only (no shuffle, no RNG state,
   * no sampleBy seed drift across retries/partitions); the same key
   * always lands on the same side, on any cluster, in any engine.
   */
  def sampleByHash(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.where(hashBucket(keyCol) < (rate * 1e6).toLong)
  }

  /**
   * Stratified deterministic sampling — the training-mix rebalancer:
   * each stratum (e.g. language) keeps its own hash-threshold rate,
   * strata absent from `rates` keep `defaultRate`. Same map-only,
   * seed-free mechanics as `sampleByHash`; the rate lookup folds to a
   * codegen'd CASE chain, so this is still one scan with zero shuffle.
   */
  def sampleStratified(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "every rate must be in [0,1]")
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(rate)).otherwise(acc)
    }
    df.where(hashBucket(keyCol).cast("double") < rateCol * 1e6)
  }

  /** First 32 md5 bits of the stringified key, mod 1e6 — the shared
    * deterministic bucket for both sampling modes. */
  private def hashBucket(keyCol: String) =
    conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000000L

  /**
   * Domain-mixture sampling to a TOKEN BUDGET — the data-mixing step of
   * a training pipeline: given target budget shares per source (e.g.
   * web 0.5, code 0.3, books 0.2), keep each source's documents at
   * rate = min(1, share·budget / source_tokens), so the sampled corpus
   * approximates the target mixture. Where [[sampleStratified]] takes
   * caller-precomputed rates, this derives them IN-PLAN: one per-source
   * token aggregate (map-side partial, sources ≪ corpus) broadcasts
   * back onto the scan, and the keep decision is the same seed-free
   * md5 bucket as [[sampleByHash]] — reproducible on any cluster, any
   * engine, any retry. Sources absent from `shares` drop entirely.
   * Rate arithmetic is ordered (share·budget)/tokens so the oracle's
   * IEEE evaluation matches bit for bit.
   *
   * Scale: two passes over the corpus (stats + filter) and zero
   * shuffles of corpus rows; wrap in `Caching.scoped` + persist the
   * input upstream if the double scan matters.
   *
   * @param docs (doc, line, source)
   * @return sampled rows + n_tokens (whitespace token count)
   */
  def mixtureSample(
      docs: DataFrame,
      shares: Map[String, Double],
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(shares.nonEmpty && shares.values.forall(s => s >= 0 && s <= 1),
      "every share must be in [0,1]")
    require(shares.values.sum <= 1.0 + 1e-9,
      s"shares sum to ${shares.values.sum} > 1 — not a mixture")
    Seq("n_tokens", "src_tokens", "rate").foreach(c =>
      require(!docs.columns.contains(c),
        s"'$c' is reserved by mixtureSample — rename that input column"))
    val shareCol = shares.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (src, sh)) =>
        when(col("source") === src, lit(sh)).otherwise(acc)
    }
    val withTok = docs.withColumn("n_tokens",
      size(filter(split(col("line"), "\\s+"), t => length(t) > 0)).cast("long"))
    val perSource = withTok.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
    withTok
      .join(broadcast(perSource), Seq("source"))
      .withColumn("rate", least(lit(1.0),
        shareCol * lit(budgetTokens.toDouble) / col("src_tokens")))
      .where(hashBucket("doc").cast("double") < col("rate") * 1e6)
      .select(col("doc"), col("line"), col("source"), col("n_tokens"))
  }

  /**
   * TEMPERATURE-scaled domain mixture — [[mixtureSample]] with the
   * target shares derived IN-PLAN from the observed distribution
   * instead of caller-given: share_d ∝ p_d^T at T = 0.5, the
   * multilingual-training recipe that upsamples tail domains without
   * letting the head dominate (the √-scaling used by multilingual BERT
   * and XLM-R's T-sampling). Keep rate per source is then
   * min(1, share_d · budget / tokens_d), decided by the same seed-free
   * md5 bucket as [[sampleByHash]].
   *
   * T is FIXED at 0.5 because √ is the one power IEEE 754 requires
   * correctly rounded — `sqrt` is bit-identical across Spark and the
   * DuckDB oracle, where a libm `pow(p, T)` is not. The √-weights are
   * floor-scaled to integers (×1000) before the normalizing sum so the
   * sum is exact long arithmetic — immune to float summation order
   * across partitions/engines; the 1/1000 relative quantization is
   * noise against sampling variance.
   *
   * Scale: one per-source token aggregate (map-side partial), then the
   * normalizer as an unbounded window SUM over that tiny per-source
   * frame (cardinality = #domains, dozens — the one place a
   * single-partition exchange is harmless), and a broadcast join back
   * onto the scan. Deriving z via a window instead of a separate
   * aggregate keeps the corpus scanned ONCE by construction — a
   * second `perSource` consumer would otherwise replan the whole
   * scan+aggregate unless exchange reuse happens to fire.
   *
   * @param docs (doc, line, source)
   * @return sampled rows + n_tokens + the per-source keep rate
   */
  def temperatureMixture(docs: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    Seq("n_tokens", "src_tokens", "w_src", "z_norm", "rate").foreach(c =>
      require(!docs.columns.contains(c),
        s"'$c' is reserved by temperatureMixture — rename that input column"))
    val withTok = docs.withColumn("n_tokens",
      size(filter(split(col("line"), "\\s+"), t => length(t) > 0)).cast("long"))
    val perSource = withTok.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("w_src",
        floor(sqrt(col("src_tokens").cast("double")) * 1000).cast("long"))
    val rates = perSource
      .withColumn("z_norm", sum(col("w_src")).over(Window.partitionBy()))
      // ordered (w/z)·budget/tokens — the oracle evaluates the same
      // IEEE operation sequence, so the threshold matches bit for bit
      .withColumn("rate", least(lit(1.0),
        col("w_src").cast("double") / col("z_norm").cast("double") *
          lit(budgetTokens.toDouble) / col("src_tokens").cast("double")))
      .select(col("source"), col("rate"))
    withTok
      .join(broadcast(rates), Seq("source"))
      .where(hashBucket("doc").cast("double") < col("rate") * 1e6)
      .select(col("doc"), col("line"), col("source"), col("n_tokens"),
        col("rate"))
  }

  /**
   * TOKEN-BUDGET QUALITY FILL — "train on the best N tokens": keep the
   * highest-quality documents whose cumulative token count fits
   * `budgetTokens`, WITHOUT the global quality sort the naive greedy
   * needs (a corpus-wide ORDER BY is the single-partition exchange this
   * library bans). Selection is two-level:
   *
   *  1. COARSE: quality scores bin into `numBins` fixed-width bins
   *     (the [[qualityBins]]/[[filterByQualityQuantile]] recipe); the
   *     per-bin token totals are a `numBins`-row aggregate, and a
   *     window over that tiny frame (descending bin) classifies every
   *     bin FULL-KEEP / CUTOFF / DROP plus the cutoff bin's remaining
   *     budget. Quality resolution is the bin width — documents
   *     within one bin are treated as quality-equivalent.
   *  2. FINE: inside the single cutoff bin, docs fill the remainder in
   *     `"fill:"`-md5 order (fair, deterministic, quality-blind by
   *     design) via a DISTRIBUTED prefix sum: the hash's own first two
   *     hex digits partition the bin into 256 buckets, a per-bucket
   *     window computes local running sums (each bucket ≈ 1/256 of ONE
   *     bin), and a 256-row cumulative offset frame stitches them.
   *     Because the bucket key is a PREFIX of the ordering key, the
   *     stitched sum is exactly the global hash-ordered prefix sum —
   *     the oracle replays it as one flat window.
   *
   * Scale shape: one stats scan, a numBins-row aggregate + window, one
   * broadcast join back, and for the cutoff bin only: one bounded
   * window + a 256-row offset frame. No corpus-wide sort anywhere;
   * every exchange is either per-bin-bounded or vocabulary-tiny.
   *
   * @param docs (doc, line)
   * @return kept rows: doc, n_tokens, quality_score — Σ n_tokens is
   *         the maximal greedy fill ≤ budget in (bin desc, hash) order
   */
  def budgetFill(
      docs: DataFrame,
      budgetTokens: Long,
      numBins: Int = 1000): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(numBins > 0, s"numBins must be positive, got $numBins")
    // The stats projection feeds the bin aggregate AND both keep
    // branches — persist it (graft.Caching route, caller releases via
    // Caching.scoped) so the corpus is scanned once, not three times.
    val stats = graft.Caching.persist(docs.select(col("doc"),
      size(filter(split(col("line"), "\\s+"), t => length(t) > 0))
        .cast("long").as("n_tokens"),
      graft.functions.TextAnalysis.qualityScoreCol(col("line"))
        .as("quality_score"))
      .withColumn("bin", least(
        floor(col("quality_score") * numBins).cast("long"),
        lit(numBins - 1L))))
    val binSums = stats.groupBy(col("bin"))
      .agg(sum(col("n_tokens")).as("bin_tokens"))
    // numBins-row frame: the one place an unpartitioned window is by
    // construction harmless (the temperatureMixture precedent)
    val wDesc = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val binInfo = binSums
      .withColumn("cum_before", coalesce(sum(col("bin_tokens")).over(wDesc), lit(0L)))
      .withColumn("kind",
        when(col("cum_before") + col("bin_tokens") <= budgetTokens, lit("full"))
          .when(col("cum_before") < budgetTokens, lit("cutoff"))
          .otherwise(lit("drop")))
      .withColumn("remaining", lit(budgetTokens) - col("cum_before"))
      .select(col("bin"), col("kind"), col("remaining"))
    val classed = stats.join(broadcast(binInfo), Seq("bin"))
    val fullKeep = classed.where(col("kind") === "full")
    // Fine fill: global "fill:"-hash order, computed as bucket-local
    // windows + stitched offsets (bucket = hash prefix ⇒ identical to
    // the flat ordered window the oracle runs).
    val cut = classed.where(col("kind") === "cutoff")
      .withColumn("hb", md5(concat(lit("fill:"), col("doc").cast("string"))))
      .withColumn("bucket", substring(col("hb"), 1, 2))
    val wRun = Window.partitionBy(col("bucket"))
      .orderBy(col("hb"), col("doc"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val bucketOff = cut.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
      .withColumn("off_before", coalesce(
        sum(col("bucket_tokens")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("off_before"))
    val cutKeep = cut
      .withColumn("run_incl", sum(col("n_tokens")).over(wRun))
      .join(broadcast(bucketOff), Seq("bucket"))
      .where(col("off_before") + col("run_incl") <= col("remaining"))
    fullKeep.select(col("doc"), col("n_tokens"), col("quality_score"))
      .unionByName(cutKeep.select(col("doc"), col("n_tokens"), col("quality_score")))
  }

  /**
   * DATA-CONSTRAINED EPOCH REPETITION — the OVERSAMPLING side of domain
   * mixing ("Scaling Data-Constrained Language Models", Muennighoff et
   * al. 2023, arXiv:2305.16264: repeating data up to ~4 epochs is
   * near-free; [[mixtureSample]]/[[temperatureMixture]] cap rates at 1
   * and can only THIN): when share·budget EXCEEDS a source's tokens,
   * every doc of that source is emitted floor(rate) times and one more
   * copy is kept iff a deterministic hash falls under the fractional
   * part — so expected emitted tokens ≈ share·budget per source, exact
   * in the integer part, and the copy multiset is reproducible across
   * retries/partitions/engines (no RNG). The `copy` index (1-based) is
   * carried so a downstream [[graft.operators.Chunking.epochShuffle]]
   * keyed on (doc, copy) spreads repeats across training batches
   * instead of packing them adjacent.
   *
   * The fractional-keep hash is `"rep:"`-prefixed — statistically
   * independent of every other md5 decision in the library (the
   * `"split:"` rule), so repetition never correlates with sampling or
   * split membership.
   *
   * Scale shape: one per-source token aggregate broadcast back onto the
   * scan (the [[mixtureSample]] recipe), then a map-side
   * explode(sequence(1, n_copies)) — output rows scale with the BUDGET,
   * not with any shuffle: corpus rows are never exchanged. Rate
   * arithmetic is ordered (share·budget)/tokens so the oracle's IEEE
   * evaluation matches bit for bit; floor/frac on that shared double
   * are then exact in both engines.
   *
   * @param docs (doc, line, source)
   * @return (doc, copy, line, source, n_tokens, n_copies) — one row per
   *         emitted copy; docs from sources absent in `shares` drop
   */
  def epochRepetition(
      docs: DataFrame,
      shares: Map[String, Double],
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(shares.nonEmpty && shares.values.forall(s => s >= 0 && s <= 1),
      "every share must be in [0,1]")
    require(shares.values.sum <= 1.0 + 1e-9,
      s"shares sum to ${shares.values.sum} > 1 — not a mixture")
    Seq("n_tokens", "src_tokens", "rate", "copy", "n_copies").foreach(c =>
      require(!docs.columns.contains(c),
        s"'$c' is reserved by epochRepetition — rename that input column"))
    val shareCol = shares.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (src, sh)) =>
        when(col("source") === src, lit(sh)).otherwise(acc)
    }
    val repBucket =
      conv(substring(md5(concat(lit("rep:"), col("doc").cast("string"))), 1, 8),
        16, 10).cast("long") % 1000000L
    val withTok = docs.withColumn("n_tokens",
      size(filter(split(col("line"), "\\s+"), t => length(t) > 0)).cast("long"))
    val perSource = withTok.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
    withTok
      .join(broadcast(perSource), Seq("source"))
      .withColumn("rate",
        shareCol * lit(budgetTokens.toDouble) / col("src_tokens"))
      .withColumn("n_copies",
        (floor(col("rate")).cast("long") +
          when(repBucket.cast("double") <
            (col("rate") - floor(col("rate"))) * 1e6, 1L).otherwise(0L)))
      .where(col("n_copies") > 0)
      .select(col("doc"), explode(sequence(lit(1L), col("n_copies"))).as("copy"),
        col("line"), col("source"), col("n_tokens"), col("n_copies"))
  }

  /**
   * DSIR-style IMPORTANCE RESAMPLING — select the `k` corpus documents
   * most like a TARGET domain by hashed-unigram log-likelihood ratio
   * ("Data Selection for Language Models via Importance Resampling",
   * arXiv:2302.03169): tokens hash into `numBuckets` buckets, the
   * target rows' bucket distribution is the target model, the whole
   * corpus the raw model (add-one smoothed over the bucket space), and
   * each doc scores Σ_tokens log(p_target(b)/p_raw(b)). We take the
   * deterministic top-k by score (the paper adds Gumbel noise for a
   * soft sample; the ranking statistic is identical).
   *
   * Determinism across engines: the per-bucket log-ratio is quantized
   * ONCE to integer micro-nats — floor(ln((cnt_t+1)(N_r+B) /
   * ((cnt_r+1)(N_t+B)))·1e6), every ln argument an exact long ratio —
   * and a doc's score is then a SUM OF LONGS: exact, order-free, no
   * float accumulation to drift between Spark and the oracle.
   *
   * Scale shape: two passes over the corpus by construction (model
   * fit, then score) — the fit aggregates to `numBuckets` rows with
   * map-side partials (the exchange carries ≤ B rows per task), the
   * totals are a window over that B-row frame, and scoring is a
   * broadcast join of the B-row model onto the token stream followed
   * by one doc-keyed partial-agg exchange. Top-k is orderBy+limit —
   * Spark plans TakeOrderedAndProject (per-partition heaps + driver
   * merge of k·P rows), never a global sort. Longer docs accumulate
   * more evidence and score accordingly — the paper's statistic; no
   * length normalization.
   *
   * @param docs (doc, line) plus any carry columns (kept in output)
   * @param isTarget predicate over `docs` rows marking the target set
   * @return top-k rows: carry columns + score_micro + n_tokens,
   *         ranked by (score_micro desc, doc)
   */
  def importanceResample(
      docs: DataFrame,
      isTarget: Column,
      k: Int,
      numBuckets: Int = 1024): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    Seq("bucket", "n_tokens", "score_micro", "qlr").foreach(c =>
      require(!docs.columns.contains(c),
        s"'$c' is reserved by importanceResample — rename that input column"))
    val carry = docs.columns.filter(_ != "line").map(col).toSeq
    val tok = docs
      .withColumn("is_tgt", isTarget)
      .select(carry :+ col("is_tgt") :+
        explode(filter(split(col("line"), "\\s+"), t => length(t) > 0))
          .as("token"): _*)
      .withColumn("bucket",
        conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long") %
          numBuckets.toLong)
    val b = lit(numBuckets.toLong)
    val model = tok.groupBy(col("bucket"))
      .agg(sum(when(col("is_tgt"), 1L).otherwise(0L)).as("cnt_t"),
        count(lit(1)).as("cnt_r"))
      // corpus-wide totals: a window over the B-row model frame — the
      // one place a single-partition exchange is harmless (≤ B rows)
      .withColumn("n_t", sum(col("cnt_t")).over(Window.partitionBy()))
      .withColumn("n_r", sum(col("cnt_r")).over(Window.partitionBy()))
      .withColumn("qlr",
        floor(log(((col("cnt_t") + 1L) * (col("n_r") + b)).cast("double") /
                  ((col("cnt_r") + 1L) * (col("n_t") + b)).cast("double")) *
          lit(1e6)).cast("long"))
      .select(col("bucket"), col("qlr"))
    tok.join(broadcast(model), Seq("bucket"))
      .groupBy(carry: _*)
      .agg(sum(col("qlr")).as("score_micro"), count(lit(1)).as("n_tokens"))
      .orderBy(col("score_micro").desc, col("doc"))
      .limit(k)
  }

  /**
   * Per-SOURCE duplication health — the governance metric that tells
   * you which ingest feed is flooding the corpus with copies: exact
   * duplicate rate per source over the md5 text fingerprint. A doc
   * duplicated across two sources counts against each source that
   * carries a redundant copy of ITS OWN text (fingerprints are grouped
   * within source — cross-source contamination is q44's job).
   *
   * Scale shape: one (source, fp) partial-agg exchange (32-byte keys)
   * then a C-row rollup — the exact-dedup shuffle shape, producing a
   * dashboard instead of a survivor set.
   *
   * @param docs (doc, line, source)
   * @return per source: n_docs, n_unique, n_dup_rows (docs that are
   *         redundant copies), dup_rate — ordered by caller
   */
  def sourceDupStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"), md5(col("line")).as("fp"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_unique"),
        sum(when(col("n") > 1L, col("n") - 1L).otherwise(0L)).as("n_dup_rows"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("n_unique").cast("double") /
          col("n_docs").cast("double"), 6))

  /**
   * Pairwise SOURCE-OVERLAP matrix — the governance companion to
   * [[sourceDupStats]]: for every pair of ingest feeds, the Jaccard
   * overlap of their distinct item fingerprints. The metric that
   * answers "is feed B just a re-crawl of feed A?" before both are
   * paid for twice — cross-feed duplication that per-feed dup rates
   * can't see.
   *
   * Scale shape: each side collapses to distinct (source, fp) at the
   * scan (one fp-keyed exchange, map-side dedup). Intersections
   * come from ONE `groupBy(fp)` whose `collect_set(source)` state is
   * bounded by the number of feeds (dozens) — pairs explode from that
   * tiny sorted set map-side, so there is NO fp self-join and no
   * quadratic candidate stage. The S×S matrix frame (sources², a
   * driver-safe handful of rows) assembles from per-source totals via
   * a tiny inequality cross — every corpus-scale exchange is keyed by
   * fingerprint or (s1, s2), never by pair-of-docs.
   *
   * Zero-intersection pairs ARE emitted (jaccard 0) — the matrix is
   * complete, absence of overlap being exactly what the dashboard
   * needs to show.
   *
   * The item granularity is the caller's: document md5 fingerprints
   * measure exact re-crawls, distinct terms measure vocabulary
   * affinity, winnow fingerprints ([[graft.functions.TextAnalysis
   * .winnowFingerprints]]) measure shared passages — same matrix,
   * same plan.
   *
   * @param items (source, fp) — need not be pre-deduplicated
   * @return per unordered source pair (s1 < s2): n1, n2 (distinct fps
   *         per side), inter, jaccard
   */
  def sourceOverlap(items: DataFrame): DataFrame = {
    val fps = items.select(col("source"), col("fp")).distinct()
    val counts = fps.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = fps
      .groupBy(col("fp"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .where(size(col("ss")) > 1)
      // all (i < j) pairs from the sorted per-fp source set, map-side
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + 2, size(col("ss"))),
          y => struct(x.as("s1"), y.as("s2")))))).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(count(lit(1)).as("inter"))
    counts.select(col("source").as("s1"), col("n").as("n1"))
      .join(counts.select(col("source").as("s2"), col("n").as("n2")),
        col("s1") < col("s2"))
      .join(inter, Seq("s1", "s2"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")), 6))
  }

  /**
   * KMV-SKETCH source overlap — [[sourceOverlap]]'s 100 TB estimate
   * tier: per-feed K-MINIMUM-VALUES sketches (Beyer et al., SIGMOD
   * 2007) instead of the full distinct-fp exchange. Each source keeps
   * only its k smallest 60-bit fp hashes (O(S·k) state — KBs per feed,
   * the persisted daily-pipeline summary); a pair's Jaccard estimate
   * reads the two sketches alone:
   *   M = the k smallest distinct hashes of the sketch UNION,
   *   Ĵ = |{v ∈ M present in both}| / |M|
   * — unbiased with σ ≈ √(J(1−J)/k). Feeds smaller than k carry their
   * whole hash set, making their estimates EXACT.
   *
   * Determinism: the hash is the first 60 md5 bits of the fp (the
   * minhash convention, [[Dedup.minhashSignatures]]) — seed-free
   * integer arithmetic, so sketch contents, merge ranks, and every
   * estimate replay bit-identically on any engine; the oracle runs the
   * identical construction in SQL, and q124b pins the estimator's
   * error against the exact q122 matrix.
   *
   * Scale shape: one distinct-(source, hash) pass, then ONE
   * source-partitioned window whose rank ≤ k filter WindowGroupLimit
   * pushes into a k-row heap per task. Everything after operates on
   * S·k sketch rows — the pair assembly (two equi-joins against the
   * tiny S² pair frame + per-pair merge windows) never touches corpus
   * data. The fp-keyed exchange of the exact tier is gone; that is
   * the point.
   *
   * @param items (source, fp) — need not be pre-deduplicated
   * @return per pair (s1 < s2): m_size (merged sketch size),
   *         n_both, jaccard_est (round 6)
   */
  def sourceOverlapKmv(items: DataFrame, k: Int = 256): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val hashed = items
      .select(col("source"),
        conv(substring(md5(col("fp")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct()
    val bySrc = Window.partitionBy(col("source")).orderBy(col("h"))
    val sk = hashed
      .withColumn("_rk", row_number().over(bySrc))
      .where(col("_rk") <= k)
      .select(col("source"), col("h"))
    val srcs = sk.select(col("source")).distinct()
    val pairFrame = srcs.select(col("source").as("s1"))
      .join(srcs.select(col("source").as("s2")), col("s1") < col("s2"))
    val sides = pairFrame
      .join(sk.withColumnRenamed("source", "s1"), Seq("s1"))
      .select(col("s1"), col("s2"), col("h"), lit(1L).as("ia"), lit(0L).as("ib"))
      .unionByName(pairFrame
        .join(sk.withColumnRenamed("source", "s2"), Seq("s2"))
        .select(col("s1"), col("s2"), col("h"), lit(0L).as("ia"), lit(1L).as("ib")))
    val merged = sides
      .groupBy(col("s1"), col("s2"), col("h"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
    val byPair = Window.partitionBy(col("s1"), col("s2")).orderBy(col("h"))
    merged
      .withColumn("_rk", row_number().over(byPair))
      .where(col("_rk") <= k)
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("m_size"),
        sum(col("ia") * col("ib")).as("n_both"))
      .withColumn("jaccard_est",
        round(col("n_both").cast("double") / col("m_size"), 6))
  }

  /**
   * Rank-based PERCENTILE NORMALIZATION within groups: each row's
   * score becomes its within-group percent rank ((rank − 1)/(n − 1) ∈
   * [0, 1]) — the cross-group equalizer that makes "top 20 % quality"
   * mean the same thing in every language/domain before a global cut,
   * where raw scores don't transfer (the [[perplexityBuckets]]
   * per-group-cuts insight, generalized from fixed thirds to a full
   * continuous rescale). Rank-based ⇒ immune to per-group scale and
   * outliers, and DETERMINISTIC: ties share the min rank whatever
   * their arrival order, the division is one exact-integer fp op, and
   * both engines define percent_rank identically. Singleton groups
   * normalize to 0.
   *
   * Scale shape: ONE group-partitioned window (parallel across
   * groups) — rank needs no second pass because percent_rank carries
   * its own group-count denominator. Group cardinality bounds the
   * skew: for few huge groups, pre-aggregate to (group, score) counts
   * and rank those instead.
   *
   * @return input columns + `pct` (round 6)
   */
  def percentileNormalize(
      df: DataFrame,
      groupCol: String,
      scoreCol: String): DataFrame = {
    require(!df.columns.contains("pct"),
      "'pct' is reserved by percentileNormalize — rename that input column")
    df.withColumn("pct",
      round(percent_rank().over(
        Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))), 6))
  }

  /**
   * Deterministic K-PER-GROUP sample — a balanced evaluation slice:
   * exactly `k` docs from every group (fewer if the group is smaller),
   * chosen by md5 rank so the pick is uniform-ish, seed-free, and
   * replayable anywhere (same rows on every engine, cluster, and
   * retry). The per-stratum analogue of `sampleByHash`'s rate-based
   * keep: rates give you a FRACTION per stratum, this gives you a
   * COUNT — what an eval set wants.
   *
   * Scale shape: one window partitioned by the group column — parallel
   * across groups; Spark's WindowGroupLimit pushes the rank filter
   * into the sort so each task keeps a k-row heap, not the group.
   * The hash key is prefixed `"kpg:"` so it is independent of every
   * other md5 decision in the library.
   *
   * @return input columns + `rk` (1..k within the group)
   */
  def sampleKPerGroup(docs: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!docs.columns.contains("rk"),
      "'rk' is reserved by sampleKPerGroup — rename that input column")
    val key = conv(substring(
        md5(concat(lit("kpg:"), col("doc").cast("string"))), 1, 8),
      16, 10).cast("long")
    val w = Window.partitionBy(col(groupCol)).orderBy(key, col("doc"))
    docs.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
  }

  /**
   * Token-LENGTH histogram in power-of-two bins — the
   * sequence-length distribution every packing/chunking config is
   * sized from (pick maxTokens where the token-mass curve, not the
   * doc-count curve, concentrates). Bin identity is INTEGER arithmetic
   * — bin = bit_length(n_tokens) - 1 = floor(log2 n) computed via the
   * binary string length, never float log2 (whose rounding at exact
   * powers of two could differ across engines); token-less docs land
   * in bin -1.
   *
   * Scale shape: one map-side token count + one ≤64-row aggregate.
   *
   * @param docs (doc, line)
   * @return per bin: bin, lo (2^bin), n_docs, tokens_total
   */
  def lengthHistogram(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens",
        size(filter(split(col("line"), "\\s+"), t => length(t) > 0)).cast("long"))
      .withColumn("bin",
        when(col("n_tokens") === 0L, lit(-1L))
          .otherwise(length(conv(col("n_tokens"), 10, 2)).cast("long") - 1L))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens_total"))
      .withColumn("lo",
        when(col("bin") < 0L, lit(0L))
          .otherwise(expr("shiftleft(1L, cast(bin AS int))")))
      .select(col("bin"), col("lo"), col("n_docs"), col("tokens_total"))

  /**
   * EQUI-DEPTH token-length deciles — [[lengthHistogram]]'s fixed
   * power-of-two bins answer "where does the mass sit?", these answer
   * "what does the Nth percentile look like?": each bucket holds the
   * same number of docs, so min/max per bucket ARE the exact decile
   * boundaries (the packing/truncation sizing view: "p90 length is
   * 1.8k tokens" reads straight off bucket 8's max).
   *
   * Determinism: bucket identity is pure integers — global rank by
   * (n_tokens, doc) from the two-stage [[Ranking.withGlobalRank]]
   * (range-partitioned, never a single-partition window), then
   * decile = ⌊rank · buckets / N⌋ with N via a 1-row count broadcast
   * cross (the q59 threshold pattern).
   *
   * @param docs (doc, line)
   * @return per decile: n_docs, min_tokens, max_tokens, tokens_total
   */
  def lengthDeciles(docs: DataFrame, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val lens = docs
      .withColumn("n_tokens",
        size(filter(split(col("line"), "\\s+"), t => length(t) > 0)).cast("long"))
      .select(col("doc"), col("n_tokens"))
    val ranked = Ranking.withGlobalRank(
      lens, Seq(col("n_tokens"), col("doc")), rankCol = "rn",
      errorHint = "re-run lengthDeciles, or checkpoint its input")
    val total = ranked.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(total))
      .withColumn("decile", expr(s"(rn * $buckets) div n"))
      .groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("tokens_total"))
  }

  /**
   * Corpus REPORT rollup — the per-(lang, source) health dashboard in
   * one pass: doc counts, token totals, and mean quality per cell,
   * plus per-lang subtotals and the grand total via ROLLUP grouping
   * sets (one shuffle, partial aggregation per grouping set). Quality
   * and token counts come from the same one-pass TextStats kernel scan
   * the text tier shares; `grouping()` masks keep subtotal rows
   * collision-proof against real 'ALL' values (the q29 convention).
   */
  def corpusRollup(docs: DataFrame): DataFrame =
    docs
      .withColumn("_st", TextAnalysis.textStatsCol(col("line")))
      .rollup(col("lang"), col("source"))
      .agg(
        grouping(col("lang")).cast("long").as("g_lang"),
        grouping(col("source")).cast("long").as("g_source"),
        count(lit(1)).as("n_docs"),
        sum(col("_st.n_tokens")).as("total_tokens"),
        // ORDER-FREE mean (r13): the per-doc score is a round-6 grid
        // value, so a float avg's partial-sum order decides the 6th
        // digit whenever a group mean lands on a half-micro boundary —
        // with >1 scan partition that digit became RUN-dependent
        // (observed: the (fr, src1) cell flipped 0.595617↔0.595618).
        // Lift to micro-longs, sum exactly, divide once — the
        // dataCardIncremental / streaming-sketch recipe, now shared by
        // the batch tier; the oracle mirrors the same integer form.
        sum(round(TextAnalysis.qualityScoreFromStats(col("_st")) * lit(1e6))
          .cast("long")).as("_qmicro"))
      .select(
        coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("g_lang"), col("g_source"), col("n_docs"),
        col("total_tokens"),
        round(col("_qmicro").cast("double") / lit(1e6) /
          col("n_docs").cast("double"), 6).as("avg_quality"))

  /**
   * Importance-WEIGHTED deterministic sampling: inclusion probability
   * proportional to a per-row weight (quality score, domain priority,
   * token count), scaled so the EXPECTED kept fraction is `fraction` —
   * each row keeps iff its md5 bucket falls under
   * `fraction · w / avg(w)` (the probability clips at 1 for rows whose
   * weight exceeds `avg(w)/fraction`, so the realized fraction lands
   * slightly under target on heavy-tailed weights — the standard
   * single-pass prob-proportional trade-off; no global sort, no RNG
   * state). avg(w) is derived IN-PLAN as a 1-row broadcast; the keep
   * decision is the same seed-free md5 bucket as [[sampleByHash]], so
   * the same key always lands the same way on any engine. Null or
   * negative weights never sample (probability 0).
   */
  def sampleByWeight(
      df: DataFrame,
      weightCol: String,
      keyCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1,
      s"fraction must be in [0,1], got $fraction")
    require(!df.columns.contains("_avg_w"),
      "'_avg_w' is reserved by sampleByWeight — rename that input column")
    val stats = df.agg(
      avg(when(col(weightCol) >= 0, col(weightCol))).as("_avg_w"))
    df.crossJoin(broadcast(stats))
      .where(hashBucket(keyCol).cast("double") <
        lit(fraction * 1e6) * coalesce(col(weightCol), lit(0.0)) / col("_avg_w"))
      .drop("_avg_w")
  }

  /**
   * Corpus-RELATIVE quality filtering: keep documents whose quality
   * score sits at or above the corpus's own `quantile` quantile — the
   * "drop the worst p%" cut curation pipelines apply when an absolute
   * threshold is unknowable across domains. The threshold is computed
   * IN-PLAN (exact interpolated percentile, the q43 convention — one
   * scalar aggregate over one double per doc) and joins back as a
   * 1-row broadcast cross; no driver action. Cross-engine-robust at
   * the boundary: scores are 6-decimal-rounded, so a doc can only tie
   * the interpolated threshold when the two order statistics around it
   * are equal — where interpolation is exact in every engine. At
   * 100 TB swap the exact percentile for `percentile_approx` (same
   * plan shape; the exact tier is the oracle contract).
   *
   * @return surviving (doc, line, quality_score) rows
   */
  def filterByQualityQuantile(docs: DataFrame, quantile: Double): DataFrame = {
    require(quantile > 0 && quantile < 1,
      s"quantile must be in (0,1), got $quantile")
    val scored = docs
      .withColumn("quality_score", TextAnalysis.qualityScoreCol(col("line")))
    val thr = scored.agg(
      expr(s"percentile(quality_score, $quantile)").as("_thr"))
    scored.crossJoin(broadcast(thr))
      .where(col("quality_score") >= col("_thr"))
      .drop("_thr")
  }

  /**
   * Curriculum BINNING: assign each document a quality bin 1..`bins`
   * from the corpus's own score distribution — the bucketing step of
   * curriculum training schedules (feed higher bins first or more
   * often). Thresholds are the i/bins quantiles computed in-plan (one
   * exact interpolated percentile-array aggregate, the q43 convention)
   * and broadcast; bin = 1 + count of thresholds STRICTLY below the
   * score. Deliberately NOT `ntile()`: a global ntile window plans a
   * single-partition sort (the scale-killer this engine bans) and
   * splits ties arbitrarily across bins — threshold counting is
   * map-side after the one scalar agg, and ties land deterministically
   * in the lower bin on every engine.
   *
   * @return (doc, line, quality_score, bin)
   */
  def qualityBins(docs: DataFrame, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val scored = docs
      .withColumn("quality_score", TextAnalysis.qualityScoreCol(col("line")))
    val ps = (1 until bins).map(i => i.toDouble / bins)
    val thr = scored.agg(
      expr(s"percentile(quality_score, array(${ps.mkString(", ")}))").as("_thr"))
    scored.crossJoin(broadcast(thr))
      .withColumn("bin",
        (lit(1) + aggregate(col("_thr"), lit(0),
          (acc, t) => acc + when(col("quality_score") > t, 1).otherwise(0)))
          .cast("long"))
      .drop("_thr")
  }

  /**
   * PREFERENCE-PAIR mining — the (chosen, rejected) pair constructor
   * preference-tuning datasets (DPO/RLHF reward modeling) are built
   * from, using the corpus's own quality score as the preference
   * signal: per group (a topic cluster, a source, a prompt family),
   * pair the highest-quality document against the lowest-quality one,
   * keeping only groups whose quality MARGIN clears `minMargin` — a
   * pair whose two sides are nearly equal teaches a preference model
   * nothing.
   *
   * Determinism: quality is the round-6 [[TextAnalysis]] score lifted
   * to micro-units (integer-exact, the q88 micro-nat convention);
   * argmax/argmin tie-break to the SMALLER doc id on both ends via
   * struct-ordered min_by on (∓score, doc), so every engine picks the
   * same pair for any orderable doc type.
   *
   * Scale shape: ONE partially-aggregated shuffle on the group key —
   * max_by/min_by combine map-side, so group size never materializes
   * anywhere (contrast a window row_number, which sorts each group).
   * Output is one row per surviving group.
   *
   * @param docs (doc, line, groupCol)
   * @return (groupCol, n_docs, chosen, rejected, q_chosen_micro,
   *         q_rejected_micro, margin_micro) — micro = score·1e6 longs
   */
  def preferencePairs(
      docs: DataFrame,
      groupCol: String,
      minMargin: Double = 0.0): DataFrame = {
    require(minMargin >= 0 && minMargin < 1,
      s"minMargin must be in [0,1), got $minMargin")
    docs
      .withColumn("_qm",
        round(TextAnalysis.qualityScoreCol(col("line")) * 1e6).cast("long"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        // negate the (long) score, not the doc — doc stays type-agnostic
        min_by(col("doc"), struct(-col("_qm"), col("doc"))).as("chosen"),
        min_by(col("doc"), struct(col("_qm"), col("doc"))).as("rejected"),
        max(col("_qm")).as("q_chosen_micro"),
        min(col("_qm")).as("q_rejected_micro"))
      .withColumn("margin_micro",
        col("q_chosen_micro") - col("q_rejected_micro"))
      .where(col("n_docs") >= 2 && col("chosen") =!= col("rejected") &&
        col("margin_micro") >= math.round(minMargin * 1e6))
  }

  /** Per-language cut points for [[perplexityBuckets]] (head/middle/tail
    * thirds). Public so the oracle SQL is generated from the SAME
    * doubles — the literal printed by Scala re-parses to the identical
    * IEEE value in DuckDB. */
  val PerplexityCuts: Seq[Double] = Seq(1.0 / 3, 2.0 / 3)

  /**
   * CCNet-style PERPLEXITY bucketing (Wenzek et al., LREC 2020 §4.3):
   * split each language's documents into head / middle / tail thirds by
   * language-model fluency — the standard web-corpus triage where an
   * absolute quality threshold cannot transfer across languages (a
   * "good" perplexity in German is not one in English; CCNet cuts each
   * language against its own distribution). Scoring is
   * [[TextAnalysis.bigramLmScore]]'s corpus-own bigram LM (higher mean
   * log-prob = more fluent = CCNet's LOWER perplexity), so `head` is
   * the most fluent third. Docs with < 2 tokens have no bigrams, emit
   * no score, and are absent — mirroring the scorer's contract.
   *
   * Scale shape: the LM chain is q46's (one (w1,w2)-keyed shuffle, the
   * model joined vocab-side first); the cuts are one exact interpolated
   * percentile-array aggregate PER LANGUAGE (a languages-row frame) and
   * join back as a broadcast; the bucket decision is map-side threshold
   * comparison, ties landing in the better bucket deterministically. At
   * 100 TB swap the exact percentile for `percentile_approx` — same
   * plan shape, and the exact tier stays the oracle contract.
   *
   * @param docs (doc, line, lang) corpus
   * @return (doc, lang, n_bigrams, avg_logp, bucket)
   */
  def perplexityBuckets(docs: DataFrame): DataFrame = {
    val scored = TextAnalysis.bigramLmScore(docs.select(col("doc"), col("line")))
      .join(docs.select(col("doc"), col("lang")), Seq("doc"))
    val cuts = scored.groupBy(col("lang"))
      .agg(expr(s"percentile(avg_logp, array(${PerplexityCuts.mkString(", ")}))")
        .as("_cuts"))
    scored.join(broadcast(cuts), Seq("lang"))
      .withColumn("bucket",
        when(col("avg_logp") >= col("_cuts")(1), lit("head"))
          .when(col("avg_logp") >= col("_cuts")(0), lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc"), col("lang"), col("n_bigrams"), col("avg_logp"),
        col("bucket"))
  }

  /**
   * Referential/data-quality AUDIT across the paired corpus tables —
   * the preflight every multi-table training pipeline runs before
   * burning GPU hours on a corpus whose text and embedding sides have
   * silently drifted: duplicate keys on either side, docs with no
   * embedding row, orphan embeddings with no doc, null/empty text.
   * One row of exact counts (no thresholds to get lucky on).
   *
   * Scale shape: two single-pass aggregates + two anti-join counts;
   * every frame collapsing into the report is 1 row, so the combining
   * crosses are broadcast trivia. Nothing is driver-collected.
   *
   * @param docs (doc, line)
   * @param vecs (vec_id, …)
   */
  def integrityAudit(docs: DataFrame, vecs: DataFrame): DataFrame = {
    val d = docs.select(col("doc"), col("line"))
    val v = vecs.select(col("vec_id"))
    val dStats = d.agg(
      count(lit(1)).as("n_docs"),
      (count(lit(1)) - countDistinct(col("doc"))).as("dup_doc_ids"),
      sum(when(col("line").isNull, 1L).otherwise(0L)).as("null_text"),
      sum(when(col("line").isNotNull && length(trim(col("line"))) === 0, 1L)
        .otherwise(0L)).as("empty_text"))
    val vStats = v.agg(
      count(lit(1)).as("n_vecs"),
      (count(lit(1)) - countDistinct(col("vec_id"))).as("dup_vec_ids"))
    val docsNoVec = d.select(col("doc"))
      .join(v, col("doc") === col("vec_id"), "left_anti")
      .agg(count(lit(1)).as("docs_without_vec"))
    val vecsNoDoc = v
      .join(d.select(col("doc")), col("vec_id") === col("doc"), "left_anti")
      .agg(count(lit(1)).as("vecs_without_doc"))
    dStats.crossJoin(broadcast(vStats))
      .crossJoin(broadcast(docsNoVec))
      .crossJoin(broadcast(vecsNoDoc))
      .select(col("n_docs"), col("dup_doc_ids"), col("null_text"),
        col("empty_text"), col("n_vecs"), col("dup_vec_ids"),
        col("docs_without_vec"), col("vecs_without_doc"))
  }

  /**
   * Train-test CONTAMINATION screen: flag corpus documents sharing at
   * least `minShared` distinct word n-grams with any benchmark document
   * — the "did an eval set leak into the training corpus" check every
   * LLM data pipeline runs before training.
   *
   * Scale shape: benchmark suites are tiny next to a 100 TB corpus, so
   * the benchmark shingle set is BROADCAST and the corpus side stays a
   * single map pass (shingle generate → broadcast hash join); only grams
   * that actually hit a benchmark gram reach the one aggregation
   * shuffle, keyed (doc, bench_doc). Shingles are distinct per doc by
   * construction, so `count(*)` IS the distinct shared-gram count.
   *
   * @return (doc, bench_doc, shared_ngrams) for pairs ≥ minShared
   */
  def contaminationCheck(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 3,
      minShared: Int = 1): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val cs = Dedup.shingles(docs, n)
    val bs = Dedup.shingles(benchmark, n)
      .select(col("doc").as("bench_doc"), col("shingle"))
    cs.join(broadcast(bs), Seq("shingle"))
      .groupBy(col("doc"), col("bench_doc"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .where(col("shared_ngrams") >= minShared)
  }

  /**
   * WINNOW-fingerprint contamination screen — [[contaminationCheck]] in
   * fingerprint space: corpus and benchmark compare on their Schleimer-
   * winnowed local minima instead of every n-gram. Two wins at scale:
   * the broadcast benchmark state shrinks by the winnow density
   * (≈ 2/(w+1) of the gram count — 2.5× at w=4, md5 hashes instead of
   * gram strings), and the k+w−1 guarantee still holds — any shared
   * token run of at least k+w−1 tokens shares at least one fingerprint,
   * so a leaked benchmark passage cannot slip between selected grams.
   * Shorter overlaps MAY go unfingerprinted — this is the screen's
   * documented recall trade against q44's exact-shingle tier.
   *
   * Scale shape identical to [[contaminationCheck]]: benchmark
   * fingerprints broadcast, one (doc, bench_doc) agg shuffle;
   * fingerprints are distinct per doc, so `count(*)` is the distinct
   * shared-fingerprint count.
   *
   * @return (doc, bench_doc, shared_fps) for pairs ≥ minShared
   */
  def contaminationCheckWinnow(
      docs: DataFrame,
      benchmark: DataFrame,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 1): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    import graft.functions.TextAnalysis
    val cf = TextAnalysis.winnowFingerprints(docs, k, w)
    val bf = TextAnalysis.winnowFingerprints(benchmark, k, w)
      .select(col("doc").as("bench_doc"), col("fp"))
    cf.join(broadcast(bf), Seq("fp"))
      .groupBy(col("doc"), col("bench_doc"))
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
  }

  /**
   * Incremental N-GRAM NOVELTY score — the ingest-time freshness
   * signal: per new document, the fraction of its distinct word
   * n-grams NEVER seen in the history corpus. Near-zero novelty means
   * the delta re-states what the corpus already holds (syndication,
   * boilerplate, re-crawls — content-level redundancy the q40/q52
   * document-identity screens can't see); high novelty marks genuinely
   * new material worth keeping. The per-doc granular complement to
   * [[Pipeline.contaminationCheck]]'s pairwise screen.
   *
   * Scale shape: the history collapses to its DISTINCT shingle set
   * once (partial-agg dedup map-side), then one shingle-keyed
   * left-join shuffle between the delta's shingles and that set and
   * one (doc) aggregate — both keyed by delta-side rows, so the work
   * after the history dedup scales with the DELTA. At 100 TB the
   * distinct history shingle table is the persisted state a daily
   * pipeline maintains incrementally (union new shingles in — the q61
   * vocabulary-state recipe); a Bloom filter over it composes as a
   * pre-screen exactly like [[Dedup.exactDedupAgainstBloom]].
   * Shingle-less docs (< n tokens) emit n_shingles = 0 with a null
   * novelty — unmeasured, not maximally novel.
   *
   * @return per new doc: doc, n_shingles, n_novel, novelty (round 6)
   */
  def noveltyScore(
      newDocs: DataFrame,
      historyDocs: DataFrame,
      n: Int = 3): DataFrame = {
    val newSh = Dedup.shingles(newDocs, n)
    val histSh = Dedup.shingles(historyDocs, n)
      .select(col("shingle")).distinct()
      .withColumn("_seen", lit(1L))
    val counts = newSh
      .join(histSh, Seq("shingle"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_shingles"),
        (count(lit(1)) - count(col("_seen"))).as("n_novel"))
    newDocs.select(col("doc"))
      .join(counts, Seq("doc"), "left")
      .select(col("doc"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty",
        when(col("n_shingles") > 0,
          round(col("n_novel").cast("double") / col("n_shingles"), 6)))
  }

  /**
   * Weighted sampling WITHOUT replacement, exact k (Efraimidis &
   * Spirakis 2006, "Weighted random sampling with a reservoir"): each
   * row draws u ∈ (0,1) and ranks by u^(1/w); the k largest keys are a
   * weighted sample without replacement. Where [[sampleByWeight]] is
   * Bernoulli (expected fraction, realized size varies, heavy rows clip
   * at p=1), this returns EXACTLY k rows and never clips — the
   * balanced-eval-slice / seed-set primitive.
   *
   * Determinism: u is seed-free — the first 52 md5 bits of
   * `"ares:" + key`, centered (+0.5) and divided by 2^52, all exact
   * double arithmetic, so every engine draws the identical u. Ranking
   * uses the monotone log form ln(u)/w, floor-quantized to micro units
   * (the DSIR convention) with the key column as tie-break, so the
   * selected SET is engine-exact.
   *
   * Scale shape: map-only scoring + `orderBy(...).limit(k)`, which
   * Spark plans as TakeOrderedAndProject — a size-k heap per partition
   * and a k·P-row driver merge. No global sort, no shuffle of corpus
   * rows, no RNG state; retries/speculation can't change the draw.
   * Null or non-positive weights never sample.
   *
   * @return the k sampled rows: keyCol, weightCol, key_micro
   */
  def sampleWeightedK(
      df: DataFrame,
      weightCol: String,
      keyCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("key_micro", esKeyMicro(keyCol, weightCol))
      .select(col(keyCol), col(weightCol), col("key_micro"))
      .orderBy(col("key_micro").desc, col(keyCol))
      .limit(k)
  }

  /**
   * Per-group CORPUS CHECKSUM — the replication/migration audit
   * primitive (the [[graft.operators.Chunking.writeTrainingShards]]
   * manifest generalized to any table): per group, the row count and
   * an ORDER-FREE content checksum — the sum of each row's 60-bit
   * `"ck:"`-prefixed hash of (key, payload-md5). Commutative, so any
   * partitioning / retry / engine of the same content produces the
   * same value; one changed byte, one lost row, or one duplicate
   * moves it. Compare two checksums instead of two corpora: the
   * 100 TB equality test that ships KBs, not rows (snapshotDiff then
   * localizes a mismatch).
   *
   * Exactness: summed internally as DECIMAL(38,0) — exact to ~10^19
   * rows per group, far past any corpus; the oracle's HUGEINT sum
   * matches digit for digit. Emitted as a STRING: the value exceeds
   * int64, and decimal/hugeint columns render differently across
   * engines' result surfaces (pandas float-mangles DECIMAL(38,0)),
   * so a checksum that exists to be *compared byte-for-byte* ships
   * in the one type every surface round-trips losslessly.
   *
   * @param df (groupCol, keyCol, payloadCol)
   * @return per group: n_rows, checksum (string decimal digits)
   */
  def corpusChecksum(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      payloadCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(conv(substring(md5(concat(
            lit("ck:"), col(keyCol).cast("string"),
            lit(":"), md5(col(payloadCol)))), 1, 15), 16, 10)
          .cast("long").cast("decimal(38,0)"))
          .cast("string").as("checksum"))

  /**
   * One-row corpus DATA CARD — the governance summary a dataset ships
   * with (Gebru et al.'s datasheets, operationalized): row/unique
   * counts and exact-dup rate, token mass and vocabulary size,
   * dominant predicted language with its share, and mean quality —
   * one frame a release gate can diff against the previous snapshot.
   *
   * Scale shape: one tokenized scan feeds a single multi-aggregate
   * (count, distinct md5, distinct term via the same Expand, token
   * sum); the language argmax reduces a ≤5-row frame; everything
   * combines through 1-row broadcast crosses. Mean quality averages
   * ROUND-6 per-doc scores (float-sum noise ~1e-13 dies in the final
   * round — the q102b convention).
   */
  def dataCard(docs: DataFrame): DataFrame = {
    val scored = docs
      .withColumn("_st", TextAnalysis.textStatsCol(col("line")))
      .withColumn("_lang", TextAnalysis.langPredFromStats(col("_st")))
      .withColumn("_q", round(TextAnalysis.qualityScoreFromStats(col("_st")), 6))
      .withColumn("_ntok",
        size(filter(split(col("line"), "\\s+"), t => length(t) > 0)).cast("long"))
    val base = scored.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("line"))).as("n_unique_texts"),
      sum(col("_ntok")).as("n_tokens"),
      // order-free mean via exact micro-long sum (the corpusRollup r13
      // rationale — and now the SAME recipe as this operator's own
      // incremental twin, dataCardFromState's q_micro scalar)
      sum(round(col("_q") * lit(1e6)).cast("long")).as("_qmicro"))
      .withColumn("mean_quality",
        round(col("_qmicro").cast("double") / lit(1e6) /
          col("n_docs").cast("double"), 6))
    val vocab = docs
      .select(explode(filter(split(col("line"), "\\s+"), t => length(t) > 0))
        .as("term"))
      .agg(countDistinct(col("term")).as("vocab_size"))
    val langW = Window.orderBy(col("n").desc, col("_lang"))
    val topLang = scored.groupBy(col("_lang")).agg(count(lit(1)).as("n"))
      // ≤5-row frame: the unpartitioned window is harmless by
      // construction (the budgetFill precedent)
      .withColumn("_rn", row_number().over(langW))
      .where(col("_rn") === 1)
      .select(col("_lang").as("top_lang"), col("n").as("top_lang_n"))
    base.crossJoin(broadcast(vocab)).crossJoin(broadcast(topLang))
      .select(col("n_docs"), col("n_unique_texts"),
        round(lit(1.0) - col("n_unique_texts").cast("double") /
          col("n_docs").cast("double"), 6).as("dup_rate"),
        col("n_tokens"), col("vocab_size"),
        col("top_lang"), col("top_lang_n"),
        round(col("top_lang_n").cast("double") /
          col("n_docs").cast("double"), 6).as("top_lang_share"),
        col("mean_quality"))
  }

  /**
   * MERGEABLE data-card STATE — [[dataCard]]'s daily-update form: every
   * card component reduced to a commutative, associative (kind, k, v)
   * long-count table, so `state(history ∪ delta) ≡
   * merge(state(history), state(delta))` holds BY CONSTRUCTION and a
   * released corpus's card refreshes from per-slice states without
   * re-scanning history. Rows: (`fp`, md5(text), n) exact-dup
   * fingerprint counts; (`term`, term, n) vocabulary counts — the q61
   * unpruned-counts recipe; (`lang`, predicted, n) language histogram;
   * (`scalar`, n_docs|n_tokens|q_micro, v) corpus scalars, with quality
   * lifted to round-6 MICRO-LONGS before summation (the q88 recipe —
   * the mean is then engine-exact however slices regroup, where the
   * batch card's `avg` of doubles would not merge exactly).
   *
   * Scale shape: state is fingerprint-mass + vocabulary-mass (the
   * exact-dedup and incremental-vocab shuffles this repo already pays),
   * built by partially-aggregated (kind, k) shuffles; scalars collapse
   * map-side to 3 rows. Nothing collects.
   *
   * Contract: state rows are unique per (kind, k) — guaranteed by this
   * builder and preserved by [[mergeDataCardStates]]; [[renderDataCard]]
   * counts rows under that contract.
   */
  def dataCardState(docs: DataFrame): DataFrame = {
    val scored = docs
      .withColumn("_st", TextAnalysis.textStatsCol(col("line")))
      .withColumn("_lang", TextAnalysis.langPredFromStats(col("_st")))
      .withColumn("_q", round(TextAnalysis.qualityScoreFromStats(col("_st")), 6))
      .withColumn("_ntok",
        size(filter(split(col("line"), "\\s+"), t => length(t) > 0)).cast("long"))
    val fps = docs
      .groupBy(md5(col("line")).as("k")).agg(count(lit(1)).as("v"))
      .select(lit("fp").as("kind"), col("k"), col("v"))
    val terms = docs
      .select(explode(filter(split(col("line"), "\\s+"), t => length(t) > 0))
        .as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("v"))
      .select(lit("term").as("kind"), col("k"), col("v"))
    val langs = scored
      .groupBy(col("_lang").as("k")).agg(count(lit(1)).as("v"))
      .select(lit("lang").as("kind"), col("k"), col("v"))
    val scalars = scored
      .agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("_ntok")), lit(0L)).as("n_tokens"),
        coalesce(sum(round(col("_q") * 1e6).cast("long")), lit(0L))
          .as("q_micro"))
      .select(explode(array(
        struct(lit("n_docs").as("k"), col("n_docs").as("v")),
        struct(lit("n_tokens").as("k"), col("n_tokens").as("v")),
        struct(lit("q_micro").as("k"), col("q_micro").as("v")))).as("s"))
      .select(lit("scalar").as("kind"), col("s.k").as("k"), col("s.v").as("v"))
    fps.unionByName(terms).unionByName(langs).unionByName(scalars)
  }

  /** Merge two [[dataCardState]] frames: one partially-aggregated
    * (kind, k) shuffle of exact long counts — commutative and
    * associative, so any merge tree over any slicing yields the same
    * state. */
  def mergeDataCardStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("kind"), col("k"))
      .agg(sum(col("v")).as("v"))

  /**
   * Render the one-row card from a [[dataCardState]]: distinct texts /
   * vocabulary are ROW counts of the fp/term sections (unique per
   * (kind, k) by the state contract), the language argmax windows over
   * the ≤5-row lang section, and mean quality divides the exact micro
   * sum — `(q_micro / 1e6) / n_docs`, one round-6. Same schema as
   * [[dataCard]]. The state is persisted ([[graft.Caching]] route) so
   * its two consumers materialize it once; the frame is vocabulary-
   * scale (one row per distinct term/fingerprint) and outlives the
   * method, so a scope is required — fail loudly rather than pin it
   * for the session.
   */
  def renderDataCard(state: DataFrame): DataFrame = {
    graft.Caching.requireScope("Pipeline.renderDataCard")
    val st = graft.Caching.persist(state)
    val flat = st.groupBy().agg(
      coalesce(sum(when(col("kind") === "scalar" && col("k") === "n_docs",
        col("v"))), lit(0L)).as("n_docs"),
      coalesce(sum(when(col("kind") === "fp", lit(1L))), lit(0L))
        .as("n_unique_texts"),
      coalesce(sum(when(col("kind") === "scalar" && col("k") === "n_tokens",
        col("v"))), lit(0L)).as("n_tokens"),
      coalesce(sum(when(col("kind") === "term", lit(1L))), lit(0L))
        .as("vocab_size"),
      coalesce(sum(when(col("kind") === "scalar" && col("k") === "q_micro",
        col("v"))), lit(0L)).as("q_micro"))
    // ≤5-row frame: unpartitioned window harmless by construction (the
    // dataCard topLang precedent)
    val langW = Window.orderBy(col("v").desc, col("k"))
    val topLang = st.where(col("kind") === "lang")
      .withColumn("_rn", row_number().over(langW))
      .where(col("_rn") === 1)
      .select(col("k").as("top_lang"), col("v").as("top_lang_n"))
    flat.crossJoin(broadcast(topLang))
      .select(col("n_docs"), col("n_unique_texts"),
        round(lit(1.0) - col("n_unique_texts").cast("double") /
          col("n_docs").cast("double"), 6).as("dup_rate"),
        col("n_tokens"), col("vocab_size"),
        col("top_lang"), col("top_lang_n"),
        round(col("top_lang_n").cast("double") /
          col("n_docs").cast("double"), 6).as("top_lang_share"),
        round(col("q_micro").cast("double") / lit(1e6) /
          col("n_docs").cast("double"), 6).as("mean_quality"))
  }

  /**
   * LENGTH–QUALITY CORRELATION per group — the quality-signal sanity
   * check ("is my quality score just measuring length?"): Pearson r
   * between per-doc token count and the round-6 quality score, per
   * source. A feed where r ≈ 1 means the score adds nothing over a
   * length floor; a negative r on one feed (long docs scoring WORSE)
   * is usually boilerplate padding. The q159/q160 exact-moment recipe
   * lifted to document features: quality lifts to round-6 micro-longs,
   * moments accumulate as exact DECIMAL(38,0) (Σxy at web scale
   * overflows int64), and r evaluates once in double, round-6.
   * Zero-variance groups (all docs the same length, or a constant
   * score) null out rather than divide by zero.
   *
   * Scale shape: one map-only TextStats scan collapsing straight to a
   * group-cardinality moment aggregate — no second exchange, nothing
   * collects, no window.
   *
   * @param docs (groupCol, line)
   * @return (groupCol, n_docs, r) — r round-6, null when degenerate
   */
  def featureCorrelation(docs: DataFrame, groupCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    docs
      .withColumn("_st", TextAnalysis.textStatsCol(col("line")))
      .withColumn("x",
        size(filter(split(col("line"), "\\s+"), t => length(t) > 0))
          .cast("long"))
      .withColumn("y",
        round(round(TextAnalysis.qualityScoreFromStats(col("_st")), 6) * 1e6)
          .cast("long"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(dec(col("x"))).as("_sx"),
        sum(dec(col("y"))).as("_sy"),
        sum(dec(col("x")) * dec(col("x"))).as("_qx"),
        sum(dec(col("y")) * dec(col("y"))).as("_qy"),
        sum(dec(col("x")) * dec(col("y"))).as("_sxy"))
      .withColumn("_num",
        dec(col("n_docs")) * col("_sxy") - col("_sx") * col("_sy"))
      .withColumn("_dx",
        dec(col("n_docs")) * col("_qx") - col("_sx") * col("_sx"))
      .withColumn("_dy",
        dec(col("n_docs")) * col("_qy") - col("_sy") * col("_sy"))
      .withColumn("r",
        when(col("_dx") > 0 && col("_dy") > 0,
          round(col("_num").cast("double") /
            (sqrt(col("_dx").cast("double")) * sqrt(col("_dy").cast("double"))),
            6)))
      .select(col(groupCol), col("n_docs"), col("r"))
  }

  /** The Efraimidis–Spirakis rank key shared by both weighted-sample
    * tiers: u = ("ares:"-prefixed 52 md5 bits + 0.5)/2^52 (exact
    * double), key = ⌊1e6·ln(u)/w⌋ — micro-quantization absorbs libm
    * last-ulp drift, so the ranked SET is engine-exact. */
  private def esKeyMicro(keyCol: String, weightCol: String): Column = {
    val u52 =
      (conv(substring(md5(concat(lit("ares:"), col(keyCol).cast("string"))),
        1, 13), 16, 10).cast("long").cast("double") + 0.5) /
        4503599627370496.0 // 2^52; (v+0.5)/2^52 is exact in doubles
    floor(lit(1e6) * log(u52) / col(weightCol)).cast("long")
  }

  /**
   * Weighted sampling without replacement, exact k PER GROUP — the
   * balanced-AND-weighted eval slice ([[sampleWeightedK]] × the
   * [[sampleKPerGroup]] stratification): every group contributes its
   * own k-row Efraimidis–Spirakis draw (fewer if the group is
   * smaller), so small strata survive while heavy rows still dominate
   * within each. Same seed-free micro-quantized key — the selected
   * set per group is engine-exact and replayable.
   *
   * Scale shape: map-only key scoring + ONE window partitioned by the
   * group column; WindowGroupLimit pushes the rank filter into the
   * sort, so each task keeps a k-row heap per group — never the
   * group, never a global sort.
   *
   * @return sampled rows: groupCol, keyCol, weightCol, key_micro,
   *         rk (1..k within the group)
   */
  def sampleWeightedKPerGroup(
      df: DataFrame,
      groupCol: String,
      weightCol: String,
      keyCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("rk"),
      "'rk' is reserved by sampleWeightedKPerGroup — rename that input column")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("key_micro").desc, col(keyCol))
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("key_micro", esKeyMicro(keyCol, weightCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col(groupCol), col(keyCol), col(weightCol),
        col("key_micro"), col("rk"))
  }

  /**
   * Per-document KL DIVERGENCE from the corpus unigram distribution —
   * the "distributional novelty" quality signal: low KL = the doc's
   * term frequencies mirror the corpus (boilerplate, templates);
   * high KL = an unusual distribution (jargon, lists, noise — or
   * genuinely novel content worth a human look). A standard
   * complement to per-doc repetition/perplexity cuts when curating
   * pretraining mixes.
   *
   * kl = Σ_t p_t · ln(p_t / q_t), p = tf/doc_total, q = ctf/corpus
   * total; every doc term has q > 0 by construction (the corpus
   * includes the doc). Emitted in integer MICRO-NATS — each term's
   * contribution quantized floor(1e6 · p·ln(p/q)) BEFORE the per-doc
   * sum (the Naive-Bayes q88 recipe): integer sums have no
   * float-aggregation-order hazard, so the value is engine-exact by
   * construction, not by rounding luck.
   *
   * Scale shape: one (doc, term) tf shuffle; the corpus distribution
   * is a V-bounded frame that BROADCASTS (with its 1-row total); the
   * per-doc aggregation is the only other exchange. Nothing
   * corpus-sized is ever collected.
   */
  def klNovelty(docs: DataFrame): DataFrame = {
    val tf = Dedup.termWeights(docs)
    val docTot = tf.groupBy(col("doc")).agg(sum(col("tf")).as("tot"))
    val ctf = tf.groupBy(col("term")).agg(sum(col("tf")).as("ctf"))
    val ctot = tf.agg(sum(col("tf")).as("ctot"))
    val p = col("tf").cast("double") / col("tot").cast("double")
    val q = col("ctf").cast("double") / col("ctot").cast("double")
    tf.join(broadcast(ctf), "term")
      .crossJoin(broadcast(ctot))
      .join(docTot, "doc")
      .withColumn("c", floor(p * log(p / q) * lit(1e6)).cast("long"))
      .groupBy(col("doc"))
      .agg(sum(col("tf")).as("n_tokens"), sum(col("c")).as("kl_unats"))
      .select(col("doc"), col("n_tokens"), col("kl_unats"))
  }

  /**
   * [[klNovelty]] against a FROZEN reference distribution — score
   * arriving/new docs against the LAST RELEASE's unigram distribution
   * instead of their own batch's (the incremental-pipeline form: the
   * reference doesn't shift under the delta being measured). Terms the
   * reference never saw have q = 0 (infinite KL), so they are EXCLUDED
   * from the sum and reported as `n_unseen` instead — the two-column
   * contract (seen-mass KL + unseen token count) is the honest
   * decomposition; a spike in either is the alert.
   *
   * Same micro-nat quantization and scale shape as [[klNovelty]]: the
   * reference distribution is V-bounded and broadcasts; docs with zero
   * tokens have no tf rows and are absent from the output (the
   * streaming twin `klScreen` emits every arrival instead — its audit
   * covers token-less rows).
   */
  def klNoveltyAgainst(docs: DataFrame, historyDocs: DataFrame): DataFrame = {
    val tf = Dedup.termWeights(docs)
    val ctf = Dedup.termWeights(historyDocs)
      .groupBy(col("term")).agg(sum(col("tf")).as("ctf"))
    val ctot = ctf.agg(sum(col("ctf")).as("ctot"))
    val docTot = tf.groupBy(col("doc")).agg(sum(col("tf")).as("tot"))
    val p = col("tf").cast("double") / col("tot").cast("double")
    val q = col("ctf").cast("double") / col("ctot").cast("double")
    tf.join(broadcast(ctf), Seq("term"), "left")
      .crossJoin(broadcast(ctot))
      .join(docTot, "doc")
      .withColumn("c", when(col("ctf").isNotNull,
        floor(p * log(p / q) * lit(1e6)).cast("long")).otherwise(lit(0L)))
      .groupBy(col("doc"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(when(col("ctf").isNull, col("tf")).otherwise(lit(0L))).as("n_unseen"),
        sum(col("c")).as("kl_unats"))
      .select(col("doc"), col("n_tokens"), col("n_unseen"), col("kl_unats"))
  }

  /**
   * CROSS-SOURCE near-duplication matrix — the feed-level governance
   * view [[sourceDupStats]] (within-source, q90) and `sourceOverlap`
   * (vocabulary-level, q122) both miss: per UNORDERED source pair, how
   * many near-duplicate DOCUMENT pairs (the q13 MinHash tier) cross
   * the boundary. A hot (s1, s2) cell means one feed is re-scraping or
   * mirroring the other — the licensing/attribution question
   * vocabulary overlap can only hint at.
   *
   * Scale shape: the q13 chain end-to-end (banded candidates, never
   * all-pairs) plus two doc-keyed source joins on the PAIRS frame
   * (pairs ≪ corpus) and a sources²-bounded final aggregate.
   *
   * @param docs (doc, line, srcCol)
   * @return (s1, s2, n_pairs) with s1 <= s2, only non-empty cells
   */
  def crossSourceDupMatrix(
      docs: DataFrame,
      srcCol: String = "source",
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashNearDups(
      docs.select(col("doc"), col("line")), n, numHashes, rowsPerBand, threshold)
    val src = docs.select(col("doc"), col(srcCol))
    pairs
      .join(src.select(col("doc").as("d1"), col(srcCol).as("_s1")), Seq("d1"))
      .join(src.select(col("doc").as("d2"), col(srcCol).as("_s2")), Seq("d2"))
      .select(least(col("_s1"), col("_s2")).as("s1"),
        greatest(col("_s1"), col("_s2")).as("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /**
   * Per-group UNIGRAM ENTROPY in integer micro-nats — the diversity
   * side of the [[klNovelty]] family (entropy is the self-referenced
   * baseline KL measures divergence FROM): H = Σ_t p_t·ln(1/p_t) over
   * each group's term distribution. A feed whose entropy collapses is
   * template/boilerplate-dominated; one whose entropy spikes changed
   * topic mix — both release-gate diffs next to the q140 vocab feed.
   *
   * Same quantization recipe as [[klNovelty]] (floor(1e6·term
   * contribution) BEFORE the sum → integer totals, engine-exact by
   * construction), with ln(tot/tf) computed as the direct quotient on
   * both engines — never 1/(tf/tot), whose extra rounding step can
   * differ in the last ulp.
   *
   * Scale shape: one (group, term) tf shuffle with map-side combine,
   * one groups-bounded totals broadcast back onto it, one final
   * groups-bounded aggregate. Nothing collects.
   *
   * @param docs (groupCol, line)
   * @return (groupCol, n_tokens, n_terms, entropy_unats)
   */
  def groupTermEntropy(docs: DataFrame, groupCol: String): DataFrame = {
    // persisted: the (group, term, tf) frame is vocab-bounded and feeds
    // both the totals and the contribution join — one corpus scan, not two
    val tf = graft.Caching.persist(docs
      .select(col(groupCol), explode(TextAnalysis.toks(col("line"))).as("term"))
      .groupBy(col(groupCol), col("term")).agg(count(lit(1)).as("tf")))
    val tot = tf.groupBy(col(groupCol))
      .agg(sum(col("tf")).as("_tot"), count(lit(1)).as("_nterms"))
    tf.join(broadcast(tot), Seq(groupCol))
      .withColumn("_c", floor(
        (col("tf").cast("double") / col("_tot").cast("double"))
          * log(col("_tot").cast("double") / col("tf").cast("double"))
          * lit(1e6)).cast("long"))
      .groupBy(col(groupCol))
      .agg(max(col("_tot")).as("n_tokens"),
        max(col("_nterms")).as("n_terms"),
        sum(col("_c")).as("entropy_unats"))
  }

  /**
   * UNIMAX token-budget allocation across languages/domains (Chung et
   * al. 2023, "UniMax: fairer and more effective language sampling" —
   * the mT5/PaLM-2 mixture recipe): split a training budget as evenly
   * as possible across groups, except no group may be repeated more
   * than `maxEpochs` times. The greedy waterfill — visit groups by
   * ascending capacity, give each min(capacity, even share of what's
   * left) — is computed here in CLOSED FORM, no loop:
   *
   *   - capacity cap_g = n_tokens_g · maxEpochs;
   *   - the capped set is exactly a PREFIX of the cap-ascending order,
   *     because f(i) = P_{i-1} + cap_i·(L-i+1) is nondecreasing in i
   *     (difference (cap_{i+1}-cap_i)(L-i) ≥ 0), so "cap_i fits under
   *     the even split of what the smaller groups left" flips once;
   *   - the uncapped suffix (u groups, R = budget − Σ capped caps)
   *     takes alloc_j = ⌊(R + j − 1)/u⌋ — the exact sequential-greedy
   *     floors, which sum to R (the last R mod u groups get the +1).
   *
   * Every quantity is a LONG — counts, caps, prefix sums, floor
   * divisions — so the allocation is engine-exact by construction;
   * the only double is the final round-6 epochs ratio. Budget is
   * conserved exactly: Σ alloc = min(budget, Σ cap).
   *
   * Scale shape: one per-group token aggregate (map-side partial) off
   * the corpus scan, then three unbounded windows over the
   * groups-bounded frame (cardinality = #languages, dozens — the one
   * place a single-partition exchange is harmless, the
   * [[temperatureMixture]] z_norm precedent). The corpus itself is
   * scanned once and never re-shuffled.
   *
   * @param docs (groupCol, line)
   * @param budgetTokens total training-token budget to allocate
   * @param maxEpochs max repetitions of any one group's data
   * @return per group: n_tokens, cap, alloc, epochs (round-6 double)
   */
  def uniMaxAllocation(
      docs: DataFrame,
      groupCol: String,
      budgetTokens: Long,
      maxEpochs: Int = 4): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val perGroup = docs
      .withColumn("_ntok",
        size(filter(split(col("line"), "\\s+"), t => length(t) > 0)).cast("long"))
      .groupBy(col(groupCol))
      .agg(sum(col("_ntok")).as("n_tokens"))
      .where(col("n_tokens") > 0)
    uniMaxAllocFromCounts(perGroup, groupCol, budgetTokens, maxEpochs)
  }

  /** The closed-form waterfill over an already-aggregated
    * (groupCol, n_tokens) frame — [[uniMaxAllocation]]'s window block,
    * exposed so [[uniMaxSample]] can run allocation and expansion off
    * one token-counting scan. */
  private def uniMaxAllocFromCounts(
      perGroup: DataFrame,
      groupCol: String,
      budgetTokens: Long,
      maxEpochs: Int): DataFrame = {
    val staged0 = perGroup
      .withColumn("cap", col("n_tokens") * lit(maxEpochs.toLong))
    // All windows below run on the groups-bounded frame (#languages
    // rows); (cap, group) is a total order, so every engine sees the
    // identical prefix.
    val byCap = Window.orderBy(col("cap"), col(groupCol))
    val all = Window.partitionBy()
    val staged = staged0
      .withColumn("_i", row_number().over(byCap))
      .withColumn("_L", count(lit(1)).over(all))
      .withColumn("_pprev",
        coalesce(sum(col("cap")).over(byCap.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      // capped ⇔ cap·(groups from here on) fits in the budget the
      // smaller (all-capped) groups left behind
      .withColumn("_capped",
        col("cap") * (col("_L") - col("_i") + lit(1L)) <=
          lit(budgetTokens) - col("_pprev"))
    staged
      .withColumn("_k", sum(when(col("_capped"), 1L).otherwise(0L)).over(all))
      .withColumn("_R", lit(budgetTokens) -
        sum(when(col("_capped"), col("cap")).otherwise(0L)).over(all))
      .withColumn("_u", col("_L") - col("_k"))
      .withColumn("alloc", when(col("_capped"), col("cap"))
        .otherwise(floor((col("_R") + (col("_i") - col("_k")) - lit(1L)) /
          col("_u")).cast("long")))
      .withColumn("epochs",
        round(col("alloc").cast("double") / col("n_tokens").cast("double"), 6))
      .select(col(groupCol), col("n_tokens"), col("cap"), col("alloc"),
        col("epochs"))
  }

  /**
   * UNIMAX APPLIED — [[uniMaxAllocation]] composed with the
   * [[epochRepetition]] copy rule, end to end in ONE plan: the
   * waterfill's per-group allocation becomes a target epoch rate
   * (alloc/n_tokens, can exceed 1 — small languages REPEAT under
   * UniMax), and each doc materializes ⌊rate⌋ copies plus one more
   * when its seed-free `"rep:"` md5 bucket falls under the fractional
   * remainder — so expected output tokens per group = alloc, no RNG,
   * engine-exact copy decisions.
   *
   * Scale shape: one token-counting scan feeds both the groups-bounded
   * allocation aggregate (then the waterfill windows on that tiny
   * frame) and the expansion join-back (broadcast, rate is one double
   * per group). The only corpus-scale operation beyond the scan is the
   * `sequence` explode — output-bounded by construction (the budget
   * caps total emitted tokens).
   *
   * @param docs (doc, line, groupCol)
   * @return (doc, copy, groupCol, n_tokens, n_copies)
   */
  def uniMaxSample(
      docs: DataFrame,
      groupCol: String,
      budgetTokens: Long,
      maxEpochs: Int = 4): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    Seq("n_tokens", "rate", "copy", "n_copies", "alloc", "cap").foreach(c =>
      require(!docs.columns.contains(c),
        s"'$c' is reserved by uniMaxSample — rename that input column"))
    val withTok = docs.withColumn("n_tokens",
      size(filter(split(col("line"), "\\s+"), t => length(t) > 0)).cast("long"))
    val perGroup = withTok.groupBy(col(groupCol))
      .agg(sum(col("n_tokens")).as("n_tokens"))
      .where(col("n_tokens") > 0)
    val rates = uniMaxAllocFromCounts(perGroup, groupCol, budgetTokens, maxEpochs)
      .select(col(groupCol),
        (col("alloc").cast("double") / col("n_tokens").cast("double")).as("rate"))
    val repBucket =
      conv(substring(md5(concat(lit("rep:"), col("doc").cast("string"))), 1, 8),
        16, 10).cast("long") % 1000000L
    withTok
      .join(broadcast(rates), Seq(groupCol))
      .withColumn("n_copies",
        floor(col("rate")).cast("long") +
          when(repBucket.cast("double") <
            (col("rate") - floor(col("rate"))) * 1e6, 1L).otherwise(0L))
      .where(col("n_copies") > 0)
      .select(col("doc"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"),
        col(groupCol), col("n_tokens"), col("n_copies"))
  }

  /**
   * CURRICULUM SCHEDULE — easy-to-hard epoch pools (Bengio et al. 2009
   * "Curriculum Learning"'s staged form): rank the corpus by the q18
   * quality score (high quality = clean, fluent = "easy" first), then
   * epoch e of E admits the top ⌈e·N/E⌉ ranks — a growing pool that
   * reaches the full corpus at the final epoch. Each admitted
   * (epoch, doc) row carries a deterministic per-epoch shuffle key
   * (`ord`, the seed-free md5 permille bucket of "ep:e:doc" — the q84
   * epoch-shuffle family) so consumers get a different, replayable
   * order every epoch without a global sort.
   *
   * Determinism: the rank orders by (round-6 quality DESC, doc) — a
   * total order over a ROUNDED score, the cross-engine convention —
   * and pool admission is the exact integer test rn·E < e·N
   * (equivalent to rn < ⌈e·N/E⌉; no float boundary to disagree on).
   *
   * Scale shape: one kernel scan for the score, [[Ranking.withGlobalRank]]
   * for the rank (range partition + per-partition index — never a
   * single-task sort), a 1-row count broadcast cross (the q59/q183
   * threshold pattern), and a ≤ E-per-doc admission fan-out. Output is
   * Σ_e ⌈eN/E⌉ ≈ N·(E+1)/2 rows — bounded by the epoch count.
   *
   * @param docs (doc, line)
   * @return (epoch 1..E, doc, quality, rn, ord) for admitted pairs
   */
  def curriculumSchedule(docs: DataFrame, epochs: Int = 4): DataFrame = {
    require(epochs >= 1 && epochs <= 64,
      s"epochs must be in [1,64], got $epochs")
    val scored = docs.select(col("doc"),
      graft.functions.TextAnalysis.qualityScoreCol(col("line")).as("quality"))
    val ranked = Ranking.withGlobalRank(scored,
      Seq(col("quality").desc, col("doc")), rankCol = "rn",
      errorHint = "re-run curriculumSchedule, or checkpoint its input")
    val total = ranked.agg(count(lit(1)).as("_n"))
    val ord = conv(substring(
        md5(concat(lit("ep:"), col("epoch").cast("string"),
          lit(":"), col("doc").cast("string"))), 1, 8),
      16, 10).cast("long") % 1000000L
    ranked.crossJoin(broadcast(total))
      .select(col("doc"), col("quality"), col("rn"), col("_n"),
        explode(sequence(lit(1L), lit(epochs.toLong))).as("epoch"))
      .where(col("rn") * lit(epochs.toLong) < col("epoch") * col("_n"))
      .withColumn("ord", ord)
      .select(col("epoch"), col("doc"), col("quality"), col("rn"), col("ord"))
  }

  /**
   * DAILY-INGEST bookend COMPOSITION — the incremental operators the
   * tier ships separately (q40b exact screen → q52 near-dup screen →
   * q91 split inherit), run as ONE lazy plan over a shared shingle /
   * band derivation: the per-delta-doc DECISION LOG every arriving
   * document gets exactly one row of.
   *
   *  - `dropped_exact`: the doc's md5 text fingerprint already exists
   *    in history ([[Dedup.exactDedupAgainstBloom]] semantics — Bloom
   *    pre-screen riding the scan, exact anti-join confirm).
   *  - `dropped_near_dup`: it survived the exact screen but matches a
   *    history doc at Jaccard ≥ `nearDupThreshold`
   *    ([[Dedup.minhashNearDupsAgainst]]); `anchor` = its smallest
   *    matched history doc.
   *  - `kept`: admitted; `split` is inherited from the anchor's history
   *    split (or the own-id permille hash when nothing matched —
   *    [[Dedup.leakageSafeSplitAgainst]] verbatim), `anchor` = the
   *    split anchor (null for fresh singletons).
   *
   * The point is the SHARED derivation: history shingles/bands build
   * ONCE and serve the near-dup guard, the candidate join, and the
   * split anchors; survivor shingles/bands build once and serve the
   * near-dup verify and (filtered to kept docs) the split probe — the
   * three stages compose without re-reading either corpus. The ANN
   * index append (q100) composes the same way on the embeddings side
   * and the data-card merge (q166) over the kept set; both are
   * exercised by their own oracle rows.
   *
   * Scale shape: delta ⋈ static history everywhere, never a self-join;
   * the hot-bucket guard bounds history buckets before every candidate
   * join; all exchanges carry shingle/band/pair rows. When
   * `historySplits` is None the history split is fitted here from the
   * same persisted history bands (the self-contained daily job);
   * production passes the persisted assignment.
   *
   * @param newDocs (doc, line) — the arriving delta
   * @param historyDocs (doc, line) — the static history
   * @param historySplits optional (doc, split) over history
   * @return one row per delta doc: (doc, stage, anchor, split)
   */
  def dailyIngest(
      newDocs: DataFrame,
      historyDocs: DataFrame,
      historySplits: Option[DataFrame] = None,
      nearDupThreshold: Double = 0.5,
      valPerMille: Int = 100,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    // SIX corpus-scale persists (history, survivors, both shingle
    // tables, both band tables) outlive the method — the decision-log
    // plan reads each several times and only the caller's scope can
    // release them after its action. A scope-less daily run would
    // silently pin all six for the session: fail loudly instead.
    graft.Caching.requireScope("Pipeline.dailyIngest")
    val hist = graft.Caching.persist(historyDocs.select(col("doc"), col("line")))
    val survivors = graft.Caching.persist(
      Dedup.exactDedupAgainstBloom(newDocs.select(col("doc"), col("line")), hist))
    val shNew = graft.Caching.persist(Dedup.shingles(survivors, n))
    val shHist = graft.Caching.persist(Dedup.shingles(hist, n))
    val bNew = graft.Caching.persist(Dedup.lshBands(
      Dedup.minhashSignatures(shNew, numHashes), numHashes, rowsPerBand))
    val bHist = graft.Caching.persist(Dedup.lshBands(
      Dedup.minhashSignatures(shHist, numHashes), numHashes, rowsPerBand))
    // the near-dup verdict frame is read THREE times (the kept anti-join,
    // whose result feeds the split assignment, and the final decision-log
    // join) — persist the delta-bounded frame so the candidate join +
    // jaccard verify chain runs once, not once per consumer
    val nd = graft.Caching.persist(
      Dedup.minhashNearDupsAgainst(survivors, hist,
          n, numHashes, rowsPerBand, nearDupThreshold,
          precomputedNewShingles = Some(shNew),
          precomputedHistShingles = Some(shHist),
          precomputedNewBands = Some(bNew),
          precomputedHistBands = Some(bHist))
        .groupBy(col("doc")).agg(min(col("hist_doc")).as("nd_anchor")))
    val kept = survivors.join(nd, Seq("doc"), "left_anti")
    val hsp = historySplits.getOrElse(
      Dedup.leakageSafeSplit(hist, valPerMille, n, numHashes, rowsPerBand,
        precomputedBands = Some(bHist)).select(col("doc"), col("split")))
    val sp = Dedup.leakageSafeSplitAgainst(kept, hist, hsp, valPerMille,
      n, numHashes, rowsPerBand,
      precomputedNewBands = Some(bNew), // superset of kept: the split's
                                        // own left join drops the rest
      precomputedHistBands = Some(bHist))
    newDocs.select(col("doc"))
      .join(survivors.select(col("doc"), lit(true).as("_surv")), Seq("doc"), "left")
      .join(nd, Seq("doc"), "left")
      .join(sp.select(col("doc"), col("anchor"), col("split")), Seq("doc"), "left")
      .select(col("doc"),
        when(col("_surv").isNull, lit("dropped_exact"))
          .when(col("nd_anchor").isNotNull, lit("dropped_near_dup"))
          .otherwise(lit("kept")).as("stage"),
        when(col("nd_anchor").isNotNull, col("nd_anchor"))
          .otherwise(when(col("_surv").isNotNull, col("anchor"))).as("anchor"),
        when(col("_surv").isNotNull && col("nd_anchor").isNull, col("split"))
          .as("split"))
  }
}
