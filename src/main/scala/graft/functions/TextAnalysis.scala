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
    * contract is determinism, not linguistic accuracy. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "los", "y", "es", "en"),
    "fr" -> Seq("le", "la", "les", "et", "en", "est", "un")
  )

  private def toks(line: Column): Column =
    filter(split(line, "\\s+"), t => length(t) > 0)

  /** Union pattern over ALL language markers, with zero-width token
    * boundaries — one regex scan of the text finds every marker
    * occurrence (the stopword list is exactly this union). */
  private val MarkerPattern: String =
    LangMarkers.flatMap(_._2).distinct.mkString("(?<=^|\\s)(", "|", ")(?=\\s|$)")

  /** All marker-token occurrences in the line (small array — marker
    * density is a few per document). ONE full-text scan serves every
    * per-language count and the stopword ratio; materialize it as a
    * column and feed `langPredFromMatches`/`qualityScoreFromMatches`. */
  def markerMatches(line: Column): Column =
    regexp_extract_all(line, lit(MarkerPattern), lit(1))

  /** Occurrences of any `words` member as a whitespace-delimited token:
    * filter the (tiny) marker-match array instead of rescanning the full
    * text — semantically identical to filtering the whitespace token
    * array with isin (verified per-occurrence, incl. adjacent tokens
    * sharing one space). */
  private def hitCountIn(matches: Column, words: Seq[String]): Column =
    size(filter(matches, m => m.isin(words.map(lit): _*)))

  private def hitCount(line: Column, words: Seq[String]): Column =
    hitCountIn(markerMatches(line), words)

  /** Language-ID argmax (hits desc, lang asc tie-break; zero hits ⇒
    * "und") over a pre-materialized marker-match array. Compose with a
    * `markerMatches` column so the text is regex-scanned ONCE — lambda
    * HOF subtrees are excluded from common-subexpression elimination, so
    * inlining the scan here would repeat it per language. */
  def langPredFromMatches(matches: Column): Column = {
    val best = array_sort(array(LangMarkers.map { case (lang, words) =>
      struct((-hitCountIn(matches, words)).as("neg"), lit(lang).as("lang"))
    }: _*)).getItem(0)
    when(best.getField("neg") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Column form of the language-ID argmax straight from the text — use
    * only standalone; inside a pipeline prefer `markerMatches` +
    * `langPredFromMatches` (single scan). */
  def langPredCol(line: Column): Column =
    langPredFromMatches(markerMatches(line))

  /**
   * Language-ID: argmax of per-language marker-token hits, deterministic
   * tie-break on language code order; no hits at all ⇒ "und".
   * Output: doc, lang_pred, plus one hit-count column per language.
   */
  def langId(docs: DataFrame): DataFrame = {
    // materialize the marker matches ONCE (one regex scan), then count
    // per language over the tiny array
    val withM = docs.withColumn("_mm", markerMatches(col("line")))
    val withHits = LangMarkers.foldLeft(withM) { case (df, (lang, words)) =>
      df.withColumn(s"hits_$lang", hitCountIn(col("_mm"), words).cast("long"))
    }
    // argmax over the ALREADY-computed hits columns (one regex pass per
    // language total — langPredCol would recompute them from the line)
    val best = array_sort(array(LangMarkers.map { case (lang, _) =>
      struct((-col(s"hits_$lang")).as("neg"), lit(lang).as("lang"))
    }: _*)).getItem(0)
    withHits
      .withColumn("lang_pred",
        when(best.getField("neg") === 0, lit("und")).otherwise(best.getField("lang")))
      .select(col("doc") +: col("lang_pred") +:
        LangMarkers.map { case (l, _) => col(s"hits_$l") }: _*)
  }

  /**
   * Quality metrics: token count, distinct-token ratio, mean token length,
   * stopword ratio, and a composite score in [0, 1] (each factor clamped).
   * The score formula is the engine's own (the reference has nothing
   * comparable) — chosen to be monotone in "looks like real prose".
   */

  /** Composite quality score from the text plus a pre-materialized
    * marker-match array (identical formula to `qualityScore`'s output
    * column, including the pre-rounded stopword ratio). */
  def qualityScoreFromMatches(line: Column, matches: Column): Column = {
    val t = toks(line)
    val nTokens = size(t).cast("long")
    val nDistinct = size(array_distinct(t)).cast("long")
    val stopRatio = round(size(matches).cast("double") /
      greatest(size(t), lit(1)), 6)
    round(
      least(nTokens / lit(50.0), lit(1.0)) * lit(0.4) +
        (nDistinct / greatest(nTokens, lit(1))) * lit(0.4) +
        least(stopRatio * lit(4.0), lit(1.0)) * lit(0.2),
      6)
  }

  /** Column form straight from the text — standalone use; in a pipeline
    * prefer `markerMatches` + `qualityScoreFromMatches` (single scan). */
  def qualityScoreCol(line: Column): Column =
    qualityScoreFromMatches(line, markerMatches(line))

  def qualityScore(docs: DataFrame): DataFrame = {
    val t = toks(col("line"))
    docs
      .withColumn("_mm", markerMatches(col("line")))
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_distinct", size(array_distinct(t)).cast("long"))
      .withColumn("mean_tok_len",
        round(aggregate(t, lit(0.0), (acc, x) => acc + length(x)) /
          greatest(size(t), lit(1)), 6))
      .withColumn("stopword_ratio",
        round(size(col("_mm")).cast("double") / greatest(size(t), lit(1)), 6))
      .withColumn("quality_score",
        qualityScoreFromMatches(col("line"), col("_mm")))
      .select(col("doc"), col("n_tokens"), col("n_distinct"),
        col("mean_tok_len"), col("stopword_ratio"), col("quality_score"))
  }

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
   * Scale shape: the positional self-join is an equi-join on doc with a
   * bounded range predicate — per-doc cost is length × window, never
   * doc-count-quadratic; count totals join back as broadcasts (vocab- or
   * 1-row-sized).
   */
  def cooccurrencePmi(
      docs: DataFrame,
      window: Int = 2,
      minCount: Int = 2): DataFrame = {
    val positioned = docs
      .select(col("doc"), posexplode(toks(col("line"))))
      .toDF("doc", "pos", "term")
    val x = positioned.select(col("doc"), col("pos").as("p1"), col("term").as("ta"))
    val y = positioned.select(col("doc"), col("pos").as("p2"), col("term").as("tb"))
    val pairs = x.join(y, Seq("doc"))
      .where(col("p2") > col("p1") && col("p2") <= col("p1") + window)
      .select(least(col("ta"), col("tb")).as("t1"),
        greatest(col("ta"), col("tb")).as("t2"))
    val termCounts = positioned.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val nTok = positioned.agg(count(lit(1)).as("n_tok"))
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
}
