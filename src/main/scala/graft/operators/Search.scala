package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Query-term semi-join + per-doc score aggregation (SURVEY.md §2 O8/O9;
 * Search.java:210-252).
 *
 * Reference quirk Q7 (Search.java:230 — `break` commented out): a score row
 * is emitted once PER MATCHING QUERY TOKEN, so a duplicated query term
 * double-counts. `parityDuplicates = true` preserves that multiset
 * semantics; the default dedups tokens (documented divergence,
 * SURVEY.md §2.4 Q7).
 *
 * Scale: the query token set is tiny → explicit `broadcast()` makes the
 * join a BroadcastHashJoin with zero shuffle of the score table; the only
 * shuffle is the final groupBy(doc), which Catalyst partial-aggregates
 * map-side.
 */
object Search {

  def searchTokens(scores: DataFrame, tokens: Seq[String]): DataFrame = {
    val spark = scores.sparkSession
    import spark.implicits._
    val queryDf = tokens.toDF("term")
    scores
      .join(broadcast(queryDf), Seq("term"), "inner")
      .groupBy(col("doc"))
      .agg(sum(col("tfidf")).as("score"))
  }

  /** Full pipeline: corpus → tfidf → filter by query → per-doc score. */
  def search(
      docs: DataFrame,
      query: String,
      numDocs: Option[Long] = None,
      parityDuplicates: Boolean = false): DataFrame = {
    val raw = TfIdf.tokenizeQuery(query)
    val tokens = if (parityDuplicates) raw else raw.distinct
    searchTokens(TfIdf.tfidf(docs, numDocs), tokens)
  }

  /**
   * Conjunctive (AND) search — the search mode the reference's OR-sum
   * cannot express: only documents containing EVERY query term score,
   * still by summed tf-idf. Same broadcast semi-join plan as [[search]]
   * plus a HAVING on the matched distinct-term count (terms are unique
   * per (term, doc) after aggregation, so `count(*)` IS the distinct
   * match count) — no second pass, no intersection join chain.
   */
  def searchAllTokens(scores: DataFrame, tokens: Seq[String]): DataFrame = {
    val spark = scores.sparkSession
    import spark.implicits._
    scores
      .join(broadcast(tokens.distinct.toDF("term")), Seq("term"), "inner")
      .groupBy(col("doc"))
      .agg(sum(col("tfidf")).as("score"), count(lit(1)).as("_matched"))
      .where(col("_matched") === tokens.distinct.length)
      .drop("_matched")
  }

  def searchAll(
      docs: DataFrame,
      query: String,
      numDocs: Option[Long] = None): DataFrame =
    searchAllTokens(TfIdf.tfidf(docs, numDocs), TfIdf.tokenizeQuery(query))

  /**
   * PHRASE search: documents containing the query terms CONSECUTIVELY,
   * in order, with per-doc occurrence counts. One row per candidate
   * start position (`explode(sequence(...))`), then a per-token equality
   * conjunction against the phrase literals. Scale: map-only scan —
   * zero joins, one (doc)-keyed aggregation over only the MATCHING
   * positions; the single-token "phrase" degenerates to a term-presence
   * filter.
   */
  def searchPhrase(docs: DataFrame, phrase: String): DataFrame = {
    val tokens = TfIdf.tokenizeQuery(phrase)
    require(tokens.nonEmpty, "phrase must contain at least one token")
    val n = tokens.length
    // One row per candidate start position, then a codegen'd per-token
    // conjunction — NOT a higher-order gram build: array HOFs
    // (transform/filter with lambdas) evaluate interpreted, and a
    // filter on the derived count inlines the whole chain twice
    // (projection collapse), which measured 5× slower than this shape.
    // The explode stays inside whole-stage codegen, the conjunction
    // prunes before the (tiny) doc aggregation.
    val matches = (0 until n)
      .map(k => element_at(col("_toks"), col("_i") + k + 1) === lit(tokens(k)))
      .reduce(_ && _)
    docs
      .select(col("doc"), Dedup.tokensCol(col("line")).as("_toks"))
      .where(size(col("_toks")) >= n)
      .select(col("doc"), col("_toks"),
        explode(sequence(lit(0), size(col("_toks")) - n)).as("_i"))
      .where(matches)
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_occurrences"))
  }
}
