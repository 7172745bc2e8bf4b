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
}
