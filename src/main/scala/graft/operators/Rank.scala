package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Global descending sort of scores (SURVEY.md §2 O10/O11;
 * Rank.java:274-310, TFIDFRank.java:186-222).
 *
 * The reference funnels everything through ONE reducer, using the
 * sign-magnitude double-bits-as-long comparator trick (Rank.java:128) —
 * a total-order bottleneck. Spark's `orderBy` range-partitions (sampled
 * boundaries) and sorts in parallel; correct for all doubles at any
 * parallelism. Equal-score order in the reference is shuffle-dependent
 * (quirk Q5) — we add a deterministic tie-break instead.
 *
 * `limit(k)` turns the plan into TakeOrderedAndProject: each partition
 * keeps a k-heap, the driver merges — no global sort at all. Always pass
 * k when the consumer only needs top-k (the reference has no LIMIT
 * anywhere; SURVEY.md §2.1).
 */
object Rank {

  /** O10 — rank search hits (doc, score) descending. */
  def rank(hits: DataFrame, k: Option[Int] = None): DataFrame = {
    val sorted = hits.orderBy(col("score").desc, col("doc"))
    k.fold(sorted)(sorted.limit)
  }

  /** O11 — rank ALL (term, doc, tfidf) scores descending. */
  def rankAll(scores: DataFrame, k: Option[Int] = None): DataFrame = {
    val sorted = scores
      .select(col("term"), col("doc"), col("tfidf"))
      .orderBy(col("tfidf").desc, col("term"), col("doc"))
    k.fold(sorted)(sorted.limit)
  }
}
