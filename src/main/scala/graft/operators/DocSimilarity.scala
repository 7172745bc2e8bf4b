package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Document–document similarity over the TF-IDF inverted index — the
 * natural "related documents" extension of the reference's data model
 * (same tokenizer, same tf·idf weights; SURVEY.md §2 O2–O7).
 *
 * Sparse cosine via the index itself: pairs arise ONLY from co-occurring
 * terms (join on term), never from an all-pairs doc join. The scale
 * lever is df pruning: a term present in more than `maxDfFraction` of
 * the corpus contributes Σdf² candidate rows (a stop word is quadratic
 * in corpus size) while adding near-zero idf weight — so high-df terms
 * are dropped BEFORE the join and the cosine is defined over the pruned
 * vector space. Cost is Σ_rare-terms df², proportional to genuinely
 * shared rare vocabulary.
 */
object DocSimilarity {

  /**
   * @param maxDfFraction keep terms with df ≤ maxDfFraction · numDocs
   * @param threshold     minimum pruned-space cosine to emit
   * @param numDocs       reference quirk Q4: caller-supplied N; default =
   *                      corpus doc count (computed in-plan, no action)
   * @return (d1, d2, cos) with d1 < d2, cos rounded to 6
   */
  def relatedDocs(
      docs: DataFrame,
      maxDfFraction: Double = 0.06,
      threshold: Double = 0.0,
      numDocs: Option[Long] = None): DataFrame = {
    val scored = TfIdf.tfidf(docs, numDocs)
      .select(col("term"), col("doc"), round(col("tfidf"), 6).as("w"), col("df"))
    val n = docs.agg(countDistinct(col("doc")).as("_nd"))
    // persisted: the pruned index feeds THREE sub-plans (norms + both
    // sides of the term join); without it each copy re-expands the whole
    // tfidf lineage (≈3 corpus scans per copy)
    val pruned = graft.Caching.persist(scored
      .crossJoin(broadcast(n))
      .where(col("df") <= col("_nd") * maxDfFraction)
      .select(col("term"), col("doc"), col("w")))
    val norms = pruned.groupBy(col("doc"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val a = pruned.select(col("term"), col("doc").as("d1"), col("w").as("w1"))
    val b = pruned.select(col("term"), col("doc").as("d2"), col("w").as("w2"))
    a.join(b, Seq("term"))
      .where(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(sum(col("w1") * col("w2")).as("dot"))
      .join(norms.select(col("doc").as("d1"), col("nrm").as("n1")), "d1")
      .join(norms.select(col("doc").as("d2"), col("nrm").as("n2")), "d2")
      .withColumn("cos", round(col("dot") / (col("n1") * col("n2")), 6))
      .where(col("cos") >= threshold)
      .select(col("d1"), col("d2"), col("cos"))
  }
}
