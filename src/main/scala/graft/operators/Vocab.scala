package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
   * runs and engines.
   *
   * Scale shape: one partially-aggregated shuffle on `term` builds the
   * counts; the ranking window is GLOBAL but runs on the *aggregated
   * vocabulary* (≤ a few million rows for natural-language corpora,
   * independent of corpus size), so the single-partition sort is
   * post-reduction small — the standard shape for dictionary builds.
   */
  def buildVocab(docs: DataFrame, minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    docs
      .select(explode(toks(col("line"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .withColumn("token_id",
        (row_number().over(Window.orderBy(col("cnt").desc, col("term"))) - 1)
          .cast("long"))
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
}
