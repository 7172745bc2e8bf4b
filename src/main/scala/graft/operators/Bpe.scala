package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding merge TRAINING over a corpus — the tokenizer-
 * learning stage of an LLM data pipeline (the engine's other text ops
 * consume tokens; this one learns how to make them).
 *
 * Classic BPE (Sennrich et al. 2016): represent each distinct word as a
 * character-symbol sequence, repeatedly (1) count adjacent symbol pairs
 * weighted by word frequency, (2) merge the globally most frequent pair
 * into one symbol. Ties break lexicographically (pair1, then pair2) so
 * the learned merge table is deterministic across engines and runs.
 *
 * Scale shape: the corpus is scanned ONCE to build the distinct
 * word-frequency table (one shuffle on the word); every iteration after
 * that runs over the VOCABULARY (≤ a few million rows regardless of
 * corpus size — the shape HF/sentencepiece trainers use), costing one
 * pair-count aggregation plus a map-only greedy rewrite of the symbol
 * arrays. The only driver-side data movement is the single top-1 pair
 * row per iteration (an AQE-sized decision, not a collect of data).
 * Symbol tables persist per iteration and release the previous one, so
 * lineage stays linear in `numMerges`.
 */
object Bpe {

  private def toks(line: Column): Column =
    filter(split(line, "\\s+"), t => length(t) > 0)

  /** Greedy left-to-right application of ONE merge (a, b) → a+b to a
    * symbol array, as a fold: merging never looks back past the token
    * it just produced, which is exactly BPE's non-overlapping rule
    * ("aaa" under (a,a) → ["aa", "a"]). */
  private def mergeOnce(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Distinct words with corpus frequencies and initial char symbols. */
  private def wordTable(docs: DataFrame): DataFrame =
    docs
      .select(explode(toks(col("line"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("sym", filter(split(col("word"), ""), s => length(s) > 0))

  /** Adjacent-pair frequencies over a symbol table. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .where(size(col("sym")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(0), size(col("sym")) - 2),
        i => struct(
          element_at(col("sym"), i + 1).as("p1"),
          element_at(col("sym"), i + 2).as("p2")))).as("pr"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(sum(col("freq")).as("cnt"))

  /**
   * Learn up to `numMerges` merges; stops early when no pair repeats.
   * Returns the ordered merge table — apply with [[applyMerges]].
   */
  def learnMerges(docs: DataFrame, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var words = wordTable(docs).persist(MEMORY_AND_DISK)
    words.count()
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    for (_ <- 1 to numMerges if !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("p1"), col("p2"))
        .limit(1)
        .collect() // exactly one row — the learned decision, not data
      top.headOption match {
        case Some(r) =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          val next = words
            .withColumn("sym", mergeOnce(col("sym"), a, b))
            .persist(MEMORY_AND_DISK)
          next.count() // materialize so the previous table can release
          words.unpersist(blocking = false)
          words = next
        case None => done = true
      }
    }
    words.unpersist(blocking = false)
    merges.result()
  }

  /**
   * Tokenize documents with a learned merge table: one row per (doc,
   * word position) with the word's BPE symbol array. Map-only — the
   * merge table folds into `numMerges` chained array rewrites inside
   * one projection; at 100 TB this runs at scan speed (apply to the
   * DISTINCT word table and broadcast-join back when the merge list is
   * long enough to make per-token re-derivation the bottleneck).
   */
  def applyMerges(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val sym = merges.foldLeft(
      filter(split(col("word"), ""), s => length(s) > 0)) {
      case (acc, (a, b)) => mergeOnce(acc, a, b)
    }
    docs
      .select(col("doc"), posexplode(toks(col("line"))).as(Seq("pos", "word")))
      .select(col("doc"), col("pos").cast("long").as("pos"), col("word"),
        sym.as("bpe_symbols"))
  }

  /**
   * The 100 TB variant of [[applyMerges]]: derive symbols once per
   * DISTINCT word and broadcast the word → symbols dictionary back onto
   * the token stream, so a long merge table's fold chain runs |vocab|
   * times instead of |corpus tokens| times. Same output contract.
   */
  def applyMergesViaDict(
      docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val sym = merges.foldLeft(
      filter(split(col("word"), ""), s => length(s) > 0)) {
      case (acc, (a, b)) => mergeOnce(acc, a, b)
    }
    val positions = docs
      .select(col("doc"), posexplode(toks(col("line"))).as(Seq("pos", "word")))
    val dict = positions.select(col("word")).distinct()
      .select(col("word"), sym.as("bpe_symbols"))
    positions
      .join(broadcast(dict), Seq("word"))
      .select(col("doc"), col("pos").cast("long").as("pos"), col("word"),
        col("bpe_symbols"))
  }
}
