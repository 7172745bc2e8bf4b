package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
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
 * Training stops once no pair repeats (top count < `minPairCount`,
 * default 2) — count-1 pairs are one-off noise, not structure.
 *
 * Scale shape — the key fact is that after ONE corpus scan the problem
 * is vocabulary-sized, not corpus-sized: the distinct word-frequency
 * table is a sufficient statistic for every merge decision. Three
 * learners share identical semantics (specs assert table equality):
 *
 *  - [[learnMergesLocal]] — THE PRODUCTION PATH. One distributed
 *    shuffle builds (word, freq); the inherently-sequential merge loop
 *    then runs in-memory on the driver with incremental pair-count
 *    updates (an occurrence index makes each merge O(words containing
 *    the pair), the sentencepiece/HF-tokenizers shape) — minutes for a
 *    32k-merge vocabulary (BASELINE.md: 189 s over 200k distinct
 *    words), not tens of thousands of sequential Spark jobs. A
 *    `maxVocab` guard fails loudly (raise `minWordFreq`,
 *    the standard trainer knob) instead of silently collecting an
 *    unbounded frame. Learning merges is a driver decision loop by
 *    nature — one merge per step, each depending on the last — so
 *    driver-side is the *right* side once the state fits; the
 *    distributed learners exist for vocabularies that genuinely don't.
 *  - [[learnMerges]] with `batchSize > 1` — the distributed loop,
 *    learning up to `batchSize` PROVABLY-INDEPENDENT merges per
 *    pair-count job (see `selectSafeBatch`), cutting the job count
 *    while staying bit-identical to the sequential table. Superseded
 *    rounds' checkpoint blocks release via CheckpointSupport
 *    (Dataset.unpersist no-ops on checkpoint-backed frames).
 *  - [[learnMerges]] with `batchSize = 1` — the reference sequential
 *    loop that defines the semantics.
 */
object Bpe {

  private def toks(line: Column): Column =
    filter(split(line, "\\s+"), t => length(t) > 0)

  /** Greedy left-to-right application of ONE merge (a, b) → a+b to a
    * symbol array, as a fold: merging never looks back past the token
    * it just produced, which is exactly BPE's non-overlapping rule
    * ("aaa" under (a,a) → ["aa", "a"]). */
  private def mergeOnce(sym: Column, a: String, b: String): Column =
    mergeBatchOnce(sym, Seq((a, b)))

  /** One greedy left-to-right scan applying a batch of SYMBOL-DISJOINT
    * merges simultaneously. For disjoint pairs this equals applying
    * each merge in its own scan (no pair can consume another's symbols
    * or chain into its product), so the batch rewrite is exactly the
    * sequential rewrite — the property `selectSafeBatch` guarantees. */
  private def mergeBatchOnce(sym: Column, pairs: Seq[(String, String)]): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) => {
      val append = concat(acc, array(x))
      pairs.foldLeft(append) { case (els, (a, b)) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(els)
      }
    })

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
   * Largest SAFE batch from the sorted top pairs — "safe" meaning the
   * sequential learner would provably pick exactly these pairs, in this
   * order, next. Selection walks candidates in (cnt desc, p1, p2)
   * order, keeping pairs whose symbols are disjoint from every earlier
   * selection, and STOPS at the first interacting candidate: merging
   * (a,b) only changes counts of pairs sharing a or b (they shrink)
   * and creates pairs carrying the new symbol a+b, each bounded by the
   * pre-count of some pair that shares a symbol with the merge — so
   * every count the batch disturbs sits at or below the first
   * interacting candidate's count (`stopCnt`). Truncating the
   * selection to counts STRICTLY above max(stopCnt, horizon) — the
   * horizon covers pairs below the collected window — leaves pairs the
   * disturbed region can never reach, even on ties. Two collision
   * guards keep symbol identity unambiguous: a candidate whose merged
   * string a+b equals an existing learned symbol (e.g. ("a","bc") when
   * ("ab","c") was already learned — both spell "abc") or a
   * batch-local product interacts through string identity, not just
   * shared symbols. If the very first candidate is unsafe the batch
   * degrades to exactly the sequential step (top-1 alone).
   */
  private def selectSafeBatch(
      top: Seq[(String, String, Long)],
      collectedAll: Boolean,
      learnedSymbols: Set[String],
      batchSize: Int,
      minPairCount: Long): Seq[(String, String)] = {
    val eligible = top.takeWhile(_._3 >= minPairCount)
    if (eligible.isEmpty) return Seq.empty
    val horizon = if (collectedAll) 0L else top.last._3
    var touched = Set.empty[String]
    val sel = mutable.ArrayBuffer.empty[(String, String, Long)]
    var stopCnt = -1L
    var full = false
    val it = eligible.iterator
    // Keep scanning after the batch fills: the truncation floor needs
    // the FIRST candidate interacting with a selected merge wherever it
    // sits in the window — exiting at batchSize would miss an
    // interacting pair tied with the last selection, whose derived
    // pairs could win the sequential tie-break (candidates that only
    // interact with other non-selected candidates are irrelevant, so
    // `touched` still grows on selection only).
    while (it.hasNext && stopCnt < 0) {
      val (a, b, c) = it.next()
      val merged = a + b
      if (touched(a) || touched(b) || touched(merged) || learnedSymbols(merged))
        stopCnt = c
      else if (!full) {
        sel += ((a, b, c))
        touched = touched + a + b + merged
        full = sel.size == batchSize
      }
    }
    val floor = math.max(stopCnt, horizon)
    val safe = sel.takeWhile(_._3 > floor).map(t => (t._1, t._2)).toSeq
    if (safe.nonEmpty) safe
    else Seq((eligible.head._1, eligible.head._2)) // exact sequential step
  }

  /**
   * Learn up to `numMerges` merges distributed; stops once the most
   * frequent pair's count drops below `minPairCount` (default 2 — a
   * pair that never repeats is noise, not a merge). Returns the ordered
   * merge table — apply with [[applyMerges]].
   *
   * `batchSize > 1` learns several merges per pair-count job when it is
   * provably safe (see `selectSafeBatch`) — same table, fewer jobs. On
   * natural text safe batches are small (top pairs share common
   * characters), which is why [[learnMergesLocal]] is the production
   * path; this loop is the fallback for vocabularies too large to
   * collect even as (word, freq) pairs.
   */
  def learnMerges(
      docs: DataFrame,
      numMerges: Int,
      batchSize: Int = 8,
      minPairCount: Long = 2): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    // Iterations rewrite `sym` in place, so the logical plan would grow
    // one fold-projection per round — after a few hundred merges the
    // accumulated plan alone exhausts driver memory (persist caches
    // blocks but does NOT truncate lineage). localCheckpoint is the
    // lineage-truncation tool for iterative algorithms: each round's
    // table materializes eagerly and the next plan starts from its
    // blocks. (On a real cluster with executor churn, swap for
    // reliable `checkpoint` against the checkpoint dir — same shape.)
    var words = wordTable(docs).localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var learnedSymbols = Set.empty[String]
    var learned = 0
    var done = false
    while (learned < numMerges && !done) {
      val want = math.min(batchSize, numMerges - learned)
      // Collect a window past the batch size so truncation has slack;
      // +1 detects whether the window covered every pair.
      val windowSize = math.max(want * 4, 16) + 1
      val window = pairCounts(words)
        .orderBy(col("cnt").desc, col("p1"), col("p2"))
        .limit(windowSize)
        .collect() // ≤ windowSize tiny rows — learner decisions, not data
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq
      val batch = selectSafeBatch(
        window.take(windowSize - 1), window.length < windowSize,
        learnedSymbols, want, minPairCount)
      if (batch.isEmpty) done = true
      else {
        merges ++= batch
        learned += batch.length
        learnedSymbols ++= batch.map { case (a, b) => a + b }
        val next = words
          .withColumn("sym", mergeBatchOnce(col("sym"), batch))
          .localCheckpoint(true) // eager: lineage truncates per round
        // Dataset.unpersist is a silent no-op on checkpoint-backed
        // frames — release the superseded round's RDD blocks explicitly
        org.apache.spark.sql.graft.CheckpointSupport.releaseLocalCheckpoint(words)
        words = next
      }
    }
    org.apache.spark.sql.graft.CheckpointSupport.releaseLocalCheckpoint(words)
    merges.result()
  }

  /** Code-point-wise string comparison matching Spark's UTF8String
    * binary order (UTF-8 byte order = code-point order; Java's
    * String.compareTo differs for supplementary characters). */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.codePoints().toArray
    val b = y.codePoints().toArray
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    a.length < b.length
  }

  /** Greedy left-to-right single-merge rewrite — the local twin of the
    * `mergeOnce` column fold, kept in lockstep (BpeSpec asserts the
    * learners agree, which exercises this equivalence every merge). */
  private def mergeOnceLocal(s: Array[String], a: String, b: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    for (x <- s) {
      if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
      else out += x
    }
    out.toArray
  }

  /**
   * The PRODUCTION learner: distributed word counting, in-memory merge
   * loop. One shuffle builds the distinct (word, freq) table — the
   * sufficient statistic for BPE, bounded by vocabulary size however
   * large the corpus — which is collected (guarded by `maxVocab`) and
   * trained with incremental pair-count maintenance: an occurrence
   * index makes each merge cost O(words containing the pair), so 32k
   * merges over a multi-million-word vocabulary run in seconds instead
   * of 32k Spark jobs. `minWordFreq` prunes hapax words before
   * collecting (the standard trainer knob — raise it when `maxVocab`
   * trips). Identical table to [[learnMerges]] by construction: same
   * counts, same (cnt desc, p1, p2) tie-break in UTF-8 order, same
   * greedy rewrite, same `minPairCount` stop.
   */
  def learnMergesLocal(
      docs: DataFrame,
      numMerges: Int,
      minPairCount: Long = 2,
      minWordFreq: Long = 1,
      maxVocab: Int = 4 << 20): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val rows = wordTable(docs)
      .where(col("freq") >= minWordFreq)
      .select(col("word"), col("freq"))
      .limit(maxVocab + 1)
      .collect()
    require(rows.length <= maxVocab,
      s"vocabulary exceeds maxVocab=$maxVocab distinct words — raise " +
        "minWordFreq (hapax pruning) or fall back to the distributed " +
        "learnMerges loop")
    val freq = rows.map(_.getLong(1))
    val syms: Array[Array[String]] =
      rows.map(_.getString(0).split("").filter(_.nonEmpty))

    val pairCnt = mutable.HashMap.empty[(String, String), Long]
    // Occurrence index: pair → word indices that (may) contain it.
    // Append-only compact buffers, NOT dense bitsets — late-stage pairs
    // are nearly word-unique, and a sparse set that allocates by
    // highest index would cost GBs across millions of pair keys.
    // Entries go stale as words rewrite (tolerated: processing
    // re-checks adjacency); membership is appended only for pairs the
    // rewrite NEWLY introduced, so total appends over the whole run are
    // O(Σ word length), not O(rewrites × word length).
    val occ = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Int]]
    def distinctPairs(s: Array[String]): mutable.LinkedHashSet[(String, String)] = {
      val out = mutable.LinkedHashSet.empty[(String, String)]
      var j = 0
      while (j < s.length - 1) { out += ((s(j), s(j + 1))); j += 1 }
      out
    }
    val dirty = mutable.LinkedHashSet.empty[(String, String)]
    def bumpCounts(s: Array[String], delta: Long): Unit = {
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = pairCnt.getOrElse(p, 0L) + delta
        if (c == 0L) pairCnt.remove(p) else pairCnt(p) = c
        dirty += p
        j += 1
      }
    }
    syms.indices.foreach { i =>
      bumpCounts(syms(i), freq(i))
      distinctPairs(syms(i)).foreach(p =>
        occ.getOrElseUpdate(p, mutable.ArrayBuffer.empty[Int]) += i)
    }

    val pairLt: ((String, String), (String, String)) => Boolean = {
      case ((x1, x2), (y1, y2)) =>
        if (x1 != y1) utf8Lt(x1, y1) else utf8Lt(x2, y2)
    }
    // Best-pair selection is a lazy-invalidation priority queue (the
    // classic trainer structure): a linear scan of the pair map per
    // merge would be O(live pairs) ≈ millions at vocabulary scale.
    // Entries snapshot (pair, count-at-push); a popped entry whose
    // snapshot no longer matches the live count is stale and dropped —
    // every count change re-pushes a fresh entry (one per touched pair
    // per merge, via the `dirty` set), so the true maximum is always
    // present. Ties order by (p1, p2) ascending in UTF-8 order.
    implicit val entryOrd: Ordering[((String, String), Long)] =
      (x: ((String, String), Long), y: ((String, String), Long)) => {
        if (x._2 != y._2) java.lang.Long.compare(x._2, y._2)
        else if (x._1 == y._1) 0
        else if (pairLt(x._1, y._1)) 1 // smaller pair = higher priority
        else -1
      }
    val pq = mutable.PriorityQueue.empty[((String, String), Long)]
    pairCnt.foreach { case (p, c) => pq.enqueue((p, c)) }
    dirty.clear()

    val merges = Seq.newBuilder[(String, String)]
    var learned = 0
    var done = false
    while (learned < numMerges && !done) {
      var best: (String, String) = null
      while (best == null && !done) {
        if (pq.isEmpty) done = true
        else {
          val (p, snap) = pq.dequeue()
          if (pairCnt.getOrElse(p, 0L) == snap) { // fresh entry
            if (snap < minPairCount) done = true // true max below floor
            else best = p
          } // else stale — a fresher entry for p is queued (or p died)
        }
      }
      if (!done) {
        val (a, b) = best
        merges += best
        learned += 1
        // occurrence lists go stale as words rewrite — re-check each
        for (i <- occ.remove(best).getOrElse(mutable.ArrayBuffer.empty[Int])) {
          val s = syms(i)
          var hit = false
          var j = 0
          while (!hit && j < s.length - 1) {
            hit = s(j) == a && s(j + 1) == b; j += 1
          }
          if (hit) {
            val ns = mergeOnceLocal(s, a, b)
            bumpCounts(s, -freq(i))
            bumpCounts(ns, freq(i))
            val before = distinctPairs(s)
            distinctPairs(ns).foreach(p =>
              if (!before.contains(p))
                occ.getOrElseUpdate(p, mutable.ArrayBuffer.empty[Int]) += i)
            syms(i) = ns
          }
        }
        dirty.foreach(p => pairCnt.get(p).foreach(c => pq.enqueue((p, c))))
        dirty.clear()
      }
    }
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
   * DISTINCT word and join the word → symbols dictionary back onto the
   * token stream, so a long merge table's fold chain runs |vocab| times
   * instead of |corpus tokens| times. Same output contract. The
   * dictionary joins as a BROADCAST by default (natural-language
   * vocabularies are tens of MB); pass `broadcastDict = false` for
   * degenerate vocabularies past the broadcast/driver-memory threshold
   * — the join then shuffles on `word`, one exchange of the token
   * stream (the [[Vocab.encodeTokens]] contract).
   */
  def applyMergesViaDict(
      docs: DataFrame,
      merges: Seq[(String, String)],
      broadcastDict: Boolean = true): DataFrame = {
    val sym = merges.foldLeft(
      filter(split(col("word"), ""), s => length(s) > 0)) {
      case (acc, (a, b)) => mergeOnce(acc, a, b)
    }
    val positions = docs
      .select(col("doc"), posexplode(toks(col("line"))).as(Seq("pos", "word")))
    val dict = positions.select(col("word")).distinct()
      .select(col("word"), sym.as("bpe_symbols"))
    positions
      .join(if (broadcastDict) broadcast(dict) else dict, Seq("word"))
      .select(col("doc"), col("pos").cast("long").as("pos"), col("word"),
        col("bpe_symbols"))
  }
}
