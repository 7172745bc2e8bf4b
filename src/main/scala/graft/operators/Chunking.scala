package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence-length preparation for LLM training pipelines: split
 * over-long documents into fixed-token-budget chunks, and pack short
 * documents into fixed-capacity training bins.
 *
 * Both operators take the engine's (doc, line) corpus shape and the O2
 * whitespace tokenizer semantics (reference tokenizer is `\s*\b\s*`,
 * DocWordCount.java:49; on whitespace-separated corpora the two are
 * identical and `\s+` is the cross-engine-stable spelling).
 */
object Chunking {

  private def toks(line: Column): Column =
    filter(split(line, "\\s+"), t => length(t) > 0)

  /**
   * Split each document's token sequence into consecutive chunks of at
   * most `maxTokens` tokens (the context-window splitter). Output:
   * (doc, chunk_id, chunk_text, n_tokens); empty documents emit no
   * chunks; the final chunk of a doc may be short.
   *
   * Scale shape: MAP-ONLY — the token array is materialized once per
   * row and sliced per chunk index; no shuffle, no self-join. At 100 TB
   * this runs at parquet-scan speed and parallelism is the input
   * partitioning. Chunk count per doc is ceil(len/maxTokens), so output
   * row count is bounded by total_tokens/maxTokens + n_docs.
   */
  def chunkDocs(docs: DataFrame, maxTokens: Int = 512): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    docs
      .select(col("doc"), toks(col("line")).as("_toks"))
      .where(size(col("_toks")) > 0)
      .select(col("doc"), col("_toks"),
        size(col("_toks")).cast("long").as("_n"),
        // last chunk index = (n-1) div maxTokens; the double-division
        // cast truncates toward zero, which is floor for n >= 1
        explode(sequence(lit(0L),
          ((size(col("_toks")) - 1) / lit(maxTokens)).cast("long")))
          .as("chunk_id"))
      .select(col("doc"), col("chunk_id"),
        array_join(
          slice(col("_toks"),
            (col("chunk_id") * maxTokens + 1).cast("int"), lit(maxTokens)),
          " ").as("chunk_text"),
        least(col("_n") - col("chunk_id") * maxTokens, lit(maxTokens.toLong))
          .cast("long").as("n_tokens"))
  }

  /**
   * SLIDING-WINDOW chunking with OVERLAP — the RAG-retrieval variant
   * of [[chunkDocs]]: chunks of `size` tokens starting every `stride`
   * tokens, so consecutive chunks share `size − stride` tokens and no
   * retrievable span is ever split across a hard boundary (the reason
   * every embedding-index pipeline chunks with overlap). `stride =
   * size` degenerates to [[chunkDocs]]' disjoint packing.
   *
   * Determinism: chunk starts are the literal arithmetic sequence
   * 0, stride, 2·stride, …; the LAST start is the smallest multiple
   * covering the tail — ⌈(n − size) / stride⌉ as the nonneg integer
   * (n − size + stride − 1) div stride — so every token lands in ≥ 1
   * chunk and no chunk starts past the text. Pure integer arithmetic,
   * map-side explode.
   *
   * Scale shape: map-only (tokenize → explode ≤ ⌈n/stride⌉ rows per
   * doc → slice); the ×(size/stride) token duplication is the
   * DELIBERATE cost of overlap — size it consciously.
   *
   * @return (doc, chunk_id, start_token, chunk_text, n_tokens)
   */
  def chunkSliding(
      docs: DataFrame,
      size: Int = 256,
      stride: Int = 128): DataFrame = {
    require(size > 0, s"size must be positive, got $size")
    require(stride >= 1 && stride <= size,
      s"stride must be in [1, size], got $stride (size $size)")
    docs
      .select(col("doc"), toks(col("line")).as("_toks"))
      .where(org.apache.spark.sql.functions.size(col("_toks")) > 0)
      .select(col("doc"), col("_toks"),
        org.apache.spark.sql.functions.size(col("_toks")).cast("long").as("_n"),
        explode(sequence(lit(0L),
          greatest(lit(0L),
            expr(s"(size(_toks) - $size + $stride - 1) div $stride"))))
          .as("chunk_id"))
      .select(col("doc"), col("chunk_id"),
        (col("chunk_id") * stride).as("start_token"),
        array_join(
          slice(col("_toks"),
            (col("chunk_id") * stride + 1).cast("int"), lit(size)),
          " ").as("chunk_text"),
        least(col("_n") - col("chunk_id") * stride, lit(size.toLong))
          .cast("long").as("n_tokens"))
  }

  /**
   * PACKING EFFICIENCY report — one row grading a [[packSequences]]
   * configuration: pack count, token mass, min/max pack size, the
   * overflow count (packs blown past `targetTokens` by an oversized
   * document — the "chunk first" signal), and the FILL RATE
   * tokens / (packs · target), the fraction of training-batch
   * capacity actually used. Run it before an epoch: a fill rate of
   * 0.7 means 30 % of every step is padding.
   *
   * Determinism: integer counts off the q48 packing, ONE round-6
   * division for the rate.
   *
   * @return one row: n_packs, n_docs, tokens_total, min_tokens,
   *         max_tokens, n_overflow, fill_rate
   */
  def packStats(
      docs: DataFrame,
      targetTokens: Int = 2048,
      buckets: Int = 64): DataFrame =
    packSequences(docs, targetTokens, buckets)
      .groupBy(col("bucket"), col("pack_id"))
      .agg(count(lit(1)).as("_nd"), sum(col("n_tokens")).as("_tk"))
      .agg(
        count(lit(1)).as("n_packs"),
        sum(col("_nd")).as("n_docs"),
        sum(col("_tk")).as("tokens_total"),
        min(col("_tk")).as("min_tokens"),
        max(col("_tk")).as("max_tokens"),
        coalesce(sum(when(col("_tk") > targetTokens, 1L)), lit(0L))
          .as("n_overflow"),
        round(sum(col("_tk")).cast("double") /
          (count(lit(1)) * targetTokens), 6).as("fill_rate"))

  /** Chunk-count bound for [[chunkKey]]: 2^20 chunks per document
    * (a 67M-token document at maxTokens=64) before the composed key
    * would alias — the per-row assert fails loudly at the bound
    * instead of silently corrupting downstream packing. */
  val MaxChunksPerDoc: Long = 1L << 20

  /**
   * Collision-proof single-column key for a (doc, chunk_id) pair from
   * [[chunkDocs]]: `doc * 2^20 + chunk_id`, injective for any integral
   * doc id while chunk_id < [[MaxChunksPerDoc]] (guarded by a
   * codegen'd per-row assert — a longer document fails the job rather
   * than aliasing another document's chunks). Headroom: doc ids up to
   * 2^43 (≈ 8.8e12 documents) before the product leaves the long
   * range. Mirrorable in plain SQL as `doc * 1048576 + chunk_id`.
   */
  def chunkKey(doc: Column, chunkId: Column): Column = {
    val guard = coalesce(assert_true(
      chunkId >= 0 && chunkId < MaxChunksPerDoc,
      concat(lit("chunk_id "), chunkId,
        lit(s" outside [0, $MaxChunksPerDoc) — the composed chunk key " +
          "would alias another document; re-key with a wider bound"))),
      lit(true))
    when(guard, doc.cast("long") * lit(MaxChunksPerDoc) + chunkId.cast("long"))
  }

  /**
   * Pack documents into fixed-capacity training bins by exclusive
   * prefix-sum of token counts: within each bucket, documents (ordered
   * by doc id) are assigned `pack_id = floor(prefix_tokens /
   * targetTokens)` — the streaming offset-packing rule. A document
   * longer than `targetTokens` overflows its pack rather than being
   * split (compose with [[chunkDocs]] first when hard caps are needed).
   *
   * Scale shape: ONE window shuffle partitioned on `bucket` — the
   * running sum never sees more than one bucket per task, so
   * parallelism is `buckets` (size it ≳ cluster cores at 100 TB; the
   * default bucketing expression `doc % buckets` keeps the assignment
   * deterministic and oracle-mirrorable — any deterministic expression
   * works).
   */
  def packSequences(
      docs: DataFrame,
      targetTokens: Int = 2048,
      buckets: Int = 64,
      bucketOf: Option[Column] = None): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive, got $targetTokens")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val bucket = bucketOf.getOrElse(pmod(col("doc"), lit(buckets.toLong)))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc"),
        size(toks(col("line"))).cast("long").as("n_tokens"),
        bucket.cast("long").as("bucket"))
      .withColumn("pack_id",
        (coalesce(sum(col("n_tokens")).over(w), lit(0L)) / lit(targetTokens))
          .cast("long"))
  }

  /**
   * Deterministic EPOCH SHUFFLE — the global reordering every training
   * epoch needs, without a global sort. Each row gets a seeded
   * pseudo-random key h = md5(seed:key) (first 8 hex chars as a 32-bit
   * int), a shard = h mod `numShards`, a within-shard position
   * `seq` = row_number ordered by (h, key), and a training-batch id
   * `batch` = (seq-1) div `batchSize`. A different `seed` is a fresh,
   * statistically independent permutation of the same membership —
   * zero state carried between epochs.
   *
   * Scale shape: `ORDER BY rand()` at 100 TB is a full range exchange
   * (sampled, nondeterministic) plus a corpus-wide sort. This is ONE
   * hash exchange on `shard` and a per-shard local sort of ~N/S rows;
   * size `numShards` to the data-loader worker count (each worker
   * streams its shard in `seq` order), so per-task sorts stay
   * memory-resident. The md5 key makes the shuffle reproducible across
   * retries, speculative tasks, clusters, and engines — the DuckDB
   * oracle replays the identical permutation. Ties in the 32-bit key
   * (expected once corpora pass ~2^16 rows) break on the raw key, so
   * the order stays total.
   */
  def epochShuffle(
      df: DataFrame,
      keyCol: String,
      seed: Int,
      numShards: Int = 1024,
      batchSize: Int = 256): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    Seq("_h", "shard", "seq", "batch").foreach(c =>
      require(!df.columns.contains(c),
        s"'$c' is reserved by epochShuffle — rename that input column"))
    val h = conv(substring(
        md5(concat(lit(s"$seed:"), col(keyCol).cast("string"))), 1, 8),
      16, 10).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(keyCol))
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(numShards.toLong)))
      .withColumn("seq", row_number().over(w).cast("long"))
      // double-division cast truncates toward zero = floor for seq >= 1
      .withColumn("batch",
        ((col("seq") - 1) / lit(batchSize.toLong)).cast("long"))
      .drop("_h")
  }

  /**
   * TRAINING-SHARD EXPORT — the pipeline's terminal sink: the
   * [[epochShuffle]] permutation written as one Hive partition per
   * shard (`shard=K/`, rows sorted by `seq` within each file so a
   * data-loader worker streams its shard in batch order with zero
   * seeks), plus a MANIFEST the run can be audited and reproduced
   * against: per shard the row count and an ORDER-FREE key checksum
   * (sum of each row's 32-bit `"shard:"`-prefixed md5 — commutative,
   * so any execution order / retry / speculative duplicate-free run of
   * the same membership produces the same value; a lost or duplicated
   * row moves it). The manifest is written next to the data
   * (`_manifest/`) and returned.
   *
   * Scale shape: exactly the [[epochShuffle]] exchange (one hash
   * shuffle on the seeded key) — `repartition(shard)` aligns write
   * tasks with shard partitions so each task writes ONE shard file,
   * and the manifest aggregate collapses map-side to `numShards` rows.
   */
  def writeTrainingShards(
      df: DataFrame,
      keyCol: String,
      seed: Int,
      numShards: Int,
      path: String,
      batchSize: Int = 256): DataFrame = {
    val sh = epochShuffle(df, keyCol, seed, numShards, batchSize)
    sh.repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("seq"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val manifest = sh.groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(conv(substring(
            md5(concat(lit("shard:"), col(keyCol).cast("string"))), 1, 8),
          16, 10).cast("long")).as("key_checksum"))
      .select(col("shard"), col("n_rows"), col("key_checksum"))
    manifest.write.mode("overwrite").parquet(s"$path/_manifest")
    manifest
  }

  /**
   * RENDEZVOUS (highest-random-weight) sharding — the RESIZE-STABLE
   * alternative to [[epochShuffle]]'s `hash mod n`: each key's shard is
   * argmax over shards s of hash(key, s). Growing n → n+1 relocates
   * ONLY the keys whose new-shard draw wins — an expected 1/(n+1) of
   * the corpus — where mod-n resharding moves (n−1)/n of EVERYTHING.
   * That stability is what makes shard-keyed incremental state
   * (per-shard caches, dedup fingerprint stores, ANN cells, the
   * [[writeTrainingShards]] layout) survive a capacity change without
   * a full rebuild; it is also the provenance of every "consistent
   * hashing" assignment since Thaler & Ravishankar 1998.
   *
   * MAP-ONLY: the per-row argmax folds the n candidate hashes inside
   * one codegen'd array expression (`array_max` over (h, shard)
   * structs — largest h wins, shard index breaks the impossible tie
   * deterministically); no shuffle, no state, no RNG. Hashes are
   * 60-bit md5 slices under the `"hrw:"` prefix, independent of every
   * other md5 decision in the library and replayable in the oracle.
   * Cost is n md5s per row — fine to the ~1k-shard range; past that,
   * jump consistent hashing (Lamping & Veach 2014) is the O(log n)
   * successor, at the cost of only supporting n-at-the-END resizes.
   *
   * @return input columns + `shard` (0-based)
   */
  def rendezvousShard(
      df: DataFrame,
      keyCol: String,
      numShards: Int): DataFrame = {
    require(numShards > 0 && numShards <= 4096,
      s"numShards must be in [1, 4096], got $numShards")
    require(!df.columns.contains("shard"),
      "'shard' is reserved by rendezvousShard — rename that input column")
    val draws = transform(
      sequence(lit(0), lit(numShards - 1)),
      s => struct(
        conv(substring(md5(concat(
            lit("hrw:"), col(keyCol).cast("string"),
            lit(":"), s.cast("string"))), 1, 15), 16, 10)
          .cast("long").as("h"),
        s.cast("long").as("shard")))
    df.withColumn("shard", array_max(draws).getField("shard"))
  }
}
