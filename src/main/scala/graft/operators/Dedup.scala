package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Training-data deduplication operators (builder-prompt extension surface;
 * SURVEY.md §7.4). All operate on a (doc, line) corpus — `doc` any type,
 * `line` the document text.
 *
 * Scale design notes (100 TB):
 *  - Exact dedup is a single hash-shuffle on a 32-byte fingerprint — the
 *    cheapest possible key; partial aggregation collapses duplicates
 *    map-side before the shuffle.
 *  - MinHash+LSH never builds the O(n²) pair space: candidates come from a
 *    shuffle on (band, bandValue) buckets, so cost is O(sum of bucket²)
 *    which is proportional to true near-duplicates. Signatures are k
 *    minima of a two-seed universal hash family sliced from ONE md5 per
 *    shingle — deterministic and engine-portable (no JVM-specific hashing
 *    in the contract surface), computed in a single groupBy(doc) pass.
 *  - SimHash is one pass: per-(doc,term) counts → width-parameterized
 *    conditional sums → a 16/32-bit fingerprint; Hamming-ball pairing is
 *    a 4-band sub-key equi-join (pigeonhole-exact for hamming ≤ 3).
 *  - n-gram Jaccard is the exact (verification) tier: shingle join +
 *    group-count; only ever run on candidate pairs at scale.
 */
object Dedup {

  /** Whitespace token array with empties removed (corpus-safe on both the
    * engine and oracle side — see SparkEntry tokenizer note). */
  def tokensCol(line: Column): Column =
    filter(split(line, "\\s+"), t => length(t) > 0)

  /** Word n-gram shingle array (distinct), empty when the doc has < n
    * tokens (guard needed: Spark `sequence(a, b)` is descending for b<a). */
  def shinglesCol(line: Column, n: Int): Column = {
    val toks = tokensCol(line)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => array_join(slice(toks, i + 1, lit(n)), " ")
    )
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** (doc, shingle) — distinct word n-grams per document, emitted by the
    * single-pass `WordShingles` generator (the HOF route in `shinglesCol`
    * is kept for column-level composition; same semantics). */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc"),
      org.apache.spark.sql.graft.ShingleFunctions
        .wordShingles(tokensCol(col("line")), n).as("shingle"))

  /**
   * Exact duplicate groups: md5(text) fingerprint → (fp, n_dups, keeper).
   * Keeper = min(doc) is the deterministic survivor choice.
   */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("line")).as("fp"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc")).as("keeper"))

  /** Corpus with exact duplicates removed (keeper row survives). */
  def exactDedup(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("line"))).orderBy(col("doc"))
    docs.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /**
   * Incremental exact dedup — the daily-increment path: drop new docs
   * whose payload fingerprint already exists in `seenFps` (a single
   * `fp` column of md5 hex, e.g. persisted from `exactGroups`). A hash
   * anti-join on the 32-byte key: broadcastable when the seen set is a
   * day's delta, shuffle-partitioned when it is the full history. Note
   * this does NOT dedup `newDocs` against itself — compose with
   * `exactDedup` first when the increment may carry internal dups.
   */
  def exactDedupAgainst(newDocs: DataFrame, seenFps: DataFrame): DataFrame =
    newDocs.join(seenFps.select(col("fp")),
      md5(col("line")) === col("fp"), "left_anti")

  /**
   * Bloom-screened incremental exact dedup — same answer as
   * [[exactDedupAgainst]], engineered for a corpus-scale history. A
   * Bloom filter over the history's xxhash64 fingerprints rides to the
   * executors inside a codegen'd probe
   * ([[org.apache.spark.sql.graft.BloomMightContainLong]]); delta rows
   * the filter rules out are DEFINITELY unseen (no false negatives) and
   * skip the history join entirely, so only the maybe-seen fraction —
   * true dups plus an fpp-sized sliver of false positives — shuffles
   * against the 100 TB fingerprint store. The exact md5 anti-join then
   * removes both real dups and the false positives, which is why the
   * result is bit-identical to the plain path for ANY fpp.
   *
   * Sizing (in code, not doc): optimal bits ≈ -n·ln(fpp)/ln²2 — 1e9
   * history fps at 3 % is ~0.9 GB, the practical broadcast ceiling.
   * Past that, keep `expectedItems` honest and raise `fpp` (the screen
   * degrades gracefully: more rows take the confirm join), or fall back
   * to [[exactDedupAgainst]]. `expectedItems <= 0` sizes from a history
   * count() — fine when the history is a stats-backed table, one extra
   * scan otherwise; production callers pass their known cardinality.
   */
  def exactDedupAgainstBloom(
      newDocs: DataFrame,
      historyDocs: DataFrame,
      expectedItems: Long = -1L,
      fpp: Double = 0.03): DataFrame = {
    val probed = bloomProbe(newDocs, historyDocs, expectedItems, fpp)
    val definitelyNew = probed.where(!col("_maybe_seen")).drop("_maybe_seen")
    val confirmed = exactDedupAgainst(
      probed.where(col("_maybe_seen")).drop("_maybe_seen"),
      historyDocs.select(md5(col("line")).as("fp")))
    definitelyNew.unionByName(confirmed)
  }

  /** Audit twin for the Bloom screen (the [[lshSkippedBuckets]]
    * contract applied here): 1-row (n_definitely_new, n_maybe_seen) —
    * how much of the delta the sketch ruled out vs sent to the confirm
    * join. An operator that silently degrades (fpp too high, sketch
    * undersized) shows up as n_maybe_seen ≈ the whole delta. */
  def bloomScreenStats(
      newDocs: DataFrame,
      historyDocs: DataFrame,
      expectedItems: Long = -1L,
      fpp: Double = 0.03): DataFrame =
    bloomProbe(newDocs, historyDocs, expectedItems, fpp)
      .agg(
        count(when(!col("_maybe_seen"), 1)).as("n_definitely_new"),
        count(when(col("_maybe_seen"), 1)).as("n_maybe_seen"))

  /** Delta rows tagged `_maybe_seen` by a Bloom sketch of the history's
    * xxhash64 fingerprints (shared by the dedup path and its audit twin). */
  /** Serialized Bloom filter over a single long `h` column —
    * treeAggregate of partial sketches (what stat.bloomFilter runs
    * underneath, minus its NPE on a zero-row frame): per-partition
    * filters merged pairwise, an empty input yields the empty filter —
    * every probe then screens as definitely-new, correctly. Shared by
    * the dedup screen and the streaming novelty screen. */
  private[graft] def bloomBytesOf(
      hashes: DataFrame,
      expectedItems: Long,
      fpp: Double): Array[Byte] = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    import org.apache.spark.util.sketch.BloomFilter
    val n = if (expectedItems > 0) expectedItems else math.max(1L, hashes.count())
    val bloom = hashes.rdd.treeAggregate(BloomFilter.create(n, fpp))(
      (f, row) => { f.putLong(row.getLong(0)); f },
      (a, b) => { a.mergeInPlace(b); a })
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  private def bloomProbe(
      newDocs: DataFrame,
      historyDocs: DataFrame,
      expectedItems: Long,
      fpp: Double): DataFrame = {
    val bytes = bloomBytesOf(
      historyDocs.select(xxhash64(col("line")).as("h")), expectedItems, fpp)
    newDocs.withColumn("_maybe_seen",
      org.apache.spark.sql.graft.BloomFunctions
        .mightContainLong(xxhash64(col("line")), bytes))
  }

  /** Modulus for the k-min hash family — smallest prime > 2^32, so the
    * mixed values stay well inside a signed 64-bit long. */
  val MinhashPrime = 4294967311L

  /**
   * Band-shape sizing rule, in code: with b bands of r rows the LSH
   * S-curve's inflection sits at (1/b)^(1/r), so pick the divisor r of
   * `numHashes` whose threshold lands nearest the target Jaccard.
   * Returns (bands, rowsPerBand). The historical 16-hash/4×4 contract
   * (threshold ≈ 0.71) stays available by passing rowsPerBand
   * explicitly; this helper is for callers sizing a new corpus.
   */
  def deriveBandShape(numHashes: Int = 16, threshold: Double = 0.5): (Int, Int) = {
    require(numHashes > 0 && threshold > 0 && threshold < 1,
      s"need numHashes > 0 and threshold in (0,1), got $numHashes, $threshold")
    val r = (1 to numHashes).filter(numHashes % _ == 0).minBy { r =>
      math.abs(math.pow(1.0 / (numHashes / r), 1.0 / r) - threshold)
    }
    (numHashes / r, r)
  }

  /**
   * SimHash width sizing rule, in code: a `bits`-bit fingerprint space
   * saturates once the corpus is large enough that unrelated documents
   * collide inside the hamming ball by volume alone (~n²·V(ball)/2^bits
   * random collisions; V(ball, r=3) ≈ 700 at 16 bits). Use 16 bits only
   * for small corpora; 32 bits past ~4k docs.
   */
  def deriveSimhashBits(nDocs: Long): Int = if (nDocs <= 4096L) 16 else 32

  /**
   * MinHash signatures, single-pass: ONE wide row per doc with k min
   * columns m0..m{k-1}. Per shingle, md5 is computed ONCE and sliced into
   * two 32-bit ints (b1, b2); hash_k = (b1 + (k+1)·b2) mod P is the
   * classic two-seed universal family, so the k minima come from k cheap
   * arithmetic expressions inside a single `groupBy(doc)` — no row
   * inflation, no shuffle of a k×-exploded table (the previous shape
   * 16×-exploded the shingle table and was 36% of the round-1 bench).
   */
  def minhashSignatures(sh: DataFrame, numHashes: Int = 16): DataFrame = {
    val h = md5(col("shingle"))
    val prepared = sh.select(
      col("doc"),
      conv(substring(h, 1, 8), 16, 10).cast("long").as("b1"),
      conv(substring(h, 9, 8), 16, 10).cast("long").as("b2"))
    val mins = (0 until numHashes).map { k =>
      min((col("b1") + lit((k + 1).toLong) * col("b2")) % MinhashPrime).as(s"m$k")
    }
    prepared.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
  }

  /**
   * LSH banding over wide signatures: explode each doc's row into
   * numHashes/rowsPerBand (band, band_val) rows, band value = concat of
   * that band's minima. Docs sharing any (band, bandValue) are candidate
   * pairs. Pure projection — no shuffle (the previous shape re-grouped a
   * (doc, seed) table).
   */
  def lshBands(sig: DataFrame, numHashes: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand ($rowsPerBand) — " +
        "a trailing partial band would silently drop the last minima from banding")
    val bandStructs = (0 until numHashes / rowsPerBand).map { b =>
      struct(
        lit(b.toLong).as("band"),
        concat_ws(",",
          (0 until rowsPerBand).map(i => col(s"m${b * rowsPerBand + i}")): _*
        ).as("band_val"))
    }
    sig.select(col("doc"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc"), col("bb.band").as("band"), col("bb.band_val").as("band_val"))
  }

  /**
   * Hot-bucket guard bound for pair-generating joins: a bucket of m docs
   * costs O(m²) pairs in the self-join, so one degenerate bucket (all-
   * identical boilerplate) above this size would become the straggler
   * task of the whole stage at 100 TB. Buckets larger than this are
   * EXCLUDED from candidate pairing (their members are exact/near-exact
   * dup families — `exactDedup`/`minhashDedup` handle them in O(m)); the
   * skip is observable via `lshSkippedBuckets` and the
   * `graft_lsh_bucket_guard` observe metric, and the oracle SQL mirrors
   * the same bound, so both engines agree by construction.
   */
  val MaxPairBucket = 1000

  /** Bucket sizes over the banded table — shared by the guard filter and
    * its audit twin. */
  private def bucketSizes(bands: DataFrame): DataFrame =
    bands.groupBy(col("band"), col("band_val")).agg(count(lit(1)).as("bucket_n"))

  /** Audit twin of the hot-bucket guard: the (band, band_val, bucket_n)
    * buckets `lshCandidates` skipped at this bound. */
  def lshSkippedBuckets(bands: DataFrame, maxBucketSize: Int = MaxPairBucket): DataFrame =
    bucketSizes(bands).where(col("bucket_n") > maxBucketSize)

  /** Candidate pairs from shared LSH buckets (d1 < d2, distinct), with
    * buckets above `maxBucketSize` excluded (see `MaxPairBucket`). The
    * ok-bucket list broadcasts while it fits (the verified plan at test
    * scale); past the broadcast threshold it shuffles on the same
    * (band, band_val) key as the pair join, so the exchange is shared.
    * The skip count is emitted as a `graft_lsh_bucket_guard` plan
    * metric — not stdout. */
  /** Plan-unique suffix for observe() metric names (Spark requires
    * distinct CollectMetrics names within one query plan, and an
    * operator may legitimately appear twice in a composed plan). */
  private val obsId = new java.util.concurrent.atomic.AtomicInteger()

  def lshCandidates(bands: DataFrame, maxBucketSize: Int = MaxPairBucket): DataFrame = {
    val ok = bucketSizes(bands)
      .observe(s"graft_lsh_bucket_guard_${obsId.incrementAndGet()}",
        sum(when(col("bucket_n") > maxBucketSize, lit(1L)).otherwise(lit(0L)))
          .as("skipped_buckets"),
        sum(when(col("bucket_n") > maxBucketSize, col("bucket_n")).otherwise(lit(0L)))
          .as("skipped_band_rows"))
      .where(col("bucket_n") <= maxBucketSize)
      .select(col("band"), col("band_val"))
    val bounded = bands.join(ok, Seq("band", "band_val"))
    val a = bounded.select(col("doc").as("d1"), col("band"), col("band_val"))
    val b = bounded.select(col("doc").as("d2"), col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .where(col("d1") < col("d2"))
      .select(col("d1"), col("d2"))
      .distinct()
  }

  /** Exact Jaccard for given pairs, from the shingle table. */
  def jaccardFor(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    val s1 = sh.select(col("doc").as("d1"), col("shingle"))
    val s2 = sh.select(col("doc").as("d2"), col("shingle"))
    val inter = pairs
      .join(s1, "d1").join(s2, Seq("d2", "shingle"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "d1").withColumnRenamed("sz", "sz1"), "d1")
      .join(sizes.withColumnRenamed("doc", "d2").withColumnRenamed("sz", "sz2"), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /**
   * Full MinHash+LSH near-dup pipeline: shingle → sign → band → bucket-join
   * → exact-Jaccard verify ≥ threshold.
   *
   * The shingle table feeds four sub-plans (signatures, both sides of the
   * candidate verify join, sizes); persisting it turns those into one
   * tokenize+shingle pass instead of four. MEMORY_AND_DISK: shingles are
   * ~linear in corpus size, spillable, never driver-collected.
   *
   * FAILS LOUDLY at construction unless a [[graft.Caching.scoped]]
   * block is open: the shingle and band persists are corpus-scale and
   * outlive the method — only the caller's scope can release them.
   */
  def minhashNearDups(
      docs: DataFrame,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    graft.Caching.requireScope("Dedup.minhashNearDups")
    val sh = graft.Caching.persist(shingles(docs, n))
    // bands persists too: the candidate self-join reads it twice
    val bands = graft.Caching.persist(
      lshBands(minhashSignatures(sh, numHashes), numHashes, rowsPerBand))
    jaccardFor(lshCandidates(bands), sh).where(col("jaccard") >= threshold)
  }

  /**
   * Sorted-neighborhood near-dup pairs (SNM) — the SORT-based blocking
   * alternative to [[minhashNearDups]]' hash banding: order the corpus
   * by (line, doc), pair every row with its `window` successors in that
   * order, then run the SAME exact-Jaccard verify. Candidates are
   * O(N·window) BY CONSTRUCTION — no bucket can blow up, which is the
   * guarantee LSH needs its hot-bucket guard for; the trade is recall
   * shape: SNM sees exactly the near-dups that sort near each other
   * (exact dups and shared-prefix edits always do; a first-token edit
   * can teleport a doc across the order and is invisible here, where
   * MinHash still catches it). Run both and union for belt-and-braces
   * dedup sweeps.
   *
   * Scale shape: the global order comes from [[Ranking.withGlobalRank]]
   * (range-partitioned two-stage rank, never a single-partition
   * window); neighbor candidates form by an equi-join on the rank
   * block ⌊rn/window⌋ with the right side replicated to its own and
   * its predecessor block — pairs at rank distance ≤ window live in
   * the same or adjacent blocks, so the join is complete and shuffles
   * ~2 rows per input row. The verify re-joins the shingle table
   * exactly as q13's pipeline does.
   */
  def sortedNeighborhoodPairs(
      docs: DataFrame,
      window: Int = 8,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val ranked = Ranking.withGlobalRank(
      docs.select(col("doc"), col("line")),
      Seq(col("line"), col("doc")),
      rankCol = "rn",
      errorHint = "re-run sortedNeighborhoodPairs, or checkpoint its input")
    val w = window.toLong
    val blk = (col("rn") / w).cast("long")
    val a = ranked.select(col("doc").as("d1"), col("rn").as("rn1"),
      blk.as("blk"))
    val b = ranked.select(col("doc").as("d2"), col("rn").as("rn2"),
      explode(array(blk, blk - 1)).as("blk"))
    val cand = a.join(b, "blk")
      .where((col("rn2") - col("rn1")).between(lit(1L), lit(w)))
      .select(col("d1"), col("d2"))
    jaccardFor(cand, shingles(docs, n)).where(col("jaccard") >= threshold)
  }

  /**
   * Signature-only Jaccard ESTIMATE for LSH candidate pairs — the
   * verify stage that never re-touches shingles: the fraction of
   * matching signature minima is an unbiased Jaccard estimator
   * (E[est] = J, σ = √(J(1−J)/numHashes) — Broder's classic MinHash
   * property), so thresholding candidates needs only the two wide
   * signature rows (numHashes longs each, ~256 B/pair) instead of the
   * shingle re-intersection [[minhashNearDups]] pays. At 100 TB the
   * difference is a 16-long broadcast-or-shuffle join against the
   * persisted signature state vs re-reading the token-scale shingle
   * table twice per verify; the estimator's error is PINNED by the
   * q102b contract against exact Jaccard on the same pairs, not
   * trusted.
   *
   * @param threshold keep pairs with est ≥ threshold (0 keeps all
   *        candidates)
   * @return (d1, d2, est) for guarded LSH candidate pairs
   */
  def minhashJaccardEstimates(
      docs: DataFrame,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.0,
      maxBucketSize: Int = MaxPairBucket,
      precomputedShingles: Option[DataFrame] = None): DataFrame = {
    // signatures persist: bands, and both sides of the estimate join,
    // all read the same wide rows
    val sig = graft.Caching.persist(minhashSignatures(
      precomputedShingles.getOrElse(shingles(docs, n)), numHashes))
    val cand = lshCandidates(lshBands(sig, numHashes, rowsPerBand), maxBucketSize)
    val s1 = sig.select(
      col("doc").as("d1") +: (0 until numHashes).map(k => col(s"m$k").as(s"a$k")): _*)
    val s2 = sig.select(
      col("doc").as("d2") +: (0 until numHashes).map(k => col(s"m$k").as(s"b$k")): _*)
    val matches = (0 until numHashes)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(s1, "d1").join(s2, "d2")
      .withColumn("est", round(matches / lit(numHashes.toDouble), 6))
      .where(col("est") >= threshold)
      .select(col("d1"), col("d2"), col("est"))
  }

  /**
   * Incremental NEAR-dup screen — the daily-ingest twin of
   * [[exactDedupAgainst]]: find new documents whose MinHash bands
   * collide with the HISTORY corpus, verified by exact Jaccard ≥
   * `threshold` across the two shingle sets. Returns (doc, hist_doc,
   * jaccard) matches; left_anti-join `doc` to admit only novel
   * arrivals. Does NOT screen `newDocs` against itself — compose with
   * [[minhashDedup]] for intra-batch near-dups.
   *
   * Scale shape: the candidate join is delta-bands ⋈ history-bands on
   * (band, band_val) — never a self-join; in production the history
   * side is persisted signature/band state that is appended, not
   * recomputed. The hot-bucket guard bounds the HISTORY buckets (a
   * degenerate boilerplate bucket there is the straggler risk, and at
   * 100 TB history dwarfs any delta); skipped buckets are observable
   * via [[lshSkippedBuckets]] on the history bands.
   */
  def minhashNearDupsAgainst(
      newDocs: DataFrame,
      historyDocs: DataFrame,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      maxBucketSize: Int = MaxPairBucket,
      precomputedNewShingles: Option[DataFrame] = None,
      precomputedHistShingles: Option[DataFrame] = None,
      precomputedNewBands: Option[DataFrame] = None,
      precomputedHistBands: Option[DataFrame] = None): DataFrame = {
    require(threshold > 0 && threshold < 1,
      s"threshold must be in (0,1), got $threshold")
    // corpus-scale shingle/band persists outlive the method (a caller
    // passing every precomputed frame registers none, but the scope
    // requirement stays unconditional — one contract, not four).
    graft.Caching.requireScope("Dedup.minhashNearDupsAgainst")
    val shNew = precomputedNewShingles.getOrElse(
      graft.Caching.persist(shingles(newDocs, n)))
    val shHist = precomputedHistShingles.getOrElse(
      graft.Caching.persist(shingles(historyDocs, n)))
    val bNew = precomputedNewBands.getOrElse(
      lshBands(minhashSignatures(shNew, numHashes), numHashes, rowsPerBand))
    val bHist = precomputedHistBands.getOrElse(graft.Caching.persist(
      lshBands(minhashSignatures(shHist, numHashes), numHashes, rowsPerBand)))
    val okBuckets = bHist
      .groupBy(col("band"), col("band_val"))
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") <= maxBucketSize)
      .select(col("band"), col("band_val"))
    // The guard restricts the HISTORY side BEFORE the candidate join
    // (the lshCandidates bounded-bands shape) — applied after, the
    // degenerate-bucket expansion would only be avoided if Catalyst
    // happened to push the semi join below the inner join.
    val boundedHist = bHist
      .join(okBuckets, Seq("band", "band_val"), "left_semi")
      .select(col("doc").as("hist_doc"), col("band"), col("band_val"))
    val cand = bNew
      .join(boundedHist, Seq("band", "band_val"))
      .select(col("doc"), col("hist_doc"))
      .distinct()
    val szNew = shNew.groupBy(col("doc")).agg(count(lit(1)).as("sz_new"))
    val szHist = shHist.groupBy(col("doc")).agg(count(lit(1)).as("sz_hist"))
    cand
      .join(shNew, Seq("doc"))
      .join(shHist.select(col("doc").as("hist_doc"), col("shingle")),
        Seq("hist_doc", "shingle"))
      .groupBy(col("doc"), col("hist_doc")).agg(count(lit(1)).as("i"))
      .join(szNew, Seq("doc"))
      .join(szHist.select(col("doc").as("hist_doc"), col("sz_hist")),
        Seq("hist_doc"))
      .where(col("i") / (col("sz_new") + col("sz_hist") - col("i")) >= threshold)
      .select(col("doc"), col("hist_doc"),
        round(col("i") / (col("sz_new") + col("sz_hist") - col("i")), 6)
          .as("jaccard"))
  }

  /**
   * Production near-dup DEDUP pass: a document survives iff no LSH bucket
   * it belongs to contains a smaller doc id. This is one step of
   * min-label propagation over the implicit candidate graph — a
   * duplicate cluster of m documents costs O(m) bucket rows, never the
   * O(m²) pairs `minhashNearDups` materializes (that tier is for
   * verification/analytics; this one is what runs over 100 TB).
   *
   * Semantics notes: buckets are UNVERIFIED candidates, so a false-
   * positive collision can drop a non-duplicate (tune numHashes /
   * rowsPerBand); transitive chains keep only one hop's worth of
   * context (full closure would iterate). Documents too short to shingle
   * produce no buckets and always survive.
   */
  def minhashDedup(
      docs: DataFrame,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val bands = lshBands(
      minhashSignatures(shingles(docs, n), numHashes), numHashes, rowsPerBand)
    val bucketMin = bands
      .groupBy(col("band"), col("band_val"))
      .agg(min(col("doc")).as("bucket_min"))
    val dropped = bands
      .join(bucketMin, Seq("band", "band_val"))
      .groupBy(col("doc"))
      .agg(min(col("bucket_min")).as("keeper"))
      .where(col("keeper") < col("doc"))
      .select(col("doc"))
    docs.join(dropped, Seq("doc"), "left_anti")
  }

  /**
   * Transitive-closure near-dup dedup: bounded-iteration min-label
   * propagation (connected components) over the doc ↔ LSH-bucket
   * bipartite graph. `minhashDedup` is ONE hop of this — a chain
   * A ~ B ~ C where A and C share no bucket (and the bridge B carries
   * the largest id) keeps 2 survivors there; iterating collapses every
   * chain to its component's minimum id.
   *
   * Each iteration costs two grouped shuffles (bucket-min of labels,
   * then doc-min of propagated labels) over the SAME persisted bands
   * table — the standard large-scale label-propagation recipe. Labels
   * only ever decrease, so a fixpoint needs at most the graph diameter;
   * real dup chains are short (maxIter = 3 covers diameter-6 doc chains
   * since each iteration crosses doc→bucket→doc). Labels persist per
   * iteration so the lineage stays linear, not 2^iter.
   */
  def minhashDedupIterative(
      docs: DataFrame,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      maxIter: Int = 3): DataFrame = {
    val labels = minhashClusterLabels(docs, n, numHashes, rowsPerBand, maxIter)
    val dropped = labels.where(col("lbl") < col("doc")).select(col("doc"))
    docs.join(dropped, Seq("doc"), "left_anti")
  }

  /**
   * The label frame behind [[minhashDedupIterative]]: (doc, lbl) for
   * every doc that produced at least one LSH bucket, where `lbl` is the
   * component-minimum doc id after `maxIter` min-label iterations.
   * Docs with no shingles have no buckets and are ABSENT — they are
   * singletons by construction (callers coalesce `lbl` to `doc`).
   * Exposed because the cluster identity itself is an operator input:
   * leakage-safe splitting keys the train/val decision on `lbl` so a
   * near-dup cluster never straddles the split.
   */
  def minhashClusterLabels(
      docs: DataFrame,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      maxIter: Int = 3,
      precomputedBands: Option[DataFrame] = None): DataFrame = {
    // `precomputedBands` lets a composition that ALSO consumes the band
    // frame (e.g. the q87b leakage audit: split + candidate pairs) share
    // one persisted derivation instead of paying shingles→signatures→
    // bands twice; the caller owns that frame's lifecycle.
    // The band + final-label persists outlive the method: scope required
    // (transitively covers minhashDedupIterative / leakageSafeSplit /
    // kFoldSplit, whose label caches these are).
    graft.Caching.requireScope("Dedup.minhashClusterLabels")
    val bands = precomputedBands.getOrElse(graft.Caching.persist(lshBands(
      minhashSignatures(shingles(docs, n), numHashes), numHashes, rowsPerBand)))
    var labels = graft.Caching.persist(bands.select(col("doc")).distinct()
      .withColumn("lbl", col("doc")))
    // Early fixpoint exit (answer-invariant): labels only decrease, and an
    // iteration that changes ZERO labels reproduces the same bucketMin —
    // and therefore the same labels — forever after, so the remaining
    // iterations are pure no-op shuffles. Detection is free: the changed
    // count rides the SAME materializing action the loop already needs to
    // release the previous iteration's cache (the converged tier's
    // recipe). Real dup chains converge in 1-2 hops, so the bounded tier
    // usually pays 2 of its 3 budgeted iterations instead of all 3 — at
    // any scale the saving is two full band-table shuffles.
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val bucketMin = bands.join(labels, Seq("doc"))
        .groupBy(col("band"), col("band_val"))
        .agg(min(col("lbl")).as("bmin"))
      val next = bands.join(bucketMin, Seq("band", "band_val"))
        .groupBy(col("doc"))
        .agg(min(col("bmin")).as("prop"))
        .join(labels, Seq("doc"))
        .select(col("doc"), least(col("lbl"), col("prop")).as("lbl"),
          (col("prop") < col("lbl")).as("_chg"))
      val nextP = graft.Caching.persist(next)
      // Materialize eagerly so the PREVIOUS iteration's cache can be
      // released now — iterative operators are the one place a
      // mid-pipeline action is the memory-correct choice (the standard
      // iterative-algorithm recipe); without it, maxIter label frames
      // stay pinned (or, unpersisted lazily, lineage recompute doubles
      // per iteration). The changed-count rides this action.
      changed = nextP.where(col("_chg")).count()
      graft.Caching.release(labels)
      labels = nextP
      iter += 1
    }
    labels.select(col("doc"), col("lbl"))
  }

  /**
   * CONVERGED transitive-closure labels — [[minhashClusterLabels]] run to
   * a FIXPOINT instead of a fixed iteration count: min-label propagation
   * repeats until an iteration changes ZERO labels (true connected
   * components of the doc ↔ LSH-bucket graph, whatever the component
   * diameter), with `maxIter` as a runaway bound only. The bounded tier
   * stays the default for known-short dup chains; this tier is for
   * corpora where chain length is unknown and an under-merged cluster is
   * a correctness bug (e.g. the leakage-safe split, where a split
   * component means train/val contamination).
   *
   * Cost of convergence DETECTION is zero extra jobs: the per-iteration
   * change flag rides the same materializing action the bounded loop
   * already needs to release the previous iteration's cache — `changed`
   * is a count over the just-persisted frame. Labels only decrease, so
   * the loop runs diameter+1 iterations (the +1 proves the fixpoint);
   * real dup graphs converge in a handful. Each iteration is the same
   * two grouped shuffles over the one persisted bands table as the
   * bounded tier.
   */
  def minhashClusterLabelsConverged(
      docs: DataFrame,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      maxIter: Int = 20): DataFrame = {
    graft.Caching.requireScope("Dedup.minhashClusterLabelsConverged")
    val bands = graft.Caching.persist(lshBands(
      minhashSignatures(shingles(docs, n), numHashes), numHashes, rowsPerBand))
    var labels = graft.Caching.persist(bands.select(col("doc")).distinct()
      .withColumn("lbl", col("doc")))
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val bucketMin = bands.join(labels.select(col("doc"), col("lbl")), Seq("doc"))
        .groupBy(col("band"), col("band_val"))
        .agg(min(col("lbl")).as("bmin"))
      val next = bands.join(bucketMin, Seq("band", "band_val"))
        .groupBy(col("doc"))
        .agg(min(col("bmin")).as("prop"))
        .join(labels.select(col("doc"), col("lbl")), Seq("doc"))
        .select(col("doc"), least(col("lbl"), col("prop")).as("lbl"),
          (col("prop") < col("lbl")).as("_chg"))
      val nextP = graft.Caching.persist(next)
      // One action serves both purposes: materialize the new labels so
      // the previous iteration's cache can be released (linear lineage,
      // the iterative-operator recipe), and count the changed labels so
      // the loop can detect its fixpoint without an extra job.
      changed = nextP.where(col("_chg")).count()
      graft.Caching.release(labels)
      labels = nextP
      iter += 1
    }
    // The CONTRACT of this tier is convergence — a silent fall-back to
    // the bounded tier's semantics would defeat its one use case (e.g.
    // a leakage-safe split where an under-merged component means
    // train/val contamination). Failing loudly is the only safe exit.
    if (changed > 0)
      throw new IllegalStateException(
        s"minhashClusterLabelsConverged: $changed labels still changing " +
          s"after maxIter=$maxIter iterations — component diameter exceeds " +
          "the runaway bound; raise maxIter (convergence is the contract)")
    labels.select(col("doc"), col("lbl"))
  }

  /**
   * Transitive-closure dedup at FULL convergence — the
   * [[minhashDedupIterative]] twin whose survivor set is exactly one doc
   * per connected component regardless of chain diameter (the bounded
   * tier can keep two survivors of a diameter-> 2·maxIter chain). Same
   * cost model per iteration; iteration count is the component diameter
   * + 1, detected, not guessed.
   */
  def minhashDedupConverged(
      docs: DataFrame,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      maxIter: Int = 20): DataFrame = {
    val labels = minhashClusterLabelsConverged(docs, n, numHashes, rowsPerBand, maxIter)
    val dropped = labels.where(col("lbl") < col("doc")).select(col("doc"))
    docs.join(dropped, Seq("doc"), "left_anti")
  }

  /**
   * Quality-aware cluster dedup: keep the BEST-scoring member of each
   * near-dup cluster instead of the smallest id — the keeper rule real
   * curation pipelines want (near-duplicates differ by boilerplate,
   * truncation, OCR noise; the min-id keeper is deterministic but
   * quality-blind — it happily keeps the truncated copy). `labels` is a
   * (doc, lbl) cluster frame from [[minhashClusterLabels]] /
   * [[minhashClusterLabelsConverged]]; docs absent from it are
   * singletons (cluster = own id). `score` is any expression over the
   * doc's columns (e.g. `TextAnalysis.qualityScoreCol(col("line"))`);
   * ties break to the smallest doc id so the keeper is total-ordered
   * and engine-portable.
   *
   * Scale shape: one left join against the vocabulary-of-clusters-sized
   * label frame, then ONE window partitioned by cluster —
   * WindowGroupLimit pushes the rank-1 filter into the sort, so each
   * task keeps a 1-row heap per cluster, never the cluster's members.
   */
  def dedupKeepBest(docs: DataFrame, labels: DataFrame, score: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clustered = docs.join(labels, Seq("doc"), "left")
      .withColumn("_cluster", coalesce(col("lbl"), col("doc")))
    val w = Window.partitionBy(col("_cluster")).orderBy(score.desc, col("doc"))
    clustered.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(docs.columns.map(col): _*)
  }

  /**
   * LEAKAGE-SAFE train/validation split — the held-out-set rule every
   * training pipeline needs once it deduplicates approximately: a doc's
   * split is decided by hashing its near-dup CLUSTER label (from
   * [[minhashClusterLabels]]), not its own id, so two near-duplicate
   * documents can never land on opposite sides of the split — the
   * classic eval-contamination leak ("Deduplicating Training Data Makes
   * Language Models Better", arXiv:2107.06499 §5, measures exactly this
   * train→test leakage). Docs with no shingles are singleton clusters
   * (label = own id). The hash is the same seed-free md5 permille
   * bucket as the sampling tier, prefixed `"split:"` so it is
   * statistically independent of every other doc-id hash in the
   * library.
   *
   * Scale shape: the label propagation's bounded band shuffles plus ONE
   * left join of the corpus against the label frame; the split decision
   * itself is a map-side expression. Convergence caveat: with bounded
   * `maxIter` a component of diameter > 2·maxIter may carry two labels;
   * the q87b contract counts candidate pairs that straddle the split
   * (must be 0) so non-convergence is observable, not silent.
   *
   * @param valPerMille validation share in 1/1000ths (100 = 10%)
   * @return (doc, cluster, split) for every input doc
   */
  def leakageSafeSplit(
      docs: DataFrame,
      valPerMille: Int = 100,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      maxIter: Int = 3,
      precomputedBands: Option[DataFrame] = None): DataFrame = {
    require(valPerMille >= 0 && valPerMille <= 1000,
      s"valPerMille must be in [0, 1000], got $valPerMille")
    val labels =
      minhashClusterLabels(docs, n, numHashes, rowsPerBand, maxIter, precomputedBands)
    val bucket = conv(substring(
        md5(concat(lit("split:"), col("cluster").cast("string"))), 1, 8),
      16, 10).cast("long") % 1000000L
    docs.select(col("doc"))
      .join(labels, Seq("doc"), "left")
      .withColumn("cluster", coalesce(col("lbl"), col("doc")))
      .withColumn("split",
        when(bucket < valPerMille * 1000L, lit("val")).otherwise(lit("train")))
      .select(col("doc"), col("cluster"), col("split"))
  }

  /**
   * LEAKAGE-SAFE K-FOLD assignment — [[leakageSafeSplit]] generalized
   * from a train/val cut to k cross-validation folds: every doc in a
   * near-dup cluster lands in the SAME fold (fold = the cluster
   * label's seed-free `"fold:"` md5 bucket mod k), so no fold's
   * held-out slice ever contains a near-copy of another fold's
   * training data — the k-fold form of the arXiv:2107.06499 §5
   * contamination rule. Singleton docs hash their own id, exactly as
   * the split tier does.
   *
   * Scale shape: identical to [[leakageSafeSplit]] — the cluster
   * labels are the cost (banded LSH + bounded label propagation); the
   * fold assignment is one map-side md5 on the label. The q173b
   * contract counts candidate pairs whose folds disagree (must be 0).
   *
   * @param k number of folds, ≥ 2 (fold ids 0..k−1)
   * @return (doc, cluster, fold)
   */
  def kFoldSplit(
      docs: DataFrame,
      k: Int = 5,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      maxIter: Int = 3,
      precomputedBands: Option[DataFrame] = None): DataFrame = {
    require(k >= 2 && k <= 1000, s"k must be in [2, 1000], got $k")
    val labels =
      minhashClusterLabels(docs, n, numHashes, rowsPerBand, maxIter, precomputedBands)
    // the same permille bucket family as the split tier ("fold:" salt),
    // reduced mod k — deterministic, engine-replayable, seed-free
    val bucket = conv(substring(
        md5(concat(lit("fold:"), col("cluster").cast("string"))), 1, 8),
      16, 10).cast("long") % 1000000L
    docs.select(col("doc"))
      .join(labels, Seq("doc"), "left")
      .withColumn("cluster", coalesce(col("lbl"), col("doc")))
      .withColumn("fold", bucket % k.toLong)
      .select(col("doc"), col("cluster"), col("fold"))
  }

  /**
   * INCREMENTAL leakage-safe split — assign arriving docs to train/val
   * CONSISTENTLY with an already-split history: a new doc that shares
   * any LSH band bucket with history inherits the split of its smallest
   * matched history doc (its `anchor`); unmatched docs are fresh
   * singleton clusters and hash their own id through the identical
   * `"split:"` permille bucket as [[leakageSafeSplit]]. The daily-ingest
   * bookend of the split tier, same shape as the dedup/vocab/prep
   * incremental twins: delta ⋈ static history, never a self-join.
   *
   * Bridge caveat (inherent, not a bug): a new doc matching TWO history
   * docs that sit in different history clusters inherits the smallest
   * anchor's side deterministically — the link it bridges was already
   * split apart when history was assigned. The q91b contract counts
   * candidate pairs whose sides disagree, so bridges are observable.
   *
   * Scale shape: history bands build once (persisted static frame), the
   * hot-bucket guard restricts the HISTORY side before the candidate
   * join (the lshCandidates bounded-bands shape), and the per-new-doc
   * anchor is one min-aggregate — no transitive iteration needed
   * because history's labels are already transitively consistent.
   *
   * @param historySplits (doc, split) — a prior [[leakageSafeSplit]]
   *        output over `historyDocs` (anchors missing from it fall back
   *        to the hash rule)
   * @return (doc, anchor, split) for every NEW doc; anchor null when
   *         nothing in history matched
   */
  def leakageSafeSplitAgainst(
      newDocs: DataFrame,
      historyDocs: DataFrame,
      historySplits: DataFrame,
      valPerMille: Int = 100,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      maxBucketSize: Int = MaxPairBucket,
      precomputedNewBands: Option[DataFrame] = None,
      precomputedHistBands: Option[DataFrame] = None): DataFrame = {
    require(valPerMille >= 0 && valPerMille <= 1000,
      s"valPerMille must be in [0, 1000], got $valPerMille")
    val bNew = precomputedNewBands.getOrElse(lshBands(
      minhashSignatures(shingles(newDocs, n), numHashes), numHashes, rowsPerBand))
    val bHist = precomputedHistBands.getOrElse(graft.Caching.persist(lshBands(
      minhashSignatures(shingles(historyDocs, n), numHashes),
      numHashes, rowsPerBand)))
    val okBuckets = bHist
      .groupBy(col("band"), col("band_val"))
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") <= maxBucketSize)
      .select(col("band"), col("band_val"))
    val boundedHist = bHist
      .join(okBuckets, Seq("band", "band_val"), "left_semi")
      .select(col("doc").as("anchor"), col("band"), col("band_val"))
    val anchors = bNew.join(boundedHist, Seq("band", "band_val"))
      .groupBy(col("doc"))
      .agg(min(col("anchor")).as("anchor"))
    val ownBucket = conv(substring(
        md5(concat(lit("split:"), col("doc").cast("string"))), 1, 8),
      16, 10).cast("long") % 1000000L
    newDocs.select(col("doc"))
      .join(anchors, Seq("doc"), "left")
      .join(historySplits.select(col("doc").as("anchor"),
        col("split").as("hist_split")), Seq("anchor"), "left")
      .withColumn("split", coalesce(col("hist_split"),
        when(ownBucket < valPerMille * 1000L, lit("val")).otherwise(lit("train"))))
      .select(col("doc"), col("anchor"), col("split"))
  }

  /**
   * N-GRAM benchmark DECONTAMINATION — the GPT-3-style overlap screen
   * (Brown et al. 2020 §C use 13-gram overlap; PaLM/Llama variants
   * differ only in n): a training document is CONTAMINATED when it
   * shares at least one word n-gram with any document of the
   * evaluation/benchmark set — one verbatim 13-gram means benchmark
   * text leaked into training and downstream eval scores inflate.
   * Output is the AUDIT per corpus doc — n_hits (distinct contaminated
   * n-grams) and the flag; filter `!contaminated` for the clean corpus
   * (flag, never silently drop — the audit trail is the deliverable).
   *
   * Scale shape: asymmetric by construction — benchmarks are MBs, the
   * corpus is the 100 TB side. The benchmark reduces to a DISTINCT
   * n-gram frame (bounded by benchmark token count) that BROADCASTS;
   * corpus n-grams stream map-side through the broadcast hash join and
   * only matched (doc, count) pairs reach the one partial-agg
   * exchange. Corpus rows are scanned once, nothing corpus-sized
   * shuffles. If a benchmark union ever outgrew a broadcast, screen
   * with the Bloom route (`bloomScreenedIncrement`'s contract:
   * over-approximate filter + exact confirm) before the join.
   */
  def ngramDecontaminate(
      corpus: DataFrame,
      bench: DataFrame,
      n: Int = 13): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val benchGrams = shingles(bench, n).select(col("shingle")).distinct()
    val hits = shingles(corpus, n)
      .join(broadcast(benchGrams), Seq("shingle"))
      .groupBy(col("doc")).agg(count(lit(1)).as("n_hits"))
    corpus.select(col("doc"))
      .join(hits, Seq("doc"), "left")
      .select(col("doc"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /**
   * Contamination BY BENCHMARK ITEM — [[ngramDecontaminate]] flipped
   * to the eval set's point of view: per benchmark document, how many
   * OTHER corpus documents share a verbatim n-gram with it, and how
   * many (corpus doc, gram) hits in total. The corpus-side screen says
   * which training docs to drop; THIS says which eval items are
   * already compromised and must be re-drawn or score-discounted —
   * the two reports together are the full contamination story.
   *
   * Self-matches are excluded (a benchmark drawn from the corpus
   * trivially matches itself) — hits count docs ≠ the bench doc.
   *
   * Scale shape: the benchmark gram set broadcasts (eval sets are
   * bounded); the corpus is scanned once; the aggregate is
   * bench-doc-keyed. Hits count DISTINCT (corpus doc, gram) pairs —
   * [[shingles]] dedups grams within a doc.
   *
   * @return per bench doc: n_docs_hit, n_gram_hits, compromised
   */
  def contaminationReport(
      corpus: DataFrame,
      bench: DataFrame,
      n: Int = 13): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val bg = shingles(bench, n)
      .select(col("doc").as("bench_doc"), col("shingle"))
    val hits = shingles(corpus, n)
      .join(broadcast(bg), Seq("shingle"))
      .where(col("doc") =!= col("bench_doc"))
      .groupBy(col("bench_doc"))
      .agg(countDistinct(col("doc")).as("n_docs_hit"),
        count(lit(1)).as("n_gram_hits"))
    bench.select(col("doc").as("bench_doc"))
      .join(hits, Seq("bench_doc"), "left")
      .select(col("bench_doc"),
        coalesce(col("n_docs_hit"), lit(0L)).as("n_docs_hit"),
        coalesce(col("n_gram_hits"), lit(0L)).as("n_gram_hits"),
        (coalesce(col("n_docs_hit"), lit(0L)) > 0).as("compromised"))
  }

  /**
   * Duplicate-CLUSTER SIZE histogram — the dedup diagnostics chart
   * over [[minhashClusterLabelsConverged]]'s true components:
   * (cluster size → number of clusters). The shape tells you what
   * kind of duplication you have — a fat size-2 row is mirroring, a
   * long tail of big clusters is template spam / syndication — and
   * sizes the dedup win before running it (docs removed =
   * Σ (size−1)·n_clusters). Singleton clusters (unique docs that
   * produced bands) are the size-1 row.
   *
   * Scale shape: the converged label propagation (banded, never
   * all-pairs) plus two label-keyed aggregates on the labels frame.
   *
   * @return (cluster_size, n_clusters), pure integers
   */
  def dupClusterHistogram(
      docs: DataFrame,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      maxIter: Int = 20): DataFrame =
    minhashClusterLabelsConverged(docs, n, numHashes, rowsPerBand, maxIter)
      .groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))

  /**
   * All-pairs exact n-gram Jaccard ≥ threshold (verification tier — at
   * scale, run only on LSH candidates). Intersections are aggregated
   * straight off the shingle self-join — no materialized pair list, no
   * second pass over the shingle table.
   */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = graft.Caching.persist(shingles(docs, n))
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("doc").as("d1"), col("shingle"))
      .join(sh.select(col("doc").as("d2"), col("shingle")), "shingle")
      .where(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "d1").withColumnRenamed("sz", "sz1"), "d1")
      .join(sizes.withColumnRenamed("doc", "d2").withColumnRenamed("sz", "sz2"), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /**
   * Shingle CONTAINMENT pairs — the ASYMMETRIC near-dup relation
   * resemblance misses (Broder's original distinction: resemblance
   * for "roughly the same", containment for "roughly contained in"):
   * c(inner→outer) = |A∩B| / |A|. A short doc quoted whole inside a
   * long one scores c ≈ 1 while its Jaccard ≈ |A|/|B| can sit far
   * below any resemblance threshold — wrapper pages, quote posts,
   * aggregator reprints. Directed output: (inner_doc, outer_doc, both
   * directions emitted when both clear τ).
   *
   * Scale shape: the q12 shingle self-join (Σ df² candidate rows,
   * partial-agg'd per pair) — the exact verification tier by declared
   * design. At 100 TB screen first: banding under-selects asymmetric
   * pairs (the small side's minima are swamped by the big side's), so
   * the right production screen is the [[hashedFeatures]] inverted
   * index or [[prefixFilterJaccardPairs]]' df-cut generalized to the
   * SMALL side's shingles — candidates from the inner doc's rarest
   * shingles, which this operator then scores exactly.
   */
  def containmentPairs(
      docs: DataFrame,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    val sh = graft.Caching.persist(shingles(docs, n))
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    sh.select(col("doc").as("inner_doc"), col("shingle"))
      .join(sh.select(col("doc").as("outer_doc"), col("shingle")), "shingle")
      .where(col("inner_doc") =!= col("outer_doc"))
      .groupBy(col("inner_doc"), col("outer_doc"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc").as("inner_doc"), col("sz")), Seq("inner_doc"))
      .withColumn("containment",
        round(col("inter").cast("double") / col("sz"), 6))
      .where(col("containment") >= threshold)
      .select(col("inner_doc"), col("outer_doc"), col("containment"))
  }

  /**
   * DF-SCREENED exact containment join — [[containmentPairs]] with the
   * prefix-filter argument adapted to the asymmetric relation: a pair
   * with round-6 containment ≥ τ shares more than |A|·τ − 1 of A's
   * shingles, so when A's HOT-shingle count (df > maxDf) is strictly
   * below |A|·τ − 1, at least one shared shingle is rare — probing
   * only A's rare shingles cannot miss the pair. Docs violating that
   * bound (stop-mass-dominated A's) fall back to probing ALL their
   * shingles, so the screen is EXACT for every doc by construction —
   * the q121/q81 invisible-optimization pattern, oracle = q158's SQL
   * verbatim, ContainmentProperties re-proves equality on random
   * corpora.
   *
   * Scale shape: candidate rows ≈ Σ_rare df² bounded by maxDf per
   * probe shingle (vs the brute tier's full Σ df², which one
   * boilerplate shingle makes quadratic); the exact verify then joins
   * full shingle sets of CANDIDATE pairs only. Fallback docs pay their
   * full fan-out — on head-dominated corpora (the shape that needs
   * the screen) a doc made mostly of stop shingles is boilerplate the
   * quality tiers drop before dedup anyway.
   */
  def containmentPairsScreened(
      docs: DataFrame,
      n: Int = 3,
      threshold: Double = 0.5,
      maxDf: Long = 1000L): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    graft.Caching.requireScope("Dedup.containmentPairsScreened")
    val sh = graft.Caching.persist(shingles(docs, n))
    val dfs = sh.groupBy(col("shingle")).agg(count(lit(1)).as("_df"))
    val shDf = graft.Caching.persist(sh.join(dfs, Seq("shingle")))
    val sizes = shDf.groupBy(col("doc")).agg(
      count(lit(1)).as("sz"),
      sum(when(col("_df") > maxDf, 1L).otherwise(0L)).as("_hot"))
    val probes = shDf.join(sizes, Seq("doc"))
      .where(col("_df") <= maxDf ||
        !(col("_hot").cast("double") < col("sz") * threshold - 1.0))
      .select(col("doc").as("inner_doc"), col("shingle"))
    val cands = probes
      .join(sh.select(col("doc").as("outer_doc"), col("shingle")), "shingle")
      .where(col("inner_doc") =!= col("outer_doc"))
      .select(col("inner_doc"), col("outer_doc")).distinct()
    // ROW-LOCAL verify (the prefixFilter verifyViaArrays route, r13):
    // per-doc shingle ARRAYS join the candidates and intersect with one
    // native array_intersect per pair — the former exploded verify join
    // carried |cands| × per-doc-shingles rows into a per-pair
    // aggregation exchange (≈50 M rows at this fixture's near-all-pairs
    // candidate mass). Shingles are per-doc DISTINCT by construction,
    // so size(array_intersect) ≡ the shared-shingle count exactly.
    val shArr = sh.groupBy(col("doc"))
      .agg(collect_list(col("shingle")).as("_arr"))
    val inter = cands
      .join(shArr.select(col("doc").as("inner_doc"), col("_arr").as("_ia")),
        Seq("inner_doc"))
      .join(shArr.select(col("doc").as("outer_doc"), col("_arr").as("_oa")),
        Seq("outer_doc"))
      .select(col("inner_doc"), col("outer_doc"),
        size(array_intersect(col("_ia"), col("_oa"))).cast("long").as("inter"))
    inter
      .join(sizes.select(col("doc").as("inner_doc"), col("sz")), Seq("inner_doc"))
      .withColumn("containment",
        round(col("inter").cast("double") / col("sz"), 6))
      .where(col("containment") >= threshold)
      .select(col("inner_doc"), col("outer_doc"), col("containment"))
  }

  /** Per-doc unigram term-frequency vectors (doc, term, tf) — the
    * WEIGHTED sets of the weighted-Jaccard tier. One shuffle with
    * map-side combine; rows bounded by Σ per-doc distinct terms. */
  def termWeights(docs: DataFrame): DataFrame =
    docs.select(col("doc"), explode(tokensCol(col("line"))).as("term"))
      .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))

  /**
   * Weighted-element expansion — the classic integer-weight reduction
   * of WEIGHTED Jaccard to plain Jaccard over replicated copies
   * (Haveliwala et al., WebDB 2000 use it for host similarity; Ioffe,
   * ICDM 2010 §1 states the reduction before improving on it): each of
   * a term's `tf` occurrences becomes its own element `term#i`, and
   * plain-set resemblance over the expanded universes equals
   * J_w(A,B) = Σ_t min(tfA,tfB) / Σ_t max(tfA,tfB). The payoff is that
   * ALL existing set machinery — [[minhashSignatures]], [[lshBands]],
   * the bucket guard, the matching-minima estimator and its q102b-style
   * error contract — runs on weighted multisets UNCHANGED and
   * integer-exact (no float hash family to keep in lockstep with the
   * oracle, unlike ICWS).
   *
   * Scale shape: output rows = Σ min(tf, tfCap) ≤ total token count —
   * the same size as the token table the corpus pays anyway, NOT a k×
   * inflation. The cap is the TRUNCATED weighted Jaccard convention
   * (weight vectors clipped at tfCap before the reduction): without
   * it, one adversarial doc — a single term repeated 10⁶× — fans out
   * 10⁶ rows before any bucket guard can see them, a per-row cliff no
   * downstream bound repairs. Signatures over capped copies estimate
   * J_w of the CLIPPED vectors; the production paths verify candidates
   * with the EXACT uncapped Σmin/Σmax afterwards, so final answers are
   * unchanged — the cap only bounds (and on hot-tf spam, slightly
   * perturbs) candidate recall. tfCap must clear the corpus's honest
   * per-doc tf range (fixture max is 14; natural text stays low —
   * repetition beyond the cap is the q45-family quality signal, not
   * similarity evidence). Input is a [[termWeights]] frame; the
   * element column is named `shingle` so the minhash machinery
   * composes verbatim.
   */
  def weightedElems(tf: DataFrame, tfCap: Long = MaxElemTf): DataFrame = {
    require(tfCap >= 1, s"tfCap must be >= 1, got $tfCap")
    tf.select(col("doc"),
      explode(transform(sequence(lit(0L), least(col("tf"), lit(tfCap)) - 1),
        i => concat(col("term"), lit("#"), i))).as("shingle"))
  }

  /** Default per-term copy bound for [[weightedElems]] — the truncated
    * weighted-Jaccard clip. Well above any natural-text per-doc tf
    * (fixture max 14) while bounding the adversarial hot-tf fan-out. */
  val MaxElemTf = 64L

  /** Default vocabulary bound for the DENSE weighted-Jaccard route: a
    * V-long vector per doc and one map/collect of V terms — the
    * NB-model/PQ-codebook kind of driver-bounded state, not data-sized.
    * Pass maxVocab = 0 to any weighted entry point to force the sparse
    * term-join path. */
  val MaxDenseVocab = 2048

  /** Dense per-doc tf vectors over the sorted vocabulary — (doc, vec
    * array<long>, tot) — or None when the distinct vocabulary exceeds
    * `maxVocab` (caller falls back to the sparse term join). */
  private def denseTfVectors(tf: DataFrame, maxVocab: Int): Option[DataFrame] = {
    if (maxVocab <= 0) return None
    val vocab = tf.select(col("term")).distinct()
      .orderBy(col("term")).limit(maxVocab + 1).collect().map(_.getString(0))
    if (vocab.length > maxVocab) return None
    val s = tf.sparkSession
    import s.implicits._
    val idx = vocab.zipWithIndex.toSeq.toDF("term", "tid")
    Some(tf.join(broadcast(idx), "term")
      .groupBy(col("doc"))
      .agg(map_from_entries(collect_list(struct(col("tid"), col("tf")))).as("m"),
        sum(col("tf")).as("tot"))
      .select(col("doc"),
        transform(sequence(lit(0), lit(vocab.length - 1)),
          i => coalesce(element_at(col("m"), i), lit(0L))).as("vec"),
        col("tot")))
  }

  /** Σ min / jaccard from two dense vectors — shared by the dense
    * routes; `smin > 0` keeps the sparse path's only-pairs-sharing-a-
    * term semantics, so the two routes are EXACTLY interchangeable. */
  private def denseJaccard(joined: DataFrame): DataFrame =
    joined
      .withColumn("smin",
        org.apache.spark.sql.graft.VectorFunctions.minSum(col("v1"), col("v2")))
      .where(col("smin") > 0)
      .withColumn("jaccard",
        col("smin").cast("double") / (col("tot1") + col("tot2") - col("smin")))
      .select(col("d1"), col("d2"), col("jaccard"))

  /**
   * Exact weighted Jaccard for given pairs, from the tf table. Two
   * interchangeable physical routes, same answer by construction:
   *
   *  - DENSE (vocabulary ≤ maxVocab): pairs join V-long tf vectors and
   *    Σ min is one codegen'd zip_with/aggregate pass — pair-count ×
   *    V arithmetic, no row inflation. On flat tiny vocabularies the
   *    sparse join's Σ shared-terms per pair ≈ V anyway, so dense does
   *    the same work without materializing it as join rows.
   *  - SPARSE (default past the bound): only SHARED terms join;
   *    Σ max = tot1 + tot2 − Σ min (min+max identity), so the union
   *    side never materializes.
   */
  def weightedJaccardFor(
      pairs: DataFrame,
      tf: DataFrame,
      maxVocab: Int = MaxDenseVocab): DataFrame =
    denseTfVectors(tf, maxVocab) match {
      case Some(vecs) =>
        denseJaccard(pairs
          .join(vecs.select(col("doc").as("d1"), col("vec").as("v1"),
            col("tot").as("tot1")), "d1")
          .join(vecs.select(col("doc").as("d2"), col("vec").as("v2"),
            col("tot").as("tot2")), "d2"))
      case None =>
        val tot = tf.groupBy(col("doc")).agg(sum(col("tf")).as("tot"))
        val inter = pairs
          .join(tf.select(col("doc").as("d1"), col("term"), col("tf").as("w1")), "d1")
          .join(tf.select(col("doc").as("d2"), col("term"), col("tf").as("w2")),
            Seq("d2", "term"))
          .groupBy(col("d1"), col("d2"))
          .agg(sum(least(col("w1"), col("w2"))).as("smin"))
        inter
          .join(tot.withColumnRenamed("doc", "d1").withColumnRenamed("tot", "tot1"), "d1")
          .join(tot.withColumnRenamed("doc", "d2").withColumnRenamed("tot", "tot2"), "d2")
          .withColumn("jaccard",
            col("smin").cast("double") / (col("tot1") + col("tot2") - col("smin")))
          .select(col("d1"), col("d2"), col("jaccard"))
    }

  /**
   * All-pairs exact WEIGHTED Jaccard ≥ threshold over unigram tf
   * vectors (verification tier, the [[ngramJaccardPairs]] shape — at
   * scale, run only on LSH candidates via [[weightedNearDups]]).
   *
   * Why tf-weighted: on a small shared vocabulary (this corpus: ~31
   * terms) PLAIN unigram Jaccard degenerates — nearly every doc pair
   * scores ~1.0 because everyone shares the vocabulary — while the
   * weighted form discriminates on FREQUENCIES, the bag-of-words
   * similarity boilerplate detection actually needs. Template docs
   * (same phrases repeated in the same proportions) score high; docs
   * that merely share words do not.
   */
  def weightedJaccardPairs(
      docs: DataFrame,
      threshold: Double = 0.8,
      maxVocab: Int = MaxDenseVocab): DataFrame = {
    val tf = graft.Caching.persist(termWeights(docs))
    val pairs = denseTfVectors(tf, maxVocab) match {
      // Dense all-pairs: the flat-vocabulary shape that justifies this
      // route is exactly the one where the sparse self-join blows up —
      // Σ df² ≈ V·N² rows (sf0.1's 31-term corpus: ~775 M) — while the
      // vector cross does N²/2 · V codegen ops with no shuffle of
      // intermediate rows. The broadcast inequality cross IS a
      // nested-loop join by declared design (the q16 pattern: an
      // all-pairs verification tier's output domain is N², so its
      // input is bounded by construction — N·(V+2) longs broadcast,
      // ~1.2 MB at sf0.1's 5 000 docs).
      case Some(vecs) =>
        val a = vecs.select(col("doc").as("d1"), col("vec").as("v1"),
          col("tot").as("tot1"))
        val b = vecs.select(col("doc").as("d2"), col("vec").as("v2"),
          col("tot").as("tot2"))
        denseJaccard(a.join(broadcast(b), col("d1") < col("d2")))
      case None =>
        val inter = tf.select(col("doc").as("d1"), col("term"), col("tf").as("w1"))
          .join(tf.select(col("doc").as("d2"), col("term"), col("tf").as("w2")), "term")
          .where(col("d1") < col("d2"))
          .groupBy(col("d1"), col("d2"))
          .agg(sum(least(col("w1"), col("w2"))).as("smin"))
        val tot = tf.groupBy(col("doc")).agg(sum(col("tf")).as("tot"))
        inter
          .join(tot.withColumnRenamed("doc", "d1").withColumnRenamed("tot", "tot1"), "d1")
          .join(tot.withColumnRenamed("doc", "d2").withColumnRenamed("tot", "tot2"), "d2")
          .withColumn("jaccard",
            col("smin").cast("double") / (col("tot1") + col("tot2") - col("smin")))
          .select(col("d1"), col("d2"), col("jaccard"))
    }
    pairs.where(col("jaccard") >= threshold)
  }

  /**
   * Production WEIGHTED near-dup path: MinHash+LSH over the
   * [[weightedElems]] expansion → bucket-guarded candidates → exact
   * weighted-Jaccard verify ≥ threshold. Identical machinery and scale
   * shape to [[minhashNearDups]] — banded, never all-pairs, hot-bucket
   * guard pre-join — only the element universe changes; recall follows
   * the same (1/b)^(1/r) band curve, pinned against the exact tier by
   * the q147-family oracle.
   */
  def weightedNearDups(
      docs: DataFrame,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.8,
      maxVocab: Int = MaxDenseVocab): DataFrame = {
    graft.Caching.requireScope("Dedup.weightedNearDups")
    val tf = graft.Caching.persist(termWeights(docs))
    val bands = graft.Caching.persist(
      lshBands(minhashSignatures(weightedElems(tf), numHashes), numHashes, rowsPerBand))
    weightedJaccardFor(lshCandidates(bands), tf, maxVocab)
      .where(col("jaccard") >= threshold)
  }

  /**
   * Incremental WEIGHTED near-dup screen — the daily-ingest twin of
   * [[weightedNearDups]], mirroring [[minhashNearDupsAgainst]]'s scale
   * shape: delta weighted-element bands ⋈ HISTORY bands on
   * (band, band_val) — never a self-join — with the hot-bucket guard
   * bounding the history side BEFORE the candidate join. The exact
   * Σmin/Σmax verify stays SPARSE here (term join on candidate pairs):
   * candidates are delta-bounded, so the verify carries
   * |candidates| × shared-terms rows — the dense-vector route's
   * union-vocabulary index buys nothing at that size.
   *
   * @return (doc, hist_doc, jaccard) for delta docs matching history
   *         at weighted Jaccard ≥ threshold
   */
  def weightedNearDupsAgainst(
      newDocs: DataFrame,
      historyDocs: DataFrame,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.8,
      maxBucketSize: Int = MaxPairBucket): DataFrame = {
    require(threshold > 0 && threshold < 1,
      s"threshold must be in (0,1), got $threshold")
    graft.Caching.requireScope("Dedup.weightedNearDupsAgainst")
    val tfNew = graft.Caching.persist(termWeights(newDocs))
    val tfHist = graft.Caching.persist(termWeights(historyDocs))
    val bNew = lshBands(
      minhashSignatures(weightedElems(tfNew), numHashes), numHashes, rowsPerBand)
    val bHist = graft.Caching.persist(lshBands(
      minhashSignatures(weightedElems(tfHist), numHashes), numHashes, rowsPerBand))
    val okBuckets = bHist
      .groupBy(col("band"), col("band_val"))
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") <= maxBucketSize)
      .select(col("band"), col("band_val"))
    val boundedHist = bHist
      .join(okBuckets, Seq("band", "band_val"), "left_semi")
      .select(col("doc").as("hist_doc"), col("band"), col("band_val"))
    val cand = bNew
      .join(boundedHist, Seq("band", "band_val"))
      .select(col("doc"), col("hist_doc"))
      .distinct()
    val totNew = tfNew.groupBy(col("doc")).agg(sum(col("tf")).as("tot_n"))
    val totHist = tfHist.groupBy(col("doc")).agg(sum(col("tf")).as("tot_h"))
    cand
      .join(tfNew.select(col("doc"), col("term"), col("tf").as("w1")), "doc")
      .join(tfHist.select(col("doc").as("hist_doc"), col("term"),
        col("tf").as("w2")), Seq("hist_doc", "term"))
      .groupBy(col("doc"), col("hist_doc"))
      .agg(sum(least(col("w1"), col("w2"))).as("smin"))
      .join(totNew, "doc")
      .join(totHist.withColumnRenamed("doc", "hist_doc"), "hist_doc")
      .withColumn("jaccard",
        col("smin").cast("double") / (col("tot_n") + col("tot_h") - col("smin")))
      .where(col("jaccard") >= threshold)
      .select(col("doc"), col("hist_doc"), col("jaccard"))
  }

  /**
   * HOLD-OUT matching-minima estimator for the weighted tier:
   * candidates come from LSH bands over minima m0..m15, the Jaccard
   * ESTIMATE from the DISJOINT minima m16..m31 of the same one-pass
   * 32-hash signature row. The split matters: banding SELECTS pairs
   * because minima matched, so estimating from the banding hashes is
   * biased upward — one collided band forces 4 equal minima, giving
   * E[est | collision] ≈ (4 + 12·J)/16, bias 0.25·(1−J). On this
   * corpus's mid-J candidate mix (thousands of J ≈ 0.5 bag-of-words
   * pairs) that is ~0.125 of systematic error, measured 0.153 mean
   * abs err — the q102b-style bounds reject it. Hashes the selection
   * never saw restore E[est] = J (plain Broder, σ = √(J(1−J)/16)).
   * [[minhashJaccardEstimates]] (q102b) survives WITHOUT the hold-out
   * only because its candidates are high-J near-dups where the bias
   * 0.25·(1−J) vanishes; this estimator is the one to copy when
   * candidates can be mid-similarity.
   */
  def weightedJaccardEstimates(
      docs: DataFrame,
      rowsPerBand: Int = 4,
      threshold: Double = 0.0,
      maxBucketSize: Int = MaxPairBucket): DataFrame = {
    val bandHashes = 16; val estHashes = 16
    val sig = graft.Caching.persist(minhashSignatures(
      weightedElems(termWeights(docs)), bandHashes + estHashes))
    val cand = lshCandidates(lshBands(sig, bandHashes, rowsPerBand), maxBucketSize)
    val estCols = bandHashes until (bandHashes + estHashes)
    val s1 = sig.select(
      col("doc").as("d1") +: estCols.map(k => col(s"m$k").as(s"a$k")): _*)
    val s2 = sig.select(
      col("doc").as("d2") +: estCols.map(k => col(s"m$k").as(s"b$k")): _*)
    val matches = estCols
      .map(k => when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(s1, "d1").join(s2, "d2")
      .withColumn("est", round(matches / lit(estHashes.toDouble), 6))
      .where(col("est") >= threshold)
      .select(col("d1"), col("d2"), col("est"))
  }

  /**
   * PREFIX-FILTERED exact set-similarity join (the All-Pairs/PPJoin
   * family — Chaudhuri et al., ICDE 2006; Bayardo et al., WWW 2007):
   * the same answer as [[ngramJaccardPairs]] — EVERY pair with shingle
   * Jaccard ≥ `threshold`, no probabilistic recall — without the full
   * shingle self-join. Where MinHash+LSH (q13) trades recall for speed,
   * this trades a candidate bound derived from the threshold itself:
   *
   *  - order each doc's shingles by a GLOBAL frequency order (document
   *    frequency ascending, shingle value as tie-break — rarest first);
   *  - a doc of size s only probes its PREFIX, the first
   *    s − ⌈τ·s⌉ + 1 shingles: two sets with J ≥ τ share ≥ ⌈τ·s⌉
   *    elements (given the size filter below), and ⌈τ·s⌉ common
   *    elements cannot all hide in the suffix of either side — so
   *    candidate generation over prefixes alone has NO false negatives;
   *  - the size filter τ·|x| ≤ |y| (symmetric) prunes pairs that could
   *    never reach τ before any verification.
   *
   * Scale shape: the candidate join keys on PREFIX shingles only —
   * which the ascending-df order makes the RAREST shingles in the
   * corpus, so bucket sizes are self-limiting exactly where a plain
   * shingle self-join explodes (stop-phrase shingles land in suffixes
   * and never generate candidates). Exchanges: one shingle-df shuffle,
   * one doc-keyed window sort for prefix ranks, the prefix self-join,
   * and the exact-Jaccard verify on surviving candidates
   * ([[jaccardFor]] over the persisted shingle table). At τ = 0.8 a
   * doc probes ~20 % of its shingles; τ → 0 degrades gracefully toward
   * the exact tier's full self-join, which is the honest cost of an
   * exact answer at low thresholds — LSH (q13) remains the production
   * path when approximate recall is acceptable.
   *
   * CROSSOVER RULE (measured, PrefixStressMain / BASELINE.md): prefix
   * filtering wins when Σ df² is HEAD-dominated — a few stop-phrase /
   * boilerplate / template shingles with df ≈ N carry most of the
   * self-join mass (the Zipf fixture: 5.8× faster than brute at
   * Σ df² = 1.15 G); it loses when df is FLAT — every "rare" prefix
   * shingle still has large df, so candidates prune little while the
   * df-join + rank-window stages still get paid (the no-tail fixture:
   * 3–5× slower than brute). Real web/code corpora are the
   * head-dominated case; tiny synthetic vocabularies are not.
   */
  /**
   * @param verifyViaArrays verification strategy. `false` (default):
   *        [[jaccardFor]] over the exploded shingle table — its joins
   *        broadcast at small scale, the cheaper plan below ~10k docs.
   *        `true`: per-doc shingle ARRAYS joined to candidates and
   *        intersected ROW-LOCALLY (`array_intersect`) — no
   *        candidate-keyed aggregation exchange, measured 22 % faster
   *        at 50k docs (PrefixStressMain) and the scaling shape for
   *        larger corpora. Identical answers (property-tested).
   */
  def prefixFilterJaccardPairs(
      docs: DataFrame,
      n: Int = 3,
      threshold: Double = 0.5,
      verifyViaArrays: Boolean = false): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    import org.apache.spark.sql.expressions.Window
    val sh = graft.Caching.persist(shingles(docs, n))
    val sdf = sh.groupBy(col("shingle")).agg(count(lit(1)).as("sdf"))
    val byDoc = Window.partitionBy(col("doc"))
    val ranked = sh.join(sdf, "shingle")
      .withColumn("pos",
        row_number().over(byDoc.orderBy(col("sdf"), col("shingle"))))
      .withColumn("sz", count(lit(1)).over(byDoc))
    val prefix = ranked
      .where(col("pos") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select(col("doc"), col("shingle"), col("sz"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc") < col("b.doc") &&
          // symmetric size filter: τ·max ≤ min, or J can never reach τ
          col("b.sz") >= lit(threshold) * col("a.sz") &&
          col("a.sz") >= lit(threshold) * col("b.sz"))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .distinct()
    if (verifyViaArrays) {
      // per-doc shingle ARRAYS joined to candidates, intersected
      // ROW-LOCALLY (arrays are distinct by construction) — no
      // candidate-keyed aggregation exchange
      val av = docs.select(col("doc"), shinglesCol(col("line"), n).as("_shs"))
      cand
        .join(av.select(col("doc").as("d1"), col("_shs").as("_s1")), Seq("d1"))
        .join(av.select(col("doc").as("d2"), col("_shs").as("_s2")), Seq("d2"))
        .withColumn("_i", size(array_intersect(col("_s1"), col("_s2"))))
        // threshold on the RAW ratio (the oracle's form), round for output
        .withColumn("_raw",
          col("_i").cast("double") /
            (size(col("_s1")) + size(col("_s2")) - col("_i")))
        .where(col("_raw") >= threshold)
        .select(col("d1"), col("d2"), round(col("_raw"), 6).as("jaccard"))
    } else
      jaccardFor(cand, sh)
        .where(col("jaccard") >= threshold)
        .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /**
   * EDIT-DISTANCE verified near-dup pairs — the character-level verify
   * metric for the template/OCR/typo duplication band: Jaccard over
   * word shingles under-scores pairs that differ by in-word edits
   * (scanner noise, stemming variants, digit runs) because every touched
   * word kills n whole shingles; normalized Levenshtein
   * (dist / max(len)) scores exactly that band. Candidates still come
   * from the guarded LSH bands — Levenshtein is O(len²) per pair and
   * must NEVER meet an unbucketed pair space; word-level banding
   * recalls char-level near-dups fine because a small char edit ratio
   * leaves most shingles intact.
   *
   * Both engines run the same unit-cost Levenshtein (Spark
   * `levenshtein` ≡ DuckDB `levenshtein`); the ratio is one exact-int
   * division, round 6.
   *
   * @return (d1, d2, dist, edit_ratio) for candidate pairs with
   *         edit_ratio ≤ maxRatio
   */
  def editDistancePairs(
      docs: DataFrame,
      n: Int = 3,
      maxRatio: Double = 0.2): DataFrame = {
    require(maxRatio > 0 && maxRatio <= 1,
      s"maxRatio must be in (0,1], got $maxRatio")
    graft.Caching.requireScope("Dedup.editDistancePairs")
    val sh = graft.Caching.persist(shingles(docs, n))
    val bands = graft.Caching.persist(
      lshBands(minhashSignatures(sh)))
    val cand = lshCandidates(bands)
    val texts = docs.select(col("doc"), col("line"))
    cand
      .join(texts.select(col("doc").as("d1"), col("line").as("_t1")), Seq("d1"))
      .join(texts.select(col("doc").as("d2"), col("line").as("_t2")), Seq("d2"))
      .withColumn("dist", levenshtein(col("_t1"), col("_t2")).cast("long"))
      .withColumn("edit_ratio", round(
        col("dist").cast("double") /
          greatest(length(col("_t1")), length(col("_t2")), lit(1)), 6))
      .where(col("edit_ratio") <= maxRatio)
      .select(col("d1"), col("d2"), col("dist"), col("edit_ratio"))
  }

  /**
   * Exact duplicated-SUBSTRING removal — the ExactSubstr recipe of
   * "Deduplicating Training Data Makes Language Models Better" (Lee et
   * al. 2022, arXiv:2107.06499), at token granularity: every occurrence
   * of a `spanTokens`-token span that appears at least twice corpus-wide
   * (across documents OR repeated within one) is removed except the
   * globally FIRST occurrence (smallest (doc, pos) — deterministic),
   * and each document's surviving tokens re-join into its cleaned text.
   * Catches the boilerplate document-level dedup misses: shared
   * headers/footers, quoted passages, license blocks embedded in
   * otherwise-distinct documents.
   *
   * Scale shape: span occurrences are a map-only array expansion keyed
   * by the span's md5 (32 bytes shuffled per occurrence, independent of
   * `spanTokens`); the keep/remove decision is ONE shuffle on that hash
   * (row_number per span); removed spans explode into their covered
   * token positions (`spanTokens` × duplicated occurrences only — the
   * overlap-merge falls out of the positional `distinct`), and the
   * rebuild is one doc-keyed regroup. No self-joins, no suffix array:
   * O(total tokens) rows end to end.
   *
   * @return (doc, clean_text, n_kept, n_removed) for every input doc
   */
  def substringDedup(docs: DataFrame, spanTokens: Int = 50): DataFrame = {
    require(spanTokens >= 2, s"spanTokens must be >= 2, got $spanTokens")
    import org.apache.spark.sql.expressions.Window
    // persisted: the token table feeds THREE sub-plans (span expansion,
    // positional rebuild, final size join) — without it each copy
    // re-runs the tokenization scan of the whole corpus
    val toked = graft.Caching.persist(
      docs.select(col("doc"), tokensCol(col("line")).as("_toks")))
    val occ = toked
      .where(size(col("_toks")) >= spanTokens)
      .select(col("doc"), explode(transform(
        sequence(lit(0L), (size(col("_toks")) - spanTokens).cast("long")),
        i => struct(i.as("pos"),
          md5(array_join(slice(col("_toks"), (i + 1).cast("int"), lit(spanTokens)), " "))
            .as("span")))).as("o"))
      .select(col("doc"), col("o.pos").as("pos"), col("o.span").as("span"))
    val removedPos = occ
      .withColumn("_rn",
        row_number().over(Window.partitionBy(col("span")).orderBy(col("doc"), col("pos"))))
      .where(col("_rn") > 1) // rn > 1 exists iff the span is duplicated
      .select(col("doc"),
        explode(sequence(col("pos"), col("pos") + (spanTokens - 1))).as("tp"))
      .distinct()
    val kept = toked
      .select(col("doc"), posexplode(col("_toks")).as(Seq("tp", "term")))
      .select(col("doc"), col("tp").cast("long").as("tp"), col("term"))
      .join(removedPos, Seq("doc", "tp"), "left_anti")
      .groupBy(col("doc"))
      .agg(transform(array_sort(collect_list(struct(col("tp"), col("term")))),
        s => s.getField("term")).as("_kt"))
    toked
      .select(col("doc"), size(col("_toks")).cast("long").as("_n"))
      .join(kept, Seq("doc"), "left_outer") // a doc can lose every token
      .select(col("doc"),
        coalesce(array_join(col("_kt"), " "), lit("")).as("clean_text"),
        coalesce(size(col("_kt")), lit(0)).cast("long").as("n_kept"),
        (col("_n") - coalesce(size(col("_kt")), lit(0))).cast("long").as("n_removed"))
  }

  /**
   * 16-bit SimHash fingerprint, weighted by term frequency: bit p of the
   * fingerprint = sign of Σ_terms cnt · (±1), where the ±1 for (term, p)
   * is derived from hex digit p of md5(term) (≥ '8' ⇒ +1). Deterministic
   * and engine-portable.
   */
  /**
   * `bits`-bit tf-weighted SimHash (default 16 for the historical
   * contract; use 32 at scale — 16 bits saturate once the corpus dwarfs
   * 2^16 and every hamming ball overflows). Bit p reads hex digit p of
   * md5(term), so bits ≤ 32.
   */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame = {
    require(bits >= 4 && bits <= 32, s"bits must be in [4,32], got $bits")
    val counts = docs
      .select(col("doc"), explode(tokensCol(col("line"))).as("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    // One groupBy(doc) with `bits` conditional sums: md5(term) is computed
    // ONCE per (doc, term) row and each bit position reads its own hex
    // digit (≥ '8' ⇒ +cnt else −cnt; lowercase hex compares identically
    // under any ASCII collation — oracle-portable). No bits× row explosion
    // and one shuffle fewer than a (doc, p) re-grouping.
    val withHash = counts.select(col("doc"), md5(col("term")).as("h"), col("cnt"))
    val sums = (1 to bits).map { p =>
      sum(when(substring(col("h"), p, 1) >= "8", col("cnt")).otherwise(-col("cnt")))
        .as(s"s$p")
    }
    withHash
      .groupBy(col("doc"))
      .agg(sums.head, sums.tail: _*)
      .select(col("doc"),
        (1 to bits)
          .map(p => when(col(s"s$p") > 0, lit(1L << (p - 1))).otherwise(lit(0L)))
          .reduce(_ + _).cast("long").as("simhash"))
  }

  /**
   * SimHash near-dup pairs within a Hamming ball, via sub-key banding:
   * a pair at Hamming distance ≤ 3 differs in at most 3 of the 4 4-bit
   * bands, so (pigeonhole) it shares at least one band exactly —
   * candidates come from an equi-join on (band, band_bits), never a
   * crossJoin. Scale cost is O(Σ bucket²) over 16-way-split buckets.
   */
  def simhashPairs(
      fingerprints: DataFrame,
      maxHamming: Int = 3,
      bits: Int = 16): DataFrame = {
    require(maxHamming <= 3, s"4-band pigeonhole covers hamming <= 3, got $maxHamming")
    require(bits % 4 == 0, s"bits must split into 4 equal bands, got $bits")
    val bandWidth = bits / 4
    val bandMask = (1L << bandWidth) - 1
    // Width contract: a 32-bit fingerprint banded with bits=16 would
    // silently band on the low half only and LOSE pairs — fail loudly
    // instead. Per-row codegen'd assert; coalesce keeps the predicate in
    // the plan (assert_true returns NULL when it passes).
    val widthOk = coalesce(assert_true(
      col("simhash") >= 0 && col("simhash") < lit(1L << bits),
      lit(s"simhash fingerprint exceeds $bits bits — pass bits= matching " +
        "the width the fingerprints were generated with")), lit(true))
    val banded = fingerprints.where(widthOk).select(col("doc"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b.toLong).as("band"),
          shiftright(col("simhash"), bandWidth * b).bitwiseAND(lit(bandMask))
            .as("band_bits"))): _*))
        .as("bb"))
      .select(col("doc"), col("simhash"), col("bb.band").as("band"),
        col("bb.band_bits").as("band_bits"))
    val a = banded.select(col("doc").as("d1"), col("simhash").as("h1"),
      col("band"), col("band_bits"))
    val b = banded.select(col("doc").as("d2"), col("simhash").as("h2"),
      col("band"), col("band_bits"))
    // Dedup multi-band matches WITHOUT a distinct exchange: keep a joined
    // row only when its band is the FIRST band where the pair agrees —
    // decidable per-row from h1^h2 alone, so it's a codegen'd filter
    // instead of a shuffle of every duplicated candidate.
    val diff = expr("h1 ^ h2")
    val firstMatchingBand = (0 until 4)
      .map(j => (shiftright(diff, bandWidth * j).bitwiseAND(lit(bandMask)) =!= 0L, j))
      .foldRight(lit(3L): Column) { case ((differs, j), tail) =>
        when(!differs, lit(j.toLong)).otherwise(tail)
      }
    a.join(b, Seq("band", "band_bits"))
      .where(col("d1") < col("d2") && col("band") === firstMatchingBand)
      .select(col("d1"), col("d2"), bit_count(diff).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /**
   * Generic CONNECTED COMPONENTS over an undirected edge list via
   * alternating LARGE-STAR / SMALL-STAR rounds (Kiveris, Lattanzi,
   * Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
   * and Beyond", SoCC 2014) — the closure whose round count is
   * O(log² n) in component SIZE, independent of component DIAMETER.
   * Min-label propagation ([[minhashClusterLabelsConverged]]) needs
   * diameter+1 rounds: a pathological 10⁶-doc boilerplate chain costs
   * 10⁶ shuffle rounds there but ~40 here, because each star round
   * re-points whole neighborhoods at the component minimum instead of
   * moving labels one hop. That makes this the 100 TB closure tier when
   * component shape is adversarial/unknown; min-label stays the cheaper
   * choice for the short chains real near-dup graphs usually have.
   *
   *   large-star(u): every neighbor v > u re-points to
   *                  m = min(N(u) ∪ {u})          — emits (v, m)
   *   small-star(u): over larger→smaller edges, every smaller neighbor
   *                  (and u itself) re-points to m = min N⁻(u)
   *
   * Both preserve connectivity (each output edge joins two nodes of the
   * same input component; every input adjacency stays connected through
   * m) and monotonically contract components toward their minimum; the
   * joint fixpoint is one star per component rooted at the component
   * min. Each round is two grouped min-shuffles + an equi-join per star
   * op — per-node state only, no neighbor lists collected, so a hot
   * node costs bandwidth, never memory. Convergence is DETECTED (edge
   * set unchanged — the symmetric-difference count rides the same
   * materializing action that releases the previous round's cache);
   * `maxIter` is a runaway bound that FAILS LOUDLY, the converged-tier
   * contract.
   *
   * `edges` needs (u, v) columns of any orderable type (doc-id-type
   * agnostic like the propagation tiers), self-loops/duplicates/
   * orientation all tolerated; `nodes` is the (doc) universe labels are
   * emitted for (isolated nodes label themselves). Returns (doc, lbl)
   * with lbl the component-minimum node id — the
   * [[minhashClusterLabelsConverged]] output contract.
   */
  def connectedComponents(
      edges: DataFrame,
      nodes: DataFrame,
      maxIter: Int = 30): DataFrame = {
    // Canonical larger→smaller orientation, self-loops dropped: the
    // small-star input shape, and the stable representation compared
    // across rounds for convergence detection.
    def canon(e: DataFrame): DataFrame = e
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
    // Lineage discipline: a star round reads `cur` SIX times (symmetrize,
    // two min-aggregates, two joins, a union), so persist alone would
    // still nest the logical plan 6^iter deep — plan-size blowup, not
    // data blowup. `localCheckpoint` (eager) truncates the plan to the
    // materialized partitions each round — the Bpe.learnMerges recipe.
    // (Cluster caveat, as there: localCheckpoint trades fault-tolerance
    // for speed; a lost executor fails the job. For a 100 TB run swap in
    // reliable `checkpoint` — same truncation, durable storage.)
    var cur = canon(edges.select(col("u"), col("v"))).localCheckpoint()
    var curCount = cur.count()
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      // LARGE-STAR over the symmetrized view: per node u the min over
      // N(u) ∪ {u}, then every strictly-larger neighbor re-points to it.
      val both = cur.unionByName(cur.select(col("v").as("u"), col("u").as("v")))
      val lsMin = both.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = both.join(lsMin, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // SMALL-STAR over larger→smaller edges: per node u the min smaller
      // neighbor; every other smaller neighbor AND u itself re-point to
      // it. (v < u on every canonical edge, so m < u always.)
      val lc = canon(large)
      val ssMin = lc.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = lc.join(ssMin, Seq("u"))
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(ssMin.select(col("u"), col("m").as("v")))
      // Eager checkpoint materializes the round; the convergence check is
      // then a bounded except() over two flat-plan, star-contracted
      // frames. Count inequality short-circuits it.
      val next = canon(small).localCheckpoint()
      val nextCount = next.count()
      changed = nextCount != curCount || next.except(cur).count() > 0
      cur = next
      curCount = nextCount
      iter += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"connectedComponents: edge set still changing after maxIter=" +
          s"$maxIter large/small-star rounds — raise maxIter " +
          "(convergence is the contract)")
    // Fixpoint is a star per component: u→root covers every non-root
    // node; roots and isolated nodes label themselves via the left join.
    val labels = cur.select(col("u").as("doc"), col("v").as("lbl"))
    nodes.select(col("doc"))
      .join(labels, Seq("doc"), "left")
      .select(col("doc"), coalesce(col("lbl"), col("doc")).as("lbl"))
  }

  /**
   * [[minhashClusterLabelsConverged]]'s answer computed by the
   * large/small-star algorithm instead of min-label propagation — same
   * (doc, lbl) contract, same true-connected-components oracle, a round
   * count that scales with log(component size) instead of diameter.
   * The doc↔bucket bipartite graph enters as PER-BUCKET STARS (every
   * bucket member → bucket-min doc): linear edges per bucket — a hot
   * bucket of B docs contributes B edges, never B² — with identical
   * components to the bucket clique.
   */
  def minhashClusterLabelsStar(
      docs: DataFrame,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      maxIter: Int = 30): DataFrame = {
    val bands = graft.Caching.persist(lshBands(
      minhashSignatures(shingles(docs, n), numHashes), numHashes, rowsPerBand))
    val bucketMin = bands
      .groupBy(col("band"), col("band_val"))
      .agg(min(col("doc")).as("bmin"))
    val edges = bands.join(bucketMin, Seq("band", "band_val"))
      .where(col("doc") =!= col("bmin"))
      .select(col("doc").as("u"), col("bmin").as("v"))
    val nodes = bands.select(col("doc")).distinct()
    val out = connectedComponents(edges, nodes, maxIter)
    graft.Caching.release(bands)
    out
  }

  /**
   * Transitive-closure dedup via [[minhashClusterLabelsStar]] — the
   * [[minhashDedupConverged]] twin on the diameter-independent closure:
   * identical survivor set (both compute true component minima), chosen
   * when the dup graph may carry long chains.
   */
  def minhashDedupStar(
      docs: DataFrame,
      n: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      maxIter: Int = 30): DataFrame = {
    val labels = minhashClusterLabelsStar(docs, n, numHashes, rowsPerBand, maxIter)
    val dropped = labels.where(col("lbl") < col("doc")).select(col("doc"))
    docs.join(dropped, Seq("doc"), "left_anti")
  }

  /**
   * FEATURE-HASHED bag-of-words vectors (the hashing trick; Weinberger
   * et al., ICML 2009) — the model-free text→vector bridge: each term
   * lands in bucket `md5("fh:"+term) mod dims` with a ±1 sign drawn
   * from the next md5 hex digit, and a doc's entry per bucket is the
   * signed sum of its term counts. No vocabulary pass, no dictionary
   * broadcast, no OOV bucket: the projection is per-row arithmetic any
   * engine replays byte-identically. The sign split keeps hash
   * collisions unbiased (colliding terms cancel in expectation), so
   * hashed cosine estimates true bag-of-words cosine.
   *
   * Scale shape: one (doc, term) count shuffle (the [[termWeights]]
   * frame) + a map-side bucket fold — at most `dims` rows per doc out,
   * integer weights, exact on every engine. Unlike [[denseTfVectors]]
   * this never collects a vocabulary: `dims` is fixed up front, so the
   * 100 TB corpus with an unbounded vocab still ships bounded rows.
   *
   * @return (doc, bucket, weight) with weight != 0
   */
  /**
   * Hashing-trick dimension sizing rule, in code (the deriveLshBits
   * convention; HashedStressMain measured the failure mode): the
   * inverted-index tier discriminates only while feature buckets stay
   * cold, which needs dims ≳ vocabulary — with vocab ≫ dims EVERY
   * bucket goes hot and candidate generation degenerates to all-pairs
   * (or, guarded, to nothing). Rule: next power of two ≥ 2·vocab
   * (load factor ≤ 0.5 keeps the birthday-collision weight noise
   * negligible), clamped to [64, 2^22]. Callers measure vocab with a
   * cheap distinct-term count — the deriveLshBits(n) calling shape.
   */
  def deriveHashedDims(vocabSize: Long): Int = {
    require(vocabSize >= 0, s"vocabSize must be >= 0, got $vocabSize")
    val needed = java.lang.Long.highestOneBit(
      math.max(1L, 2L * vocabSize - 1L)) * 2L
    math.min(1 << 22, math.max(64L, needed)).toInt
  }

  def hashedFeatures(docs: DataFrame, dims: Int = 64): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    val h = md5(concat(lit("fh:"), col("term")))
    termWeights(docs)
      .withColumn("bucket",
        conv(substring(h, 1, 8), 16, 10).cast("long") % dims)
      .withColumn("sign",
        lit(1L) - lit(2L) *
          (conv(substring(h, 9, 1), 16, 10).cast("long") % 2L))
      .groupBy(col("doc"), col("bucket"))
      .agg(sum(col("sign") * col("tf")).as("weight"))
      .where(col("weight") =!= 0)
  }

  /**
   * SPARSE COSINE near-dup pairs over [[hashedFeatures]] vectors via an
   * INVERTED-INDEX self-join — the third text-similarity scale shape
   * next to shingle-Jaccard (q12/q13) and weighted-Jaccard (q146):
   * candidate pairs are generated only where two docs share a non-hot
   * feature bucket, then each candidate's dot product is computed
   * EXACTLY over all its shared buckets (the guard shapes candidate
   * generation only — it cannot perturb a reported cosine, the q81
   * invisible-optimization contract). Cosine is integer dot over
   * integer norms, rounded once at the end (round-6, the q102b float
   * convention).
   *
   * Scale shape: the index join fans out per BUCKET, so the worst case
   * is bounded by the hottest admitted bucket (≤ maxBucketDocs² pairs),
   * never by corpus²; norms are one per-doc aggregate reused across all
   * pairs. Recall caveat, documented: a pair sharing ONLY hot buckets
   * is never generated — at real corpus shapes hot buckets are the
   * stopword mass whose cosine contribution least distinguishes docs.
   *
   * @return (doc_a, doc_b, cos) with doc_a < doc_b and cos >= threshold
   */
  /** Dims bound for the DENSE hashed-cosine verify route: a dims-long
    * vector per doc (32 KB of longs at the bound) — the per-doc-state
    * class the dense weighted-Jaccard route already draws at
    * [[MaxDenseVocab]]. Past it the sparse term join wins on memory. */
  val MaxDenseCosineDims = 4096

  /** Per-doc DENSE weight vectors over [[hashedFeatures]] output —
    * (doc, vec array<long>, n2) with n2 = Σ w² (integer-exact). The
    * verify-stage twin of `denseTfVectors`: candidate dots become ONE
    * codegen'd [[org.apache.spark.sql.graft.LongDot]] per pair instead
    * of a (pair × shared-bucket)-row join + aggregation exchange —
    * at the r13 measurement that join carried ~37 M rows for q153c's
    * 1.19 M candidates (guide §2.3 "aggregate before you shuffle" /
    * §2.4 "remove shuffles outright"). Integer weights make the dense
    * and sparse dots EQUAL, not approximately equal: absent buckets
    * contribute exactly 0. */
  private def denseHashedVecs(feats: DataFrame, dims: Int): DataFrame =
    feats.groupBy(col("doc"))
      .agg(map_from_entries(collect_list(
        struct(col("bucket").cast("int"), col("weight")))).as("_m"))
      .select(col("doc"),
        transform(sequence(lit(0), lit(dims - 1)),
          i => coalesce(element_at(col("_m"), i), lit(0L))).as("_vec"))
      .withColumn("_n2",
        org.apache.spark.sql.graft.VectorFunctions.longDot(col("_vec"), col("_vec")))

  /** The shared cos scoring tail: exact integer dot + norms → round-6
    * double, identical expression tree in the dense and sparse routes. */
  private def cosOf(dot: Column, na2: Column, nb2: Column): Column =
    round(dot.cast("double") /
      (sqrt(na2.cast("double")) * sqrt(nb2.cast("double"))), 6)

  /** @param maxDenseDims route gate (tests force the sparse route with
    *        0); the routes are answer-equal by construction and
    *        re-proven by the route-equality property test. */
  def hashedCosinePairs(
      docs: DataFrame,
      dims: Int = 64,
      threshold: Double = 0.9,
      maxBucketDocs: Long = 100000L,
      maxDenseDims: Int = MaxDenseCosineDims): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    require(maxBucketDocs >= 1, s"maxBucketDocs must be >= 1, got $maxBucketDocs")
    val feats = graft.Caching.persist(hashedFeatures(docs, dims))
    val cold = feats.groupBy(col("bucket"))
      .agg(count(lit(1)).as("_docs"))
      .where(col("_docs") <= maxBucketDocs)
      .select(col("bucket"))
    val indexed = feats.join(broadcast(cold), Seq("bucket"))
    val cands = indexed.select(col("bucket"), col("doc").as("doc_a"))
      .join(indexed.select(col("bucket"), col("doc").as("doc_b")), Seq("bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val scored =
      if (dims <= maxDenseDims) {
        // DENSE verify: one row-local LongDot per candidate — no
        // (pair × bucket) fan-out, no per-pair aggregation exchange.
        // Same integer dot, same norms, same rounding ⇒ same answer
        // (HashedCosineProperties re-proves route equality).
        val vecs = denseHashedVecs(feats, dims)
        cands
          .join(vecs.select(col("doc").as("doc_a"), col("_vec").as("_va"),
            col("_n2").as("_na2")), Seq("doc_a"))
          .join(vecs.select(col("doc").as("doc_b"), col("_vec").as("_vb"),
            col("_n2").as("_nb2")), Seq("doc_b"))
          .withColumn("_dot",
            org.apache.spark.sql.graft.VectorFunctions.longDot(col("_va"), col("_vb")))
      } else {
        // SPARSE verify (dims past the dense bound): only shared
        // buckets join; the guard keeps the fan bounded per bucket.
        val fa = feats.select(col("doc").as("doc_a"), col("bucket"),
          col("weight").as("_wa"))
        val fb = feats.select(col("doc").as("doc_b"), col("bucket"),
          col("weight").as("_wb"))
        val norms = feats.groupBy(col("doc"))
          .agg(sum(col("weight") * col("weight")).as("_n2"))
        cands
          .join(fa, Seq("doc_a"))
          .join(fb, Seq("doc_b", "bucket"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(sum(col("_wa") * col("_wb")).as("_dot"))
          .join(norms.select(col("doc").as("doc_a"), col("_n2").as("_na2")),
            Seq("doc_a"))
          .join(norms.select(col("doc").as("doc_b"), col("_n2").as("_nb2")),
            Seq("doc_b"))
      }
    scored
      .withColumn("cos", cosOf(col("_dot"), col("_na2"), col("_nb2")))
      .where(col("cos") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("cos"))
  }

  /**
   * [[hashedCosinePairs]] with dims AUTO-SIZED from the corpus's own
   * distinct-term count via [[deriveHashedDims]] — the q5d pattern: the
   * sizing rule HashedStressMain measured, applied in code instead of
   * left to the caller. The vocabulary count is one driver action over
   * a V-bounded aggregate (the nearDupScreen hot-set kind of
   * plan-sizing decision), after which the plan is [[hashedCosinePairs]]
   * verbatim — on any corpus where the rule lands on the same dims a
   * caller would pass, the answer is identical by construction (the
   * q153d oracle is q153b's SQL verbatim for exactly that reason).
   */
  def hashedCosinePairsAuto(
      docs: DataFrame,
      threshold: Double = 0.9,
      maxBucketDocs: Long = 100000L): DataFrame = {
    val vocab = termWeights(docs).select(col("term")).distinct().count()
    hashedCosinePairs(docs, deriveHashedDims(vocab), threshold, maxBucketDocs)
  }

  /**
   * BAG-OF-WORDS fingerprint — md5 of the SORTED token multiset: the
   * dedup key order-insensitive duplicates hide behind. Exact dedup
   * (q11) misses a shuffled copy entirely and MinHash (q13) only
   * scores it high-but-uncertain; the sorted-multiset key makes
   * "same words, same counts, any order" an exact 32-byte equality —
   * template spam, column-reordered CSV rows, scrambled scrape dups.
   *
   * Scale shape: map-only per row (tokenize, sort within the row,
   * hash); the sort is per-document, never a shuffle. Composes with
   * the whole exact-dedup machinery ([[exactGroups]]' count/keeper
   * aggregate, [[exactDedupAgainst]]'s anti-join) by substituting
   * this fingerprint for md5(line).
   */
  def bowFingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc"),
      md5(array_join(array_sort(tokensCol(col("line"))), " ")).as("bow_fp"))

  /** Per-fingerprint dup groups over [[bowFingerprints]] — the
    * [[exactGroups]] aggregate on the order-insensitive key. */
  def bowGroups(docs: DataFrame): DataFrame =
    bowFingerprints(docs)
      .groupBy(col("bow_fp"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc")).as("keeper"))

  /**
   * Incremental BOW dedup — [[exactDedupAgainst]] on the
   * order-insensitive key: drop arriving docs whose SORTED token
   * multiset already exists in `seenBowFps` (a single `bow_fp` column,
   * e.g. persisted from [[bowGroups]]). Same anti-join scale shape,
   * same does-not-self-dedup contract (compose with [[bowGroups]]'
   * keeper filter when the increment may carry internal shuffled dups).
   */
  def bowDedupAgainst(newDocs: DataFrame, seenBowFps: DataFrame): DataFrame =
    newDocs.join(seenBowFps.select(col("bow_fp")),
      md5(array_join(array_sort(tokensCol(col("line"))), " ")) === col("bow_fp"),
      "left_anti")

  /**
   * Incremental [[hashedCosinePairs]] — the daily-ingest twin (the
   * q40/q52/q152 family): arriving docs' hashed vectors probe the
   * HISTORY's inverted index on cold buckets; intra-delta pairs are
   * never formed (no self-join — an increment dedups against itself
   * with the batch operator first, the standing contract). The guard
   * bounds the HISTORY side of the index, so a hot bucket in the
   * history can't fan a delta row out past maxBucketDocs candidates;
   * as in the batch tier it shapes candidate generation only — every
   * reported cosine is the full exact dot over all shared buckets.
   *
   * Scale shape: history features/norms are computed once per batch of
   * deltas (persist upstream across micro-batches at 100 TB — the
   * frame is ≤ dims rows per history doc); per delta the work is one
   * bucket-keyed probe + a candidate-bounded dot join.
   *
   * @return (doc, hist_doc, cos) with cos >= threshold
   */
  def hashedCosineAgainst(
      newDocs: DataFrame,
      historyDocs: DataFrame,
      dims: Int = 64,
      threshold: Double = 0.9,
      maxBucketDocs: Long = 100000L,
      maxDenseDims: Int = MaxDenseCosineDims): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    require(maxBucketDocs >= 1, s"maxBucketDocs must be >= 1, got $maxBucketDocs")
    // two feature-table persists (delta + history) outlive the method —
    // the cold-bucket screen, candidate probe, dot join, and both norm
    // aggregates all read them; only the caller's scope can release.
    graft.Caching.requireScope("Dedup.hashedCosineAgainst")
    val fNew = graft.Caching.persist(hashedFeatures(newDocs, dims))
    val fHist = graft.Caching.persist(hashedFeatures(historyDocs, dims))
    val cold = fHist.groupBy(col("bucket"))
      .agg(count(lit(1)).as("_docs"))
      .where(col("_docs") <= maxBucketDocs)
      .select(col("bucket"))
    val cands = fNew.select(col("bucket"), col("doc"))
      .join(fHist.join(broadcast(cold), Seq("bucket"))
        .select(col("bucket"), col("doc").as("hist_doc")), Seq("bucket"))
      .select(col("doc"), col("hist_doc")).distinct()
    val scored =
      if (dims <= maxDenseDims) {
        // DENSE verify (the hashedCosinePairs route, delta⋈history
        // keyed): one LongDot per candidate in place of the
        // (candidate × shared-bucket) join + aggregation exchange —
        // measured r13, q153c's verify carried ~37 M joined rows /
        // ~200 task-seconds for 1.19 M candidates; the dense route
        // is one map-side lookup join per side.
        val vNew = denseHashedVecs(fNew, dims)
        val vHist = denseHashedVecs(fHist, dims)
        cands
          .join(vNew.select(col("doc"), col("_vec").as("_vn"),
            col("_n2").as("_nn2")), Seq("doc"))
          .join(vHist.select(col("doc").as("hist_doc"), col("_vec").as("_vh"),
            col("_n2").as("_nh2")), Seq("hist_doc"))
          .withColumn("_dot",
            org.apache.spark.sql.graft.VectorFunctions.longDot(col("_vn"), col("_vh")))
      } else {
        val nNew = fNew.groupBy(col("doc"))
          .agg(sum(col("weight") * col("weight")).as("_nn2"))
        val nHist = fHist.groupBy(col("doc"))
          .agg(sum(col("weight") * col("weight")).as("_nh2"))
        cands
          .join(fNew.select(col("doc"), col("bucket"), col("weight").as("_wn")),
            Seq("doc"))
          .join(fHist.select(col("doc").as("hist_doc"), col("bucket"),
            col("weight").as("_wh")), Seq("hist_doc", "bucket"))
          .groupBy(col("doc"), col("hist_doc"))
          .agg(sum(col("_wn") * col("_wh")).as("_dot"))
          .join(nNew, Seq("doc"))
          .join(nHist.withColumnRenamed("doc", "hist_doc"), Seq("hist_doc"))
      }
    scored
      .withColumn("cos", cosOf(col("_dot"), col("_nn2"), col("_nh2")))
      .where(col("cos") >= threshold)
      .select(col("doc"), col("hist_doc"), col("cos"))
  }
}
