package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/**
 * θ-heavy-hitter (hot-key) detection — the skew radar in front of every
 * shuffle-on-key decision. A key is HOT when it carries at least
 * ⌈θ·N⌉ of the N input rows; the hot set is what a planner feeds the
 * salting strategy (`TfIdf.tfidfSalted`-style `(key, salt)` shuffles),
 * an AQE skew hint, or a hot-bucket guard (`Dedup.MaxPairBucket`).
 *
 * Two tiers, one answer:
 *  - [[hotKeys]] — exact: one partial-aggregated shuffle over every
 *    key + a broadcast 1-row total. The right call when the key space
 *    is modest (it already shuffles only (key, count) pairs).
 *  - [[hotKeysSketched]] — the 100 TB screen: a count-min sketch built
 *    in one scan (fixed depth×width counters, INDEPENDENT of key
 *    cardinality — an exact count's shuffle grows with distinct keys,
 *    the sketch does not), then a codegen'd per-row estimate filter
 *    that rides the scan, so the confirming groupBy only ever shuffles
 *    rows of CANDIDATE keys. Count-min only over-counts (collisions
 *    add), so the screen keeps every true hot key and the exact confirm
 *    drops the false positives — the output equals [[hotKeys]] for any
 *    sketch size, which is why both share one oracle.
 *
 * Sizing rule IN CODE (`deriveEps`): the screen is useful while the
 * over-count stays well under the threshold, so eps defaults to θ/10
 * (width ≈ ⌈e/eps⌉ counters — at θ = 1e-4 that is ~270 k longs ≈ 2 MB,
 * still cardinality-free). Keys are probed through `xxhash64`: a 64-bit
 * hash collision merges two keys' counts — again only an over-count,
 * soaked up by the confirm.
 */
object HotKeys {

  /** eps for the sketch screen: a tenth of the hot threshold, so the
    * guaranteed over-count (≤ eps·N at `confidence`) cannot promote a
    * key that is an order of magnitude below hot. */
  def deriveEps(theta: Double): Double = theta / 10.0

  /** Exact θ-heavy keys of `keyCol`: (key, cnt, freq), key-ordered.
    * One hash shuffle (map-side partial counts) + broadcast total. */
  def hotKeys(df: DataFrame, keyCol: String, theta: Double): DataFrame = {
    require(theta > 0 && theta < 1, s"theta must be in (0,1), got $theta")
    val tot = df.agg(count(lit(1)).as("n_rows"))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .where(col("cnt") >= ceil(lit(theta) * col("n_rows")))
      .select(col(keyCol), col("cnt"),
        round(col("cnt") / col("n_rows"), 6).as("freq"))
      .orderBy(col(keyCol))
  }

  /** Sketch-screened twin of [[hotKeys]] — identical output, but the
    * confirming aggregation only shuffles rows whose key the count-min
    * sketch estimates at ≥ ⌈θ·N⌉ (the screen predicate is per-key
    * deterministic, so a surviving key keeps ALL its rows and its
    * confirm count is exact). Two scans (sketch build + screened agg),
    * one sliver-sized shuffle; N comes exactly from the sketch's own
    * totalCount, not a third pass. */
  def hotKeysSketched(
      df: DataFrame,
      keyCol: String,
      theta: Double,
      eps: Double = -1.0,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val (bytes, n) = buildSketch(df, keyCol, theta, eps, confidence, seed)
    val threshold = math.max(1L, math.ceil(theta * n).toLong)
    df.where(org.apache.spark.sql.graft.CmsFunctions
        .estimateLong(xxhash64(col(keyCol)), bytes) >= threshold)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= threshold)
      .select(col(keyCol), col("cnt"),
        round(col("cnt") / lit(n.toDouble), 6).as("freq"))
      .orderBy(col(keyCol))
  }

  /** Audit twin (the `bloomScreenStats` contract here): 1 row of
    * (n_candidate_rows, n_screened_out) — how much of the input the
    * sketch kept from the confirm shuffle. A degrading screen (eps too
    * coarse for θ) shows up as n_candidate_rows ≈ N. */
  def hotKeyScreenStats(
      df: DataFrame,
      keyCol: String,
      theta: Double,
      eps: Double = -1.0,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val (bytes, n) = buildSketch(df, keyCol, theta, eps, confidence, seed)
    val threshold = math.max(1L, math.ceil(theta * n).toLong)
    val pass = org.apache.spark.sql.graft.CmsFunctions
      .estimateLong(xxhash64(col(keyCol)), bytes) >= threshold
    df.agg(
      count(when(pass, 1)).as("n_candidate_rows"),
      count(when(!pass, 1)).as("n_screened_out"))
  }

  /**
   * Skew-aware inner equi-join on `key` — the radar FEEDING a plan
   * decision. Hot keys (count ≥ ⌈θ·N⌉ of the left input, detected via
   * the sketch screen) take a salted path: left hot rows get a
   * deterministic salt (xxhash64 of the whole row, mod `salts`) and
   * right hot rows are replicated once per salt, so one hot key's pairs
   * spread over `salts` reducers instead of one straggler partition.
   * Cold keys join untouched. The union is EXACTLY the plain join —
   * salting is row replication on the build side only, never a filter —
   * which is the oracle contract (q81 compares against the plain SQL
   * join).
   *
   * Driver safety is by construction: at threshold θ there can be at
   * most ⌊1/θ⌋ hot keys, so the collected hot set is bounded no matter
   * how large the input (θ = 0.001 ⇒ ≤ 1000 keys in an `isin` set the
   * codegen'd scans check). AQE's skew-join handles sort-merge spills
   * adaptively at runtime; this operator is the DECLARATIVE version for
   * when the hot keys should be known, logged, and stable across runs
   * (and it works under broadcast-disabled shuffle joins, where AQE's
   * OptimizeSkewedJoin cannot split a hash-partitioned build side).
   */
  def skewJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      theta: Double = 0.001,
      salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val hot = hotKeysSketched(left, key, theta)
      .select(col(key)).collect().map(_.get(0)).toSeq
    if (hot.isEmpty) return left.join(right, Seq(key))
    val isHot = col(key).isin(hot: _*)
    val cold = left.where(!isHot).join(right.where(!isHot), Seq(key))
    val saltedLeft = left.where(isHot).withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts.toLong)))
    val repRight = right.where(isHot).withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    val hotJoined = saltedLeft.join(repRight, Seq(key, "_salt")).drop("_salt")
    cold.unionByName(hotJoined)
  }

  /** Bloom-pruned inner join — answer-invisible join-site filtering
    * (the q81 contract: the oracle is the plain SQL join verbatim).
    *
    * A Bloom sketch of the dim side's key fingerprints rides to the
    * fact scan as a broadcast literal (~10 bits/key at 1 % fpp — a
    * 1e9-key dim is a ~1.2 GB filter where its payload columns could
    * be 100× that), so non-matching fact rows are dropped BEFORE the
    * shuffle instead of after it. The inner join then removes the
    * false positives exactly: fpp only costs extra shuffled rows,
    * never a wrong answer, and a false negative is impossible
    * (`mightContain` has none). This is the declarative cousin of
    * Spark's runtime row-level bloom injection
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) for when the
    * dim side is an arbitrary derived frame the optimizer won't sketch,
    * and it composes with any join the planner then picks.
    *
    * When the dim is small enough to broadcast whole, the planner's
    * broadcast-hash join already does better — this operator's window
    * is a dim too wide to broadcast with payloads but whose KEY set
    * still fits a sketch.
    */
  def bloomJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    val bytes = Dedup.bloomBytesOf(
      dim.select(xxhash64(col(dimKey)).as("h")), expectedItems, fpp)
    val pruned = fact.where(
      org.apache.spark.sql.graft.BloomFunctions
        .mightContainLong(xxhash64(col(factKey)), bytes))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }

  /** One-scan sketch build over xxhash64(key) (the treeAggregate shape
    * the Bloom screen uses — partial sketches merged pairwise; an empty
    * input yields the empty sketch and a 0 total). Returns (serialized
    * sketch, exact row count via totalCount). */
  private def buildSketch(
      df: DataFrame,
      keyCol: String,
      theta: Double,
      eps: Double,
      confidence: Double,
      seed: Int): (Array[Byte], Long) = {
    require(theta > 0 && theta < 1, s"theta must be in (0,1), got $theta")
    require(confidence > 0 && confidence < 1,
      s"confidence must be in (0,1), got $confidence")
    val e = if (eps > 0) eps else deriveEps(theta)
    val hashes = df.select(xxhash64(col(keyCol)).as("h"))
    val cms = hashes.rdd.treeAggregate(CountMinSketch.create(e, confidence, seed))(
      (s, row) => { s.addLong(row.getLong(0)); s },
      (a, b) => { a.mergeInPlace(b); a })
    (cms.toByteArray, cms.totalCount())
  }
}
