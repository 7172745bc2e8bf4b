package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (builder-prompt extension
 * surface; SURVEY.md §7.4). Input shape: (vec_id, embedding array<float>).
 *
 * Vector math runs through the codegen-native `DotProduct` expression
 * (org.apache.spark.sql.graft.VectorExpressions) — no UDF, no interpreted
 * lambdas,
 * no driver collect. Arithmetic is done in double (cast from float) with
 * a sequential-fold sum, so results are portable across engines.
 *
 * Scale design:
 *  - Norms are computed ONCE per vector before any pair join, so the
 *    O(n²) pair stage does exactly one dot product per pair (vs three
 *    when cosine recomputes both norms pairwise).
 *  - `cosineTopK` is the exact baseline: broadcast the (small) query set,
 *    stream the corpus once, per-query top-k via window row_number. At
 *    1000 executors this is a map-only pass over the corpus + one shuffle
 *    of the scored survivors.
 *  - `lshCosineTopK` is the scale path: `bits` random-hyperplane sign bits
 *    (hyperplane directions derived deterministically from md5 — no RNG
 *    state to ship to executors); candidates restricted to same-bucket,
 *    then exact re-rank. Recall < 1, cost ~2^bits-fold lower.
 */
object Similarity {

  import org.apache.spark.sql.graft.VectorFunctions.dotProduct

  /** Sentinel `bits` value: derive the hyperplane count from the corpus
    * size (`deriveLshBits`) instead of trusting a fixed default. */
  val AutoBits: Int = -1

  /** Hot-bucket guard bound for the near-dup pair join — buckets with
    * more vectors than this are excluded from pairing (O(m²) straggler
    * risk); embedding buckets are coarser than MinHash band buckets, so
    * the bound is looser than `Dedup.MaxPairBucket`. */
  val MaxPairBucket = 5000

  /** Plan-unique suffix for observe() metric names (Spark requires
    * distinct CollectMetrics names within one query plan). */
  private val obsId = new java.util.concurrent.atomic.AtomicInteger()

  /**
   * LSH bucket-bit sizing rule, in code (the round-2 verdict's ask):
   * candidate volume ≈ tables · n²/2^bits, so target mean bucket size
   * `targetBucket` via 2^bits ≈ n/targetBucket, clamped to [4, 20].
   * At the measured 20k-vector stress point this yields 8 bits (the
   * no-cliff setting); at n ≤ 1600 it yields the floor of 4.
   */
  def deriveLshBits(n: Long, targetBucket: Long = 100L): Int = {
    require(targetBucket > 0)
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(20, math.max(4, needed))
  }

  /** Σ aᵢ·bᵢ over two array<double> columns — codegen-native. */
  def dot(a: Column, b: Column): Column = dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** (prefix_vec_id, prefix_emb, prefix_nrm) — norm materialized once per
    * vector so pair joins pay a single dot product per pair. */
  private def withNorm(df: DataFrame, prefix: String): DataFrame =
    df.select(col("vec_id").as(s"${prefix}_vec_id"),
        asDouble(col("embedding")).as(s"${prefix}_emb"))
      .withColumn(s"${prefix}_nrm",
        sqrt(dot(col(s"${prefix}_emb"), col(s"${prefix}_emb"))))

  /**
   * Exact brute-force top-k cosine neighbors for each query vector.
   * @param corpus  (vec_id, embedding)
   * @param queries (vec_id, embedding), small — gets broadcast
   */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = withNorm(corpus, "n")
    val q = withNorm(queries, "q")
    val scored = c
      .join(broadcast(q), col("q_vec_id") =!= col("n_vec_id"))
      .withColumn("cos", round(
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")), 6))
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("cos").desc, col("n_vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_vec_id"), col("n_vec_id"), col("cos"), col("rank"))
  }

  /** All-pairs cosine ≥ threshold (embedding near-dup tier). O(n²) —
    * exact verification tier; bucket with LSH first at scale. */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = withNorm(corpus, "a")
    val b = withNorm(corpus, "b")
    a.join(b, col("a_vec_id") < col("b_vec_id"))
      .withColumn("cos", round(
        dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")), 6))
      .where(col("cos") >= threshold)
      .select(col("a_vec_id").as("d1"), col("b_vec_id").as("d2"), col("cos"))
  }

  /**
   * Per-vector int8 quantization — the storage/bandwidth lever for
   * 100 TB embedding tables: scale = (max − min)/255,
   * q_i = clamp(⌊(x_i − min)/scale + 0.5⌋, 0, 255), reconstruction
   * x̂_i = min + q_i·scale (error ≤ scale/2 per dimension). Quantized
   * vectors drive the cheap candidate stages (bucketing, coarse scoring)
   * at 4× less memory; exact re-ranks stay on the fp column. Constant
   * vectors (scale 0) quantize to all-zeros. Pure codegen column
   * expressions — map-only, deterministic, engine-portable (explicit
   * +0.5-then-floor instead of engine-specific rounding modes).
   */
  def quantizeInt8(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("minv", array_min(col("emb")))
      .withColumn("scale", (array_max(col("emb")) - col("minv")) / lit(255.0))
      .withColumn("q",
        when(col("scale") === 0, transform(col("emb"), _ => lit(0)))
          .otherwise(transform(col("emb"), x =>
            least(greatest(floor((x - col("minv")) / col("scale") + lit(0.5)),
              lit(0.0)), lit(255.0)).cast("int"))))

  /** Reconstruction of a quantized vector: x̂_i = min + q_i·scale. */
  def dequantizeInt8(quantized: DataFrame): DataFrame =
    quantized.withColumn("emb_approx",
      transform(col("q"), qi => col("minv") + qi * col("scale")))

  /**
   * Sign-matrix random projection (Achlioptas ±1 JL transform) to
   * `outDim` dimensions: projected_p = ⟨emb, r_p⟩ / √outDim with the
   * SAME deterministic hyperplane rows the LSH family uses
   * (`signRow` — md5-derived, so engine and oracle share the matrix).
   * The other memory lever next to [[quantizeInt8]]: fewer dims instead
   * of narrower cells, and the standard pre-pass that brings
   * wider-than-[[MaxDim]] vectors under the LSH ceiling, or shrinks the
   * exact-rerank dot products of the ANN tiers.
   *
   * Map-only and codegen'd — `outDim` dot products per row against
   * literal sign arrays, no shuffle; the JL guarantee (pairwise inner
   * products preserved within ±ε for outDim ≈ ln n/ε²) is pinned by the
   * recall contract query rather than trusted (q80b: exact top-k on the
   * projection vs on the original).
   */
  def randomProject(corpus: DataFrame, outDim: Int): DataFrame = {
    require(outDim >= 1 && outDim <= MaxDim,
      s"outDim must be in [1, $MaxDim], got $outDim")
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    corpus.select(col("vec_id"), asDouble(col("embedding")).as("embedding"))
      .where(dimGuard(col("embedding")))
      .select(col("vec_id"),
        array((0 until outDim).map(p =>
          dotProduct(col("embedding"), typedLit(signRow(p))) * lit(scale)): _*)
          .as("projected"))
  }

  /** Hyperplane directions support vectors up to this dimension. Inputs
    * beyond it fail loudly (see `dimGuard`) — silent truncation to the
    * first 1024 dims would quietly degrade bucket quality. */
  val MaxDim = 1024

  /** Per-row dimensionality assert for LSH paths: codegen'd, map-only;
    * `coalesce` keeps the predicate in the plan (assert_true returns NULL
    * when it passes, so the filter keeps every valid row). */
  private def dimGuard(emb: Column): Column =
    coalesce(assert_true(size(emb) <= MaxDim,
      concat(lit(s"embedding dimension "), size(emb),
        lit(s" exceeds MaxDim=$MaxDim — hyperplane sign rows are only " +
          "defined up to that; raise Similarity.MaxDim for wider vectors"))),
      lit(true))

  /**
   * Deterministic pseudo-random hyperplane sign r_h[j] ∈ {−1, +1}: hex
   * digit (j mod 16) of md5("h:j"), ≥ '8' ⇒ +1. The signs depend only on
   * (h, j), so the whole matrix is computed ONCE driver-side and shipped
   * as literal arrays — the per-row work is `bits` codegen'd dot products,
   * not bits×dim md5 calls.
   */
  private def signRow(h: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until MaxDim).map { j =>
      val hex = md.digest(s"$h:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.charAt(j % 16) >= '8') 1.0 else -1.0
    }
  }

  /** `bits`-bit random-hyperplane bucket id for an array<double> column. */
  def lshBucketCol(emb: Column, bits: Int): Column =
    (0 until bits).map { h =>
      when(dotProduct(emb, typedLit(signRow(h))) > 0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Corpus annotated with its LSH bucket. */
  def withLshBucket(corpus: DataFrame, bits: Int = 8): DataFrame =
    corpus.select(col("vec_id"), asDouble(col("embedding")).as("embedding"))
      .where(dimGuard(col("embedding")))
      .withColumn("bucket", lshBucketCol(col("embedding"), bits))

  /**
   * LSH-bucketed near-dup pairs — the scale path for `nearDupPairs`:
   * `tables` independent hyperplane tables of `bits` bits each (table t,
   * bit i uses hyperplane t·bits + i); candidate pairs share at least one
   * table's bucket, then an exact cosine ≥ threshold re-rank verifies.
   * Recall for a pair at cosine s is 1 − (1 − p^bits)^tables with
   * p = 1 − acos(s)/π — the multi-table OR keeps recall high for true
   * near-dups while never forming the O(n²) pair space: each table's
   * self-join shuffles on (t, bucket) and costs O(Σ bucket²).
   *
   * `bits` SIZES ITSELF WITH THE CORPUS by default (`AutoBits`): the
   * measured cliff (BASELINE.md: bits=4 at 20k vectors ⇒ ~100 M
   * candidates / 110 s, bits=8 ⇒ 14.5 s with recall intact) is a sizing
   * rule, so it lives in code, not scaladoc — `deriveLshBits` picks
   * 2^bits ≈ n/100 from a cheap count of the already-persisted corpus
   * frame (the count doubles as the cache warm-up, so it costs nothing
   * extra). Pass an explicit `bits` only to pin a contract.
   */
  def lshNearDupPairs(
      corpus: DataFrame,
      threshold: Double,
      bits: Int = AutoBits,
      tables: Int = 4,
      maxBucketSize: Int = MaxPairBucket): DataFrame = {
    val e = graft.Caching.persist(
      corpus.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
        .where(dimGuard(col("emb")))
        .withColumn("nrm", sqrt(dot(col("emb"), col("emb")))))
    val resolvedBits = if (bits == AutoBits) deriveLshBits(e.count()) else bits
    val bucketStructs = (0 until tables).map { t =>
      struct(
        lit(t.toLong).as("t"),
        (0 until resolvedBits).map { i =>
          when(dotProduct(col("emb"), typedLit(signRow(t * resolvedBits + i))) > 0,
            lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _).as("bucket"))
    }
    val tb = e.select(col("vec_id"), explode(array(bucketStructs: _*)).as("tb"))
      .select(col("vec_id"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    // Hot-bucket guard (same rationale as Dedup.MaxPairBucket): a bucket
    // of m vectors costs O(m²) in the pair join, so degenerate buckets
    // are excluded rather than allowed to become the stage's straggler;
    // the skip is a plan metric, and the oracle mirrors the bound.
    val ok = tb.groupBy(col("t"), col("bucket")).agg(count(lit(1)).as("bucket_n"))
      .observe(s"graft_emb_bucket_guard_${obsId.incrementAndGet()}",
        sum(when(col("bucket_n") > maxBucketSize, lit(1L)).otherwise(lit(0L)))
          .as("skipped_buckets"),
        sum(when(col("bucket_n") > maxBucketSize, col("bucket_n")).otherwise(lit(0L)))
          .as("skipped_rows"))
      .where(col("bucket_n") <= maxBucketSize)
      .select(col("t"), col("bucket"))
    val bounded = tb.join(ok, Seq("t", "bucket"))
    val cand = bounded.select(col("vec_id").as("d1"), col("t"), col("bucket"))
      .join(bounded.select(col("vec_id").as("d2"), col("t"), col("bucket")), Seq("t", "bucket"))
      .where(col("d1") < col("d2"))
      .select(col("d1"), col("d2"))
      .distinct()
    val v1 = e.select(col("vec_id").as("d1"), col("emb").as("e1"), col("nrm").as("n1"))
    val v2 = e.select(col("vec_id").as("d2"), col("emb").as("e2"), col("nrm").as("n2"))
    cand.join(v1, "d1").join(v2, "d2")
      .withColumn("cos", round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .where(col("cos") >= threshold)
      .select(col("d1"), col("d2"), col("cos"))
  }

  /**
   * IVF (inverted-file) approximate top-k — the coarse-quantizer scale
   * path. Centroids are a deterministic corpus sample (vec_id ≡ 0 mod
   * `stride` — no RNG, no trained model, so the cell layout is
   * reproducible across engines); every vector joins the broadcast
   * centroid set once and keeps its max-cosine centroid as its cell (a
   * partial-aggregated argmax — one map-only pass plus a ~1-row-per-vec
   * shuffle, never a window over the n×k cross). Queries probe their
   * `nProbe` nearest cells and exact-cosine re-rank only those cells'
   * members, cutting the scan to ~nProbe/k of the corpus.
   */
  /** (vec_id, emb, nrm) with double-cast embedding and materialized norm. */
  private def normed(df: DataFrame): DataFrame =
    df.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))

  /** Deterministic IVF coarse quantizer: every stride-th vector is a
    * centroid (cent_id, c_emb, c_nrm). */
  private def ivfCentroids(n: DataFrame, stride: Int): DataFrame =
    n.where(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("cent_id"), col("emb").as("c_emb"),
        col("nrm").as("c_nrm"))

  /** Argmax-centroid cell per vector (ties to the smallest cent_id) —
    * the ONE assignment definition shared by the direct path and the
    * materialized index, so index probes reproduce `ivfCosineTopK`
    * bit-for-bit. */
  private def ivfAssign(n: DataFrame, cents: DataFrame): DataFrame =
    n.crossJoin(broadcast(cents))
      .withColumn("ccos", dot(col("emb"), col("c_emb")) / (col("nrm") * col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(first(col("emb")).as("emb"), first(col("nrm")).as("nrm"),
        max_by(col("cent_id"), struct(col("ccos"), -col("cent_id"))).as("cell"))

  /** Top-nProbe cells per query + the query vector/norm carried along. */
  private def ivfProbes(
      queries: DataFrame, cents: DataFrame, nProbe: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_vec_id"),
        asDouble(col("embedding")).as("q_emb"))
      .withColumn("q_nrm", sqrt(dot(col("q_emb"), col("q_emb"))))
    val wProbe = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    q.crossJoin(broadcast(cents))
      .withColumn("ccos", dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= nProbe)
      .select(col("q_vec_id"), col("q_emb"), col("q_nrm"), col("cent_id").as("cell"))
  }

  /** Exact cosine re-rank of cell-matched candidates to top-k. */
  private def ivfRerank(
      assign: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    assign.join(broadcast(probes), Seq("cell"))
      .where(col("q_vec_id") =!= col("vec_id"))
      .withColumn("cos", round(
        dot(col("q_emb"), col("emb")) / (col("q_nrm") * col("nrm")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_vec_id"), col("vec_id").as("n_vec_id"), col("cos"), col("rank"))
  }

  def ivfCosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      stride: Int = 100,
      nProbe: Int = 2): DataFrame = {
    val n = normed(corpus)
    val cents = ivfCentroids(n, stride)
    ivfRerank(ivfAssign(n, cents), ivfProbes(queries, cents, nProbe), k)
  }

  /**
   * MATERIALIZED IVF index — the `Search.buildIndex` recipe for the ANN
   * tier: cell assignments written Hive-partitioned BY CELL (one
   * directory per inverted list) plus the centroid table, so a probe
   * touches only nProbe of the ~n/stride cell directories instead of
   * re-deriving assignments over the whole corpus per query batch. At
   * 100 TB the index is built once per ingest and each query batch
   * reads a few lists — the file layout IS the index.
   */
  def buildAnnIndex(corpus: DataFrame, path: String, stride: Int = 100): Unit = {
    val n = normed(corpus)
    val cents = ivfCentroids(n, stride)
    ivfAssign(n, cents)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    cents.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /**
   * Probe a [[buildAnnIndex]] layout: queries pick their nProbe cells
   * against the (broadcast) persisted centroids, and the cell join
   * against the partitioned scan prunes to those directories via
   * DYNAMIC partition pruning (the probe side is a runtime value, so
   * planning-time pruning cannot apply — the DPP subquery filter on the
   * scan is asserted in SimilaritySpec). Results are bit-identical to
   * [[ivfCosineTopK]] (same assignment/probe/re-rank definitions —
   * q82's oracle is q26's SQL verbatim, the index-roundtrip contract).
   */
  def searchAnnIndexed(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 2): DataFrame = {
    val assign = spark.read.parquet(s"$path/cells")
      .select(col("vec_id"), col("emb"), col("nrm"), col("cell").cast("long"))
    val cents = spark.read.parquet(s"$path/centroids")
    ivfRerank(assign, ivfProbes(queries, cents, nProbe), k)
  }

  /**
   * Approximate top-k: exact cosine re-rank restricted to same-bucket
   * candidates. The bucket join shuffles on the bucket id — at scale this
   * replaces the corpus-wide scan per query with a 1/2^bits slice.
   */
  def lshCosineTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 8): DataFrame = {
    // norms materialized once per vector — the pair stage pays a single
    // dot product per candidate, like cosineTopK
    val c = withLshBucket(corpus, bits)
      .select(col("vec_id").as("n_vec_id"), col("embedding").as("n_emb"), col("bucket"))
      .withColumn("n_nrm", sqrt(dot(col("n_emb"), col("n_emb"))))
    val q = withLshBucket(queries, bits)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"), col("bucket"))
      .withColumn("q_nrm", sqrt(dot(col("q_emb"), col("q_emb"))))
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .where(col("q_vec_id") =!= col("n_vec_id"))
      .withColumn("cos", round(
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")), 6))
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("cos").desc, col("n_vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_vec_id"), col("n_vec_id"), col("cos"), col("rank"))
  }

  /**
   * MULTI-PROBE LSH top-k — the recall lever that costs probes, not
   * memory: each query inspects its own hyperplane bucket PLUS every
   * bucket at Hamming distance 1 (one sign bit flipped), so a true
   * neighbor that landed just across one hyperplane is recovered
   * without doubling the table count (Lv et al., VLDB 2007: perturbing
   * the query's bucket approximates what extra independent tables buy,
   * at zero extra index footprint). With `bits` hyperplanes a query
   * probes bits+1 buckets — recall rises toward the exact scan's while
   * the corpus-side layout (ONE bucket per vector) is unchanged.
   *
   * Scale shape: identical to [[lshCosineTopK]] — the probe expansion
   * is a query-side explode (queries are the tiny side and stay
   * broadcast), the join still keys on the bucket id, and each (query,
   * candidate) pair appears at most once because a corpus vector lives
   * in exactly one bucket and the probe set is distinct by
   * construction — no dedup exchange. Candidate volume is (bits+1)/2^bits
   * of the corpus per query in expectation.
   */
  def lshCosineTopKMultiProbe(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      bits: Int = 8): DataFrame = {
    val c = withLshBucket(corpus, bits)
      .select(col("vec_id").as("n_vec_id"), col("embedding").as("n_emb"), col("bucket"))
      .withColumn("n_nrm", sqrt(dot(col("n_emb"), col("n_emb"))))
    val probeSet = array(
      col("bucket") +: (0 until bits).map(i =>
        col("bucket").bitwiseXOR(lit(1L << i))): _*)
    val q = withLshBucket(queries, bits)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"),
        explode(probeSet).as("bucket"))
      .withColumn("q_nrm", sqrt(dot(col("q_emb"), col("q_emb"))))
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .where(col("q_vec_id") =!= col("n_vec_id"))
      .withColumn("cos", round(
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")), 6))
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("cos").desc, col("n_vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_vec_id"), col("n_vec_id"), col("cos"), col("rank"))
  }
}
