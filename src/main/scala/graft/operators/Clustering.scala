package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed Lloyd k-means over an embedding column, and the
 * SemDeDup-style semantic dedup built on top of it (cluster first, then
 * drop near-duplicates WITHIN each cluster — arXiv:2303.09540's recipe
 * for embedding-level dedup of web-scale corpora). Extension surface
 * beyond the reference (builder prompt: training-data pipeline ops);
 * input shape matches the similarity tier: (vec_id, embedding
 * array<float>, …).
 *
 * Everything is deterministic — centroid seeds are a stride sample of
 * the corpus (no RNG), ties break to the smallest centroid id, and each
 * Lloyd update rounds centroid coordinates to 6 decimals — so results
 * are reproducible across engines and retries, and the DuckDB oracle
 * can unroll the same iterations as generated SQL (the q28b pattern).
 *
 * Scale shape (the point of k-means at 100 TB):
 *  - The centroid frame is k rows of d doubles — BROADCAST to every
 *    executor; assignment is a map-side cross of corpus × centroids
 *    followed by a partial-aggregated per-vector argmax (the IVF
 *    assign shape, `Similarity.ivfCosineTopK`).
 *  - The centroid UPDATE is a per-(cell, dim) partial-aggregated mean:
 *    posexplode fans each vector into d (cell, dim, value) rows that
 *    combine map-side, so the shuffle carries ~k·d partial sums per
 *    partition, not the corpus.
 *  - Each iteration's centroid frame is persisted (k·d doubles — tiny),
 *    truncating recomputation of the iterative lineage; the corpus
 *    frame is persisted once and re-scanned per iteration, which is the
 *    canonical distributed-k-means cost: O(iters) corpus passes.
 *  - `semanticDedup`'s pair join runs per-cell, so clustering IS the
 *    bucketing: candidate volume drops from O(n²) to O(Σ cell²) ≈
 *    O(n²/k), with the same hot-bucket guard as the LSH tiers
 *    (degenerate cells are skipped, observably, not allowed to
 *    straggle).
 */
object Clustering {

  import org.apache.spark.sql.graft.VectorFunctions.dotProduct

  /** Hot-cell guard bound for the semantic-dedup pair join — same
    * rationale and bound as `Similarity.MaxPairBucket`. */
  val MaxPairCell = 5000

  /** Plan-unique suffix for observe() metric names. */
  private val obsId = new java.util.concurrent.atomic.AtomicInteger()

  private def dot(a: Column, b: Column): Column = dotProduct(a, b)

  /** (vec_id, emb array<double>, nrm) with the norm materialized once. */
  private def normalized(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))

  /** Per-vector argmax-cosine centroid: map-side broadcast cross +
    * partial-aggregated max_by; ties break to the smallest centroid id.
    * The winning cosine rides along as `ccos` (rounded to 6 — the
    * engine-portable convention) — it is the centroid-distance signal
    * SemDeDup's farthest-from-centroid keeper ranks by. */
  private def assignCells(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("ccos", dot(col("emb"), col("cemb")) / (col("nrm") * col("cnrm")))
      .groupBy(col("vec_id"))
      .agg(first(col("emb")).as("emb"), first(col("nrm")).as("nrm"),
        max_by(col("cent"), struct(col("ccos"), -col("cent"))).as("cell"),
        round(max(col("ccos")), 6).as("ccos"))

  /**
   * Lloyd k-means by cosine: deterministic stride-sampled seeds
   * (vec_id ≡ 0 mod `stride`, the IVF convention — k scales with the
   * corpus), `iters` assign/update rounds, then a final assignment.
   *
   * @return (vec_id, emb, nrm, cell, ccos) — cell is the seed id of the
   *         winning centroid (cluster labels are stable across engines);
   *         ccos its cosine, the centroid-proximity signal
   */
  def kmeans(corpus: DataFrame, stride: Int = 50, iters: Int = 2): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // the normalized-corpus persist + the final centroid frame outlive
    // the method (iteration centroids release per round); scope required
    // — transitively covers coverageSample / semanticDedup* /
    // clusterTopTerms, which all ride this assignment.
    graft.Caching.requireScope("Clustering.kmeans")
    val e = graft.Caching.persist(normalized(corpus))
    var cents = e.where(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").as("cent"), col("emb").as("cemb"), col("nrm").as("cnrm"))
    var prevCents: DataFrame = null
    (1 to iters).foreach { _ =>
      // Lloyd update: element-wise mean per cell, ROUNDED to 6 decimals
      // so the iteration stays in lockstep across engines (the mean's
      // accumulation order differs between engines; the rounded value
      // doesn't, away from measure-zero boundaries)
      cents = graft.Caching.persist(assignCells(e, cents)
        .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => round(x("m"), 6)).as("cemb"))
        .select(col("cell").as("cent"), col("cemb"),
          sqrt(dot(col("cemb"), col("cemb"))).as("cnrm")))
      // k·d doubles — persisting truncates the iterative recompute; the
      // superseded round's frame releases immediately (only the LATEST
      // centroid frame is live — each round reads its predecessor once)
      if (prevCents != null) graft.Caching.release(prevCents)
      prevCents = cents
    }
    assignCells(e, cents)
  }

  /**
   * Per-cluster contingency summary against a label column: size,
   * majority label (ties to the smallest label), purity. With random
   * labels purity ≈ 1/|labels| — this is a determinism contract for the
   * clustering, and a quality probe when labels are real.
   *
   * @param assign (vec_id, …, cell) — `kmeans` output
   * @param labels (vec_id, label)
   */
  def clusterSummary(assign: DataFrame, labels: DataFrame): DataFrame =
    assign.join(labels, Seq("vec_id"))
      .groupBy(col("cell"), col("label")).agg(count(lit(1)).as("n"))
      .groupBy(col("cell"))
      .agg(sum(col("n")).as("size"),
        max_by(col("label"), struct(col("n"), -col("label"))).as("maj_label"),
        max(col("n")).as("maj_n"))
      .select(col("cell"), col("size"), col("maj_label"),
        round(col("maj_n") / col("size"), 6).as("purity"))

  /**
   * CLUSTER LABELING — the "what IS this cluster" readout: per k-means
   * cell, the top-k most DISTINCTIVE terms of its members' text, scored
   * by integer-exact lift — how over-represented the term is in the
   * cell relative to the whole corpus:
   *   score_micro = ⌊ cnt_ct · tot_toks · 1e6 / (toks_c · cnt_t) ⌋
   * (cnt_ct = term count inside the cell, toks_c = cell token total,
   * cnt_t = corpus term count, tot_toks = corpus token total). 1e6 =
   * "as expected"; a cell whose members mention a term 5× more often
   * than the corpus scores 5e6. Pure BIGINT products in DECIMAL with
   * floor division — engine-exact, no float ratios. Terms under
   * `minCount` occurrences in the cell are suppressed (noise floor);
   * the TOTALS still count them, so the denominator is honest.
   *
   * Scale shape: corpus rows are touched once (the token explode,
   * pre-filtered to docs that HAVE an embedding by the assignment
   * join); everything after operates on the persisted (cell, term)
   * count table — one groupBy exchange to build it, vocabulary-scale
   * joins for the totals (cell totals broadcast — cells ≪ vocab), and
   * ONE k-bounded window per cell (WindowGroupLimit heaps). The 1-row
   * corpus total joins as a broadcast cross.
   *
   * @param assign (vec_id, …, cell) — `kmeans` output
   * @param docs   (doc, line) with doc ~ vec_id
   * @return (cell, term, cnt, score_micro, rnk), rnk ≤ k per cell
   */
  def clusterLabels(
      assign: DataFrame,
      docs: DataFrame,
      k: Int = 5,
      minCount: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    import graft.functions.TextAnalysis
    val terms = docs.join(assign, docs("doc") === assign("vec_id"))
      .select(col("cell"), explode(TextAnalysis.toks(col("line"))).as("term"))
    val ct = graft.Caching.persist(
      terms.groupBy(col("cell"), col("term")).agg(count(lit(1)).as("cnt")))
    val cellTot = ct.groupBy(col("cell")).agg(sum(col("cnt")).as("toks_c"))
    val termTot = ct.groupBy(col("term")).agg(sum(col("cnt")).as("cnt_t"))
    val tot = ct.agg(sum(col("cnt")).as("tot_toks"))
    val num = col("cnt").cast("decimal(38,0)") * col("tot_toks") * lit(1000000L)
    val den = col("toks_c").cast("decimal(38,0)") * col("cnt_t")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
      .orderBy(col("score_micro").desc, col("term"))
    ct.where(col("cnt") >= minCount)
      .join(broadcast(cellTot), Seq("cell"))
      .join(termTot, Seq("term"))
      .crossJoin(broadcast(tot))
      .select(col("cell"), col("term"), col("cnt"),
        ((num - pmod(num, den)) / den).cast("long").as("score_micro"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /**
   * Cluster-COVERAGE sampling — diversity-preserving downsampling:
   * keep the `perCell` members closest to each k-means centroid (by
   * the rounded assignment cosine, ties to the smallest vec_id). Where
   * random sampling thins dense regions and sparse regions alike, this
   * keeps one representative per discovered mode — the cheap
   * prototype-selection recipe behind coreset-style training-set
   * pruning (cluster then keep exemplars; cf. SemDeDup's converse,
   * which DROPS within-cluster redundancy).
   *
   * Scale shape: the clustering's own cost dominates; selection adds
   * ONE window partitioned by cell — parallel across cells, heap-bound
   * per task. Never a global sort.
   */
  def coverageSample(
      corpus: DataFrame,
      stride: Int = 50,
      iters: Int = 2,
      perCell: Int = 1): DataFrame = {
    require(perCell > 0, s"perCell must be positive, got $perCell")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell")).orderBy(col("ccos").desc, col("vec_id"))
    kmeans(corpus, stride, iters)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= perCell)
      .select(col("cell"), col("vec_id"), col("ccos"), col("rnk"))
  }

  /** Survivor-choice strategy for [[semanticDedup]]. */
  sealed trait Keeper
  object Keeper {
    /** Keep the smallest-id member of a duplicate pair (the
      * `Dedup.minhashDedup` convention — deterministic, quality-blind). */
    case object MinId extends Keeper
    /** The SemDeDup paper's keeper (arXiv:2303.09540): keep the member
      * FARTHEST from its centroid (lowest assigned-centroid cosine) —
      * duplicates cluster near their centroid, so the far member
      * preserves the most diversity. Ties break to the smaller id. */
    case object FarthestFromCentroid extends Keeper
  }

  /**
   * SemDeDup: k-means cluster, then within each cell drop every vector
   * DOMINATED by a cell-mate at cosine ≥ `threshold` — dominance is the
   * keeper strategy's total order (one-hop, like `Dedup.minhashDedup`):
   * [[Keeper.MinId]] orders by id; [[Keeper.FarthestFromCentroid]]
   * orders by (centroid cosine asc, id), the paper's diversity-keeping
   * choice. The pair join never leaves a cell, so candidate volume is
   * O(Σ cell²); cells above `maxCellSize` are excluded from pairing
   * (members all survive) and counted in a plan metric rather than
   * becoming the stage straggler.
   *
   * @return surviving (vec_id, cell) rows
   */
  def semanticDedup(
      corpus: DataFrame,
      threshold: Double,
      stride: Int = 50,
      iters: Int = 2,
      maxCellSize: Int = MaxPairCell,
      keeper: Keeper = Keeper.MinId): DataFrame = {
    require(threshold > 0 && threshold < 1,
      s"threshold must be in (0,1), got $threshold")
    graft.Caching.requireScope("Clustering.semanticDedup")
    val a = graft.Caching.persist(kmeans(corpus, stride, iters))
    val ok = a.groupBy(col("cell")).agg(count(lit(1)).as("cell_n"))
      .observe(s"graft_semdedup_cell_guard_${obsId.incrementAndGet()}",
        sum(when(col("cell_n") > maxCellSize, lit(1L)).otherwise(lit(0L)))
          .as("skipped_cells"),
        sum(when(col("cell_n") > maxCellSize, col("cell_n")).otherwise(lit(0L)))
          .as("skipped_rows"))
      .where(col("cell_n") <= maxCellSize)
      .select(col("cell"))
    val m = a.join(broadcast(ok), Seq("cell"))
    // d1 dominates d2 ⇒ d2 is droppable; the order is strict and total
    // (id is unique), so every duplicate pair is visited exactly once
    val dominates = keeper match {
      case Keeper.MinId => col("d1") < col("d2")
      case Keeper.FarthestFromCentroid =>
        struct(col("c1"), col("d1")) < struct(col("c2"), col("d2"))
    }
    val drops = m.select(col("cell"), col("vec_id").as("d1"),
        col("emb").as("e1"), col("nrm").as("n1"), col("ccos").as("c1"))
      .join(m.select(col("cell"), col("vec_id").as("d2"),
        col("emb").as("e2"), col("nrm").as("n2"), col("ccos").as("c2")),
        Seq("cell"))
      .where(dominates)
      .where(round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 6)
        >= threshold)
      .select(col("d2").as("vec_id")).distinct()
    a.join(drops, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  /**
   * CLUSTER TOP TERMS — the interpretability readout for [[kmeans]]:
   * per cluster, the k most DISTINCTIVE terms of its member documents,
   * scored cnt_in_cluster × ⌊N/df⌋ — the reference engine's own
   * floor-division idf (quirk Q3) recruited as the distinctiveness
   * weight, so the whole score is one exact long per (cell, term).
   * "Cluster 17 is 〈spark, stream, state, …〉" is the difference
   * between a clustering you can audit and an opaque partition.
   *
   * Documents link to vectors by id (the corpus convention: doc_id =
   * vec_id); docs without an embedding don't participate, and N is
   * the count of linked docs with ≥ 1 token (the frame every other
   * aggregate here reads).
   *
   * Scale shape: [[kmeans]]'s broadcast-centroid assignment + one
   * tokenized scan feeding two term-keyed aggregates (the persisted
   * token frame is read twice); N rides a 1-row broadcast cross; the
   * rank is a per-cell WindowGroupLimit top-k.
   *
   * @param embs (vec_id, embedding); docs (doc, line)
   * @return (cell, term, score, rk) — rk 1..k within the cell
   */
  def clusterTopTerms(
      embs: DataFrame,
      docs: DataFrame,
      k: Int = 5,
      stride: Int = 50,
      iters: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.Caching.requireScope("Clustering.clusterTopTerms")
    val assign = kmeans(embs, stride, iters)
    val dj = docs.join(assign, docs("doc") === assign("vec_id"))
      .select(col("cell"), col("doc"), col("line"))
    val tok = graft.Caching.persist(dj.select(col("cell"), col("doc"),
      explode(filter(split(col("line"), "\\s+"), t => length(t) > 0))
        .as("term")))
    val cellCnt = tok.groupBy(col("cell"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val df = tok.select(col("doc"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = tok.select(col("doc")).distinct().agg(count(lit(1)).as("_n"))
    val scored = cellCnt.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("cell"), col("term"),
        (col("cnt") * expr("_n div df")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
  }
}
