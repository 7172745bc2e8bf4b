package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/**
 * Graph analytics over corpus-derived graphs. The first resident is
 * PageRank over the term co-occurrence graph — the "which terms are
 * central to this corpus" signal that complements raw counts (q37) and
 * PMI (q39): a term ranks high when it co-occurs with other
 * well-connected terms, not merely when it is frequent.
 *
 * Everything here follows the repo's iterative-operator recipe
 * (Dedup.minhashClusterLabelsConverged): per-iteration persist of the
 * new state, one materializing action that doubles as the loop's
 * progress check, release of the previous iteration's cache — linear
 * lineage, no exponential plan nesting.
 */
object Graph {

  /**
   * PAGERANK over the windowed term co-occurrence graph, INTEGER-EXACT.
   *
   * Graph: nodes are terms; an undirected edge joins t1—t2 when the
   * pair co-occurs within `window` positions at least `minCount` times
   * ([[TextAnalysis.cooccurrencePairs]] multiset semantics, exactly
   * q39's pair relation). Self-loops (a term repeating inside its own
   * window) are dropped; terms with no surviving edge are not in the
   * graph. Symmetrizing makes every node's out-degree ≥ 1, so there are
   * NO dangling nodes and the damping redistribution term vanishes —
   * the recurrence is purely local.
   *
   * Arithmetic: ranks live in integer MICRO units (start 1_000_000 per
   * node) and the standard damping-0.85 update is evaluated with
   * integer floor division only —
   *   r' = 150000 + (85 · Σ_in (r div deg)) div 100
   * — so a fixed iteration count yields bit-identical ranks on ANY
   * engine (the oracle unrolls the same recurrence as chained CTEs).
   * The floor-div mass leakage is ≤ deg ulps per node per iteration —
   * micro units make that ≤ ~1e-5 relative, invisible next to the
   * round-6 contracts elsewhere and irrelevant to ordering.
   *
   * Scale shape — TWO TIERS, auto-selected on the MEASURED edge count
   * (the q5d radar precedent; both tiers run the identical integer
   * recurrence, so the selection is answer-invisible by construction):
   *
   *  - DRIVER tier (E ≤ driverMaxEdges): the pruned co-occurrence
   *    graph collects and the 10 rounds run as driver Long loops. The
   *    collect is bounded by the GATE, not by data — past it the
   *    distributed tier runs — which puts it in the PQ-codebook /
   *    NB-model bounded-collect class. This exists because the
   *    distributed loop's cost at small E is pure per-round JOB
   *    overhead: the sf0.1 graph is 930 edges, yet 10 rounds × 2
   *    exchanges of it cost ~4.6 s of scheduling for microseconds of
   *    arithmetic (GraphProfileMain, BASELINE.md round-7).
   *  - DISTRIBUTED tier (E > driverMaxEdges): the edge list
   *    (src, dst, deg) is built once, pre-partitioned by src, and
   *    persisted — each of the `iters` rounds shuffles only the
   *    (term, rank) pair frame (16 B values) into that partitioning,
   *    then one (dst)-keyed partial-agg exchange. State is O(V + E)
   *    on executors, per-round cost two exchanges of vocabulary-scale
   *    rows — corpus rows are touched exactly once, in the pair scan.
   *
   * Iteration count is FIXED (PageRank needs a fixed point only
   * approximately; 10 damped rounds is the conventional truncation),
   * so no convergence detection job is needed in either tier.
   *
   * CACHE LIFECYCLE CONTRACT: the DISTRIBUTED tier registers one lazy
   * cache point per round (that is what keeps planning linear and the
   * whole chain a single job), and — because nothing materializes
   * until the caller's action — no round can be released from inside
   * this method; the scope is the release point. That tier therefore
   * FAILS LOUDLY at construction unless a [[graft.Caching.scoped]]
   * block is open (the API-level assert, round-7; CachingSpec pins
   * it). The driver tier is self-contained — its one probe persist is
   * released before returning — and needs no scope.
   *
   * @return (term, rank_micro) for every node of the graph
   */
  def termPageRank(
      docs: DataFrame,
      window: Int = 2,
      minCount: Int = 2,
      iters: Int = 10,
      driverMaxEdges: Long = DriverMaxEdges): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(iters >= 1 && iters <= 100,
      s"iters must be in [1,100], got $iters")
    require(driverMaxEdges >= 0,
      s"driverMaxEdges must be >= 0, got $driverMaxEdges")
    val pc = TextAnalysis.cooccurrencePairs(docs, window)
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount && col("t1") =!= col("t2"))
      .select(col("t1"), col("t2"))
    // symmetrize, attach out-degrees, co-locate by src for the loop
    val edges = pc.select(col("t1").as("src"), col("t2").as("dst"))
      .union(pc.select(col("t2").as("src"), col("t1").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // materialize once to read the tier radar (the edge count); both
    // tiers consume this frame
    val edgesDeg = edges.join(deg, Seq("src")).repartition(col("src")).persist()
    val e = edgesDeg.count()
    if (e <= driverMaxEdges) {
      val rows = edgesDeg.select(col("src"), col("dst"), col("deg")).collect()
      edgesDeg.unpersist(blocking = false)
      val spark = docs.sparkSession
      import spark.implicits._
      if (rows.isEmpty) return Seq.empty[(String, Long)].toDF("term", "rank_micro")
      val idx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      def idOf(t: String): Int = idx.getOrElseUpdate(t, idx.size)
      val srcIds = new Array[Int](rows.length)
      val dstIds = new Array[Int](rows.length)
      val degOf = new Array[Long](rows.length)
      var k = 0
      while (k < rows.length) {
        srcIds(k) = idOf(rows(k).getString(0))
        dstIds(k) = idOf(rows(k).getString(1))
        degOf(k) = rows(k).getLong(2)
        k += 1
      }
      val v = idx.size
      var r = Array.fill(v)(1000000L)
      for (_ <- 1 to iters) {
        // the EXACT distributed recurrence: Long floor division on
        // positive operands = Spark's `div`, contributions summed per
        // dst, then r' = 150000 + (85·s) div 100
        val s = new Array[Long](v)
        var i = 0
        while (i < rows.length) {
          s(dstIds(i)) += r(srcIds(i)) / degOf(i)
          i += 1
        }
        r = s.map(x => 150000L + 85L * x / 100L)
      }
      idx.iterator.map { case (t, i) => (t, r(i)) }.toSeq
        .toDF("term", "rank_micro")
    } else {
      graft.Caching.requireScope("Graph.termPageRank (distributed tier)")
      graft.Caching.adopt(edgesDeg)
      var ranks = graft.Caching.persist(
        deg.select(col("src").as("term"), lit(1000000L).as("r")))
      // Fixed iteration count ⇒ no per-round convergence check is
      // needed, so NOTHING materializes inside the loop: each round's
      // persist marks the frame for caching and the single consuming
      // action computes all rounds in ONE job (2·iters chained
      // stages), caches filling as they go — still linear lineage
      // (each round reads the previous round's cache point, never its
      // expanded plan), without the iters extra count() jobs whose
      // scheduling overhead dominated the measured wall-clock. Memory
      // holds iters vocabulary-scale rank frames until the consumer
      // finishes; the required Caching scope releases them (the
      // converged-dedup tiers keep the materialize-and-release loop
      // because they READ a per-round change count — PageRank doesn't).
      for (_ <- 1 to iters) {
        val next = edgesDeg
          .join(ranks, edgesDeg("src") === ranks("term"))
          .select(col("dst"), expr("r div deg").as("c"))
          .groupBy(col("dst"))
          .agg(sum(col("c")).as("s"))
          .select(col("dst").as("term"),
            expr("150000L + (85 * s) div 100").as("r"))
        ranks = graft.Caching.persist(next)
      }
      ranks.select(col("term"), col("r").as("rank_micro"))
    }
  }

  /** Edge-count gate for [[termPageRank]]'s driver tier: below it the
    * 10-round loop is per-round job overhead on a tiny frame and runs
    * as driver Long arithmetic; above it the distributed loop runs.
    * The collect this admits is bounded by the gate itself. */
  val DriverMaxEdges: Long = 1L << 17

  /**
   * TRIANGLE participation counts over the same windowed co-occurrence
   * graph — the local clustering signal: a term in many triangles
   * lives in a tight topical clique (its neighbors also co-occur with
   * each other); a high-degree term with few triangles is a hub
   * bridging unrelated contexts (stopword-like). The classic
   * complement to PageRank's global centrality.
   *
   * Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
   * "Counting triangles and the curse of the last reducer", WWW 2011).
   * Orient every undirected edge from its lower to its higher endpoint
   * under the total order ≺ = (degree, term); each triangle x≺y≺z then
   * materializes EXACTLY once, as the wedge (x→y, x→z) closed by the
   * oriented edge y→z. Wedge generation per node is bounded by its
   * OUT-degree, which the orientation caps at O(√E) — the skewed
   * stopword hub that would generate deg² wedges in a naive join emits
   * almost none, because nearly all its edges point INTO it. That is
   * the whole fix for the last-reducer curse; no hot-key guard needed.
   *
   * Scale shape: edge list built once (the q117 pair scan), degrees
   * one vocabulary-scale agg; the wedge self-join keys on the pivot
   * and the closing check is a semi-join on the (y, z) edge key —
   * every exchange carries edge/wedge rows, never corpus rows. Counts
   * are integers: engine-exact with no rounding contract at all.
   *
   * @return (term, n_triangles) for every term in ≥ 1 triangle
   */
  def triangleCounts(
      docs: DataFrame,
      window: Int = 2,
      minCount: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val und = coocEdges(docs, window, minCount)
    val oriented = graft.Caching.persist(
      orientedEdges(und, termDegrees(und)))
    perTermTriangles(oriented)
  }

  /** Canonical undirected co-occurrence edges (t1 < t2, one row per
    * edge) — the shared graph-construction stage of q117/q127. */
  /**
   * K-CORE of the term co-occurrence graph — the "dense topical
   * kernel" extractor: iteratively peel nodes whose CURRENT degree is
   * below `k` until only nodes with ≥ k surviving neighbors remain.
   * Stopword hubs survive (high degree); the long tail and weakly
   * attached bridge terms peel away — the standard graph-density
   * complement to PageRank's centrality (q117) and the triangle tier's
   * cliquishness (q127/q191).
   *
   * Semantics: a FIXED `rounds` peel (each round removes every node
   * with degree < k simultaneously), the engine-replayable truncation
   * convention (q117's fixed iteration count, q182's fixed power
   * rounds). Truncation can only OVER-include: peeling is monotone, so
   * nodes removed by round R are never in the true k-core and the
   * R-round survivor set shrinks to the exact core once R ≥ the
   * graph's peel depth — GraphSpec pins a depth-2 fixture converging
   * inside the default. Counts are integers end to end; no rounding
   * contract at all.
   *
   * Scale shape: the same two tiers as [[termPageRank]], radar-gated
   * on the measured edge count. Driver tier (E ≤ driverMaxEdges):
   * arrays, with early exit on a fixed point (answer-identical — the
   * remaining rounds are no-ops by monotonicity). Distributed tier:
   * per round one degree aggregate + two semi-joins over the
   * vocabulary-scale edge frame. Lineage discipline differs from the
   * PageRank loop: a peel round reads its OWN edge frame twice and the
   * alive frame twice, so lazy cache-chaining still nests the plan
   * ~4^rounds deep (plan-size blowup, not data blowup — the
   * star-closure lesson); each round therefore `localCheckpoint`s
   * eagerly and releases its predecessor, with the same count-based
   * early exit as the driver tier (peeling only removes, so an equal
   * edge count IS the fixed point). Self-contained — no Caching scope
   * needed; only the final round's checkpoint backs the returned frame.
   *
   * @return (term, deg) for surviving nodes — deg measured INSIDE the
   *         surviving subgraph after the final round
   */
  def kCore(
      docs: DataFrame,
      k: Int,
      window: Int = 2,
      minCount: Int = 2,
      rounds: Int = 8,
      driverMaxEdges: Long = DriverMaxEdges): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(window >= 1, s"window must be >= 1, got $window")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(rounds >= 1 && rounds <= 64,
      s"rounds must be in [1,64], got $rounds")
    require(driverMaxEdges >= 0,
      s"driverMaxEdges must be >= 0, got $driverMaxEdges")
    val und = coocEdges(docs, window, minCount)
    val sym = und.select(col("t1").as("src"), col("t2").as("dst"))
      .union(und.select(col("t2").as("src"), col("t1").as("dst")))
      .persist()
    val e = sym.count()
    if (e <= driverMaxEdges) {
      val rows = sym.collect()
      sym.unpersist(blocking = false)
      val spark = docs.sparkSession
      import spark.implicits._
      if (rows.isEmpty) return Seq.empty[(String, Long)].toDF("term", "deg")
      val idx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      def idOf(t: String): Int = idx.getOrElseUpdate(t, idx.size)
      val srcIds = rows.map(r => idOf(r.getString(0)))
      val dstIds = rows.map(r => idOf(r.getString(1)))
      val v = idx.size
      val alive = Array.fill(v)(true)
      val deg = new Array[Long](v)
      var changed = true
      var round = 0
      while (round < rounds && changed) {
        java.util.Arrays.fill(deg, 0L)
        var i = 0
        while (i < srcIds.length) {
          if (alive(srcIds(i)) && alive(dstIds(i))) deg(srcIds(i)) += 1L
          i += 1
        }
        changed = false
        i = 0
        while (i < v) {
          if (alive(i) && deg(i) < k) { alive(i) = false; changed = true }
          i += 1
        }
        round += 1
      }
      // final in-core degrees
      java.util.Arrays.fill(deg, 0L)
      var i = 0
      while (i < srcIds.length) {
        if (alive(srcIds(i)) && alive(dstIds(i))) deg(srcIds(i)) += 1L
        i += 1
      }
      // deg > 0 matches the distributed tier's final groupBy exactly: a
      // node whose last neighbors died in the final (truncated) round
      // has no surviving edge rows and is absent there too
      idx.iterator.collect {
        case (t, j) if alive(j) && deg(j) > 0 => (t, deg(j))
      }.toSeq.toDF("term", "deg")
    } else {
      import org.apache.spark.sql.graft.CheckpointSupport
      var edges = sym.localCheckpoint()
      sym.unpersist(blocking = false)
      var curCount = e
      var round = 0
      var changed = true
      while (round < rounds && changed) {
        val alive = edges.groupBy(col("src")).agg(count(lit(1)).as("_d"))
          .where(col("_d") >= k.toLong).select(col("src"))
        val next = edges
          .join(alive, Seq("src"), "left_semi")
          .join(alive.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
          .select(col("src"), col("dst"))
          .localCheckpoint()
        val nextCount = next.count()
        changed = nextCount != curCount
        CheckpointSupport.releaseLocalCheckpoint(edges)
        edges = next
        curCount = nextCount
        round += 1
      }
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(col("src").as("term"), col("deg"))
    }
  }

  private def coocEdges(docs: DataFrame, window: Int, minCount: Int): DataFrame =
    TextAnalysis.cooccurrencePairs(docs, window)
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount && col("t1") =!= col("t2"))
      .select(col("t1"), col("t2"))

  /** (term, deg) over the undirected edge list. */
  private def termDegrees(und: DataFrame): DataFrame =
    und.select(col("t1").as("term"))
      .union(und.select(col("t2").as("term")))
      .groupBy(col("term")).agg(count(lit(1)).as("deg"))

  /** Degree-ordered orientation: every edge points from its lower to
    * its higher endpoint under ≺ = (degree, term); dst's degree rides
    * along so the wedge join re-applies ≺ without a lookup. */
  private def orientedEdges(und: DataFrame, deg: DataFrame): DataFrame = {
    val lowFirst = col("d1") < col("d2") ||
      (col("d1") === col("d2") && col("t1") < col("t2"))
    und
      .join(deg.select(col("term").as("t1"), col("deg").as("d1")), "t1")
      .join(deg.select(col("term").as("t2"), col("deg").as("d2")), "t2")
      .select(
        when(lowFirst, col("t1")).otherwise(col("t2")).as("src"),
        when(lowFirst, col("t2")).otherwise(col("t1")).as("dst"),
        when(lowFirst, col("d2")).otherwise(col("d1")).as("ddeg"))
  }

  /** (term, n_triangles) from an oriented (and persisted — it feeds
    * three sub-plans) edge frame: each triangle materializes once as a
    * wedge closed by an oriented edge, then credits all 3 corners. */
  private def perTermTriangles(oriented: DataFrame): DataFrame = {
    val wedges = oriented
      .select(col("src"), col("dst").as("y"), col("ddeg").as("dy"))
      .join(oriented.select(col("src"), col("dst").as("z"), col("ddeg").as("dz")),
        Seq("src"))
      .where(col("dy") < col("dz") ||
        (col("dy") === col("dz") && col("y") < col("z")))
    val triangles = wedges
      .join(oriented.select(col("src").as("y"), col("dst").as("z")),
        Seq("y", "z"), "left_semi")
    triangles
      .select(explode(array(col("src"), col("y"), col("z"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /**
   * DEGREE DISTRIBUTION of the co-occurrence graph — the (degree,
   * node-count) histogram: the one-glance answer to "is this graph
   * Zipf-shaped?" (a heavy high-degree tail means stopword-like hubs
   * the q127 orientation exists to tame) and the sizing input for any
   * downstream wedge/pair fan-out bound. Integer counts — engine-exact
   * with no rounding contract at all.
   *
   * Scale shape: the pair scan is the only corpus-touching stage;
   * degrees are one vocabulary-scale agg and the histogram one
   * degrees-bounded agg. Nothing collects.
   *
   * @return (deg, n_terms)
   */
  def degreeDistribution(
      docs: DataFrame,
      window: Int = 2,
      minCount: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    // persist: the degree union reads the edge frame twice — without
    // the cache point each branch re-runs the corpus pair scan
    termDegrees(graft.Caching.persist(coocEdges(docs, window, minCount)))
      .groupBy(col("deg")).agg(count(lit(1)).as("n_terms"))
  }

  /**
   * LOCAL CLUSTERING COEFFICIENT per term — triangles ÷ wedges at each
   * node: c(v) = 2·T(v) / (deg(v)·(deg(v)−1)). High coefficient =
   * tight topical clique (the node's neighbors also co-occur with each
   * other); a high-degree term with c ≈ 0 is a context-bridging hub —
   * the q127 scaladoc's stopword signal, normalized so nodes of
   * different degree compare. Nodes of degree 1 have no wedge to
   * close and emit null.
   *
   * Determinism: T and deg are exact integers; the coefficient is ONE
   * round-6 division. Scale shape: [[triangleCounts]]'s oriented
   * wedge machinery (per-node fan-out capped O(√E) by the
   * orientation) plus a vocabulary-scale left join attaching T = 0 to
   * triangle-free nodes.
   *
   * @return (term, deg, n_triangles, coeff) for every graph node
   */
  def clusteringCoefficients(
      docs: DataFrame,
      window: Int = 2,
      minCount: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    // three edge/degree-scale persists outlive the method: scope required
    graft.Caching.requireScope("Graph.clusteringCoefficients")
    val und = graft.Caching.persist(coocEdges(docs, window, minCount))
    val deg = graft.Caching.persist(termDegrees(und))
    val oriented = graft.Caching.persist(orientedEdges(und, deg))
    deg.join(perTermTriangles(oriented), Seq("term"), "left")
      .select(col("term"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
          round(lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("deg") * (col("deg") - 1)).cast("double"), 6)).as("coeff"))
  }
}
