package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {

  // star c—d, c—e plus isolated pair a—b; every edge appears twice so
  // minCount=2 keeps it
  private def starCorpus = corpus(
    "1" -> "a b", "2" -> "a b",
    "3" -> "c d", "4" -> "c d",
    "5" -> "c e", "6" -> "c e")

  test("termPageRank: two rounds of the integer recurrence, hand-computed") {
    val got = Graph.termPageRank(starCorpus, window = 2, minCount = 2, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a—b (deg 1 each) is at the recurrence's fixed point immediately:
    // 150000 + 85% of 1e6 = 1_000_000
    got("a") shouldBe 1000000L
    got("b") shouldBe 1000000L
    // star: r1(c) = 150000 + (85·2e6) div 100 = 1_850_000,
    //        r1(d) = 150000 + (85·(1e6 div 2)) div 100 = 575_000
    // r2(c) = 150000 + (85·2·575000) div 100   = 1_127_500
    // r2(d) = 150000 + (85·(1850000 div 2)) div 100 = 936_250
    got("c") shouldBe 1127500L
    got("d") shouldBe 936250L
    got("e") shouldBe 936250L
  }

  test("termPageRank: hub outranks leaves at depth; sub-minCount and self-loops drop") {
    val c = corpus(
      "1" -> "h x", "2" -> "h x", "3" -> "h y", "4" -> "h y",
      "5" -> "h z", "6" -> "h z",
      "7" -> "p q",          // seen once → below minCount, not in graph
      "8" -> "s t s", "9" -> "s t s") // (s,s) self-loop dropped; s—t kept
    val got = Graph.termPageRank(c, window = 2, minCount = 2, iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.keySet shouldBe Set("h", "x", "y", "z", "s", "t")
    got("h") should be > got("x")
    got("x") shouldBe got("y")
    // s—t is a symmetric pair → fixed point 1e6, like a—b above
    got("s") shouldBe 1000000L
  }

  test("termPageRank conserves rank mass up to floor-division leakage") {
    val got = Graph.termPageRank(starCorpus, window = 2, minCount = 2, iters = 10)
      .collect().map(_.getLong(1))
    val total = got.sum
    // 5 nodes × 1e6 start mass; each round loses < deg ulps per node
    total should be <= 5000000L
    total should be > (5000000L - 100L)
  }

  test("termPageRank rejects bad parameters") {
    an[IllegalArgumentException] should be thrownBy
      Graph.termPageRank(starCorpus, window = 0)
    an[IllegalArgumentException] should be thrownBy
      Graph.termPageRank(starCorpus, minCount = 0)
    an[IllegalArgumentException] should be thrownBy
      Graph.termPageRank(starCorpus, iters = 0)
  }

  test("triangleCounts: K4 has 4 triangles with every node in 3") {
    // one doc per edge → each pair co-occurs exactly once
    val k4 = corpus("1" -> "w x", "2" -> "w y", "3" -> "w z",
      "4" -> "x y", "5" -> "x z", "6" -> "y z")
    val got = Graph.triangleCounts(k4, window = 2, minCount = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("w" -> 3L, "x" -> 3L, "y" -> 3L, "z" -> 3L)
  }

  test("triangleCounts: squares and pendants yield nothing; a triangle counts once") {
    val g = corpus(
      "t" -> "a b c", // window 2 → edges (a,b), (a,c), (b,c): one triangle
      "p" -> "a d", // pendant edge — d in no triangle
      // 4-cycle p-q-r-s without chords: no triangles
      "c1" -> "p q", "c2" -> "q r", "c3" -> "r s", "c4" -> "s p")
    val got = Graph.triangleCounts(g, window = 2, minCount = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("a" -> 1L, "b" -> 1L, "c" -> 1L)
  }

  test("triangleCounts respects minCount and rejects bad parameters") {
    // edge (b,c) appears once, (a,b)/(a,c) twice → at minCount 2 the
    // triangle breaks
    val g = corpus("1" -> "a b c a")
    Graph.triangleCounts(g, window = 2, minCount = 2).count() shouldBe 0L
    Graph.triangleCounts(g, window = 2, minCount = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("a" -> 1L, "b" -> 1L, "c" -> 1L)
    an[IllegalArgumentException] should be thrownBy
      Graph.triangleCounts(g, window = 0)
    an[IllegalArgumentException] should be thrownBy
      Graph.triangleCounts(g, minCount = 0)
  }

  test("degreeDistribution: star + pair histogram") {
    // starCorpus graph: c has degree 2; a, b, d, e degree 1
    val got = Graph.degreeDistribution(starCorpus, window = 2, minCount = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 4L, 2L -> 1L)
  }

  test("clusteringCoefficients: closed triangle 1.0, open wedge 0.0, pendant null") {
    val g = corpus(
      "t" -> "a b c", // window 2 → triangle a-b-c
      "p" -> "a d",   // pendant d; lifts a to degree 3
      "q" -> "d e")   // chain keeps d at degree 2 with an open wedge
    val got = Graph.clusteringCoefficients(g, window = 2, minCount = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    got shouldBe Set(
      ("a", 3L, 1L, 0.333333), // triangle + pendant: 1 of 3 wedges closed
      ("b", 2L, 1L, 1.0),
      ("c", 2L, 1L, 1.0),
      ("d", 2L, 0L, 0.0),      // a-d-e open wedge
      ("e", 1L, 0L, null))     // degree 1: no wedge to close
  }

  test("termPageRank leaves no cached state behind under Caching.scoped") {
    // snapshot-diff: earlier unscoped tests legitimately left session
    // cache behind (the legacy caller-owns-cache contract).
    // driverMaxEdges = 0 forces the DISTRIBUTED tier — the one with
    // iteration caches to leak.
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    Caching.scoped {
      Graph.termPageRank(starCorpus, iters = 3, driverMaxEdges = 0L).collect()
    }
    (spark.sparkContext.getPersistentRDDs.keySet.toSet -- before) shouldBe empty
  }

  test("termPageRank driver and distributed tiers are bit-identical") {
    val drv = Graph.termPageRank(starCorpus, iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dist = Caching.scoped {
      Graph.termPageRank(starCorpus, iters = 10, driverMaxEdges = 0L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    drv shouldBe dist
  }

  test("kCore peels pendants transitively; the triangle survives as the 2-core") {
    // graph: triangle a-b-c plus chain c-d-e. Round 1 peels e (deg 1);
    // round 2 peels d (its degree fell to 1) — depth-2 peel, so the
    // fixed 8 rounds converge to exactly the triangle, every node at
    // in-core degree 2.
    val c = corpus(
      "1" -> "a b", "2" -> "a b", "3" -> "b c", "4" -> "b c",
      "5" -> "a c", "6" -> "a c", "7" -> "c d", "8" -> "c d",
      "9" -> "d e", "10" -> "d e")
    val got = Graph.kCore(c, k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("a" -> 2L, "b" -> 2L, "c" -> 2L)
    // truncation over-includes: ONE round only peels e, leaving d at
    // its stale membership (deg 1 inside the round-1 survivor graph)
    val trunc = Graph.kCore(c, k = 2, rounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    trunc.keySet shouldBe Set("a", "b", "c", "d")
    trunc("d") shouldBe 1L
    // k above the max degree peels everything
    Graph.kCore(c, k = 10).count() shouldBe 0L
  }

  test("kCore driver and distributed tiers are bit-identical") {
    val c = corpus(
      "1" -> "a b", "2" -> "a b", "3" -> "b c", "4" -> "b c",
      "5" -> "a c", "6" -> "a c", "7" -> "c d", "8" -> "c d")
    val drv = Graph.kCore(c, k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the distributed tier checkpoints per round and is self-contained
    // — no Caching scope required (unlike the PageRank loop)
    val dist = Graph.kCore(c, k = 2, driverMaxEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    drv shouldBe dist
  }

  test("termPageRank's distributed tier fails loudly outside Caching.scoped") {
    // the round-7 API-level cache-contract assert: the tier whose
    // iteration caches only a scope can release must refuse to
    // construct a leaking plan (Caching.unscoped: every test body now
    // runs under a suite-level scope, so drop it to pin the failure)
    val ex = the[IllegalStateException] thrownBy Caching.unscoped {
      Graph.termPageRank(starCorpus, iters = 3, driverMaxEdges = 0L)
    }
    ex.getMessage should include ("Caching.scoped")
  }
}
