package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  private def dupCorpus = corpus(
    "a" -> "the quick brown fox jumps over the lazy dog",
    "b" -> "the quick brown fox jumps over the lazy dog", // exact dup of a
    "c" -> "the quick brown fox jumps over a lazy dog",   // near dup
    "d" -> "completely different words here entirely now today")

  test("shingles: distinct word 3-grams, empty for short docs") {
    val sh = Dedup.shingles(corpus("s" -> "a b", "t" -> "x y z w"), 3)
    val got = rowsOf(sh)
    got shouldBe Seq(
      Seq("t", "x y z"),
      Seq("t", "y z w")
    ).sortBy(_.mkString(" "))
  }

  test("shingles are distinct per doc") {
    val sh = Dedup.shingles(corpus("s" -> "a b a b a b a b"), 3)
    // grams: "a b a","b a b" repeated — distinct leaves 2
    sh.count() shouldBe 2L
  }

  test("exactGroups finds exact duplicates with deterministic keeper") {
    val g = Dedup.exactGroups(dupCorpus).where(col("n_dups") > 1).collect()
    g.length shouldBe 1
    g.head.getAs[Long]("n_dups") shouldBe 2L
    g.head.getAs[String]("keeper") shouldBe "a"
  }

  test("exactDedup keeps one row per distinct text") {
    val kept = Dedup.exactDedup(dupCorpus).select("doc").collect().map(_.getString(0)).sorted
    kept shouldBe Array("a", "c", "d")
  }

  test("minhash signature: one wide row per doc with numHashes minima") {
    val sig = Dedup.minhashSignatures(Dedup.shingles(dupCorpus, 3), numHashes = 8)
    sig.columns shouldBe ("doc" +: (0 until 8).map(k => s"m$k")).toArray
    sig.groupBy("doc").count().collect().foreach(_.getLong(1) shouldBe 1L)
    // identical text ⇒ identical signature
    val byDoc = sig.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(r => (1 until 9).map(r.getLong)).toSet).toMap
    byDoc("a") shouldBe byDoc("b")
    // minima lie inside the hash family's modulus
    sig.collect().foreach { r =>
      (1 until 9).foreach { i =>
        r.getLong(i) should be >= 0L
        r.getLong(i) should be < Dedup.MinhashPrime
      }
    }
  }

  test("minhashNearDups finds exact+near dup pairs, not unrelated docs") {
    val pairs = Dedup.minhashNearDups(dupCorpus, threshold = 0.5)
      .select("d1", "d2").collect().map(r => (r.getString(0), r.getString(1))).toSet
    pairs should contain(("a", "b")) // identical: jaccard 1.0
    all(pairs.toSeq.flatMap(p => Seq(p._1, p._2))) should not be "d"
  }

  test("sortedNeighborhoodPairs: sort-adjacent near-dups found, far sorts missed") {
    // sort order is d < c < a < b (the "over a" / "over the" split);
    // identical a/b are adjacent even at w=1; c-a is the rank-1
    // neighbor at jaccard 4/10, so it needs the lower threshold
    val pairs = Dedup.sortedNeighborhoodPairs(dupCorpus, window = 1, threshold = 0.3)
      .select("d1", "d2").collect().map(r => (r.getString(0), r.getString(1))).toSet
    pairs shouldBe Set(("a", "b"), ("c", "a"))
    // widening the window adds the distance-2 (c, b) pair, same verify
    val w2 = Dedup.sortedNeighborhoodPairs(dupCorpus, window = 2, threshold = 0.3)
      .select("d1", "d2").collect().map(r => (r.getString(0), r.getString(1))).toSet
    w2 shouldBe Set(("a", "b"), ("c", "a"), ("c", "b"))
    // the documented blind spot: a FIRST-token edit teleports the doc
    // across the sort order, so SNM misses what MinHash catches
    val prefixEdit = corpus(
      "p1" -> "alpha common tail words shared by both documents here",
      "p2" -> "zzz common tail words shared by both documents here",
      "mid" -> "mmm unrelated middle sorts between the two entirely")
    val snm = Dedup.sortedNeighborhoodPairs(prefixEdit, window = 1, threshold = 0.3)
      .select("d1", "d2").collect().map(r => (r.getString(0), r.getString(1))).toSet
    snm should not contain (("p1", "p2"))
  }

  test("minhashNearDupsAgainst matches new docs only against history") {
    // SparkEntry.ChainDocs 1000001↔1000003 were SEEDED to share an LSH
    // band (q28b chain) with Jaccard 28/48 ≈ 0.58 — a deterministic
    // band-collision fixture, unlike ad-hoc near-dup sentences whose
    // collision odds depend on the hash family.
    val chain = SparkEntry.ChainDocs.toMap
    val history = corpus(
      "h1" -> chain(1000001L),
      "h2" -> "completely different words here entirely now today")
    val fresh = corpus(
      "n1" -> chain(1000003L), // seeded band-mate of h1
      "n2" -> "novel content with no overlap anywhere in sight",
      "n3" -> "novel content with no overlap anywhere in sight") // intra-batch dup
    val got = Dedup.minhashNearDupsAgainst(fresh, history, threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    got shouldBe Set("n1" -> "h1") // n3~n2 is intra-batch: NOT screened here
  }

  test("minhashNearDupsAgainst hot-bucket guard drops oversized history buckets") {
    val history = corpus(
      "h1" -> "the quick brown fox jumps over the lazy dog",
      "h2" -> "the quick brown fox jumps over the lazy dog")
    val fresh = corpus("n1" -> "the quick brown fox jumps over the lazy dog")
    Dedup.minhashNearDupsAgainst(fresh, history, threshold = 0.5)
      .count() shouldBe 2L
    Dedup.minhashNearDupsAgainst(fresh, history, threshold = 0.5,
      maxBucketSize = 1).count() shouldBe 0L
  }

  test("exactDedupAgainst drops only payloads already in the seen set") {
    val seen = Dedup.exactGroups(corpus("old" -> "known payload"))
      .select("fp")
    val kept = Dedup.exactDedupAgainst(
      corpus("n1" -> "known payload", "n2" -> "fresh payload"), seen)
      .select("doc").collect().map(_.getString(0)).toSet
    kept shouldBe Set("n2")
  }

  test("exactDedupAgainstBloom equals the plain anti-join path") {
    val history = corpus("old1" -> "known payload", "old2" -> "other seen text")
    val delta = corpus(
      "n1" -> "known payload", "n2" -> "fresh payload", "n3" -> "other seen text",
      "n4" -> "genuinely new words")
    val plain = Dedup.exactDedupAgainst(
      delta, history.select(md5(col("line")).as("fp")))
      .select("doc").collect().map(_.getString(0)).toSet
    val bloomed = Dedup.exactDedupAgainstBloom(delta, history)
      .select("doc").collect().map(_.getString(0)).toSet
    bloomed shouldBe plain
    bloomed shouldBe Set("n2", "n4")
  }

  test("exactDedupAgainstBloom is exact even at a degenerate 0.5 fpp") {
    // At fpp=0.5 roughly half the genuinely-new rows take the confirm
    // join as false positives — the answer must not move.
    val history = corpus((1 to 40).map(i => s"h$i" -> s"seen payload $i"): _*)
    val delta = corpus(
      (1 to 40).map(i => s"d$i" -> s"seen payload $i") ++ // all dups
      (1 to 40).map(i => s"f$i" -> s"fresh payload $i"): _*) // all new
    val kept = Dedup.exactDedupAgainstBloom(delta, history, fpp = 0.5)
      .select("doc").collect().map(_.getString(0)).toSet
    kept shouldBe (1 to 40).map(i => s"f$i").toSet
  }

  test("bloomScreenStats reports the screened/confirm split") {
    val history = corpus((1 to 30).map(i => s"h$i" -> s"seen payload $i"): _*)
    val delta = corpus(
      (1 to 30).map(i => s"d$i" -> s"seen payload $i") ++
      (1 to 30).map(i => s"f$i" -> s"fresh payload $i"): _*)
    val row = Dedup.bloomScreenStats(delta, history, fpp = 0.001).head()
    val newN = row.getAs[Long]("n_definitely_new")
    val maybeN = row.getAs[Long]("n_maybe_seen")
    newN + maybeN shouldBe 60L
    maybeN should be >= 30L // every true dup MUST screen as maybe-seen
    newN should be >= 25L   // at fpp 0.001 nearly all fresh rows screen out
  }

  test("bloom probe has no false negatives on inserted hashes") {
    import org.apache.spark.sql.graft.BloomFunctions
    val s = spark
    import s.implicits._
    val vals = (1L to 1000L).toDF("h")
    val bloom = vals.stat.bloomFilter("h", 1000L, 0.03)
    val bytes = { val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos); bos.toByteArray }
    val misses = vals
      .where(!BloomFunctions.mightContainLong(col("h"), bytes))
      .count()
    misses shouldBe 0L
  }

  test("minhashDedup keeps the smallest doc per candidate cluster") {
    val kept = Dedup.minhashDedup(dupCorpus)
      .select("doc").collect().map(_.getString(0)).toSet
    kept should contain("a")     // smallest of the a/b identical pair
    kept should not contain "b"  // identical payload, larger id
    kept should contain("d")     // unrelated doc always survives
    // contract vs the candidate graph: a doc is dropped iff some LSH
    // candidate pair links it to a smaller doc
    val cands = Dedup.lshCandidates(Dedup.lshBands(
      Dedup.minhashSignatures(Dedup.shingles(dupCorpus, 3))))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expectedDropped = cands.map(_._2).toSet
    kept shouldBe Set("a", "b", "c", "d") -- expectedDropped
  }

  test("minhashDedup keeps shingle-less short docs") {
    val withShort = corpus(
      "a" -> "the quick brown fox jumps over the lazy dog",
      "b" -> "the quick brown fox jumps over the lazy dog",
      "tiny" -> "so short")
    val kept = Dedup.minhashDedup(withShort)
      .select("doc").collect().map(_.getString(0)).toSet
    kept shouldBe Set("a", "tiny")
  }

  test("deriveBandShape picks the divisor whose S-curve threshold is nearest") {
    // 16 hashes: r=2 → (1/8)^(1/2) ≈ 0.354 is nearest 0.3
    Dedup.deriveBandShape(16, threshold = 0.3) shouldBe ((8, 2))
    // r=4 → (1/4)^(1/4) ≈ 0.707 is nearest 0.7 — the historical 4×4 shape
    Dedup.deriveBandShape(16, threshold = 0.7) shouldBe ((4, 4))
    // high thresholds want long bands
    Dedup.deriveBandShape(16, threshold = 0.95)._2 should be >= 8
    // result always partitions the hash budget exactly
    val (b, r) = Dedup.deriveBandShape(18, threshold = 0.5)
    b * r shouldBe 18
  }

  test("deriveSimhashBits widens past the 16-bit saturation point") {
    Dedup.deriveSimhashBits(500) shouldBe 16
    Dedup.deriveSimhashBits(4096) shouldBe 16
    Dedup.deriveSimhashBits(100000) shouldBe 32
  }

  test("lshBands rejects numHashes not divisible by rowsPerBand") {
    val sig = Dedup.minhashSignatures(Dedup.shingles(dupCorpus, 3), numHashes = 18)
    an[IllegalArgumentException] should be thrownBy
      Dedup.lshBands(sig, numHashes = 18, rowsPerBand = 4)
  }

  test("minhashDedupIterative collapses a transitive chain to one survivor") {
    val s = spark
    import s.implicits._
    // the seeded q28b chain: 1000003 bridges 1000001 ~ 1000002, which
    // share no bucket with each other; the bridge has the largest id
    val chain = SparkEntry.ChainDocs.toDF("doc", "line")
    val oneHop = Dedup.minhashDedup(chain)
      .select("doc").collect().map(_.getLong(0)).toSet
    oneHop shouldBe Set(1000001L, 1000002L) // one-hop leaves both endpoints
    val closed = Dedup.minhashDedupIterative(chain, maxIter = 3)
      .select("doc").collect().map(_.getLong(0)).toSet
    closed shouldBe Set(1000001L) // closure keeps only the component min
  }

  test("minhashJaccardEstimates: identical docs estimate 1.0, values in [0,1]") {
    val est = Dedup.minhashJaccardEstimates(dupCorpus)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // identical text ⇒ identical signature ⇒ all 16 minima match
    est(("a", "b")) shouldBe 1.0
    est.values.foreach { e => e should be >= 0.0; e should be <= 1.0 }
    // thresholding drops sub-threshold candidates
    val kept = Dedup.minhashJaccardEstimates(dupCorpus, threshold = 0.99)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    kept shouldBe Set(("a", "b"))
  }

  test("minhashDedupConverged reaches the fixpoint on the seeded chain") {
    val s = spark
    import s.implicits._
    // same chain as the bounded-tier test, but convergence is DETECTED:
    // the loop must stop on its own (well under the runaway bound) and
    // land on exactly the component minimum
    val chain = SparkEntry.ChainDocs.toDF("doc", "line")
    Dedup.minhashDedupConverged(chain)
      .select("doc").collect().map(_.getLong(0)).toSet shouldBe Set(1000001L)
    // converged labels: every member of the component carries the min
    val labels = Dedup.minhashClusterLabelsConverged(chain)
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("lbl")).toMap
    labels shouldBe Map(1000001L -> 1000001L, 1000002L -> 1000001L,
      1000003L -> 1000001L)
  }

  test("connectedComponents: large/small-star closes a long path in few rounds") {
    val s = spark
    import s.implicits._
    // a diameter-11 path 1-2-…-12: min-label propagation would need ~11
    // rounds; large/small-star must close it well inside maxIter=6 —
    // the diameter-independence the tier exists for
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("u", "v")
    val nodes = (1L to 13L).toDF("doc") // 13 is isolated
    val labels = Dedup.connectedComponents(edges, nodes, maxIter = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 12L).foreach(d => labels(d) shouldBe 1L)
    labels(13L) shouldBe 13L // isolated node labels itself
  }

  test("connectedComponents tolerates duplicates, self-loops, mixed orientation") {
    val s = spark
    import s.implicits._
    val edges = Seq((2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L), (2L, 3L),
      (5L, 4L)).toDF("u", "v")
    val nodes = (1L to 5L).toDF("doc")
    val labels = Dedup.connectedComponents(edges, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L)
  }

  test("minhashClusterLabelsStar equals the converged min-label closure") {
    val s = spark
    import s.implicits._
    // the two converged tiers must agree exactly — both contracts are
    // TRUE connected components of the same band graph (corpus + the
    // seeded chain exercises a multi-hop component)
    val chain = SparkEntry.ChainDocs.toDF("doc", "line")
    val in = dupCorpus.select(col("doc"), col("line"))
    val star = Dedup.minhashClusterLabelsStar(in)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val prop = Dedup.minhashClusterLabelsConverged(in)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    star shouldBe prop
    val starChain = Dedup.minhashDedupStar(chain)
      .select("doc").collect().map(_.getLong(0)).toSet
    starChain shouldBe Set(1000001L) // closure keeps only the component min
  }

  test("minhashClusterLabelsConverged fails loudly when the runaway bound truncates") {
    val s = spark
    import s.implicits._
    // maxIter=1 stops the loop mid-propagation (the chain needs two
    // label hops + one confirming pass): the contract is convergence,
    // so silently returning under-merged labels would be a correctness
    // bug — the operator must throw instead
    val chain = SparkEntry.ChainDocs.toDF("doc", "line")
    val ex = intercept[IllegalStateException] {
      Dedup.minhashClusterLabelsConverged(chain, maxIter = 1).collect()
    }
    ex.getMessage should include("maxIter")
  }

  test("dedupKeepBest keeps the max-score member, ties to smallest doc") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "short"),
      (2L, "a much longer and higher quality document body here"),
      (3L, "a much longer and higher quality document body here"), // ties 2
      (9L, "unclustered singleton")).toDF("doc", "line")
    // labels cluster 1,2,3 together; 9 is absent (singleton by contract)
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc", "lbl")
    val kept = Dedup.dedupKeepBest(docs, labels,
        graft.functions.TextAnalysis.qualityScoreCol(col("line")))
      .select("doc").collect().map(_.getLong(0)).toSet
    // 2 and 3 share the top quality score — the tie breaks to 2; the
    // min-id keeper would have kept the low-quality doc 1 instead
    kept shouldBe Set(2L, 9L)
  }

  test("minhashDedupIterative equals one-hop dedup when no chains exist") {
    val kept = Dedup.minhashDedupIterative(dupCorpus)
      .select("doc").collect().map(_.getString(0)).toSet
    val oneHop = Dedup.minhashDedup(dupCorpus)
      .select("doc").collect().map(_.getString(0)).toSet
    kept shouldBe oneHop
  }

  test("hot-bucket guard: degenerate identical-doc bucket is skipped and observable") {
    val docs = corpus((1 to 50).map(i =>
      f"dup$i%02d" -> "alpha beta gamma delta epsilon zeta eta theta"): _*)
    val bands = Dedup.lshBands(Dedup.minhashSignatures(Dedup.shingles(docs, 3)))
    // under the default bound the 50-doc bucket pairs normally
    Dedup.lshCandidates(bands).count() shouldBe 50L * 49 / 2
    // a tight bound excludes it: no candidate pairs, no O(m²) straggler
    Dedup.lshCandidates(bands, maxBucketSize = 10).count() shouldBe 0L
    // and the drop is observable through the audit twin
    val skipped = Dedup.lshSkippedBuckets(bands, maxBucketSize = 10).collect()
    skipped.length shouldBe 4 // the same 50-doc bucket in each of 4 bands
    skipped.foreach(_.getAs[Long]("bucket_n") shouldBe 50L)
  }

  test("simhashPairs fails loudly when fingerprints exceed the declared width") {
    val s = spark
    import s.implicits._
    val fp = Seq(("a", 70000L), ("b", 70000L)).toDF("doc", "simhash")
    val ex = intercept[Exception] {
      Dedup.simhashPairs(fp, maxHamming = 3, bits = 16).collect()
    }
    ex.getMessage should include("bits")
  }

  test("ngramDecontaminate flags docs sharing any n-gram with the benchmark") {
    val bench = corpus("e1" -> "one two three four five")
    val cor = corpus(
      "t1" -> "zzz one two three yyy",      // shares "one two three"
      "t2" -> "four five one aaa bbb",      // no verbatim 3-gram from e1
      "t3" -> "one two three four qqq www", // shares 2 benchmark 3-grams
      "t4" -> "xx")                         // shorter than one 3-gram
    val got = Dedup.ngramDecontaminate(cor, bench, n = 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    got("t1") shouldBe ((1L, true))
    got("t2") shouldBe ((0L, false))
    got("t3") shouldBe ((2L, true)) // "one two three", "two three four"
    got("t4") shouldBe ((0L, false)) // still a row: audit covers every doc
    got.size shouldBe 4
  }

  test("ngramJaccardPairs computes exact jaccard") {
    val pairs = Dedup.ngramJaccardPairs(dupCorpus, threshold = 0.1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    pairs(("a", "b")) shouldBe 1.0 +- 1e-12
    // a: 7 shingles, c: 7 shingles, intersection 5 ("the quick brown" "quick
    // brown fox" "brown fox jumps" "fox jumps over" + "the lazy dog"? check:
    // a grams: [the quick brown, quick brown fox, brown fox jumps,
    //           fox jumps over, jumps over the, over the lazy, the lazy dog]
    // c grams: [the quick brown, quick brown fox, brown fox jumps,
    //           fox jumps over, jumps over a, over a lazy, a lazy dog]
    // inter = 4, union = 10 → 0.4
    pairs(("a", "c")) shouldBe 0.4 +- 1e-12
  }

  test("prefixFilterJaccardPairs ≡ brute-force ngramJaccardPairs at several thresholds") {
    // a wider corpus than dupCorpus: exact dups, near dups at varying
    // overlap, shared-prefix decoys, and an unrelated doc
    val c = corpus(
      "a" -> "the quick brown fox jumps over the lazy dog",
      "b" -> "the quick brown fox jumps over the lazy dog",
      "c" -> "the quick brown fox jumps over a lazy dog",
      "d" -> "the quick brown fox leaps over the lazy dog today",
      "e" -> "completely different words here entirely now today",
      "f" -> "completely different words here entirely now tomorrow",
      "g" -> "one two three four five six seven eight nine ten")
    Seq(0.3, 0.5, 0.8).foreach { t =>
      withClue(s"threshold $t:") {
        rowsOf(Dedup.prefixFilterJaccardPairs(c, threshold = t)) shouldBe
          rowsOf(Dedup.ngramJaccardPairs(c, threshold = t)
            .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard")))
      }
    }
  }

  test("prefixFilterJaccardPairs rejects a threshold outside (0, 1]") {
    an[IllegalArgumentException] should be thrownBy
      Dedup.prefixFilterJaccardPairs(dupCorpus, threshold = 0.0)
    an[IllegalArgumentException] should be thrownBy
      Dedup.prefixFilterJaccardPairs(dupCorpus, threshold = 1.5)
  }

  test("editDistancePairs: candidate pairs verified by normalized levenshtein") {
    val c = corpus(
      "a" -> "the quick brown fox jumps over the lazy dog",
      "b" -> "the quick brown fox jumps over the lazy dog", // exact dup
      "c" -> "the quick brown fox jumps over the lazy cat", // dog→cat
      "d" -> "completely different words here entirely now today")
    val got = Dedup.editDistancePairs(c, maxRatio = 0.3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    got(("a", "b")) shouldBe ((0L, 0.0)) // exact dup: distance 0
    got(("a", "c"))._1 shouldBe 3L // dog→cat = 3 substitutions
    got(("a", "c"))._2 shouldBe (3.0 / 43).doubleValue +- 1e-6
    got.keySet should not contain (("a", "d")) // unrelated: no candidate
    an[IllegalArgumentException] should be thrownBy
      Dedup.editDistancePairs(c, maxRatio = 0.0)
  }

  test("simhash: identical docs share fingerprint; fingerprint is 16-bit") {
    val fp = Dedup.simhash(dupCorpus).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fp("a") shouldBe fp("b")
    fp.values.foreach { v => v should be >= 0L; v should be < 65536L }
  }

  test("simhash at 32 bits: identical docs collide, fingerprint < 2^32") {
    val fp = Dedup.simhash(dupCorpus, bits = 32).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fp("a") shouldBe fp("b")
    fp.values.foreach { v => v should be >= 0L; v should be < (1L << 32) }
    // wider fingerprint separates the unrelated doc further than 16 bits
    val pairs32 = Dedup.simhashPairs(Dedup.simhash(dupCorpus, bits = 32),
      maxHamming = 0, bits = 32)
      .collect().map(r => (r.getString(0), r.getString(1)))
    pairs32 should contain(("a", "b"))
  }

  test("substringDedup removes all-but-first occurrences of duplicated spans") {
    // "a b c d e" occurs at (d1, 0) and (d2, 3): keep-first retains d1's,
    // removes d2's covered positions 3..7
    val got = Dedup.substringDedup(corpus(
        "d1" -> "a b c d e x y z",
        "d2" -> "q r s a b c d e"), spanTokens = 5)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    got("d1") shouldBe (("a b c d e x y z", 8L, 0L))
    got("d2") shouldBe (("q r s", 3L, 5L))
  }

  test("substringDedup catches repeats WITHIN one document") {
    val got = Dedup.substringDedup(corpus("d" -> "m n o p m n o p"), spanTokens = 4)
      .collect().head
    got.getString(1) shouldBe "m n o p"
    got.getLong(3) shouldBe 4L
  }

  test("substringDedup leaves short docs and unique text untouched") {
    val got = Dedup.substringDedup(corpus(
        "s" -> "too short",
        "u" -> "entirely unique words appearing nowhere else at all"), spanTokens = 5)
      .collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    got shouldBe Map("s" -> 0L, "u" -> 0L)
  }

  test("simhashPairs: exact dups at hamming 0") {
    val pairs = Dedup.simhashPairs(Dedup.simhash(dupCorpus), maxHamming = 0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    pairs.map(p => (p._1, p._2)) should contain(("a", "b"))
    pairs.filter(p => p._1 == "a" && p._2 == "b").head._3 shouldBe 0L
  }

  test("leakageSafeSplit keeps a near-dup cluster on one side of the split") {
    val sp = Dedup.leakageSafeSplit(dupCorpus, valPerMille = 500)
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    sp.keySet shouldBe Set("a", "b", "c", "d")
    // a~b are one near-dup component (exact dups always share every
    // band): same cluster label (the min), therefore the same split,
    // regardless of what the hash picks
    sp("a")._1 shouldBe "a"
    sp("b")._1 shouldBe "a"
    sp("b")._2 shouldBe sp("a")._2
    // c's single-word edit happens to survive banding here; d is
    // unrelated — both are their own components
    sp("c")._1 shouldBe "c"
    sp("d")._1 shouldBe "d"
  }

  test("kFoldSplit: clusters land whole in one fold, folds replay the hash rule") {
    val fd = Dedup.kFoldSplit(dupCorpus, k = 5).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    fd.keySet shouldBe Set("a", "b", "c", "d")
    // a~b share a cluster → the same fold, whatever the hash picks
    fd("b")._1 shouldBe fd("a")._1
    fd("b")._2 shouldBe fd("a")._2
    fd.values.foreach { case (_, f) => f should (be >= 0L and be < 5L) }
    // the fold is exactly the "fold:" md5 bucket of the label, mod k —
    // local replication of the engine's seed-free rule
    def localFold(lbl: String, k: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"fold:$lbl".getBytes("UTF-8"))
        .map(x => f"${x & 0xff}%02x").mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % 1000000L) % k
    }
    fd.foreach { case (_, (lbl, f)) => f shouldBe localFold(lbl, 5) }
    an[IllegalArgumentException] should be thrownBy
      Dedup.kFoldSplit(dupCorpus, k = 1)
  }

  test("leakageSafeSplit: shingle-less docs are singleton clusters") {
    val sp = Dedup.leakageSafeSplit(
        corpus("s" -> "a b", "t" -> "x y"), valPerMille = 500)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    sp shouldBe Map("s" -> "s", "t" -> "t")
  }

  test("leakageSafeSplitAgainst inherits the anchor's split, hashes the rest") {
    val hist = corpus(
      "a" -> "the quick brown fox jumps over the lazy dog",
      "z" -> "completely different words here entirely now today")
    // force history to all-val so inheritance is distinguishable from
    // the ~10% hash fallback
    val hsp = Dedup.leakageSafeSplit(hist, valPerMille = 1000)
      .select(col("doc"), col("split"))
    val delta = corpus(
      "n1" -> "the quick brown fox jumps over the lazy dog", // dup of a
      "n2" -> "unrelated fresh material nothing shared with history docs")
    val got = Dedup.leakageSafeSplitAgainst(delta, hist, hsp, valPerMille = 0)
      .collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)), r.getString(2)))
      .toMap
    got("n1") shouldBe ((Some("a"), "val")) // inherited, NOT the 0‰ hash
    got("n2") shouldBe ((None, "train")) // unmatched → own-hash rule (0‰)
  }

  test("leakageSafeSplitAgainst falls back to the hash when the anchor has no split row") {
    val hist = corpus("a" -> "the quick brown fox jumps over the lazy dog")
    val empty = hist.where(col("doc") === "nope").select(col("doc"),
      col("line").as("split"))
    val delta = corpus("n1" -> "the quick brown fox jumps over the lazy dog")
    val got = Dedup.leakageSafeSplitAgainst(delta, hist, empty, valPerMille = 1000)
      .collect().map(r => (Option(r.getString(1)), r.getString(2)))
    got.head shouldBe ((Some("a"), "val")) // matched but split-less → hash
  }

  test("leakageSafeSplit honours valPerMille extremes and rejects bad shares") {
    val all = Dedup.leakageSafeSplit(dupCorpus, valPerMille = 1000)
      .select(col("split")).distinct().collect().map(_.getString(0))
    all shouldBe Array("val")
    val none = Dedup.leakageSafeSplit(dupCorpus, valPerMille = 0)
      .select(col("split")).distinct().collect().map(_.getString(0))
    none shouldBe Array("train")
    an[IllegalArgumentException] should be thrownBy
      Dedup.leakageSafeSplit(dupCorpus, valPerMille = 1001)
  }

  test("weightedJaccardPairs computes exact tf-weighted jaccard") {
    // a: {x:3, y:1} tot 4; b: {x:2, y:2} tot 4
    // Σmin = min(3,2)+min(1,2) = 3; Σmax = 4+4−3 = 5 ⇒ J_w = 0.6
    val cor = corpus("a" -> "x x x y", "b" -> "x x y y", "c" -> "z z z z")
    val got = Dedup.weightedJaccardPairs(cor, threshold = 0.5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    got shouldBe Array(("a", "b", 0.6))
  }

  test("weightedElems replication makes plain jaccard equal weighted jaccard") {
    val cor = corpus("a" -> "x x x y", "b" -> "x x y y")
    val elems = Dedup.weightedElems(Dedup.termWeights(cor))
    // a expands to {x#0,x#1,x#2,y#0}; b to {x#0,x#1,y#0,y#1}:
    // |∩| = 3, |∪| = 5 ⇒ plain J = 0.6 = J_w — the integer-weight
    // reduction the whole tier rests on
    val s = spark
    import s.implicits._
    val pairs = Seq(("a", "b")).toDF("d1", "d2")
    val plain = Dedup.jaccardFor(pairs, elems).collect().head.getDouble(2)
    plain shouldBe 0.6
    rowsOf(elems.where(col("doc") === "a").select(col("shingle")))
      .map(_.head) shouldBe Seq("x#0", "x#1", "x#2", "y#0")
  }

  test("weightedElems clips the per-term fan-out at tfCap (truncated weighted jaccard)") {
    val s = spark
    import s.implicits._
    // an adversarial hot-tf doc: one term repeated 1000× expands to
    // exactly tfCap copies, not 1000 — the per-row bound no bucket
    // guard downstream could provide
    val hot = Seq(("spam", Seq.fill(1000)("x").mkString(" "))).toDF("doc", "line")
    val tf = Dedup.termWeights(hot)
    Dedup.weightedElems(tf).count() shouldBe Dedup.MaxElemTf
    Dedup.weightedElems(tf, tfCap = 7L).count() shouldBe 7L
    // below the cap, expansion is exact — the reduction semantics the
    // tier rests on are untouched for natural text
    val nat = Dedup.termWeights(corpus("a" -> "x x x y"))
    rowsOf(Dedup.weightedElems(nat).select(col("shingle")))
      .map(_.head).sorted shouldBe Seq("x#0", "x#1", "x#2", "y#0")
    an[IllegalArgumentException] should be thrownBy
      Dedup.weightedElems(tf, tfCap = 0L)
  }

  test("weighted jaccard dense and sparse routes agree exactly") {
    val cor = corpus(
      "a" -> "x x x y",
      "b" -> "x x y y",
      "c" -> "y z z q",    // low overlap with a/b
      "d" -> "p p r r")    // zero overlap: both routes must drop it
    val dense = Dedup.weightedJaccardPairs(cor, threshold = 0.01)
    val sparse = Dedup.weightedJaccardPairs(cor, threshold = 0.01, maxVocab = 0)
    rowsOf(dense) shouldBe rowsOf(sparse)
    rowsOf(dense).map(_.take(2)) should not contain Seq("a", "d")
    // same equivalence for the pairs-verify entry point
    val s = spark
    import s.implicits._
    val pairs = Seq(("a", "b"), ("a", "d")).toDF("d1", "d2")
    val tf = Dedup.termWeights(cor)
    rowsOf(Dedup.weightedJaccardFor(pairs, tf)) shouldBe
      rowsOf(Dedup.weightedJaccardFor(pairs, tf, maxVocab = 0))
  }

  test("weightedNearDupsAgainst matches delta against history only") {
    val hist = corpus("h1" -> "p q p r", "h2" -> "s t u v")
    val delta = corpus(
      "d1" -> "r p q p",  // h1's multiset, permuted ⇒ J_w = 1
      "d2" -> "m n o w",  // novel vocabulary
      "d3" -> "m n o w")  // intra-delta dup: must NOT pair (no self-join)
    val got = Dedup.weightedNearDupsAgainst(delta, hist, threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    got shouldBe Array(("d1", "h1", 1.0))
  }

  test("weightedNearDups finds permuted token multisets, skips unrelated docs") {
    // a/b are the SAME multiset in different order: the bag-of-words
    // tier is order-insensitive (unlike shingles), so J_w = 1 and the
    // minhash signatures are identical ⇒ the pair cannot be missed
    val cor = corpus(
      "a" -> "p q p r",
      "b" -> "r p q p",
      "c" -> "s t u v")
    val got = Dedup.weightedNearDups(cor, threshold = 0.9).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    got shouldBe Array(("a", "b", 1.0))
  }

  /** Local replica of the hashing-trick bucket/sign (md5 hex fold). */
  private def fhLocal(term: String, dims: Int): (Long, Long) = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"fh:$term".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val bucket = java.lang.Long.parseLong(hex.substring(0, 8), 16) % dims
    val sign = 1L - 2L * (Integer.parseInt(hex.substring(8, 9), 16) % 2)
    (bucket, sign)
  }

  test("hashedFeatures matches a local md5 bucket/sign replication") {
    val cor = corpus("a" -> "x x y z", "b" -> "y z z", "c" -> "w")
    val got = Dedup.hashedFeatures(cor, dims = 8).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = Seq(
      "a" -> Seq("x" -> 2L, "y" -> 1L, "z" -> 1L),
      "b" -> Seq("y" -> 1L, "z" -> 2L),
      "c" -> Seq("w" -> 1L))
      .flatMap { case (doc, tfs) =>
        tfs.map { case (t, tf) =>
          val (b, s) = fhLocal(t, 8); (doc, b, s * tf)
        }
      }
      .groupBy { case (doc, b, _) => (doc, b) }
      .view.mapValues(_.map(_._3).sum).toMap
      .filter(_._2 != 0L)
    got shouldBe expected
  }

  test("hashedCosinePairs: permuted multiset copies score cos 1.0") {
    val cor = corpus(
      "a" -> "p q p r s t",
      "b" -> "t s r p q p", // same multiset, different order
      "c" -> "u v w x y z")
    val got = Dedup.hashedCosinePairs(cor, dims = 16, threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    got shouldBe Array(("a", "b", 1.0))
  }

  test("hashedCosinePairs: hot-bucket guard shapes candidates, never a reported cosine") {
    // a/b share a cold (rare) bucket AND the hot bucket every doc hits;
    // with the guard at 2 the hot bucket is suppressed, but a/b's pair
    // (found via their cold shared feature) must still score its FULL
    // dot — identical to the wide-open-guard cosine.
    val hot = "common"
    val cor = corpus(
      "a" -> s"$hot rare rare extra",
      "b" -> s"$hot rare rare other",
      "c" -> s"$hot solo1",
      "d" -> s"$hot solo2")
    val open = Dedup.hashedCosinePairs(cor, dims = 32, threshold = 0.1,
        maxBucketDocs = 1000L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    val guarded = Dedup.hashedCosinePairs(cor, dims = 32, threshold = 0.1,
        maxBucketDocs = 2L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    guarded.keySet should contain(("a", "b"))
    // every guarded pair's cosine equals the wide-open computation
    guarded.foreach { case (k, v) => open(k) shouldBe v }
    // the guard DID suppress hot-bucket-only candidates
    assert(guarded.size < open.size)
  }

  test("hashedCosineAgainst pairs delta only with history — intra-delta dups never meet") {
    val hist = corpus("h1" -> "p q p r s", "h2" -> "u v w")
    val delta = corpus(
      "d1" -> "s p q r p", // permuted copy of h1 → cos 1.0
      "d2" -> "m n o",     // novel vocabulary
      "d3" -> "m n o")     // intra-delta dup: must NOT pair
    val got = Dedup.hashedCosineAgainst(delta, hist, dims = 32, threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    got shouldBe Array(("d1", "h1", 1.0))
  }

  test("containmentPairs: asymmetric — quoted-whole doc scores 1.0 inward, low outward") {
    val cor = corpus(
      "small" -> "a b c d",                          // 2 distinct 3-shingles
      "big" -> "x y z a b c d q r s t u v w",       // quotes small whole
      "other" -> "completely different words here today")
    val got = Dedup.containmentPairs(cor, n = 3, threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    // small's 2 shingles both appear in big → containment 1.0
    got(("small", "big")) shouldBe 1.0
    // the reverse direction: 2 of big's 12 shingles → 1/6 < τ, absent
    got.keySet should not contain (("big", "small"))
    // and resemblance would miss it: jaccard = 2/12 < 0.5
    Dedup.ngramJaccardPairs(cor, n = 3, threshold = 0.5).count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Dedup.containmentPairs(cor, threshold = 0.0)
  }

  test("deriveHashedDims: next pow2 >= 2*vocab, clamped to [64, 2^22]") {
    Dedup.deriveHashedDims(0L) shouldBe 64
    Dedup.deriveHashedDims(32L) shouldBe 64
    Dedup.deriveHashedDims(33L) shouldBe 128
    Dedup.deriveHashedDims(40010L) shouldBe 131072
    Dedup.deriveHashedDims(10000000L) shouldBe (1 << 22)
  }

  test("hashedCosinePairsAuto applies the sizing rule across the 64/128 boundary") {
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sorted.toSeq
    // 6 distinct terms → dims 64
    val small = corpus("a" -> "p q p r", "b" -> "r p q p", "c" -> "s t u")
    pairsOf(Dedup.hashedCosinePairsAuto(small, threshold = 0.5)) shouldBe
      pairsOf(Dedup.hashedCosinePairs(small, dims = 64, threshold = 0.5))
    // 40 distinct terms (> 32) → the rule must flip to dims 128
    val bigLines = (0 until 4).map(i =>
      s"d$i" -> ((0 until 10).map(j => s"t${i}_$j").mkString(" ") + " shared"))
    val big = corpus(bigLines :+ ("dup" -> bigLines.head._2): _*)
    pairsOf(Dedup.hashedCosinePairsAuto(big, threshold = 0.5)) shouldBe
      pairsOf(Dedup.hashedCosinePairs(big, dims = 128, threshold = 0.5))
  }

  test("bowDedupAgainst drops shuffled history copies that md5(line) misses") {
    val hist = corpus("h1" -> "the quick brown fox")
    val delta = corpus(
      "d1" -> "fox brown quick the", // shuffled copy of h1 → must drop
      "d2" -> "genuinely new words")
    val bow = Dedup.bowDedupAgainst(delta, Dedup.bowFingerprints(hist))
      .collect().map(_.getString(0))
    bow shouldBe Array("d2")
    // the exact (order-sensitive) screen would keep BOTH
    Dedup.exactDedupAgainst(delta,
      hist.select(org.apache.spark.sql.functions.md5(col("line")).as("fp")))
      .count() shouldBe 2L
  }

  test("bowGroups collapses shuffled copies; distinct multisets stay apart") {
    val cor = corpus(
      "a" -> "the quick brown fox",
      "b" -> "fox brown quick the", // shuffled copy of a
      "c" -> "the the quick brown fox", // extra 'the': different multiset
      "d" -> "something else")
    val groups = Dedup.bowGroups(cor).collect()
      .map(r => (r.getLong(1), r.getString(2)))
    groups.toSet shouldBe Set((2L, "a"), (1L, "c"), (1L, "d"))
    // and the fingerprint agrees with exact dedup on UN-shuffled dups:
    // a shuffled copy is invisible to md5(line) but not to bow_fp
    val exact = Dedup.exactGroups(cor).where(col("n_dups") >= 2).count()
    exact shouldBe 0L
  }

  test("dupClusterHistogram: exact-dup pair clusters, the rest are singletons") {
    // a, b share every band (exact dup); on this fixture the near-dup
    // c happens to share no full band with them (deterministic under
    // the md5 minhash), so the histogram is one size-2 cluster plus
    // the c and d singletons
    val got = Dedup.dupClusterHistogram(dupCorpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(2L -> 1L, 1L -> 2L)
  }

  test("contaminationReport: per-bench-doc corpus hits, self excluded") {
    val corpusDf = corpus(
      "c1" -> "alpha beta gamma delta", // shares "alpha beta gamma" with b1
      "c2" -> "alpha beta gamma",        // also shares it
      "c3" -> "totally unrelated words here")
    val bench = corpus(
      "b1" -> "alpha beta gamma",
      "b2" -> "nothing matches this benchmark row")
    val got = Dedup.contaminationReport(corpusDf, bench, n = 3).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    got shouldBe Map(
      "b1" -> ((2L, 2L, true)),
      "b2" -> ((0L, 0L, false)))
  }
}
