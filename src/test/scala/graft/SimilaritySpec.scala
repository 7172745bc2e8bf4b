package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def fixture = vecs(
    0L -> Seq(1f, 0f, 0f),
    1L -> Seq(0.9f, 0.1f, 0f), // closest to 0
    2L -> Seq(0f, 1f, 0f),     // orthogonal to 0
    3L -> Seq(-1f, 0f, 0f),    // opposite of 0
    4L -> Seq(0.5f, 0.5f, 0f))

  test("cosine of identical vectors is 1, opposite is -1, orthogonal 0") {
    val df = vecs(0L -> Seq(1f, 2f, 3f))
      .select(
        Similarity.cosine(col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>")).as("self"))
    df.head().getDouble(0) shouldBe 1.0 +- 1e-12
  }

  test("cosineTopK ranks nearest first with deterministic ties") {
    val got = Similarity.cosineTopK(fixture, fixture.where(col("vec_id") === 0), k = 4)
      .collect().map(r => (r.getAs[Long]("n_vec_id"), r.getAs[Long]("rank")))
    got.toSeq.sortBy(_._2).map(_._1) shouldBe Seq(1L, 4L, 2L, 3L)
  }

  test("cosineTopK excludes the query vector itself") {
    val got = Similarity.cosineTopK(fixture, fixture, k = 10)
      .where(col("q_vec_id") === col("n_vec_id")).count()
    got shouldBe 0L
  }

  test("nearDupPairs finds only pairs above threshold, d1 < d2") {
    val pairs = Similarity.nearDupPairs(fixture, threshold = 0.99)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
    pairs.toSet shouldBe Set((0L, 1L)) // cos(0,1) ≈ 0.9939
    pairs.foreach { case (a, b) => a should be < b }
  }

  test("lsh bucket is deterministic and respects bit width") {
    val b1 = Similarity.withLshBucket(fixture, bits = 8).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    val b2 = Similarity.withLshBucket(fixture, bits = 8).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    b1 shouldBe b2
    b1.values.foreach { v => v should be >= 0L; v should be < 256L }
    // opposite vectors land in complementary buckets (all signs flip)
    (b1(0L) ^ b1(3L)) shouldBe 255L
  }

  test("lshCosineTopK returns a subset of exact top-k candidates, exact cos") {
    val exact = Similarity.cosineTopK(fixture, fixture.where(col("vec_id") === 0), k = 4)
      .collect().map(r => r.getAs[Long]("n_vec_id") -> r.getAs[Double]("cos")).toMap
    val approx = Similarity.lshCosineTopK(fixture, fixture.where(col("vec_id") === 0),
      k = 4, bits = 4)
      .collect().map(r => r.getAs[Long]("n_vec_id") -> r.getAs[Double]("cos"))
    approx.foreach { case (id, c) => exact(id) shouldBe c +- 1e-12 }
  }

  test("lshNearDupPairs: subset of exact pairs with identical cosines") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.nearDupPairs(e, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshNearDupPairs(e, threshold = 0.4, bits = 4, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    lsh.size should be > 0
    lsh.foreach { case (pair, c) => exact(pair) shouldBe c +- 1e-12 }
    // d1 < d2 and no duplicates
    lsh.map(_._1).distinct.length shouldBe lsh.length
    lsh.foreach { case ((a, b), _) => a should be < b }
  }

  test("ivfCosineTopK: cosines exact, ranks contiguous, probes restrict") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.cosineTopK(e, e.where(col("vec_id") < 3), k = 1000)
      .collect().map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id")) ->
        r.getAs[Double]("cos")).toMap
    val ivf = Similarity.ivfCosineTopK(e, e.where(col("vec_id") < 3),
      k = 5, stride = 100, nProbe = 2).collect()
    ivf.length should be > 0
    // every IVF hit carries the exact cosine for that pair
    ivf.foreach { r =>
      exact((r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id"))) shouldBe
        r.getAs[Double]("cos") +- 1e-12
    }
    // ranks are 1..m contiguous per query
    ivf.groupBy(_.getAs[Long]("q_vec_id")).values.foreach { rs =>
      rs.map(_.getAs[Long]("rank")).sorted shouldBe (1L to rs.length)
    }
  }

  test("deriveLshBits encodes the measured sizing rule in code") {
    // floor of 4 bits through the verify SFs (oracle mirrors fixed 4)
    Similarity.deriveLshBits(1) shouldBe 4
    Similarity.deriveLshBits(128) shouldBe 4
    Similarity.deriveLshBits(1280) shouldBe 4
    Similarity.deriveLshBits(1600) shouldBe 4
    // the measured cliff point (BASELINE.md: 20k vectors, bits=4 ⇒ 110 s,
    // bits=8 ⇒ 14.5 s) now self-sizes past the cliff
    Similarity.deriveLshBits(20000) shouldBe 8
    // clamped upper bound
    Similarity.deriveLshBits(1000000000L) shouldBe 20
  }

  test("lshNearDupPairs auto-sizing: 10x-replicated corpus engages wider buckets, no cliff") {
    val s = spark
    import s.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val n0 = base.length
    val replicas = 10
    val big = (0 until replicas).flatMap(rep =>
      base.map { case (id, emb) => (id + rep.toLong * n0, emb) })
      .toDF("vec_id", "embedding")
    // the sizing rule must engage beyond the 4-bit floor at this scale
    Similarity.deriveLshBits(n0.toLong * replicas) should be > 4
    // and the auto-sized run completes without the measured candidate
    // cliff: every replica pair is identical (cos = 1), so recall of the
    // replica family is a correctness check too
    val pairs = Similarity.lshNearDupPairs(big, threshold = 0.999999)
    pairs.count() should be >= n0.toLong * (replicas.toLong * (replicas - 1) / 2)
  }

  test("LSH paths fail loudly on embeddings wider than MaxDim") {
    val s = spark
    import s.implicits._
    val wide = Seq((1L, Array.fill(Similarity.MaxDim + 1)(0.5f).toSeq))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.withLshBucket(wide, bits = 4).collect()
    }
    ex.getMessage should include("MaxDim")
    val ex2 = intercept[Exception] {
      Similarity.lshNearDupPairs(wide, threshold = 0.5, bits = 4).count()
    }
    ex2.getMessage should include("MaxDim")
  }

  test("lshCosineTopK recall@10 vs exact stays above the pinned floor") {
    // The q25b contract, asserted: the floor is deliberately modest (the
    // synthetic embeddings are near-random, so single-table LSH recall is
    // inherently low) — what it catches is the catastrophic bug class
    // where query-side and corpus-side bucketing silently disagree and
    // recall collapses to 0.
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val exact = Similarity.cosineTopK(e, q, k = 10).select("q_vec_id", "n_vec_id")
    val approx = Similarity.lshCosineTopK(e, q, k = 10, bits = 4)
      .select("q_vec_id", "n_vec_id")
    val hits = approx.join(exact, Seq("q_vec_id", "n_vec_id"), "left_semi").count()
    (hits.toDouble / 50.0) should be >= 0.08 // measured 0.10 at sf0.01
  }

  test("multi-probe recall@10 dominates single-probe at the same bits") {
    // The q95b contract, asserted: probing the query's own bucket PLUS
    // every hamming-1 flip can only ADD candidates relative to the
    // single-probe run on the same hash family, so recall must dominate
    // — and at bits=8 (1/256 buckets) the single-probe run is starved
    // enough that domination is the whole point of the operator.
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val exact = Similarity.cosineTopK(e, q, k = 10).select("q_vec_id", "n_vec_id")
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      approx.select("q_vec_id", "n_vec_id")
        .join(exact, Seq("q_vec_id", "n_vec_id"), "left_semi").count().toDouble / 50.0
    val single = recall(Similarity.lshCosineTopK(e, q, k = 10, bits = 8))
    val multi = recall(Similarity.lshCosineTopKMultiProbe(e, q, k = 10, bits = 8))
    multi should be >= single
    multi should be > 0.0 // catastrophic-bug floor: probe set misses even the own bucket
  }

  test("multi-probe candidates are exactly the hamming<=1 bucket union") {
    // Every returned neighbor must live in a bucket at hamming distance
    // <= 1 from its query's bucket (the probe definition), and cosines
    // are exact (same re-rank as the single-probe tier).
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val buckets = Similarity.withLshBucket(e, bits = 8).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    val got = Similarity.lshCosineTopKMultiProbe(e, q, k = 10, bits = 8).collect()
    got.length should be > 0
    got.foreach { r =>
      val d = java.lang.Long.bitCount(
        buckets(r.getAs[Long]("q_vec_id")) ^ buckets(r.getAs[Long]("n_vec_id")))
      d should be <= 1
    }
  }

  test("ivfCosineTopK recall@10 vs exact stays above the pinned floor") {
    // The q26b contract, asserted: IVF with 2 probes over stride-100
    // centroids recovers most of the exact top-10 — a broken cell
    // assignment (query and corpus assigned by different math) collapses
    // this to ~k/n and fails loudly.
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val exact = Similarity.cosineTopK(e, q, k = 10).select("q_vec_id", "n_vec_id")
    val approx = Similarity.ivfCosineTopK(e, q, k = 10, stride = 100, nProbe = 2)
      .select("q_vec_id", "n_vec_id")
    val hits = approx.join(exact, Seq("q_vec_id", "n_vec_id"), "left_semi").count()
    (hits.toDouble / 50.0) should be >= 0.4 // measured 0.68 at sf0.01
  }

  test("pqEncode: m codes per vector in [0, k), deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def codes() = Similarity.pqEncode(e).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    val c1 = codes()
    c1 shouldBe codes() // collected-codebook chain is fully deterministic
    c1.size shouldBe e.count()
    c1.values.foreach { cs =>
      cs.length shouldBe Similarity.PqM
      cs.foreach { c => c should be >= 0; c should be < Similarity.PqK }
    }
    // the codebook seeds quantize to themselves: seed j's subspace-s
    // code is j (its own entry is at L2 distance 0)
    (0 until Similarity.PqK).foreach { j =>
      c1(j.toLong * Similarity.PqStride) shouldBe Seq.fill(Similarity.PqM)(j)
    }
  }

  test("pq ADC recall@10 stays above the catastrophic-bug floor") {
    // The q99c contract, asserted: seed (untrained) codebooks on
    // near-random embeddings give modest recall (measured 0.12 at
    // sf0.01) — the floor catches the bug class where encode and LUT
    // disagree and the scan degrades to rank-by-vec_id (~k/n = 0.02).
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val exact = Similarity.cosineTopK(e, q, k = 10).select("q_vec_id", "n_vec_id")
    val approx = Similarity.pqAdcTopK(e, q, kTop = 10).select("q_vec_id", "n_vec_id")
    val hits = approx.join(exact, Seq("q_vec_id", "n_vec_id"), "left_semi").count()
    (hits.toDouble / 50.0) should be >= 0.06
  }

  test("hardNegatives: excludes candidates at or above the ceiling, keeps the band") {
    // query 0's exact duplicate (vec 9, cos 1.0) and near-dup (vec 1,
    // cos ≈ 0.994) must be EXCLUDED at ceiling 0.9; the mid-similarity
    // vector 4 (cos ≈ 0.707) is the hard negative the miner is for
    val docs = vecs(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f),
      2L -> Seq(0f, 1f, 0f),
      3L -> Seq(-1f, 0f, 0f),
      4L -> Seq(0.5f, 0.5f, 0f),
      9L -> Seq(1f, 0f, 0f)) // exact clone of 0
    val got = Similarity.hardNegatives(docs, docs.where(col("vec_id") === 0),
        k = 2, ceiling = 0.9)
      .collect().map(r => (r.getAs[Long]("n_vec_id"), r.getAs[Long]("rank")))
      .sortBy(_._2).map(_._1)
    got shouldBe Seq(4L, 2L) // clone 9 and near-dup 1 excluded; 4 then 2
    // multi-probe twin returns a subset of the exact band with exact cos
    val exact = Similarity.hardNegatives(docs, docs.where(col("vec_id") === 0),
        k = 10, ceiling = 0.9)
      .collect().map(r => r.getAs[Long]("n_vec_id") -> r.getAs[Double]("cos")).toMap
    Similarity.hardNegativesMultiProbe(docs, docs.where(col("vec_id") === 0),
        k = 10, ceiling = 0.9, bits = 4)
      .collect().foreach { r =>
        exact(r.getAs[Long]("n_vec_id")) shouldBe r.getAs[Double]("cos") +- 1e-12
      }
  }

  test("ivfPqTopK: tier-consistent with the flat ADC scan, candidates cell-confined") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    // flat ADC scores for EVERY pair (kTop = corpus size)
    val flat = Similarity.pqAdcTopK(e, q, kTop = e.count().toInt)
      .collect()
      .map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id")) ->
        r.getAs[Double]("adc")).toMap
    val ivfpq = Similarity.ivfPqTopK(e, q, kTop = 10).collect()
    ivfpq.length should be > 0
    // composing IVF pruning with PQ scoring must not change any score —
    // the cell stage only restricts WHICH pairs are scored
    ivfpq.foreach { r =>
      flat((r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id"))) shouldBe
        r.getAs[Double]("adc")
    }
  }

  test("ivfPqTopKRefined: true-cosine scores, refine pool from the ADC tier, recall never below pure ADC") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val pred = col("label") === 1
    // refined scores ARE the exact cosine (downstream thresholds mean
    // what they say)
    val exact = Similarity.cosineTopK(e, q, k = Int.MaxValue - 1).collect()
      .map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id")) ->
        r.getAs[Double]("cos")).toMap
    val refined = Similarity.ivfPqTopKFilteredRefined(e, q, pred,
      kTop = 10, refineFactor = 5).collect()
    refined.length should be > 0
    refined.foreach { r =>
      exact((r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id"))) shouldBe
        r.getAs[Double]("cos") +- 1e-12
    }
    // the refine pool is the ADC top-R: every refined hit appears in
    // the ADC tier's top-50 for its query
    val adc50 = Similarity.ivfPqTopKFiltered(e, q, pred, kTop = 50).collect()
      .map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id"))).toSet
    refined.foreach { r =>
      adc50 should contain(
        (r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id")))
    }
    // recall@10 vs the exact filtered top-10: refined ≥ pure ADC per
    // query (the re-rank can only promote true neighbors the codes
    // mis-ordered), and the q229c oracle records the measured lift
    val truth = Similarity.cosineTopK(e.where(pred), q, k = 10).collect()
      .map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id"))).toSet
    def recallOf(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id")))
      .groupBy(_._1).view
      .mapValues(_.count(truth.contains)).toMap.withDefaultValue(0)
    val rAdc = recallOf(
      Similarity.ivfPqTopKFiltered(e, q, pred, kTop = 10).collect())
    val rRef = recallOf(refined)
    (0L until 5L).foreach { qid =>
      rRef(qid) should be >= rAdc(qid)
    }
    // the unfiltered refined arm holds the same containment contract
    val adcU = Similarity.ivfPqTopK(e, q, kTop = 50).collect()
      .map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id"))).toSet
    Similarity.ivfPqTopKRefined(e, q, kTop = 10, refineFactor = 5).collect()
      .foreach { r =>
        adcU should contain(
          (r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id")))
      }
  }

  test("appendAnnIndex: batched appends equal one append and cover the union") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val hist = e.where(col("vec_id") < 400)
    val d1 = e.where(col("vec_id") >= 400 && col("vec_id") < 450)
    val d2 = e.where(col("vec_id") >= 450)
    val q = e.where(col("vec_id") < 5)
    def grow(name: String, deltas: Seq[org.apache.spark.sql.DataFrame]) = {
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_append_spec_$name"
      Similarity.buildAnnIndex(hist, idx, stride = 100)
      deltas.foreach(d => Similarity.appendAnnIndex(spark, d, idx))
      idx
    }
    val oneShot = grow("one", Seq(d1.unionByName(d2)))
    val batched = grow("two", Seq(d1, d2))
    // ingest batching is invisible to queries
    rowsOf(Similarity.searchAnnIndexed(spark, batched, q, k = 10, nProbe = 2)) shouldBe
      rowsOf(Similarity.searchAnnIndexed(spark, oneShot, q, k = 10, nProbe = 2))
    // the grown index holds every vector exactly once, history untouched
    val cells = spark.read.parquet(s"$oneShot/cells")
    cells.count() shouldBe e.count()
    cells.select("vec_id").distinct().count() shouldBe e.count()
  }

  test("ivfCosineTopKFiltered: only surviving candidates, exact scores, underfill") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val got = Similarity.ivfCosineTopKFiltered(e, q, col("label") === 1,
      k = 10, stride = 100, nProbe = 2).collect()
    got.length should be > 0
    val allowed = e.where(col("label") === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    got.foreach(r => allowed should contain(r.getAs[Long]("n_vec_id")))
    // scores are the exact cosine — the filter prunes candidates, never
    // changes arithmetic
    val exact = Similarity.cosineTopK(e, q, k = Int.MaxValue - 1).collect()
      .map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id")) ->
        r.getAs[Double]("cos")).toMap
    got.foreach { r =>
      exact((r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id"))) shouldBe
        r.getAs[Double]("cos") +- 1e-12
    }
    // a rare predicate UNDERFILLS (deterministic output, no hidden probe
    // widening): 3 surviving vectors can fill at most 3 of k=10 slots
    val rare = Similarity.ivfCosineTopKFiltered(e, q,
      col("label") === 1 && col("vec_id") < 40, k = 10, stride = 100, nProbe = 2)
    val perQuery = rare.groupBy("q_vec_id").count().collect()
    val nRare = e.where(col("label") === 1 && col("vec_id") < 40).count()
    perQuery.foreach(r => r.getAs[Long]("count") should be <= nRare)
  }

  test("deleteFromAnnIndex: tombstoned rows stop being candidates, cells survive") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    // fresh dir per run: a leftover tombstone set from a previous run
    // would (correctly) trip the rebuild's id-reuse guard
    val idx = java.nio.file.Files.createTempDirectory("graft_delete_spec").toString
    Similarity.buildAnnIndex(e, idx, stride = 100)
    // vec_id ≡ 2 mod 4 deletes centroid 200's source vector too — the
    // frozen-quantizer semantic: the CELL survives, the vector does not
    val dead = pmod(col("vec_id"), lit(4)) === 2
    Similarity.deleteFromAnnIndex(spark, e.where(dead), idx)
    val got = Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2)
    val deadIds = e.where(dead).select("vec_id").collect().map(_.getLong(0)).toSet
    got.collect().foreach(r => deadIds should not contain r.getAs[Long]("n_vec_id"))
    // search-after-delete ≡ the direct filtered IVF path with the FULL
    // corpus's centroids (the q223 oracle contract, pinned engine-side)
    rowsOf(got) shouldBe rowsOf(Similarity.ivfCosineTopKFiltered(
      e, q, !dead, k = 10, stride = 100, nProbe = 2))
  }

  test("compactAnnIndex folds tombstones answer-invariantly; commit is one atomic version flip") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("graft_compact_spec").toString
    Similarity.buildAnnIndex(e, idx, stride = 100)
    Similarity.deleteFromAnnIndex(spark, e.where(col("vec_id") % 4 === 2), idx)
    val before = rowsOf(Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2))
    // the observability table reads the debt the policy bound acts on:
    // totals cover the corpus, tombstone mass = the delete set, live =
    // the difference — per cell
    val stats = Similarity.annIndexStats(spark, idx).collect()
      .map(r => r.getAs[Long]("cell") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("n_tombstoned"),
          r.getAs[Long]("n_live")))).toMap
    stats.values.map(_._1).sum shouldBe e.count()
    stats.values.map(_._2).sum shouldBe e.where(col("vec_id") % 4 === 2).count()
    stats.values.foreach { case (n, t, l) => l shouldBe n - t }
    // a RETRIED delete appends the same ids again — the stats read
    // dedupes, so neither totals nor debt inflate (advice r10)
    Similarity.deleteFromAnnIndex(spark, e.where(col("vec_id") % 4 === 2), idx)
    val retried = Similarity.annIndexStats(spark, idx).collect()
      .map(r => r.getAs[Long]("cell") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("n_tombstoned"),
          r.getAs[Long]("n_live")))).toMap
    retried shouldBe stats
    // PROBE ACROSS THE COMPACTION: a plan resolved BEFORE the commit
    // keeps scanning its own (retained) generation + tombstone set —
    // the round-10 rename race had no such guarantee
    val inFlight = Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2)
    Similarity.compactAnnIndex(spark, idx)
    rowsOf(inFlight) shouldBe before
    // answers identical post-flip; generation 1 committed and shrunk
    rowsOf(Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2)) shouldBe before
    new java.io.File(s"$idx/COMMIT_v1").exists() shouldBe true
    spark.read.parquet(s"$idx/cells_v1").count() shouldBe
      e.where(col("vec_id") % 4 =!= 2).count()
    // post-compaction stats: debt zero, live totals unchanged
    val after = Similarity.annIndexStats(spark, idx).collect()
    after.map(_.getAs[Long]("n_tombstoned")).sum shouldBe 0L
    after.map(_.getAs[Long]("n_live")).sum shouldBe
      stats.values.map(_._3).sum
    // ID-REUSE GUARD: a rebuild whose input carries a pending-tombstoned
    // id fails loudly instead of silently resurrecting the row
    Similarity.deleteFromAnnIndex(spark, e.where(col("vec_id") === 1), idx)
    val reuse = intercept[IllegalArgumentException] {
      Similarity.buildAnnIndex(e, idx, stride = 100)
    }
    reuse.getMessage should include("pending-tombstoned")
    // a rebuild NOT reusing the id proceeds: generations + markers +
    // tombstone sets all retire, lists live at generation 0 again
    val e2 = e.where(col("vec_id") =!= 1)
    Similarity.buildAnnIndex(e2, idx, stride = 100)
    new java.io.File(s"$idx/COMMIT_v1").exists() shouldBe false
    new java.io.File(s"$idx/cells_v1").exists() shouldBe false
    new java.io.File(s"$idx/tombstones").exists() shouldBe false
    rowsOf(Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2)) shouldBe
      rowsOf(Similarity.ivfCosineTopK(e2, q, k = 10, stride = 100, nProbe = 2))
    // crash healing: a compaction that died BEFORE its commit marker
    // left an UNCOMMITTED generation dir — the next compaction removes
    // the partial write, re-folds, and answers correctly
    Similarity.deleteFromAnnIndex(spark, e2.where(col("vec_id") % 4 === 2), idx)
    val expected = rowsOf(
      Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2))
    val partial = new java.io.File(s"$idx/cells_v1")
    partial.mkdir() shouldBe true
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$idx/cells_v1/part-junk"), "partial write")
    Similarity.compactAnnIndex(spark, idx)
    new java.io.File(s"$idx/COMMIT_v1").exists() shouldBe true
    rowsOf(Similarity.searchAnnIndexed(
      spark, idx, q, k = 10, nProbe = 2)) shouldBe expected
    // SECOND compaction retires generation 0 entirely (bounded
    // retention: current + previous stay, older go)
    Similarity.deleteFromAnnIndex(spark, e2.where(col("vec_id") === 5), idx)
    Similarity.compactAnnIndex(spark, idx)
    new java.io.File(s"$idx/COMMIT_v2").exists() shouldBe true
    new java.io.File(s"$idx/cells").exists() shouldBe false
    new java.io.File(s"$idx/tombstones").exists() shouldBe false
    new java.io.File(s"$idx/cells_v1").exists() shouldBe true
    rowsOf(Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2)) shouldBe
      rowsOf(Similarity.ivfCosineTopK(
        e2.where(col("vec_id") % 4 =!= 2 && col("vec_id") =!= 5),
        q, k = 10, stride = 100, nProbe = 2))
    // THIRD compaction: generation 0 is already retired — retention must
    // skip absent paths, retire v1, and keep v2 + v3
    Similarity.deleteFromAnnIndex(spark, e2.where(col("vec_id") === 9), idx)
    Similarity.compactAnnIndex(spark, idx)
    new java.io.File(s"$idx/COMMIT_v3").exists() shouldBe true
    new java.io.File(s"$idx/cells_v1").exists() shouldBe false
    new java.io.File(s"$idx/cells_v2").exists() shouldBe true
    rowsOf(Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2)) shouldBe
      rowsOf(Similarity.ivfCosineTopK(
        e2.where(col("vec_id") % 4 =!= 2 && col("vec_id") =!= 5 &&
          col("vec_id") =!= 9),
        q, k = 10, stride = 100, nProbe = 2))
  }

  test("annIndexGenerations + vacuumAnnIndex: the version pointer is observable and reclaimable") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("graft_vacuum_spec").toString
    Similarity.buildAnnIndex(e, idx, stride = 100)
    def gens() = Similarity.annIndexGenerations(spark, idx).collect()
      .map(r => r.getAs[Long]("generation") ->
        ((r.getAs[Boolean]("committed"), r.getAs[Boolean]("current"),
          r.getAs[Boolean]("has_tombstones")))).toMap
    // fresh index: one committed, current generation, no debt
    gens() shouldBe Map(0L -> ((true, true, false)))
    // vacuum on a fresh index is a no-op
    Similarity.vacuumAnnIndex(spark, idx)
    gens() shouldBe Map(0L -> ((true, true, false)))
    // delete + compact: generation 1 current, generation 0 retained
    // WITH its folded tombstone set — the vacuum debt, observable
    Similarity.deleteFromAnnIndex(spark, e.where(col("vec_id") % 4 === 2), idx)
    Similarity.compactAnnIndex(spark, idx)
    val expected = rowsOf(
      Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2))
    gens() shouldBe Map(
      0L -> ((true, false, true)), 1L -> ((true, true, false)))
    // crash litter: an uncommitted partial generation shows up as such
    new java.io.File(s"$idx/cells_v2").mkdir() shouldBe true
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$idx/cells_v2/part-junk"), "partial")
    gens() shouldBe Map(0L -> ((true, false, true)),
      1L -> ((true, true, false)), 2L -> ((false, false, false)))
    // vacuum reclaims the retained generation AND the litter; the
    // current generation answers exactly as before
    Similarity.vacuumAnnIndex(spark, idx)
    gens() shouldBe Map(1L -> ((true, true, false)))
    new java.io.File(s"$idx/cells").exists() shouldBe false
    new java.io.File(s"$idx/tombstones").exists() shouldBe false
    new java.io.File(s"$idx/cells_v2").exists() shouldBe false
    rowsOf(Similarity.searchAnnIndexed(
      spark, idx, q, k = 10, nProbe = 2)) shouldBe expected
    // the lifecycle keeps composing after a vacuum: append + search
    Similarity.appendAnnIndex(spark,
      e.where(col("vec_id") === 8)
        .select((col("vec_id") + 3001L).as("vec_id"), col("embedding")), idx)
    spark.read.parquet(s"$idx/cells_v1").count() shouldBe
      e.where(col("vec_id") % 4 =!= 2).count() + 1
  }

  test("compactAnnIndex reconciles a racing delete and fails loudly on a racing append") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    // RACING DELETE: lands after the live fold is staged but before the
    // commit marker — it belongs to the superseded generation's set,
    // which the pre-fix code retired next cycle without ever folding
    // (the deleted row silently resurrected). The drift check carries
    // the set forward into the new generation's tombstones.
    val idx = java.nio.file.Files.createTempDirectory("graft_race_del").toString
    Similarity.buildAnnIndex(e, idx, stride = 100)
    Similarity.deleteFromAnnIndex(spark, e.where(col("vec_id") % 4 === 2), idx)
    Similarity.compactAnnIndexWithHook(spark, idx, () =>
      Similarity.deleteFromAnnIndex(spark, e.where(col("vec_id") === 7), idx))
    val expected = rowsOf(Similarity.ivfCosineTopKFiltered(
      e, q, col("vec_id") % 4 =!= 2 && col("vec_id") =!= 7,
      k = 10, stride = 100, nProbe = 2))
    val got = Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2)
    got.select("n_vec_id").collect().map(_.getLong(0)).toSet should
      not contain 7L
    rowsOf(got) shouldBe expected
    // the carried-forward set folds physically on the NEXT compaction
    // (re-folding already-folded ids is an idempotent anti-join no-op)
    Similarity.compactAnnIndex(spark, idx)
    spark.read.parquet(s"$idx/cells_v2").count() shouldBe
      e.where(col("vec_id") % 4 =!= 2 && col("vec_id") =!= 7).count()
    rowsOf(Similarity.searchAnnIndexed(
      spark, idx, q, k = 10, nProbe = 2)) shouldBe expected

    // RACING APPEND: the delta's files land in the superseded lists
    // only — probes of the committed generation would silently miss
    // them, so the drift check fails loudly naming the recovery
    val idx2 = java.nio.file.Files.createTempDirectory("graft_race_app").toString
    val delta = e.where(col("vec_id") === 8)
      .select((col("vec_id") + 2001L).as("vec_id"), col("embedding"))
    Similarity.buildAnnIndex(e, idx2, stride = 100)
    Similarity.deleteFromAnnIndex(spark, e.where(col("vec_id") % 4 === 2), idx2)
    val raced = intercept[IllegalStateException] {
      Similarity.compactAnnIndexWithHook(spark, idx2, () =>
        Similarity.appendAnnIndex(spark, delta, idx2))
    }
    raced.getMessage should include("raced this generation swap")
    // the commit itself is SOUND (a correct fold of the pre-race
    // snapshot) and the superseded lists stay for the re-run
    new java.io.File(s"$idx2/COMMIT_v1").exists() shouldBe true
    new java.io.File(s"$idx2/cells").exists() shouldBe true
    // recovery is exactly what the error names: re-run the append — it
    // now lands in the committed generation
    Similarity.appendAnnIndex(spark, delta, idx2)
    val union = e.select(col("vec_id"), col("embedding")).unionByName(delta)
    rowsOf(Similarity.searchAnnIndexed(spark, idx2, q, k = 10, nProbe = 2)) shouldBe
      rowsOf(Similarity.ivfCosineTopKFiltered(
        union, q, col("vec_id") % 4 =!= 2, k = 10, stride = 100, nProbe = 2))
  }

  test("compactAnnIndex converges stranded generations even with no pending tombstones") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("graft_strand_spec").toString
    Similarity.buildAnnIndex(e, idx, stride = 100)
    Similarity.deleteFromAnnIndex(spark, e.where(col("vec_id") % 4 === 2), idx)
    Similarity.compactAnnIndex(spark, idx)
    Similarity.deleteFromAnnIndex(spark, e.where(col("vec_id") === 5), idx)
    Similarity.compactAnnIndex(spark, idx)
    val expected = rowsOf(
      Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2))
    // recreate the stranded generation-0 layout a crash after COMMIT_v2
    // but before retirement would have left (lists + tombstone set)
    new java.io.File(s"$idx/cells").mkdir() shouldBe true
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$idx/cells/part-junk"), "stranded")
    new java.io.File(s"$idx/tombstones").mkdir() shouldBe true
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$idx/tombstones/part-junk"), "stranded")
    // NO pending tombstones at the current generation — the pre-fix
    // early return skipped the heal and stranded the litter forever
    Similarity.compactAnnIndex(spark, idx)
    new java.io.File(s"$idx/cells").exists() shouldBe false
    new java.io.File(s"$idx/tombstones").exists() shouldBe false
    // retention policy untouched: the immediately-previous generation
    // stays one cycle, the current one keeps answering identically
    new java.io.File(s"$idx/cells_v1").exists() shouldBe true
    new java.io.File(s"$idx/cells_v2").exists() shouldBe true
    rowsOf(Similarity.searchAnnIndexed(
      spark, idx, q, k = 10, nProbe = 2)) shouldBe expected
  }

  test("maintainAnnIndex: measures debt, folds only over the bound, vacuums on drain assertion") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("graft_maint_spec").toString
    Similarity.buildAnnIndex(e, idx, stride = 100)
    // UNDER the bound: measured, nothing folds, the deletes stay
    // pending (probes still honor them via the anti-join)
    Similarity.deleteFromAnnIndex(spark, e.where(col("vec_id") < 10), idx)
    val r1 = Similarity.maintainAnnIndex(spark, idx, maxDebtFrac = 0.2).head()
    r1.getAs[Long]("n_vecs") shouldBe e.count()
    r1.getAs[Long]("n_tombstoned") shouldBe 10L
    r1.getAs[Boolean]("compacted") shouldBe false
    r1.getAs[Boolean]("serve_state_stale") shouldBe false
    r1.getAs[Long]("generation_after") shouldBe 0L
    new java.io.File(s"$idx/tombstones").exists() shouldBe true
    // OVER the bound: the call folds, the generation pointer flips,
    // and pre-call serve artifacts are flagged stale
    Similarity.deleteFromAnnIndex(spark, e.where(col("vec_id") % 4 === 2), idx)
    val r2 = Similarity.maintainAnnIndex(spark, idx, maxDebtFrac = 0.2).head()
    r2.getAs[Boolean]("compacted") shouldBe true
    r2.getAs[Double]("debt") should be > 0.2
    r2.getAs[Long]("generation_before") shouldBe 0L
    r2.getAs[Long]("generation_after") shouldBe 1L
    r2.getAs[Boolean]("serve_state_stale") shouldBe true
    // answer-invariance of the maintenance fold (q223's contract)
    val live = !(col("vec_id") < 10 || col("vec_id") % 4 === 2)
    rowsOf(Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2)) shouldBe
      rowsOf(Similarity.ivfCosineTopKFiltered(
        e, q, live, k = 10, stride = 100, nProbe = 2))
    // DRAIN asserted: the retained generation reclaims; no fold needed
    new java.io.File(s"$idx/cells").exists() shouldBe true
    val r3 = Similarity.maintainAnnIndex(
      spark, idx, maxDebtFrac = 0.2, reclaimRetained = true).head()
    r3.getAs[Boolean]("compacted") shouldBe false
    r3.getAs[Boolean]("vacuumed") shouldBe true
    r3.getAs[Boolean]("serve_state_stale") shouldBe false
    new java.io.File(s"$idx/cells").exists() shouldBe false
    rowsOf(Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2)) shouldBe
      rowsOf(Similarity.ivfCosineTopKFiltered(
        e, q, live, k = 10, stride = 100, nProbe = 2))
  }

  test("compactAnnIndex refuses to fold the index away to zero live rows") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < 20)
    val idx = java.nio.file.Files.createTempDirectory("graft_empty_fold").toString
    Similarity.buildAnnIndex(e, idx, stride = 5)
    Similarity.deleteFromAnnIndex(spark, e, idx) // everything
    val emptied = intercept[IllegalArgumentException] {
      Similarity.compactAnnIndex(spark, idx)
    }
    emptied.getMessage should include("ZERO live rows")
    // nothing committed: the index still resolves generation 0 and the
    // tombstone set still pends (searches correctly serve nothing)
    new java.io.File(s"$idx/COMMIT_v1").exists() shouldBe false
    new java.io.File(s"$idx/cells_v1").exists() shouldBe false
    Similarity.searchAnnIndexed(spark, idx,
      e.where(col("vec_id") < 2), k = 5, nProbe = 2).count() shouldBe 0L
  }

  test("retrainAnnIndex: fresh quantizer from live rows equals a fresh build; metadata rides through") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("graft_retrain_a").toString
    // grow the index far past its build: the frozen quantizer never saw
    // the appended rows' seed positions (400 is a seed id of the FULL
    // corpus but not of the partial build)
    Similarity.buildAnnIndex(e.where(col("vec_id") < 400), idx,
      stride = 100, metaCols = Seq("label"))
    Similarity.appendAnnIndex(spark, e.where(col("vec_id") >= 400), idx)
    Similarity.retrainAnnIndex(spark, idx, stride = 100)
    // retrain ≡ a fresh build over the same (live) rows — same seed
    // rule, same assignment, same probes
    val idx2 = java.nio.file.Files.createTempDirectory("graft_retrain_a2").toString
    Similarity.buildAnnIndex(e, idx2, stride = 100, metaCols = Seq("label"))
    def rows(p: String) = Similarity.searchAnnIndexed(spark, p, q,
      k = 10, nProbe = 2).collect().map(_.toSeq).toSet
    rows(idx) shouldBe rows(idx2)
    rows(idx) should not be empty
    // metadata columns rode through the re-assignment: filtered probes
    // still push the predicate into the retrained layout
    def frows(p: String) = Similarity.searchAnnIndexedFiltered(spark, p, q,
      col("label") === 1, k = 10, nProbe = 2).collect().map(_.toSeq).toSet
    frows(idx) shouldBe frows(idx2)
    // appends AFTER the retrain assign with the NEW quantizer: the
    // grown index still equals the fresh-build twin grown the same way
    val extra = e.where(col("vec_id") < 3)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"),
        col("label"))
    Similarity.appendAnnIndex(spark, extra, idx)
    Similarity.appendAnnIndex(spark, extra, idx2)
    rows(idx) shouldBe rows(idx2)
  }

  test("retrainAnnIndex folds tombstones, drifts serve artifacts, and versions the quantizer reclaimably") {
    import graft.streaming.StreamingOps
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft_retrain_b").toString
    Similarity.buildAnnIndex(e, idx, stride = 100)
    val st0 = StreamingOps.annServeState(spark, idx)
    Similarity.deleteFromAnnIndex(spark,
      e.where(col("vec_id") % 4 === 2), idx)
    Similarity.retrainAnnIndex(spark, idx, stride = 100)
    // tombstones folded as a side effect: a previously-deleted id
    // re-appends without an explicit compact (the q226 law)
    Similarity.appendAnnIndex(spark,
      e.where(col("vec_id") === 2).select("vec_id", "embedding"), idx)
    // a pre-retrain serve artifact drifts by generation — loud
    intercept[IllegalArgumentException] {
      StreamingOps.requireServeStateCurrent(spark, idx, st0)
    }.getMessage should include("STALE")
    // … and repairs through the one-call maintenance: rebuilt with the
    // NEW quantizer, CURRENT on return
    val (rep, art) = StreamingOps.maintainAnnIndexServing(spark, idx, st0)
    rep.select("serve_action").head().getString(0) shouldBe "rebuilt"
    StreamingOps.requireServeStateCurrent(spark, idx, art)
    // quantizer versions: a second retrain supersedes centroids_v1;
    // vacuum reclaims it (drain contract) and keeps the current one
    Similarity.retrainAnnIndex(spark, idx, stride = 100)
    new java.io.File(s"$idx/centroids_v1").exists() shouldBe true
    new java.io.File(s"$idx/centroids_v2").exists() shouldBe true
    Similarity.vacuumAnnIndex(spark, idx)
    new java.io.File(s"$idx/centroids_v1").exists() shouldBe false
    new java.io.File(s"$idx/centroids_v2").exists() shouldBe true
    Similarity.searchAnnIndexed(spark, idx, e.where(col("vec_id") < 2),
      k = 5, nProbe = 2).count() should be > 0L
    // crash healing: an uncommitted generation's partial quantizer dies
    // with its lists on the next swap's heal pass
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$idx/cells_v3"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$idx/centroids_v3"))
    Similarity.compactAnnIndex(spark, idx) // heals, then no-work return
    new java.io.File(s"$idx/cells_v3").exists() shouldBe false
    new java.io.File(s"$idx/centroids_v3").exists() shouldBe false
  }

  test("appendAnnIndex refuses pending-tombstoned ids; compact-then-append re-inserts") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("graft_reinsert_spec").toString
    Similarity.buildAnnIndex(e, idx, stride = 100)
    val dead = pmod(col("vec_id"), lit(4)) === 2
    Similarity.deleteFromAnnIndex(spark, e.where(dead), idx)
    // delete(id) then append(id) would leave the re-ingested row
    // invisible to every search (the anti-join removes it) and the next
    // compaction would physically drop it — the composition fails loudly
    val clash = intercept[IllegalArgumentException] {
      Similarity.appendAnnIndex(spark, e.where(dead), idx)
    }
    clash.getMessage should include("pending-tombstoned")
    // the supported composition: fold the deletes, THEN re-insert — the
    // round-trip restores the full corpus bit-for-bit (frozen centroids,
    // so re-appended rows reclaim their original cells)
    Similarity.compactAnnIndex(spark, idx)
    Similarity.appendAnnIndex(spark, e.where(dead), idx)
    rowsOf(Similarity.searchAnnIndexed(spark, idx, q, k = 10, nProbe = 2)) shouldBe
      rowsOf(Similarity.ivfCosineTopK(e, q, k = 10, stride = 100, nProbe = 2))
    // a NON-clashing append with a pending tombstone set passes the
    // guard: the new id lands in the lists, the tombstoned one stays out
    val idx2 = java.nio.file.Files.createTempDirectory("graft_reinsert_spec2").toString
    Similarity.buildAnnIndex(e, idx2, stride = 100)
    Similarity.deleteFromAnnIndex(spark, e.where(col("vec_id") === 7), idx2)
    Similarity.appendAnnIndex(spark,
      e.where(col("vec_id") === 8)
        .select((col("vec_id") + 1001L).as("vec_id"), col("embedding")), idx2)
    spark.read.parquet(s"$idx2/cells").count() shouldBe e.count() + 1
    val seen = Similarity.searchAnnIndexed(spark, idx2, q, k = 10, nProbe = 2)
      .select("n_vec_id").collect().map(_.getLong(0)).toSet
    seen should not contain 7L
  }

  test("embedding hot-bucket guard skips degenerate buckets observably") {
    val s = spark
    import s.implicits._
    // 40 identical vectors: every table's bucket holds all 40
    val clones = (0L until 40L).map(i => (i, Seq(1f, 2f, 3f, 4f))).toDF("vec_id", "embedding")
    Similarity.lshNearDupPairs(clones, threshold = 0.9, bits = 4)
      .count() shouldBe 40L * 39 / 2
    Similarity.lshNearDupPairs(clones, threshold = 0.9, bits = 4, maxBucketSize = 10)
      .count() shouldBe 0L
  }

  test("quantizeInt8: values in [0,255], reconstruction error <= scale/2") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < 50)
    val rows = Similarity.dequantizeInt8(Similarity.quantizeInt8(e)).collect()
    rows.foreach { r =>
      val emb = r.getAs[scala.collection.Seq[Double]]("emb")
      val q = r.getAs[scala.collection.Seq[Int]]("q")
      val approx = r.getAs[scala.collection.Seq[Double]]("emb_approx")
      val scale = r.getAs[Double]("scale")
      q.foreach { v => v should be >= 0; v should be <= 255 }
      emb.zip(approx).foreach { case (x, xa) =>
        math.abs(x - xa) should be <= (scale / 2 + 1e-9)
      }
    }
  }

  test("real embeddings: top-1 neighbor is symmetric-consistent at small k") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val top = Similarity.cosineTopK(e, e.where(col("vec_id") < 3), k = 5)
    top.count() shouldBe 15L
    // ranks are 1..5 per query
    top.groupBy("q_vec_id").agg(max("rank"), min("rank")).collect().foreach { r =>
      r.getLong(1) shouldBe 5L
      r.getLong(2) shouldBe 1L
    }
  }

  test("embeddingContamination flags exactly the vectors near a bench vector") {
    val s = spark
    import s.implicits._
    // bench = v0; v10 is a near-copy of v0 (cos ≈ 1), v11 orthogonal,
    // v12 anti-parallel — only v10 crosses tau
    val mk = (xs: Seq[Float]) => xs
    val emb = Seq(
      (0L, mk(Seq(1f, 0f, 0f, 0f))),
      (10L, mk(Seq(0.99f, 0.01f, 0f, 0f))),
      (11L, mk(Seq(0f, 1f, 0f, 0f))),
      (12L, mk(Seq(-1f, 0f, 0f, 0f)))).toDF("vec_id", "embedding")
    val got = Similarity.embeddingContamination(
        emb.where(col("vec_id") >= 10), emb.where(col("vec_id") < 10),
        tau = 0.85)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    got.keySet shouldBe Set(10L, 11L, 12L)
    got(10L)._2 shouldBe true
    got(10L)._1 should be > 0.99
    got(11L) shouldBe ((0.0, false))
    got(12L) shouldBe ((-1.0, false))
  }

  test("randomProject emits outDim values, deterministically") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < 20)
    val a = Similarity.randomProject(e, outDim = 8).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("projected"))
    a.length shouldBe 20
    a.foreach { case (_, p) => p.length shouldBe 8 }
    val b = Similarity.randomProject(e, outDim = 8).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("projected"))
    a.toMap shouldBe b.toMap
  }

  test("randomProject maps identical vectors to identical projections") {
    // exact duplicates MUST stay exact duplicates (cosine 1) after the
    // reduction — the property embedding-dedup composition relies on
    val e = vecs(0L -> Seq(3f, -1f, 2f), 1L -> Seq(3f, -1f, 2f),
      2L -> Seq(-3f, 1f, -2f))
    val p = Similarity.randomProject(e, outDim = 4).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("projected"))
      .toMap
    p(0L) shouldBe p(1L)
    // a negated input projects to the negated output (linearity)
    p(2L) shouldBe p(0L).map(v => -v)
  }

  test("randomProject mean cosine distortion stays under the q80b bound") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val proj = Similarity.randomProject(e, outDim = 32)
      .select(col("vec_id"), col("projected").as("embedding"))
    def cosPairs(f: org.apache.spark.sql.DataFrame) = {
      val q = f.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_e"))
      f.select(col("vec_id").as("n_vec_id"),
          col("embedding").cast("array<double>").as("n_e"))
        .join(broadcast(q), col("q_vec_id") =!= col("n_vec_id"))
        .select(col("q_vec_id"), col("n_vec_id"),
          Similarity.cosine(col("q_e").cast("array<double>"), col("n_e")).as("c"))
    }
    val errs = cosPairs(e.select(col("vec_id"), col("embedding")))
      .withColumnRenamed("c", "c0")
      .join(cosPairs(proj), Seq("q_vec_id", "n_vec_id"))
      .groupBy(col("q_vec_id"))
      .agg(avg(abs(col("c0") - col("c"))).as("mean_err"))
      .collect()
    errs.length shouldBe 5
    errs.foreach(r => r.getAs[Double]("mean_err") should be <= 0.25)
  }

  test("randomProject rejects an out-of-range target dimension") {
    val e = vecs(0L -> Seq(1f, 2f))
    an[IllegalArgumentException] should be thrownBy
      Similarity.randomProject(e, outDim = 0)
    an[IllegalArgumentException] should be thrownBy
      Similarity.randomProject(e, outDim = Similarity.MaxDim + 1)
  }

  test("mipsTopK ranks by inner product, not cosine") {
    // v2 points the same way as the query but with twice the norm —
    // cosine ties it with v1, MIPS must prefer it
    val corpus = vecs(
      1L -> Seq(1f, 0f, 0f),
      2L -> Seq(2f, 0f, 0f),
      3L -> Seq(0f, 1f, 0f))
    val got = Similarity.mipsTopK(corpus, vecs(9L -> Seq(1f, 0f, 0f)), k = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    got.toSeq shouldBe Seq((2L, 2.0), (1L, 1.0), (3L, 0.0))
  }

  test("augmentForMips: every augmented vector has norm M; cosine order = MIPS order") {
    val aug = Similarity.augmentForMips(fixture)
    val norms = aug.select(
        Similarity.norm(col("embedding")).as("n")).collect().map(_.getDouble(0))
    // M = 1 in the fixture (unit-ish vectors, max norm 1)
    norms.foreach(_ shouldBe norms.max +- 1e-9)
    val qa = vecs(9L -> Seq(1f, 0f, 0f))
      .select(col("vec_id"),
        concat(col("embedding").cast("array<double>"), array(lit(0.0)))
          .as("embedding"))
    val viaCos = Similarity.cosineTopK(aug, qa, k = 5)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    val direct = Similarity.mipsTopK(fixture, vecs(9L -> Seq(1f, 0f, 0f)), k = 5)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    viaCos shouldBe direct
  }

  test("knnClassify takes the majority label, ties to the smallest label") {
    val s2 = spark
    import s2.implicits._
    val corpus = Seq(
      (1L, Seq(1f, 0f), 7), (2L, Seq(0.9f, 0.1f), 7),
      (3L, Seq(0.8f, 0.2f), 3), (4L, Seq(0f, 1f), 5))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(corpus, vecs(9L -> Seq(1f, 0f)), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.toSeq shouldBe Seq((9L, 7L, 2L)) // 7 votes 2, 3 votes 1
    // 2-2 tie between labels 3 and 7 → smallest label wins
    val tied = Seq(
      (1L, Seq(1f, 0f), 7), (2L, Seq(0.9f, 0.1f), 7),
      (3L, Seq(0.8f, 0.2f), 3), (4L, Seq(0.7f, 0.3f), 3))
      .toDF("vec_id", "embedding", "label")
    Similarity.knnClassify(tied, vecs(9L -> Seq(1f, 0f)), k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((3L, 2L))
  }

  test("hammingTopK: identical vectors at distance 0, near-dups beat unrelated") {
    val sig = Similarity.binarySignatures(fixture, bits = 48).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sig.values.foreach { s => s should be >= 0L; s should be < (1L << 48) }
    val got = Similarity.hammingTopK(
        fixture, vecs(9L -> Seq(1f, 0f, 0f)), k = 5, bits = 48)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // v0 IS the query direction → hamming 0; v1 nearly → small;
    // v3 is the exact opposite → all 48 bits differ
    got.head._1 shouldBe 0L
    got.head._2 shouldBe 0L
    got.find(_._1 == 3L).get._2 shouldBe 48L
    got.find(_._1 == 1L).get._2 should be < 10L
  }

  test("hammingTopK recall: binary-then-exact finds true neighbors in a clustered corpus") {
    // two tight clusters far apart: the binary tier must put the
    // query's own cluster ahead of the other
    val clustered = vecs(
      (0L to 4L).map(i => i -> Seq(1f, 0.01f * i, 0f)) ++
      (5L to 9L).map(i => i -> Seq(0f, 0.01f * (i - 5), 1f)): _*)
    val got = Similarity.hammingTopK(
        clustered, vecs(99L -> Seq(1f, 0.02f, 0f)), k = 5, bits = 48)
      .collect().map(_.getLong(1)).toSet
    got shouldBe Set(0L, 1L, 2L, 3L, 4L)
    an[IllegalArgumentException] should be thrownBy
      Similarity.binarySignatures(fixture, bits = 63)
  }

  test("centroidDrift: identical slices cos 1, flipped slices cos -1, one-sided labels drop") {
    val s2 = spark
    import s2.implicits._
    val a = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.8f, 0.2f), 0),
      (3L, Seq(0f, 1f), 1),
      (9L, Seq(1f, 1f), 7)) // label 7 absent from b
      .toDF("vec_id", "embedding", "label")
    val same = graft.operators.Similarity
      .centroidDrift(a, a.where(col("label") =!= 7)).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    same shouldBe Map(0L -> 1.0, 1L -> 1.0)
    val flipped = Seq(
      (1L, Seq(-1f, 0f), 0), (2L, Seq(-0.8f, -0.2f), 0))
      .toDF("vec_id", "embedding", "label")
    graft.operators.Similarity
      .centroidDrift(a.where(col("label") === 0), flipped)
      .collect().head.getDouble(3) shouldBe -1.0
  }

  test("labelOutliers flags the member farthest from its own label centroid") {
    val s2 = spark
    import s2.implicits._
    // label 0: a tight cluster around (1, 0) plus one flipped point;
    // label 1: a tight pair — nothing to flag at p=0.3 but its tail
    val corpus = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.95f, 0.05f), 0),
      (3L, Seq(0.9f, 0.1f), 0), (4L, Seq(-1f, 0.2f), 0), // the mislabel
      (5L, Seq(0f, 1f), 1), (6L, Seq(0.05f, 0.95f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.labelOutliers(corpus, pLo = 0.3).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    got(4L)._2 shouldBe true
    got(4L)._1 should be < 0.0 // opposite the centroid
    Seq(1L, 2L, 3L).count(got(_)._2) shouldBe 0
    an[IllegalArgumentException] should be thrownBy
      Similarity.labelOutliers(corpus, pLo = 0.0)
  }

  test("evalRanking: hand-computed recall/MRR/nDCG, zero-hit and absent queries") {
    val s2 = spark
    import s2.implicits._
    // q1: truth {a,b,c}; retrieved [a@1, x@2, c@3] → hits a,c
    // q2: truth {a};     retrieved [x@1, y@2]     → no hits
    // q3: truth {a, b};  retrieved nothing at all → zeros via outer join
    val results = Seq(
      (1L, 10L, 1L), (1L, 99L, 2L), (1L, 30L, 3L),
      (2L, 99L, 1L), (2L, 98L, 2L))
      .toDF("q_vec_id", "n_vec_id", "rank")
    val truth = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L),
      (3L, 10L), (3L, 20L))
      .toDF("q_vec_id", "n_vec_id")
    val got = graft.operators.Search.evalRanking(results, truth, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val (nRel1, nHits1, recall1, mrr1, ndcg1) = got(1L)
    nRel1 shouldBe 3L
    nHits1 shouldBe 2L
    recall1 shouldBe 0.666667 +- 1e-9
    mrr1 shouldBe 1.0
    // dcg = 1/log2(2) + 1/log2(4) = 1.5; idcg = 1 + 1/log2(3) + 0.5
    ndcg1 shouldBe (1.5 / (1.5 + 1.0 / (math.log(3) / math.log(2)))) +- 1e-6
    got(2L) shouldBe ((1L, 0L, 0.0, 0.0, 0.0))
    got(3L) shouldBe ((2L, 0L, 0.0, 0.0, 0.0))
    an[IllegalArgumentException] should be thrownBy
      graft.operators.Search.evalRanking(results, truth, k = 0)
  }

  test("materialized ANN index roundtrip reproduces ivfCosineTopK exactly") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 3)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ann-index").toString
    Similarity.buildAnnIndex(e, path, stride = 50)
    val direct = Similarity.ivfCosineTopK(e, q, k = 5, stride = 50, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val indexed = Similarity.searchAnnIndexed(spark, path, q, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    indexed.sorted shouldBe direct.sorted
    direct.length should be > 0
  }

  test("ANN index probe prunes cell partitions dynamically") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("graft-ann-index-dpp").toString
    Similarity.buildAnnIndex(e, path, stride = 50)
    val plan = Similarity
      .searchAnnIndexed(spark, path, e.where(col("vec_id") < 3), k = 5)
      .queryExecution.executedPlan.toString
    // the probe cells are runtime values, so pruning must be the DPP
    // subquery filter on the partitioned scan — static PartitionFilters
    // cannot express it
    withClue(s"plan:\n$plan\n") {
      assert(plan.contains("dynamicpruning"),
        "no dynamic partition pruning on the cell-partitioned scan")
    }
  }

  test("searchAnnIndexedFiltered: equals the direct filtered path, predicate pushed to the scan") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ann-index-filtered").toString
    Similarity.buildAnnIndex(e, path, stride = 100, metaCols = Seq("label"))
    val indexed = Similarity.searchAnnIndexedFiltered(
      spark, path, q, col("label") === 1, k = 10, nProbe = 2)
    rowsOf(indexed) shouldBe rowsOf(Similarity.ivfCosineTopKFiltered(
      e, q, col("label") === 1, k = 10, stride = 100, nProbe = 2))
    indexed.count() should be > 0L
    // the predicate reaches the cell-file scan as a pushed parquet
    // filter — row groups skip by label min/max, composing with the
    // DPP cell pruning
    val plan = indexed.queryExecution.executedPlan.toString
    withClue(s"plan:\n$plan\n") {
      assert(plan.contains("PushedFilters: [IsNotNull(label), EqualTo(label,1)"),
        "label predicate not pushed into the cells scan")
    }
    // appends inherit the INDEX's metadata layout (derived from the
    // persisted schema, never re-specified) and stay batching-invariant
    // under the filtered probe
    def grow(deltas: Seq[org.apache.spark.sql.DataFrame]) = {
      val p = java.nio.file.Files
        .createTempDirectory("graft-ann-index-filtered-grow").toString
      Similarity.buildAnnIndex(e.where(col("vec_id") < 400), p,
        stride = 100, metaCols = Seq("label"))
      deltas.foreach(d => Similarity.appendAnnIndex(spark, d, p))
      p
    }
    val d1 = e.where(col("vec_id") >= 400 && col("vec_id") < 450)
    val d2 = e.where(col("vec_id") >= 450)
    val oneShot = grow(Seq(d1.unionByName(d2)))
    val batched = grow(Seq(d1, d2))
    val grownRows = rowsOf(Similarity.searchAnnIndexedFiltered(
      spark, batched, q, col("label") === 1, k = 10, nProbe = 2))
    grownRows shouldBe rowsOf(Similarity.searchAnnIndexedFiltered(
      spark, oneShot, q, col("label") === 1, k = 10, nProbe = 2))
    grownRows should not be empty
    spark.read.parquet(s"$batched/cells").columns should contain("label")
    // appended rows carry real labels, not nulls — the filtered probe
    // can surface a delta-only vector
    spark.read.parquet(s"$batched/cells")
      .where(col("vec_id") >= 400 && col("label").isNull)
      .count() shouldBe 0L
  }

  test("embeddingHealth flags null/NaN/zero/dead-dim pathologies and the norm envelope") {
    val s = spark
    import s.implicits._
    // dim 2 is dead (0 in every vector); vec 3 is all-zero; vec 4 has a
    // NaN; vec 5 is null; vec 6 is empty
    val rows: Seq[(Long, Seq[Float])] = Seq(
      0L -> Seq(3f, 4f, 0f),          // norm 5
      1L -> Seq(0f, 2f, 0f),          // norm 2
      2L -> Seq(1f, 0f, 0f),          // norm 1
      3L -> Seq(0f, 0f, 0f),          // zero vector
      4L -> Seq(Float.NaN, 1f, 0f),   // NaN component
      6L -> Seq.empty[Float])
    val df = rows.toDF("vec_id", "embedding")
      .unionByName(Seq((5L, Option.empty[Seq[Float]]))
        .toDF("vec_id", "embedding"))
    val r = Similarity.embeddingHealth(df).collect().head
    r.getAs[Long]("n_vecs") shouldBe 7L
    r.getAs[Long]("n_null_or_empty") shouldBe 2L
    r.getAs[Long]("n_nan_vecs") shouldBe 1L
    r.getAs[Long]("n_zero_vecs") shouldBe 1L
    r.getAs[Long]("dims_min") shouldBe 0L
    r.getAs[Long]("dims_max") shouldBe 3L
    r.getAs[Long]("dead_dims") shouldBe 1L // dim 2 (NaN dim 0 keeps dim 0 alive via vec 0)
    r.getAs[Double]("min_norm") shouldBe 0.0 +- 1e-9 // the zero vector
    r.getAs[Double]("max_norm") shouldBe 5.0 +- 1e-9
    // norms 5, 2, 1, 0 over 4 usable vectors → mean 2
    r.getAs[Double]("mean_norm") shouldBe 2.0 +- 1e-9
  }

  test("int8SdcTopK score equals the locally-expanded quantized cosine") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < 40)
    val got = Similarity.int8SdcTopK(e, e.where(col("vec_id") < 2), kTop = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    got.size shouldBe 10
    // independent local replication: quantize per vector, expand the
    // SDC cosine from integer stats — must match the engine round-6
    val raw = e.collect().map(r => r.getLong(0) ->
      r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray).toMap
    def qz(x: Array[Double]): (Double, Double, Array[Long]) = {
      val mn = x.min; val sc = (x.max - x.min) / 255.0
      val q = if (sc == 0) x.map(_ => 0L)
        else x.map(v => math.min(math.max(
          math.floor((v - mn) / sc + 0.5), 0.0), 255.0).toLong)
      (mn, sc, q)
    }
    def nsq(mn: Double, sc: Double, q: Array[Long]) =
      mn * mn * q.length + 2.0 * mn * sc * q.sum + sc * sc * q.map(v => v * v).sum
    for (((qi, ni), (cos, _)) <- got) {
      val (mq, sq2, qq) = qz(raw(qi)); val (mnv, snv, qn) = qz(raw(ni))
      val ipq = qq.zip(qn).map { case (a, b) => a * b }.sum
      val ip = mq * mnv * qn.length + mq * snv * qn.sum +
        mnv * sq2 * qq.sum + sq2 * snv * ipq
      val expect = BigDecimal(ip / (math.sqrt(nsq(mq, sq2, qq)) *
        math.sqrt(nsq(mnv, snv, qn))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      cos shouldBe expect
    }
    an[IllegalArgumentException] should be thrownBy
      Similarity.int8SdcTopK(e, e, kTop = 0)
  }

  test("int8SdcTopK: 8-bit cells keep near-exact ranking on the fixture") {
    // well-separated fixture → the quantized ranking equals the exact one
    val exact = Similarity.cosineTopK(fixture, fixture.where(col("vec_id") === 0), k = 4)
      .collect().map(r => (r.getAs[Long]("n_vec_id"), r.getAs[Long]("rank")))
    val approx = Similarity.int8SdcTopK(fixture, fixture.where(col("vec_id") === 0), kTop = 4)
      .collect().map(r => (r.getAs[Long]("n_vec_id"), r.getAs[Long]("rank")))
    approx.toSeq shouldBe exact.toSeq
  }

  test("covarianceMatrix: hand-computed cov/corr, null corr on constant dims") {
    // dim0 = (1,2,3), dim1 = 2·dim0 (corr +1), dim2 constant (corr null)
    val e = vecs(
      0L -> Seq(1f, 2f, 5f),
      1L -> Seq(2f, 4f, 5f),
      2L -> Seq(3f, 6f, 5f))
    val got = Similarity.covarianceMatrix(e)
      .orderBy(col("i"), col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) null else r.getDouble(4)))
    got shouldBe Array(
      (0L, 0L, 3L, 0.666667, 1.0),
      (0L, 1L, 3L, 1.333333, 1.0),
      (0L, 2L, 3L, 0.0, null),
      (1L, 1L, 3L, 2.666667, 1.0),
      (1L, 2L, 3L, 0.0, null),
      (2L, 2L, 3L, 0.0, null))
  }

  test("principalComponent: rank-1 fixture recovers the exact direction") {
    // vectors (t, 2t, 5): all variance lives along (1, 2, 0) — PC1
    // loadings (0.5, 1.0, 0.0), λ = 6.25, explained = 1.0
    val e = vecs(
      0L -> Seq(1f, 2f, 5f),
      1L -> Seq(2f, 4f, 5f),
      2L -> Seq(3f, 6f, 5f),
      3L -> Seq(4f, 8f, 5f))
    val got = Similarity.principalComponent(e, iters = 5)
      .orderBy(col("dim")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    got shouldBe Array(
      (0L, 0.5, 6.25, 1.0),
      (1L, 1.0, 6.25, 1.0),
      (2L, 0.0, 6.25, 1.0))
  }

  test("incremental PCA from merged co-moment states equals the all-at-once fit") {
    val e = vecs(
      0L -> Seq(1f, 2f, 5f),
      1L -> Seq(2f, 4f, 5f),
      2L -> Seq(3f, 6f, 5f),
      3L -> Seq(4f, 8f, 5f),
      4L -> Seq(0f, 1f, 7f))
    val whole = Similarity.principalComponent(e, iters = 7)
      .orderBy(col("dim")).collect().map(_.toSeq)
    // three arbitrary disjoint slices, merged pairwise in an arbitrary
    // order — additive exact sums make any grouping equivalent
    val s1 = Similarity.coMomentState(e.where(col("vec_id") < 2))
    val s2 = Similarity.coMomentState(e.where(col("vec_id") === 2))
    val s3 = Similarity.coMomentState(e.where(col("vec_id") > 2))
    val merged = Similarity.mergeCoMomentStates(
      Similarity.mergeCoMomentStates(s3, s1), s2)
    val inc = Similarity.principalComponentFromState(merged, iters = 7)
      .orderBy(col("dim")).collect().map(_.toSeq)
    inc shouldBe whole
  }

  test("mergeCoMomentStates overflows LOUDLY at the DECIMAL(38,0) boundary") {
    // the documented merge-headroom contract: lanes re-sum as
    // DECIMAL(38,0) (|v| < 10^38, ~10^26 unit-scale rows of headroom);
    // past the boundary Spark must throw loudly at the action
    // (ARITHMETIC_OVERFLOW from the decimal sum — or
    // NUMERIC_VALUE_OUT_OF_RANGE when the overflow instead surfaces at
    // the decimal cast) — never wrap, never null
    def state(lane: String): org.apache.spark.sql.DataFrame =
      spark.sql(s"""SELECT 0 AS i, 0 AS j, CAST(1 AS BIGINT) AS n_vecs,
        CAST(0 AS DECIMAL(38,0)) AS _sx, CAST(0 AS DECIMAL(38,0)) AS _sy,
        CAST('$lane' AS DECIMAL(38,0)) AS _sxy""")
    // just inside: 4e37 + 4e37 = 8e37 (38 digits) merges exactly
    val in = "4" + "0" * 37
    val okRow = graft.operators.Similarity
      .mergeCoMomentStates(state(in), state(in)).collect().head
    okRow.getDecimal(okRow.fieldIndex("_sxy")).toBigInteger.toString shouldBe
      "8" + "0" * 37
    // just outside: (1e38 - 1) + (1e38 - 1) needs 39 digits -> loud
    val max = "9" * 38
    val ex = intercept[Exception] {
      graft.operators.Similarity
        .mergeCoMomentStates(state(max), state(max)).collect()
    }
    ex.getMessage should fullyMatch regex
      "(?s).*(ARITHMETIC_OVERFLOW|NUMERIC_VALUE_OUT_OF_RANGE).*"
  }

  test("principalComponent: canonical sign flips a negative dominant loading") {
    // variance along (1, -2): power iteration lands on ±(0.5, -1);
    // the flip makes dim 1 (largest |loading|) positive -> (-0.5, 1)
    val e = vecs(
      0L -> Seq(1f, -2f),
      1L -> Seq(2f, -4f),
      2L -> Seq(3f, -6f),
      3L -> Seq(4f, -8f))
    val got = Similarity.principalComponent(e, iters = 5)
      .orderBy(col("dim")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    got shouldBe Array((0L, -0.5), (1L, 1.0))
  }

  test("lshBucketHistogram: sizes sum to the corpus, identical vectors co-bucket") {
    val e = vecs(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(1f, 0f, 0f),  // identical to 0 -> same bucket
      2L -> Seq(-1f, 0f, 0f)) // antipodal -> flipped sign bits
    val got = Similarity.lshBucketHistogram(e, bits = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.map { case (sz, n) => sz * n }.sum shouldBe 3L
    got(2L) shouldBe 1L // the identical pair's bucket
  }

  test("principalComponent2: deflation recovers the orthogonal second axis") {
    // cov = diag(5, 1, 0): PC1 = e0 (λ 5), PC2 = e1 (λ 1, explained 1/6)
    val e = vecs(
      0L -> Seq(2f, 1f, 5f),
      1L -> Seq(4f, -1f, 5f),
      2L -> Seq(6f, -1f, 5f),
      3L -> Seq(8f, 1f, 5f))
    val got = Similarity.principalComponent2(e, iters = 20)
      .orderBy(col("dim")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    got shouldBe Array(
      (0L, 0.0, 1.0, 0.166667, 0.0),
      (1L, 1.0, 1.0, 0.166667, 0.0),
      (2L, 0.0, 1.0, 0.166667, 0.0))
  }

  test("pcProjection: alignment ±1 on the component's own axis, 0 orthogonal") {
    // PC1 of the rank-1 fixture is (0.5, 1, 0)-direction (micro
    // (5e5, 1e6, 0)); score vectors on, against, and orthogonal to it
    val fit = vecs(
      0L -> Seq(1f, 2f, 5f),
      1L -> Seq(2f, 4f, 5f),
      2L -> Seq(3f, 6f, 5f),
      3L -> Seq(4f, 8f, 5f))
    val got = Similarity.pcProjection(fit, iters = 5)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    // proj for (t, 2t, 5) = (0.5t + 2t)·1e12 / 1e12 = 2.5t; cos =
    // 2.5t / (|e|·|x|) — verify against a local double replication
    val xm = Array(500000L, 1000000L, 0L)
    val expected = Array(Array(1.0, 2.0, 5.0), Array(2.0, 4.0, 5.0),
      Array(3.0, 6.0, 5.0), Array(4.0, 8.0, 5.0)).zipWithIndex.map { case (e, id) =>
      val em = e.map(v => Math.round(v * 1e6))
      val p = em.zip(xm).map { case (a, b) => a * b }.sum
      val ne2 = em.map(v => v * v).sum
      val xn2 = xm.map(v => v * v).sum
      def r6(v: Double) = java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      (id.toLong, r6(p.toDouble / 1e12),
        r6(p.toDouble / (math.sqrt(ne2.toDouble) * math.sqrt(xn2.toDouble))))
    }
    got.map(g => (g._1, g._2, g._3)) shouldBe expected.map(e =>
      (e._1, e._2, e._3: Any))
  }

  test("matryoshkaTopK ranks by the prefix only, blind to the tail") {
    val e = vecs(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(1f, 0f, 9f, 9f), // prefix-2 identical to the query
      2L -> Seq(0.6f, 0.8f, 0f, 0f))
    val got = Similarity.matryoshkaTopK(e, e.where(col("vec_id") === 0),
        k = 2, dims = 2)
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[Long]("n_vec_id"), r.getAs[Double]("cos")))
    got shouldBe Array((1L, 1.0), (2L, 0.6))
  }
}
