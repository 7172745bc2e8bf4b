package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

import graft.operators.{Clustering, Dedup}

class CachingSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  /** Persistent-RDD ids NOT present before `body` ran — the cache
    * footprint a pipeline leaked (snapshot-diff, robust to leftover
    * localCheckpoint blocks from other suites). */
  private def leakedBlocks[T](body: => T): Set[Int] = {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    body
    spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
  }

  test("scoped composed dedup pipeline releases every internal persist") {
    val docs = corpus((1 to 40).map(i =>
      s"d$i" -> s"some shared words plus token$i and token${i % 7} here"): _*)
    leakedBlocks {
      Caching.scoped {
        Dedup.minhashNearDups(docs, threshold = 0.5).collect()
        Dedup.minhashDedupIterative(docs).collect()
      }
    } shouldBe empty
  }

  test("scoped kmeans + semanticDedup releases corpus and centroid caches") {
    val e = vecs((0L to 20L).map(i =>
      i -> Seq((i % 5).toFloat + 1f, (i % 3).toFloat)): _*)
    leakedBlocks {
      Caching.scoped {
        Clustering.semanticDedup(e, threshold = 0.99, stride = 7, iters = 2)
          .collect()
      }
    } shouldBe empty
  }

  test("scoped round-5 persisting operators release every internal frame") {
    val docs = corpus((1 to 30).map(i =>
      s"d$i" -> s"shared phrase base plus token$i and token${i % 5} again"): _*)
    leakedBlocks {
      Caching.scoped {
        Dedup.prefixFilterJaccardPairs(docs, threshold = 0.8).collect()
        Dedup.prefixFilterJaccardPairs(docs, threshold = 0.8,
          verifyViaArrays = true).collect()
        Dedup.editDistancePairs(docs, maxRatio = 0.3).collect()
        graft.operators.Graph.triangleCounts(docs, minCount = 1).collect()
        graft.operators.Graph.termPageRank(docs, minCount = 1, iters = 3,
          driverMaxEdges = 0L) // force the tier with iteration caches
          .collect()
      }
    } shouldBe empty
  }

  test("without a scope SINGLE-persist operators keep the legacy fallback") {
    // multi-persist compositions now requireScope; the documented
    // no-scope contract survives for one-frame operators — the caller
    // owns the session cache (Bench-style clearCache() per run).
    // Caching.unscoped: every test body runs under a suite scope, so
    // drop it to exercise the fallback.
    val docs = corpus("a" -> "w x y z q r", "b" -> "w x y z q s")
    val leaked = leakedBlocks {
      Caching.unscoped {
        Dedup.minhashJaccardEstimates(docs).collect()
      }
    }
    leaked should not be empty
    spark.catalog.clearCache()
  }

  test("every multi-persist composition fails loudly outside a scope") {
    // one assert per guarded operator: constructing the plan with no
    // scope open must throw (never silently pin corpus-scale frames)
    val docs = corpus("a" -> "w x y z q r", "b" -> "w x y z q s")
    val e = vecs(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
    val ev = {
      val s = spark
      import s.implicits._
      Seq(("u1", "click", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .toDF("user_id", "event_type", "ts")
    }
    val guarded: Seq[(String, () => Any)] = Seq(
      "Dedup.minhashNearDups" -> (() => Dedup.minhashNearDups(docs)),
      "Dedup.minhashNearDupsAgainst" ->
        (() => Dedup.minhashNearDupsAgainst(docs, docs)),
      "Dedup.minhashClusterLabels" -> (() => Dedup.minhashClusterLabels(docs)),
      "Dedup.minhashClusterLabelsConverged" ->
        (() => Dedup.minhashClusterLabelsConverged(docs)),
      "Dedup.containmentPairsScreened" ->
        (() => Dedup.containmentPairsScreened(docs)),
      "Dedup.weightedNearDups" -> (() => Dedup.weightedNearDups(docs)),
      "Dedup.weightedNearDupsAgainst" ->
        (() => Dedup.weightedNearDupsAgainst(docs, docs)),
      "Dedup.editDistancePairs" -> (() => Dedup.editDistancePairs(docs)),
      "Dedup.hashedCosineAgainst" -> (() => Dedup.hashedCosineAgainst(docs, docs)),
      "Clustering.kmeans" -> (() => Clustering.kmeans(e)),
      "Clustering.semanticDedup" ->
        (() => Clustering.semanticDedup(e, threshold = 0.9)),
      "Clustering.clusterTopTerms" -> (() => Clustering.clusterTopTerms(e, docs)),
      "Graph.clusteringCoefficients" ->
        (() => graft.operators.Graph.clusteringCoefficients(docs)),
      "Events.dailyAutocorrelation" ->
        (() => graft.operators.Events.dailyAutocorrelation(ev)),
      "Pipeline.dailyIngest" ->
        (() => graft.operators.Pipeline.dailyIngest(docs, docs)),
      "Pipeline.renderDataCard" ->
        (() => graft.operators.Pipeline.renderDataCard(
          graft.operators.Pipeline.dataCardState(docs))))
    guarded.foreach { case (name, build) =>
      withClue(name) {
        val ex = the[IllegalStateException] thrownBy Caching.unscoped { build() }
        ex.getMessage should include ("Caching.scoped")
      }
    }
  }

  test("scoped multi-persist compositions release every internal frame") {
    // the positive half of the weak-clearing contract: under a scope,
    // the action runs and ZERO persistent blocks survive the scope
    val docs = corpus((1 to 30).map(i =>
      s"d$i" -> s"shared phrase base plus token$i and token${i % 5} again"): _*)
    val e = vecs((0L to 20L).map(i =>
      i -> Seq((i % 5).toFloat + 1f, (i % 3).toFloat)): _*)
    val ev = {
      val s = spark
      import s.implicits._
      (1 to 40).map(i => (s"u${i % 4}", if (i % 2 == 0) "click" else "view",
        java.sql.Timestamp.valueOf(f"2024-01-${i % 9 + 1}%02d 00:00:00")))
        .toDF("user_id", "event_type", "ts")
    }
    leakedBlocks {
      Caching.scoped {
        graft.operators.Pipeline.dailyIngest(
          docs.where(col("doc").isin("d1", "d2", "d3")),
          docs.where(!col("doc").isin("d1", "d2", "d3"))).collect()
        Dedup.hashedCosineAgainst(docs, docs, dims = 16, threshold = 0.5)
          .collect()
        graft.operators.Pipeline.renderDataCard(
          graft.operators.Pipeline.dataCardState(docs)).collect()
        Dedup.weightedNearDupsAgainst(docs, docs, threshold = 0.5).collect()
        Dedup.containmentPairsScreened(docs).collect()
        // doc_id = vec_id link: numeric doc ids for the cluster readout
        Clustering.clusterTopTerms(e, corpus((0 to 20).map(i =>
          s"$i" -> s"cluster words alpha$i beta${i % 3}"): _*)).collect()
        graft.operators.Graph.clusteringCoefficients(docs, minCount = 1)
          .collect()
        graft.operators.Events.dailyAutocorrelation(ev, maxLag = 2).collect()
      }
    } shouldBe empty
  }

  test("scopes nest: inner scope releases only its own frames") {
    var outer: DataFrame = null
    var inner: DataFrame = null
    Caching.scoped {
      outer = Caching.persist(spark.range(10).toDF())
      outer.count()
      Caching.scoped {
        inner = Caching.persist(spark.range(5).toDF())
        inner.count()
        inner.storageLevel should not be StorageLevel.NONE
      }
      inner.storageLevel shouldBe StorageLevel.NONE // inner scope closed
      outer.storageLevel should not be StorageLevel.NONE // outer still live
    }
    outer.storageLevel shouldBe StorageLevel.NONE
  }
}
