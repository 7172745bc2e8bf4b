package graft

import org.apache.spark.sql.DataFrame
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

  test("without a scope the caller owns the session cache (legacy contract)") {
    val docs = corpus("a" -> "w x y z q r", "b" -> "w x y z q s")
    val leaked = leakedBlocks {
      Dedup.minhashNearDups(docs, threshold = 0.5).collect()
    }
    leaked should not be empty // Bench-style callers clearCache() per run
    spark.catalog.clearCache()
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
