package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators._

/** Degenerate-input sweep: empty corpora, single documents, and absent
  * query terms must flow through every tier as empty (or singleton)
  * results — never as exceptions. */
class EdgeCasesSpec extends SparkSpec {

  private def emptyDocs: DataFrame = corpus()
  private def oneDoc: DataFrame = corpus("only" -> "a single document here")

  test("round-4 tiers flow empty/single-doc corpora through without exceptions") {
    Dedup.substringDedup(emptyDocs).count() shouldBe 0L
    Dedup.substringDedup(oneDoc).count() shouldBe 1L // nothing duplicated
    // quantile thresholds over an empty corpus are null — rows are empty
    // anyway, so the plans must evaluate, not throw
    Pipeline.filterByQualityQuantile(emptyDocs, quantile = 0.5).count() shouldBe 0L
    Pipeline.qualityBins(emptyDocs, bins = 4).count() shouldBe 0L
    Pipeline.qualityBins(oneDoc, bins = 4).collect()
      .map(_.getAs[Long]("bin")).toSeq shouldBe Seq(1L) // sole doc: lowest bin
    val s2 = spark
    import s2.implicits._
    val noDocs = Seq.empty[(String, String, String)].toDF("doc", "line", "source")
    Pipeline.mixtureSample(noDocs, Map("a" -> 0.5), 100L).count() shouldBe 0L
    TfIdf.keywords(emptyDocs).count() shouldBe 0L
    Vocab.rankVocab(Vocab.mergeTermCounts(
      Vocab.termCounts(emptyDocs), emptyDocs)).count() shouldBe 0L
  }

  test("bloom dedup, salted df, and retention flow degenerate inputs through") {
    // empty HISTORY: the bloom is built over zero fps (expectedItems
    // floors to 1) — every delta row is definitely-new and survives
    Dedup.exactDedupAgainstBloom(oneDoc, emptyDocs).count() shouldBe 1L
    // empty DELTA: nothing to screen
    Dedup.exactDedupAgainstBloom(emptyDocs, oneDoc).count() shouldBe 0L
    // salted df strategy on empty/one-doc corpora
    TfIdf.tfidf(emptyDocs, dfSalt = Some(4)).count() shouldBe 0L
    TfIdf.tfidf(oneDoc, dfSalt = Some(4)).count() shouldBe 4L
    // retention with no matching event type / no events at all
    val s3 = spark
    import s3.implicits._
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    Events.cohortRetention(noEvents).count() shouldBe 0L
    val clickOnly = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      1L, "click", 1.0, "{}")).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    Events.cohortRetention(clickOnly, eventType = "purchase").count() shouldBe 0L
  }

  test("tfidf pipeline on an empty corpus yields no rows") {
    TfIdf.tfidf(emptyDocs).count() shouldBe 0L
    Search.search(emptyDocs, "anything").count() shouldBe 0L
    Rank.rank(Search.search(emptyDocs, "anything")).count() shouldBe 0L
  }

  test("new search modes and sampling flow empty/degenerate corpora through") {
    Search.searchAll(emptyDocs, "a b").count() shouldBe 0L
    Search.searchPhrase(emptyDocs, "a b").count() shouldBe 0L
    Search.searchNear(emptyDocs, "a b", window = 4).count() shouldBe 0L
    Search.bm25Scores(emptyDocs).count() shouldBe 0L
    Search.searchBm25(emptyDocs, "a b").count() shouldBe 0L
    Search.searchBm25(oneDoc, "absent terms").count() shouldBe 0L
    // single doc: df == N == 1 → idf = ln(1 + 0.5/1.5) > 0, one row per term
    Search.searchBm25(oneDoc, "single").count() shouldBe 1L
    TextAnalysis.winnowFingerprints(emptyDocs).count() shouldBe 0L
    Pipeline.sampleByWeight(
      emptyDocs.withColumn("w", expr("length(line)").cast("double")),
      "w", "doc", 0.5).count() shouldBe 0L
    // sole doc: w == avg(w) → threshold = fraction·1e6; keep decision
    // degrades to sampleByHash semantics, never a division blow-up
    Pipeline.sampleByWeight(
      oneDoc.withColumn("w", expr("length(line)").cast("double")),
      "w", "doc", 1.0).count() shouldBe 1L
  }

  test("dedup tiers on empty and single-doc corpora yield no pairs") {
    Dedup.exactGroups(emptyDocs).count() shouldBe 0L
    Dedup.minhashNearDups(emptyDocs).count() shouldBe 0L
    Dedup.minhashDedup(emptyDocs).count() shouldBe 0L
    Dedup.simhashPairs(Dedup.simhash(emptyDocs)).count() shouldBe 0L
    Dedup.minhashNearDups(oneDoc).count() shouldBe 0L
    Dedup.simhashPairs(Dedup.simhash(oneDoc)).count() shouldBe 0L
    Dedup.minhashDedup(oneDoc).count() shouldBe 1L // sole doc survives
  }

  test("search for absent terms yields no hits") {
    Search.search(oneDoc, "absent missing").count() shouldBe 0L
  }

  test("text analysis of empty corpus yields no rows; cleanCorpus too") {
    TextAnalysis.langId(emptyDocs).count() shouldBe 0L
    TextAnalysis.qualityScore(emptyDocs).count() shouldBe 0L
    Pipeline.cleanCorpus(emptyDocs, Seq("en"), 0.0).count() shouldBe 0L
    TextAnalysis.topNgrams(emptyDocs).count() shouldBe 0L
    TextAnalysis.cooccurrencePmi(emptyDocs, minCount = 1).count() shouldBe 0L
    TextAnalysis.repetitionScore(emptyDocs).count() shouldBe 0L
    TextAnalysis.bigramLmScore(emptyDocs).count() shouldBe 0L
    TextAnalysis.bigramLmScore(oneDoc).count() shouldBe 1L // 3 bigrams
  }

  test("contamination screen with empty sides yields no rows; closure dedup empty-safe") {
    Pipeline.contaminationCheck(oneDoc, emptyDocs).count() shouldBe 0L
    Pipeline.contaminationCheck(emptyDocs, oneDoc).count() shouldBe 0L
    Dedup.minhashDedupIterative(emptyDocs).count() shouldBe 0L
    Dedup.minhashDedupIterative(oneDoc).count() shouldBe 1L
  }

  test("corpusStats on an empty corpus is a single zero row") {
    val row = TextAnalysis.corpusStats(emptyDocs).head()
    row.getAs[Long]("n_docs") shouldBe 0L
    row.getAs[Long]("total_tokens") shouldBe 0L
  }

  test("similarity ops with empty query/corpus sides yield no rows") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val one = Seq(1L -> Seq(1f, 0f)).toDF("vec_id", "embedding")
    Similarity.cosineTopK(one, empty, k = 5).count() shouldBe 0L
    Similarity.cosineTopK(empty, one, k = 5).count() shouldBe 0L
    Similarity.nearDupPairs(one, 0.5).count() shouldBe 0L
    Similarity.lshNearDupPairs(one, 0.5).count() shouldBe 0L
    Similarity.ivfCosineTopK(one, one, k = 5, stride = 1).count() shouldBe 0L
  }

  test("as-of and range joins with empty right sides keep/drop correctly") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, new java.sql.Timestamp(1000L))).toDF("k", "ts")
    val right = Seq.empty[(Long, java.sql.Timestamp, Double)].toDF("k", "ts", "v")
    val asOf = AsOfJoin.asOfJoin(left, right, Seq("k"), "ts", "v")
    asOf.count() shouldBe 1L // left preserved
    asOf.where(col("asof_value").isNull).count() shouldBe 1L
    val pts = Seq((1L, 5.0)).toDF("pid", "v")
    val ivs = Seq.empty[(Long, Double, Double)].toDF("iid", "lo", "hi")
    RangeJoin.pointInInterval(pts, ivs, "v", "lo", "hi", 1.0).count() shouldBe 0L
  }

  test("round-7 tiers flow empty/degenerate corpora through without exceptions") {
    val s = spark
    import s.implicits._
    // k-core: empty graph and single-doc graph both yield no rows
    graft.operators.Graph.kCore(emptyDocs, k = 2).count() shouldBe 0L
    graft.operators.Graph.kCore(oneDoc, k = 2).count() shouldBe 0L
    // daily ingest: an empty delta emits an empty decision log; an
    // empty HISTORY keeps everything (no screen can fire)
    graft.Caching.scoped {
      graft.operators.Pipeline.dailyIngest(emptyDocs, oneDoc).count() shouldBe 0L
      val keptAll = graft.operators.Pipeline.dailyIngest(oneDoc, emptyDocs)
        .collect()
      keptAll.map(_.getString(1)).toSeq shouldBe Seq("kept")
    }
    // curriculum: one doc appears in every epoch, rank 0
    val cur = graft.Caching.scoped {
      graft.operators.Pipeline.curriculumSchedule(oneDoc, epochs = 3).collect()
    }
    cur.map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 3L)
    cur.map(_.getLong(3)).distinct shouldBe Array(0L)
    // overlap F1: empty pair frame and pairs over too-short docs drop
    val noPairs = Seq.empty[(String, String)].toDF("d1", "d2")
    TextAnalysis.ngramOverlapF1(noPairs, oneDoc, n = 2).count() shouldBe 0L
    // gap regularity: empty events frame yields no rows
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long)]
      .toDF("user_id", "ts", "event_id")
    graft.operators.Events.userGapRegularity(noEvents).count() shouldBe 0L
    // incremental PCA state over an empty slice merges as a no-op
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val one = Seq(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f)).toDF("vec_id", "embedding")
    val merged = Similarity.mergeCoMomentStates(
      Similarity.coMomentState(one), Similarity.coMomentState(empty))
    Similarity.principalComponentFromState(merged).count() shouldBe 2L
  }
}
