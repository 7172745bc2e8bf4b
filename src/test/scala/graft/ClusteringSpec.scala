package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  /** Two tight groups along orthogonal axes; vec_id 0 and 3 are the
    * stride-3 seeds, one inside each group. */
  private def twoClusters = vecs(
    0L -> Seq(1f, 0f),
    1L -> Seq(0.95f, 0.05f),
    2L -> Seq(0.9f, 0.1f),
    3L -> Seq(0f, 1f),
    4L -> Seq(0.05f, 0.95f),
    5L -> Seq(0.1f, 0.9f))

  test("kmeans assigns each group to its seed's cell and is deterministic") {
    val a = Clustering.kmeans(twoClusters, stride = 3, iters = 2)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.keySet shouldBe (0L to 5L).toSet
    Seq(0L, 1L, 2L).map(a) shouldBe Seq(0L, 0L, 0L)
    Seq(3L, 4L, 5L).map(a) shouldBe Seq(3L, 3L, 3L)
    val b = Clustering.kmeans(twoClusters, stride = 3, iters = 2)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    b shouldBe a
  }

  test("kmeans iters=0 assigns straight to the seed sample") {
    val a = Clustering.kmeans(twoClusters, stride = 3, iters = 0)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // nearest of {v0, v3} by cosine
    a(1L) shouldBe 0L
    a(4L) shouldBe 3L
  }

  test("clusterSummary computes size, majority label, purity") {
    val s = spark
    import s.implicits._
    val labels = Seq(0L -> 7, 1L -> 7, 2L -> 8, 3L -> 9, 4L -> 9, 5L -> 9)
      .toDF("vec_id", "label")
    val got = Clustering.clusterSummary(
        Clustering.kmeans(twoClusters, stride = 3, iters = 1), labels)
      .orderBy(col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    got shouldBe Array(
      (0L, 3L, 7, 0.666667), // labels 7,7,8 -> majority 7, purity 2/3
      (3L, 3L, 9, 1.0))
  }

  test("clusterSummary majority ties break to the smallest label") {
    val s = spark
    import s.implicits._
    val one = vecs(0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f))
    val labels = Seq(0L -> 5, 1L -> 3).toDF("vec_id", "label")
    val got = Clustering.clusterSummary(
        Clustering.kmeans(one, stride = 1000, iters = 0), labels)
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    got shouldBe Array((2L, 3)) // 1-vs-1 tie -> label 3
  }

  test("semanticDedup keeps the smallest id per near-dup set, within cells only") {
    // cell of seed 0: {0,1,2} all mutually cos >= 0.99; cell of seed 3:
    // {3,4,5} likewise. Cross-cell cosines (~0.1..0.2) are below 0.9
    // anyway, but the join must not even consider them.
    val survivors = Clustering.semanticDedup(twoClusters,
        threshold = 0.9, stride = 3, iters = 2)
      .collect().map(_.getLong(0)).toSet
    survivors shouldBe Set(0L, 3L)
  }

  test("semanticDedup hot-cell guard: oversized cells skip pairing, all rows survive") {
    val survivors = Clustering.semanticDedup(twoClusters,
        threshold = 0.9, stride = 3, iters = 2, maxCellSize = 2)
      .collect().map(_.getLong(0)).toSet
    // both cells have 3 members > maxCellSize -> no pairing anywhere
    survivors shouldBe Set(0L, 1L, 2L, 3L, 4L, 5L)
  }

  test("semanticDedup FarthestFromCentroid keeper keeps the far member of a dup set") {
    // One cell (only seed 0 at stride 50, iters=0 → centroid = v0):
    // {0,1,2} mutually cos ≥ 0.9 (one dup set); v3 orthogonal — not a
    // duplicate of anyone, survives under every keeper.
    // Centroid cosines: v0 = 1.0 > v1 ≈ 0.994 > v2 ≈ 0.919, so the
    // paper's keeper retains v2 (farthest); min-id retains v0.
    val one = vecs(
      0L -> Seq(1f, 0f),
      1L -> Seq(0.9f, 0.1f),
      2L -> Seq(0.7f, 0.3f),
      3L -> Seq(0f, 1f))
    Clustering.semanticDedup(one, threshold = 0.9, stride = 50, iters = 0,
        keeper = Clustering.Keeper.FarthestFromCentroid)
      .collect().map(_.getLong(0)).toSet shouldBe Set(2L, 3L)
    Clustering.semanticDedup(one, threshold = 0.9, stride = 50, iters = 0)
      .collect().map(_.getLong(0)).toSet shouldBe Set(0L, 3L)
  }

  test("coverageSample keeps the centroid-closest member per cell") {
    val got = Clustering.coverageSample(twoClusters, stride = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cell 0's final centroid ≈ the group mean (0.95, 0.05) → vec 1 is
    // the exemplar; cell 3's ≈ (0.05, 0.95) → vec 4
    got shouldBe Map(0L -> 1L, 3L -> 4L)
  }

  test("coverageSample perCell widens the sample with contiguous ranks") {
    val rows = Clustering.coverageSample(twoClusters, stride = 3, iters = 2,
        perCell = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    rows.length shouldBe 4
    rows.groupBy(_._1).values.foreach { cell =>
      cell.map(_._3).sorted shouldBe Array(1L, 2L)
    }
    an[IllegalArgumentException] should be thrownBy
      Clustering.coverageSample(twoClusters, perCell = 0)
  }

  test("kmeans rejects non-positive stride and negative iters") {
    an[IllegalArgumentException] should be thrownBy
      Clustering.kmeans(twoClusters, stride = 0)
    an[IllegalArgumentException] should be thrownBy
      Clustering.kmeans(twoClusters, iters = -1)
    an[IllegalArgumentException] should be thrownBy
      Clustering.semanticDedup(twoClusters, threshold = 1.5)
  }

  test("clusterLabels: integer lift vs corpus, minCount floor, k cap") {
    val s2 = spark
    import s2.implicits._
    val assign = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("vec_id", "cell")
    val docs = Seq((1L, "x x y"), (2L, "x z"), (3L, "y y z")).toDF("doc", "line")
    val got = Clustering.clusterLabels(assign, docs, k = 2, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // totals: A holds 5 tokens, B 3; corpus: x=3 y=3 z=2, 8 total.
    // A/x: ⌊3·8e6 / (5·3)⌋ = 1_600_000; B/y: ⌊2·8e6 / (3·3)⌋ = 1_777_777.
    // Every other (cell, term) count is 1 → under minCount.
    got shouldBe Set(
      ("A", "x", 3L, 1600000L, 1L),
      ("B", "y", 2L, 1777777L, 1L))
  }

  test("clusterLabels keeps at most k terms per cell, ranked by lift then term") {
    val s2 = spark
    import s2.implicits._
    val assign = Seq((1L, "A")).toDF("vec_id", "cell")
    val docs = Seq((1L, "a a b b c c")).toDF("doc", "line")
    // single cell → every term has lift exactly 1e6; rank ties break
    // alphabetically and k=2 cuts c off
    val got = Clustering.clusterLabels(assign, docs, k = 2, minCount = 2)
      .collect().map(r => (r.getString(1), r.getLong(3), r.getLong(4)))
    got.toSeq.sortBy(_._3) shouldBe Seq(("a", 1000000L, 1L), ("b", 1000000L, 2L))
  }

  test("clusterLabels rejects bad parameters") {
    val s2 = spark
    import s2.implicits._
    val assign = Seq((1L, "A")).toDF("vec_id", "cell")
    val docs = Seq((1L, "a")).toDF("doc", "line")
    an[IllegalArgumentException] should be thrownBy
      Clustering.clusterLabels(assign, docs, k = 0)
    an[IllegalArgumentException] should be thrownBy
      Clustering.clusterLabels(assign, docs, minCount = 0)
  }

  test("clusterTopTerms: floor-idf distinctive terms per cell, hand-computed") {
    val s = spark
    import s.implicits._
    // vecs 0,1 cluster on e0 (seed 0); 2,3 on e1 (seed 2) at stride 2
    val e = vecs(0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f),
      2L -> Seq(0f, 1f), 3L -> Seq(0.1f, 0.9f))
    val docs = Seq(
      (0L, "apple apple common"), (1L, "apple common"),
      (2L, "banana common"), (3L, "banana banana common"))
      .toDF("doc", "line")
    // N=4; df(apple)=2 -> idf 2; df(banana)=2 -> 2; df(common)=4 -> 1
    // cell 0: apple 3·2=6, common 2·1=2; cell 2: banana 3·2=6, common 2
    val got = Clustering.clusterTopTerms(e, docs, k = 2, stride = 2, iters = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    got shouldBe Set(
      (0L, "apple", 6L, 1L), (0L, "common", 2L, 2L),
      (2L, "banana", 6L, 1L), (2L, "common", 2L, 2L))
  }
}
