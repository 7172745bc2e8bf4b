package graft

import org.apache.spark.sql.functions.{col => C}
import graft.operators.Vocab

class VocabSpec extends SparkSpec {

  private val docs = corpus(
    "d1" -> "b a a c",
    "d2" -> "a b zz")

  test("buildVocab ranks ids by count desc then term asc") {
    val got = Vocab.buildVocab(docs).orderBy(C("token_id")).collect()
      .map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("token_id")))
    // a×3, b×2, c×1, zz×1 → ids 0,1,2,3 (c before zz on the tie)
    got.toSeq shouldBe Seq(
      "a" -> (3L, 0L), "b" -> (2L, 1L), "c" -> (1L, 2L), "zz" -> (1L, 3L))
  }

  test("buildVocab minCount prunes and encodeTokens maps pruned terms to OOV") {
    val vocab = Vocab.buildVocab(docs, minCount = 2)
    vocab.count() shouldBe 2L
    val got = Vocab.encodeTokens(docs, vocab)
      .where(C("doc") === "d2").orderBy(C("pos")).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("token_id")))
    got.toSeq shouldBe Seq("a" -> 0L, "b" -> 1L, "zz" -> Vocab.OovId)
  }

  test("encodeDocs preserves document token order in the id array") {
    val vocab = Vocab.buildVocab(docs)
    val got = Vocab.encodeDocs(docs, vocab).collect()
      .map(r => r.getAs[String]("doc") -> r.getAs[Seq[Long]]("ids")).toMap
    got("d1") shouldBe Seq(1L, 0L, 0L, 2L) // b a a c
    got("d2") shouldBe Seq(0L, 1L, 3L)     // a b zz
  }

  test("oovRate counts pruned terms per doc") {
    val vocab = Vocab.buildVocab(docs, minCount = 2) // keeps a, b
    val got = Vocab.oovRate(corpus("x" -> "a b zz zz"), vocab).head()
    got.getAs[Long]("n_tokens") shouldBe 4L
    got.getAs[Long]("n_oov") shouldBe 2L
    got.getAs[Double]("oov_rate") shouldBe 0.5
  }

  test("two-stage rank equals the global (cnt desc, term) rank across partitions") {
    // 120 terms t000..t119 where t_i occurs (i % 7) + 1 times — enough
    // distinct (cnt, term) combinations to span all 4 test shuffle
    // partitions of the range exchange, so partition offsets are
    // actually exercised (a single-partition plan would pass trivially).
    val lines = (0 until 120).flatMap { i =>
      Seq.fill(i % 7 + 1)(f"t$i%03d")
    }.mkString(" ")
    val vocab = Vocab.buildVocab(corpus("d" -> lines))
    val got = vocab.orderBy(C("token_id")).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("cnt"),
        r.getAs[Long]("token_id")))
    val expect = (0 until 120).map(i => (f"t$i%03d", (i % 7 + 1).toLong))
      .sortBy { case (t, c) => (-c, t) }
      .zipWithIndex.map { case ((t, c), r) => (t, c, r.toLong) }
    got.toSeq shouldBe expect
    // ids are a dense 0-based permutation — no gaps, no collisions
    got.map(_._3).toSeq shouldBe (0L until 120L)
  }

  test("buildVocab plan has no single-partition exchange") {
    val plan = Vocab.buildVocab(docs).queryExecution.executedPlan.toString
    plan should not include "Exchange SinglePartition"
  }

  test("empty corpus yields an empty vocabulary and no encoded rows") {
    val empty = corpus()
    Vocab.buildVocab(empty).count() shouldBe 0L
    Vocab.encodeTokens(empty, Vocab.buildVocab(empty)).count() shouldBe 0L
  }

  test("termSketches estimate tracks exact distinct terms; merge is invariant") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id as doc", "text as line", "source")
    val est = Vocab.sketchEstimates(Vocab.termSketches(docs))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs
      .selectExpr("source", "explode(filter(split(line, '\\\\s+'), t -> length(t) > 0)) as term")
      .groupBy(C("source"))
      .agg(org.apache.spark.sql.functions.countDistinct(C("term")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.keySet shouldBe exact.keySet
    exact.foreach { case (src, n) =>
      math.abs(est(src) - n).toDouble should be <= n * 0.06
    }
    // split-invariance: union of half-sketches == one-pass sketch, exactly
    val merged = Vocab.sketchEstimates(Vocab.mergeTermSketches(
        Vocab.termSketches(docs.where(C("doc") % 2 === 0)),
        Vocab.termSketches(docs.where(C("doc") % 2 === 1))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    merged shouldBe est
  }

  test("incremental counts state + rank equals the batch vocabulary") {
    import org.apache.spark.sql.functions.{col => C}
    val first = corpus("a" -> "x x y z", "b" -> "x q")
    val delta = corpus("c" -> "y q r r")
    val both = corpus("a" -> "x x y z", "b" -> "x q", "c" -> "y q r r")
    val inc = Vocab.rankVocab(
      Vocab.mergeTermCounts(Vocab.termCounts(first), delta), minCount = 2)
    rowsOf(inc) shouldBe rowsOf(Vocab.buildVocab(both, minCount = 2))
    // q sits below minCount in the history alone (cnt 1) and crosses the
    // threshold only because the merged state is UNPRUNED
    inc.where(C("term") === "q").count() shouldBe 1L
  }

  test("vocabDiff: added/removed/grown/shrunk/stable by integer thresholds") {
    import org.apache.spark.sql.functions.{col => C}
    val a = corpus("1" -> "x x x y y z z z z w w q")
    val b = corpus("2" -> "x x x y y y y z z n n p")
    // minCount 2: q (1 in a) and p (1 in b) never appear at all
    val got = Vocab.vocabDiff(a, b, minCount = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    got shouldBe Map(
      "x" -> ((3L, 3L, "stable")),
      "y" -> ((2L, 4L, "grown")), // exactly doubled counts as grown
      "z" -> ((4L, 2L, "shrunk")),
      "w" -> ((2L, 0L, "removed")),
      "n" -> ((0L, 2L, "added")))
    an[IllegalArgumentException] should be thrownBy Vocab.vocabDiff(a, b, 0)
  }

  test("zipfSlope matches a local micro-moment replication; single-term group null") {
    val d = corpus("1" -> "x x x x y y z", "2" -> "w w w")
      .withColumn("src",
        org.apache.spark.sql.functions.when(C("doc") === "2", "s2").otherwise("s1"))
    val got = Vocab.zipfSlope(d, "src").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    // s1: counts x:4, y:2, z:1 → ranks 1, 2, 3; replicate the exact
    // micro-long least squares locally
    val pts = Seq((1L, 4L), (2L, 2L), (3L, 1L)).map { case (rnk, cnt) =>
      (math.round(math.log(rnk.toDouble) * 1e6),
        math.round(math.log(cnt.toDouble) * 1e6))
    }
    val n = pts.size.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val qx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = BigDecimal((n * sxy - sx * sy).toDouble / (n * qx - sx * sx))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got("s1") shouldBe ((3L, Some(slope)))
    slope should be < -0.5 // a Zipf-ish head: decidedly negative
    // s2: one distinct term → zero rank variance → null
    got("s2") shouldBe ((1L, None))
  }

  test("tokenizerFertility: per-group chars/token and OOV vs the trained vocab") {
    val d = corpus(
      "1" -> "aa bb aa",    // en
      "2" -> "aa cccc",     // en: cccc is corpus-count 1 → OOV at minCount=2
      "3" -> "bb dd dd")    // fr
      .withColumn("lang",
        org.apache.spark.sql.functions.when(C("doc") === "3", "fr").otherwise("en"))
    val vocab = Vocab.buildVocab(d, minCount = 2) // {aa:3, bb:2, dd:2}
    val got = Vocab.tokenizerFertility(d, vocab, "lang").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // en: docs 1,2 → 5 tokens, chars 2+2+2+2+4=12, oov=1 (cccc)
    got("en") shouldBe ((2L, 5L, 12L, 1L, 2.4, 0.2))
    // fr: doc 3 → 3 tokens, chars 2+2+2=6, oov=0
    got("fr") shouldBe ((1L, 3L, 6L, 0L, 2.0, 0.0))
  }

  test("ngramDiversity: unigram + trigram TTR per group; short group null") {
    val d = corpus("1" -> "a b c a b c", "2" -> "x y")
      .withColumn("src",
        org.apache.spark.sql.functions.when(C("doc") === "2", "s2").otherwise("s1"))
    val got = Vocab.ngramDiversity(d, "src", n = 3).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getLong(4), r.getLong(5), Option(r.get(6)).map(_.asInstanceOf[Double]))))
      .toMap
    // s1: 6 tokens / 3 distinct → 0.5; trigrams "a b c","b c a","c a b",
    // "a b c" → 4 total / 3 distinct → 0.75
    got("s1") shouldBe ((6L, 3L, Some(0.5), 4L, 3L, Some(0.75)))
    // s2: 2 tokens, both unique; too short for any trigram → null ratio
    got("s2") shouldBe ((2L, 2L, Some(1.0), 0L, 0L, None))
  }

  test("termBurstiness: cf/df above the df floor, top-k by (burstiness, term)") {
    val d = corpus("d1" -> "a a a b", "d2" -> "a b c c")
    val got = Vocab.termBurstiness(d, minDf = 2L, k = 50).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // c: df=1 < 2 → dropped; a: cf 4 / df 2 = 2.0; b: 2/2 = 1.0
    got.toSeq shouldBe Seq(("a", 4L, 2L, 2.0), ("b", 2L, 2L, 1.0))
    Vocab.termBurstiness(d, minDf = 2L, k = 1).collect()
      .map(_.getString(0)).toSeq shouldBe Seq("a")
  }

  test("coverageCurve: power-of-two budgets up to the first power >= |vocab|") {
    // a×4, b×2, c×1, d×1 → total 8, V=4 → budgets 1, 2, 4
    val d = corpus("d1" -> "a a a a b b", "d2" -> "c d")
    val got = Vocab.coverageCurve(d).orderBy(C("vocab_budget")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    got shouldBe Array(
      (1L, 1L, 4L, 8L, 0.5),
      (2L, 2L, 6L, 8L, 0.75),
      (4L, 4L, 8L, 8L, 1.0))
  }

  test("heapsCurve: vocabulary at each power-of-two doc-id budget") {
    val s = spark
    import s.implicits._
    val d = Seq((0L, "a b"), (1L, "a c"), (2L, "d d"), (3L, "a"))
      .toDF("doc", "line")
    val got = Vocab.heapsCurve(d).orderBy(C("n_docs")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // first-seen: a,b@0  c@1  d@2; max id 3 → budgets 1, 2, 4
    got shouldBe Array((1L, 2L), (2L, 3L), (4L, 4L))
  }

}
