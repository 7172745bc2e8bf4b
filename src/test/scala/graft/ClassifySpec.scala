package graft

import org.apache.spark.sql.functions._

import graft.operators.Classify

class ClassifySpec extends SparkSpec {

  private def labeled(rows: (String, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc", "line", "source")
  }

  test("naiveBayes is perfect on a planted disjoint-vocabulary corpus") {
    val docs = labeled(
      ("a1", "alpha beta alpha gamma", "news"),
      ("a2", "beta gamma alpha alpha", "news"),
      ("a3", "gamma alpha beta beta", "news"),
      ("b1", "delta epsilon zeta zeta", "code"),
      ("b2", "zeta delta epsilon delta", "code"),
      ("b3", "epsilon zeta delta gamma", "code")) // one shared token
    val got = Classify.naiveBayes(docs, "source", numBuckets = 256)
      .collect()
      .map(r => r.getAs[String]("doc") ->
        (r.getAs[String]("source"), r.getAs[String]("predicted"))).toMap
    got.keySet shouldBe Set("a1", "a2", "a3", "b1", "b2", "b3")
    // resubstitution on disjoint vocab: every doc must classify to its
    // own class — 5 of 6 tokens decide even for the gamma-sharing b3
    got.foreach { case (d, (truth, pred)) =>
      withClue(s"doc $d:") { pred shouldBe truth }
    }
  }

  test("naiveBayes scores are exact longs and rank the true class strictly higher") {
    val docs = labeled(
      ("a1", "alpha alpha alpha", "news"),
      ("b1", "delta delta delta", "code"))
    val got = Classify.naiveBayes(docs, "source", numBuckets = 64).collect()
    got.foreach { r =>
      r.getAs[String]("predicted") shouldBe r.getAs[String]("source")
      // with balanced priors the argmax-winning posterior must beat the
      // smoothed all-unseen floor: 3·qcond(unseen) + qprior
      val floorScore =
        3L * math.floor(math.log(1.0 / (3 + 64)) * 1e6).toLong +
          math.floor(math.log(0.5) * 1e6).toLong
      r.getAs[Long]("score_micro") should be > floorScore
    }
  }

  test("naiveBayes breaks exact posterior ties to the smallest label") {
    // both classes see the same token multiset {xx, yy}, priors equal —
    // every class posterior ties exactly, so argmax must pick "aaa"
    val docs = labeled(
      ("d1", "xx yy", "aaa"),
      ("d2", "yy xx", "bbb"))
    val got = Classify.naiveBayes(docs, "source", numBuckets = 64)
      .collect()
      .map(r => r.getAs[String]("doc") -> r.getAs[String]("predicted")).toMap
    got shouldBe Map("d1" -> "aaa", "d2" -> "aaa")
  }

  test("naiveBayes drops token-less docs from scoring but keeps them in priors") {
    val docs = labeled(
      ("a1", "alpha beta", "news"),
      ("a2", "   ", "news"), // whitespace-only: no tokens
      ("b1", "delta zeta", "code"))
    val got = Classify.naiveBayes(docs, "source", numBuckets = 64).collect()
    got.map(_.getAs[String]("doc")).sorted shouldBe Array("a1", "b1")
  }

  test("fit + scoreRowLocal equals the distributed naiveBayes bit for bit") {
    val docs = labeled(
      ("a1", "alpha beta alpha gamma", "news"),
      ("a2", "beta gamma alpha alpha", "news"),
      ("b1", "delta epsilon zeta zeta", "code"),
      ("b2", "zeta delta epsilon delta", "code"),
      ("m1", "alpha delta gamma zeta", "code"), // genuinely mixed
      ("t1", "xx yy", "news"), ("t2", "yy xx", "code")) // exact tie pair
    val dist = Classify.naiveBayes(docs, "source", numBuckets = 128)
      .collect()
      .map(r => r.getAs[String]("doc") ->
        (r.getAs[String]("predicted"), r.getAs[Long]("score_micro"))).toMap
    val model = Classify.fit(docs, "source", numBuckets = 128)
    model.labels shouldBe Seq("code", "news") // sorted ascending
    val local = Classify.scoreRowLocal(docs, model)
      .collect()
      .map(r => r.getAs[String]("doc") ->
        (r.getAs[String]("predicted"), r.getAs[Long]("score_micro"))).toMap
    local shouldBe dist
  }

  test("scoreRowLocal pays the smoothed penalty for buckets unseen at fit") {
    val fitDocs = labeled(("a1", "alpha beta", "news"), ("b1", "delta zeta", "code"))
    val model = Classify.fit(fitDocs, "source", numBuckets = 64)
    val got = Classify.scoreRowLocal(
        labeled(("x1", "neverseen tokens here", "?")), model)
      .collect().head
    // 3 unseen tokens: score = prior + 3·unseen, per class; classes are
    // symmetric (1 doc, 2 tokens each) so the posterior ties exactly and
    // the first (smallest) label wins
    got.getAs[String]("predicted") shouldBe "code"
    val i = model.labels.indexOf("code")
    got.getAs[Long]("score_micro") shouldBe
      model.priorsMicro(i) + 3L * model.unseenMicro(i)
  }

  test("scoreRowLocal keeps token-less rows with a prior-only score") {
    val model = Classify.fit(
      labeled(("a1", "alpha", "aa"), ("b1", "beta", "bb")), "source", 64)
    val got = Classify.scoreRowLocal(labeled(("e1", "   ", "?")), model)
      .collect().head
    got.getAs[String]("predicted") shouldBe "aa" // equal priors, tie to first
    got.getAs[Long]("score_micro") shouldBe model.priorsMicro.max
  }

  test("naiveBayes rejects bad parameters and reserved columns") {
    val one = labeled(("d", "x", "a"))
    an[IllegalArgumentException] should be thrownBy
      Classify.naiveBayes(one, "source", numBuckets = 0)
    an[IllegalArgumentException] should be thrownBy
      Classify.naiveBayes(one.withColumn("bucket", lit(1L)), "source")
  }

  test("marginCalibration matches a local replay of the candidate scores") {
    val docs = labeled(
      ("a1", "alpha beta alpha gamma", "news"),
      ("a2", "beta gamma alpha alpha", "news"),
      ("b1", "delta epsilon zeta zeta", "code"),
      ("b2", "zeta delta epsilon delta", "code"),
      ("c1", "gamma delta", "news")) // mixed-vocab low-margin doc
    val binW = 2000000L
    val got = Classify.marginCalibration(docs, "source", numBuckets = 64,
        binMicroNats = binW, maxBin = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // local replay from the shared candidate-score frame
    val sc = Classify.candidateScores(docs, "source", 64).collect()
      .map(r => (r.getAs[String]("doc"), r.getAs[String]("label"),
        r.getAs[String]("cand"), r.getAs[Long]("score_micro")))
    val expect = sc.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(t => (-t._4, t._3))
      if (sorted.size < 2) None
      else {
        val bin = math.min(
          math.floor((sorted(0)._4 - sorted(1)._4).toDouble / binW).toLong, 3L)
        Some(bin -> (if (sorted(0)._3 == sorted(0)._2) 1L else 0L))
      }
    }.groupBy(_._1).map { case (bin, oks) =>
      val n = oks.size.toLong; val c = oks.map(_._2).sum
      bin -> ((n, c, BigDecimal(c.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    got shouldBe expect
    got.values.map(_._1).sum shouldBe 5L // every doc has a runner-up
    an[IllegalArgumentException] should be thrownBy
      Classify.marginCalibration(docs, "source", binMicroNats = 0L)
  }
}
