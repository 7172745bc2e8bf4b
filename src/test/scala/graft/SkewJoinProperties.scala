package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.HotKeys

/**
 * Property check for the skew-aware join: for ANY fact multiset (hot
 * whales, duplicates, orphan keys) and any θ, the salted/cold split
 * must be row-for-row equal to the plain inner join — salting is plan
 * surgery, never semantics.
 */
object SkewJoinProperties extends Properties("SkewJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  // keys 1..6, some beyond the dim's 1..4 range (orphans drop in both)
  private val factGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(0, 60)
    fs <- Gen.listOfN(n, for {
      k <- Gen.frequency(5 -> Gen.const(1L), 3 -> Gen.chooseNum(2L, 4L),
        1 -> Gen.chooseNum(5L, 6L))
      p <- Gen.oneOf("a", "b", "c") // few payloads => duplicate rows
    } yield (k, p))
  } yield fs

  private val thetaGen: Gen[Double] =
    Gen.oneOf(0.001, 0.05, 0.2, 0.5, 0.9)

  property("equals the plain inner join") = forAll(factGen, thetaGen) {
    (facts, theta) =>
      val s = spark
      import s.implicits._
      val f = facts.toDF("k", "payload")
      val dim = (1L to 4L).map(k => (k, s"d$k")).toDF("k", "attr")
      val plain = f.join(dim, Seq("k")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sorted.toList
      val skew = HotKeys.skewJoin(f, dim, "k", theta = theta, salts = 4)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sorted.toList
      skew == plain
  }
}
