package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Dedup

/**
 * Property check for the df-screened exact containment join: for ANY
 * small corpus (tiny shared vocabulary ⇒ dense overlap structure, so
 * most shingles exceed small maxDf values and the rare-probe /
 * fallback boundary is exercised from both sides) and ANY threshold
 * and maxDf, `containmentPairsScreened` must return the SAME directed
 * pair set with the SAME containments as the brute tier — the
 * no-false-negative bound (hot_A < |A|·τ − 1 ⇒ a τ-pair shares a rare
 * shingle; otherwise full fallback) checked mechanically, not trusted.
 */
object ContainmentProperties extends Properties("Containment") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.spark

  // docs of 4–10 tokens over an 8-word vocabulary
  private val corpusGen: Gen[List[(String, String)]] = for {
    n <- Gen.chooseNum(2, 10)
    ds <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(4, 10)
      toks <- Gen.listOfN(len,
        Gen.oneOf("w0", "w1", "w2", "w3", "w4", "w5", "w6", "w7"))
    } yield toks.mkString(" "))
  } yield ds.zipWithIndex.map { case (line, i) => (s"d$i", line) }

  property("equals the brute-force tier at any threshold and maxDf") =
    forAll(corpusGen, Gen.oneOf(0.3, 0.5, 0.8, 1.0),
      Gen.oneOf(1L, 2L, 5L)) { (docs, t, maxDf) =>
      val s = spark
      import s.implicits._
      val df = docs.toDF("doc", "line")
      val fast = graft.Caching.scoped {
        Dedup.containmentPairsScreened(df, threshold = t, maxDf = maxDf)
          .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
          .sorted.toList
      }
      val brute = Dedup.containmentPairs(df, threshold = t)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sorted.toList
      fast == brute
    }
}
