package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Dedup

/**
 * Property check for the prefix-filtered exact similarity join: for ANY
 * small corpus (tiny shared vocabulary ⇒ dense near-dup structure,
 * exactly where candidate pruning is under the most pressure) and ANY
 * threshold, `prefixFilterJaccardPairs` must return the SAME pair set
 * with the SAME jaccards as the brute-force all-pairs tier — the
 * theorem (prefix probing + symmetric size filter has no false
 * negatives) checked mechanically, not trusted.
 */
object PrefixFilterProperties extends Properties("PrefixFilter") {

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

  property("equals the brute-force tier at any threshold") =
    forAll(corpusGen, Gen.oneOf(0.3, 0.5, 0.8, 1.0)) { (docs, t) =>
      val s = spark
      import s.implicits._
      val df = docs.toDF("doc", "line")
      val fast = Dedup.prefixFilterJaccardPairs(df, threshold = t)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sorted.toList
      val fastArr = Dedup.prefixFilterJaccardPairs(df, threshold = t,
          verifyViaArrays = true)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sorted.toList
      val brute = Dedup.ngramJaccardPairs(df, threshold = t)
        .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sorted.toList
      fast == brute && fastArr == brute
    }
}
