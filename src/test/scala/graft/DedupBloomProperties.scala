package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.{col, md5}

import graft.operators.Dedup

/**
 * Property check: the Bloom-screened incremental dedup must be
 * bit-identical to the plain anti-join for ANY delta/history pair and
 * ANY fpp — false positives are caught by the confirm join, false
 * negatives cannot exist. Random corpora over a 3-letter vocabulary
 * force heavy payload collisions between the two sides, and a
 * deliberately degenerate fpp (0.5) maximizes the false-positive path.
 */
object DedupBloomProperties extends Properties("DedupBloom") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  private val payload: Gen[String] =
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum('a', 'c').map(_.toString)).map(_.mkString(" ")))

  private val corpusGen: Gen[List[(String, String)]] = for {
    n <- Gen.chooseNum(0, 20)
    ps <- Gen.listOfN(n, payload)
  } yield ps.zipWithIndex.map { case (p, i) => (f"d$i%03d", p) }

  private def df(rows: List[(String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc", "line")
  }

  property("bloom screen == plain anti-join at fpp 0.5") =
    forAll(corpusGen, corpusGen) { (delta, history) =>
      val d = df(delta)
      val h = df(history)
      val plain = Dedup.exactDedupAgainst(d, h.select(md5(col("line")).as("fp")))
        .select("doc").collect().map(_.getString(0)).toSet
      val bloomed = Dedup.exactDedupAgainstBloom(d, h, fpp = 0.5)
        .select("doc").collect().map(_.getString(0)).toSet
      plain == bloomed
    }
}
