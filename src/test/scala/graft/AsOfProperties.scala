package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.AsOfJoin

/**
 * Property check: the union + running-window as-of join equals the
 * brute-force per-row definition (latest right ts ≤ left ts per key) on
 * random inputs — guards the window-ordering subtleties (tie order,
 * ignoreNulls carry, per-key isolation).
 */
object AsOfProperties extends Properties("AsOfJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  private val key: Gen[Long] = Gen.chooseNum(1L, 3L)
  private val ts: Gen[Long] = Gen.chooseNum(0L, 20L)

  private val leftGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.zip(key, ts)))

  /** Right side: unique per (key, ts) — the operator's contract. */
  private val rightGen: Gen[List[(Long, Long, Double)]] =
    Gen.chooseNum(0, 10).flatMap { n =>
      Gen.listOfN(n, Gen.zip(key, ts)).map(_.distinct.zipWithIndex.map {
        case ((k, t), i) => (k, t, (i + 1) * 10.0)
      })
    }

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  private def ldf(rows: List[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.zipWithIndex.map { case ((k, x), i) => (i.toLong, k, t(x)) }
      .toDF("lid", "k", "ts")
  }

  private def rdf(rows: List[(Long, Long, Double)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (k, x, v) => (k, t(x), v) }.toDF("k", "ts", "v")
  }

  property("equals brute-force latest-at-or-before lookup") =
    forAll(leftGen, rightGen) { (l, r) =>
      val got = AsOfJoin.asOfJoin(ldf(l), rdf(r), Seq("k"), "ts", "v")
        .collect()
        .map(row => row.getAs[Long]("lid") ->
          Option(row.getAs[java.lang.Double]("asof_value")).map(_.toDouble))
        .toMap
      val expect = l.zipWithIndex.map { case ((k, x), i) =>
        val candidates = r.filter(rr => rr._1 == k && rr._2 <= x)
        i.toLong -> candidates.sortBy(_._2).lastOption.map(_._3)
      }.toMap
      got == expect
    }
}
