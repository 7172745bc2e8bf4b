package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Events

/**
 * Property check for the hourly-anomaly z-scores: for ANY event
 * multiset, the operator's integer-sum formula must agree with an
 * INDEPENDENT local computation of
 *   z = (n·h − S) / (h·√((h·Q − S²)/(h·(h−1))))
 * over the same hourly counts — and the null contract must hold
 * exactly (h < 3 or zero spread ⇒ null z, never flagged).
 */
object AnomalyProperties extends Properties("HourlyAnomalies") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  // events over ≤ 6 hours × ≤ 2 types, with duplicate-heavy hours
  private val eventsGen: Gen[List[(Long, Int, String)]] = for {
    n <- Gen.chooseNum(0, 80)
    es <- Gen.listOfN(n, for {
      id <- Gen.chooseNum(1L, 100000L)
      h <- Gen.chooseNum(0, 5)
      t <- Gen.oneOf("a", "b")
    } yield (id, h, t))
  } yield es.distinctBy(_._1)

  property("matches an independent local z computation") =
    forAll(eventsGen) { events =>
      val s = spark
      import s.implicits._
      val df = events.map { case (id, h, t) =>
        (id, new Timestamp(h * 3600000L), 1L, t, 0.0,
          """{"k": 0}""")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val got = Events.hourlyAnomalies(df, zThreshold = 1.0).collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime) ->
          (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
            r.getBoolean(4))).toMap

      val counts = events.groupBy(e => (e._3, e._2.toLong * 3600000L))
        .view.mapValues(_.size.toLong).toMap
      counts.forall { case ((t, hms), n) =>
        val series = counts.collect { case ((`t`, _), c) => c }.toList
        val h = series.size.toLong
        val sS = series.sum
        val q = series.map(c => c * c).sum
        val vnum = h * q - sS * sS
        val expectZ =
          if (h >= 3 && vnum > 0)
            Some(math.floor(
              ((n * h - sS).toDouble /
                (h.toDouble * math.sqrt(vnum.toDouble / (h * (h - 1)).toDouble)))
                * 1e6 + 0.5) / 1e6)
          else None
        val (gn, gz, gflag) = got((t, hms))
        gn == n &&
          gz.map(z => math.abs(z - expectZ.getOrElse(Double.NaN)) < 1e-9)
            .getOrElse(expectZ.isEmpty) &&
          gflag == expectZ.exists(z => math.abs(z) > 1.0)
      }
    }
}
