package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Events

/**
 * Property check for the cohort-retention triangle against a local
 * reference of the spec (per user: distinct active days, cohort = min;
 * per (cohort, offset): users active that day). Random small
 * user × day incidence matrices exercise multi-cohort overlap, repeat
 * same-day activity, and single-day users.
 */
object RetentionProperties extends Properties("CohortRetention") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  private val eventGen: Gen[(Long, Int)] = for {
    u <- Gen.chooseNum(1L, 5L)
    d <- Gen.chooseNum(1, 6) // day-of-January
  } yield (u, d)

  private val eventsGen: Gen[List[(Long, Int)]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, eventGen))

  property("triangle equals the local reference") = forAll(eventsGen) { evs =>
    val s = spark
    import s.implicits._
    val df = evs.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong, Timestamp.valueOf(f"2024-01-0$d%d 10:00:00"), u, "purchase", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val got = Events.cohortRetention(df).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet

    val byUser = evs.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
    val expected = byUser.toList
      .flatMap { case (_, days) => days.map(d => (days.head, d - days.head)) }
      .groupBy(identity).map { case ((cohort, off), hits) =>
        (f"2024-01-0$cohort%d", off.toLong, hits.size.toLong)
      }.toSet

    got == expected
  }
}
