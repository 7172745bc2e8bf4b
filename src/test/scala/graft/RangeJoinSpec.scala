package graft

import org.apache.spark.sql.DataFrame

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  private def pts(rows: (Long, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("pid", "v")
  }

  private def ivs(rows: (Long, Double, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("iid", "lo", "hi")
  }

  test("pointInInterval matches [lo, hi) including overlapping intervals") {
    val got = RangeJoin.pointInInterval(
      pts(1L -> 5.0, 2L -> 10.0, 3L -> 25.0),
      ivs((100L, 0.0, 10.0), (200L, 5.0, 15.0), (300L, 20.0, 30.0)),
      "v", "lo", "hi", binWidth = 4.0)
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("iid"))).toSet
    got shouldBe Set(
      (1L, 100L), (1L, 200L), // 5.0 in both [0,10) and [5,15) (lo inclusive)
      (2L, 200L),             // 10.0 excluded from [0,10) (hi exclusive)
      (3L, 300L))
  }

  test("pointInInterval finds matches across bin boundaries") {
    // interval spans many bins; point sits mid-interval in a bin the
    // interval only reaches via the explode fan-out
    val got = RangeJoin.pointInInterval(
      pts(1L -> 97.0), ivs((9L, 10.0, 100.0)), "v", "lo", "hi", binWidth = 3.0)
      .count()
    got shouldBe 1L
  }

  test("pointInInterval yields nothing outside all intervals") {
    RangeJoin.pointInInterval(
      pts(1L -> 50.0), ivs((9L, 0.0, 10.0)), "v", "lo", "hi", binWidth = 5.0)
      .count() shouldBe 0L
  }
}
