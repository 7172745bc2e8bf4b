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

  private def ivs2(rows: (Long, Double, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("jid", "lo2", "hi2")
  }

  test("intervalOverlap matches closed overlaps exactly once across bins") {
    val got = RangeJoin.intervalOverlap(
      ivs((1L, 0.0, 10.0), (2L, 20.0, 21.0), (3L, 5.0, 5.0)),
      ivs2((100L, 9.0, 30.0), (200L, 10.0, 10.0), (300L, 40.0, 50.0)),
      "lo", "hi", "lo2", "hi2", binWidth = 4.0)
      .collect().map(r => (r.getAs[Long]("iid"), r.getAs[Long]("jid")))
    // no duplicate rows despite many shared bins (first-shared-bin rule)
    got.length shouldBe got.toSet.size
    got.toSet shouldBe Set(
      (1L, 100L), // [0,10] x [9,30] overlap at 9..10, spans several bins
      (1L, 200L), // closed semantics: touching at exactly 10 counts
      (2L, 100L)) // [20,21] inside [9,30]
    // zero-length interval (3: [5,5]) overlaps nothing here but would
    // match an interval containing 5 — closed semantics keep it alive
    val z = RangeJoin.intervalOverlap(
      ivs((3L, 5.0, 5.0)), ivs2((100L, 0.0, 6.0)),
      "lo", "hi", "lo2", "hi2", binWidth = 4.0)
    z.count() shouldBe 1L
  }

  test("intervalOverlap rejects malformed (descending) intervals loudly") {
    val e = intercept[Exception] {
      RangeJoin.intervalOverlap(
        ivs((1L, 10.0, 0.0)), ivs2((2L, 0.0, 1.0)),
        "lo", "hi", "lo2", "hi2", binWidth = 4.0).collect()
    }
    e.getMessage should include("malformed interval")
  }
}
