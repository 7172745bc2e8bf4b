package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def df(cols: String, rows: Product*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { p =>
      (p.productElement(0).asInstanceOf[Long],
        Timestamp.valueOf(p.productElement(1).asInstanceOf[String]),
        p.productElement(2).asInstanceOf[Double])
    }.toDF(cols.split(",").toIndexedSeq: _*)
  }

  private val left = df("k,ts,x",
    (1L, "2024-01-01 00:05:00", 0.0),
    (1L, "2024-01-01 00:20:00", 0.0),
    (1L, "2024-01-01 00:00:00", 0.0), // before any snapshot
    (2L, "2024-01-01 00:30:00", 0.0)) // key with no snapshots

  private val right = df("k,ts,v",
    (1L, "2024-01-01 00:03:00", 10.0),
    (1L, "2024-01-01 00:10:00", 20.0))

  test("asOfJoin picks the latest right row at or before each left ts") {
    val got = AsOfJoin.asOfJoin(left, right, Seq("k"), "ts", "v")
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Timestamp]("ts").toString,
        Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)))
      .toSet
    got shouldBe Set(
      (1L, "2024-01-01 00:05:00.0", Some(10.0)),
      (1L, "2024-01-01 00:20:00.0", Some(20.0)),
      (1L, "2024-01-01 00:00:00.0", None),
      (2L, "2024-01-01 00:30:00.0", None))
  }

  test("asOfJoin includes a right row at exactly the left ts (<= semantics)") {
    val l = df("k,ts,x", (1L, "2024-01-01 00:10:00", 0.0))
    val got = AsOfJoin.asOfJoin(l, right, Seq("k"), "ts", "v").head()
    got.getAs[Double]("asof_value") shouldBe 20.0
  }

  test("forward asOfJoin picks the earliest right row at or after left ts") {
    val got = AsOfJoin.asOfJoin(left, right, Seq("k"), "ts", "v", forward = true)
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Timestamp]("ts").toString,
        Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)))
      .toSet
    got shouldBe Set(
      (1L, "2024-01-01 00:05:00.0", Some(20.0)), // next right at 00:10
      (1L, "2024-01-01 00:20:00.0", None),       // nothing after
      (1L, "2024-01-01 00:00:00.0", Some(10.0)), // next right at 00:03
      (2L, "2024-01-01 00:30:00.0", None))
  }

  test("asOfJoin preserves left row count and columns") {
    val out = AsOfJoin.asOfJoin(left, right, Seq("k"), "ts", "v")
    out.count() shouldBe 4L
    out.columns.toSeq shouldBe Seq("k", "ts", "x", "asof_value")
  }

  test("asOfJoin rejects inputs that carry its reserved internal columns") {
    // a left '_r' column would be silently overwritten then dropped —
    // must fail loudly instead
    val badLeft = left.withColumnRenamed("x", "_r")
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.asOfJoin(badLeft, right, Seq("k"), "ts", "v")
    val badRight = right.withColumnRenamed("v", "_is_right")
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.asOfJoin(left, badRight, Seq("k"), "ts", "_is_right")
  }

  test("asOfJoin tolerance nulls matches staler than the bound") {
    // left 00:20 matches right 00:10 (10 min stale); left 00:05 matches
    // right 00:03 (2 min stale) — a 5-minute bound keeps only the latter
    val got = AsOfJoin.asOfJoin(left, right, Seq("k"), "ts", "v",
        toleranceMs = Some(5L * 60 * 1000))
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Timestamp]("ts").toString,
        Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)))
      .toSet
    got shouldBe Set(
      (1L, "2024-01-01 00:05:00.0", Some(10.0)),
      (1L, "2024-01-01 00:20:00.0", None), // match exists but 10 min stale
      (1L, "2024-01-01 00:00:00.0", None),
      (2L, "2024-01-01 00:30:00.0", None))
    // boundary: exactly the tolerance is IN (<= semantics)
    val exact = AsOfJoin.asOfJoin(left, right, Seq("k"), "ts", "v",
        toleranceMs = Some(10L * 60 * 1000))
      .collect()
      .map(r => (r.getAs[Timestamp]("ts").toString,
        Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble))).toMap
    exact("2024-01-01 00:20:00.0") shouldBe Some(20.0)
  }
}
