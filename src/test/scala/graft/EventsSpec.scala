package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Events

class EventsSpec extends SparkSpec {

  private def ev(rows: (Long, String, Long, String, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, ts, uid, typ, v) =>
      (id, Timestamp.valueOf(ts), uid, typ, v, s"""{"k": $id}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("hourlyTypeStats buckets into epoch-aligned hours") {
    val got = Events.hourlyTypeStats(ev(
      (1L, "2024-01-01 10:15:00", 1L, "click", 1.0),
      (2L, "2024-01-01 10:59:59", 1L, "click", 2.0),
      (3L, "2024-01-01 11:00:00", 1L, "click", 4.0)))
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3)))
    got.toSet shouldBe Set(
      ("2024-01-01 10:00:00.0", 2L, 3.0),
      ("2024-01-01 11:00:00.0", 1L, 4.0))
  }

  test("slidingTypeStats: each event covers window/slide overlapping windows") {
    // one event at 10:31 → 1h windows sliding 15min: starts 09:45,
    // 10:00, 10:15, 10:30 (4 = 60/15 covering windows)
    val got = Events.slidingTypeStats(ev(
      (1L, "2024-01-01 10:31:00", 1L, "click", 2.5)))
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3)))
    got.toSet shouldBe Set(
      ("2024-01-01 09:45:00.0", 1L, 2.5),
      ("2024-01-01 10:00:00.0", 1L, 2.5),
      ("2024-01-01 10:15:00.0", 1L, 2.5),
      ("2024-01-01 10:30:00.0", 1L, 2.5))
    // two events an hour apart share exactly one window boundary region
    val two = Events.slidingTypeStats(ev(
      (1L, "2024-01-01 10:31:00", 1L, "click", 1.0),
      (2L, "2024-01-01 11:16:00", 1L, "click", 2.0)))
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2)))
    two.count(_._2 == 2L) shouldBe 1 // only the 10:30 window holds both
    two.map(_._2).sum shouldBe 8L // 4 covering windows per event
  }

  test("valueQuantiles approx tier tracks the exact tier") {
    val rows = (1 to 500).map(i =>
      (i.toLong, f"2024-01-01 ${i % 24}%02d:00:00", 1L, "click", i.toDouble))
    val exact = Events.valueQuantiles(ev(rows: _*)).head()
    val approx = Events.valueQuantiles(ev(rows: _*), exact = false).head()
    Seq("p50", "p90", "p99").foreach { c =>
      approx.getAs[Double](c) shouldBe exact.getAs[Double](c) +- 5.0
    }
  }

  test("winsorizeValues clips into the corpus percentile band") {
    // values 1..100: p10 = 10.9, p90 = 90.1 (interpolated, rounded 6)
    val rows = (1 to 100).map(i =>
      (i.toLong, f"2024-01-01 ${i % 24}%02d:00:00", 1L, "a", i.toDouble))
    val got = Events.winsorizeValues(ev(rows: _*), pLo = 0.1, pHi = 0.9)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("value_w"))
      .toMap
    got(1L) shouldBe 10.9 +- 1e-9   // clipped up
    got(100L) shouldBe 90.1 +- 1e-9 // clipped down
    got(50L) shouldBe 50.0 +- 1e-9  // inside the band: untouched
    an[IllegalArgumentException] should be thrownBy
      Events.winsorizeValues(ev(rows.head), pLo = 0.9, pHi = 0.1)
  }

  test("propsKeyStats extracts json ints and aggregates") {
    val row = Events.propsKeyStats(ev(
      (10L, "2024-01-01 00:00:00", 1L, "click", 0.0),
      (20L, "2024-01-01 00:00:01", 2L, "click", 0.0))).head()
    row.getAs[Long]("n_events") shouldBe 2L
    row.getAs[Long]("k_sum") shouldBe 30L
    row.getAs[Double]("k_avg") shouldBe 15.0 +- 1e-9
  }

  test("valueQuantiles interpolates at rank (n-1)p") {
    // values 1,2,3,10: p50 = 2.5, p90 = 3 + 0.7*(10-3) = 7.9
    val row = Events.valueQuantiles(ev(
      (1L, "2024-01-01 00:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 00:01:00", 1L, "a", 2.0),
      (3L, "2024-01-01 00:02:00", 1L, "a", 3.0),
      (4L, "2024-01-01 00:03:00", 1L, "a", 10.0)), ps = Seq(0.5, 0.9)).head()
    row.getAs[Double]("p50") shouldBe 2.5 +- 1e-9
    row.getAs[Double]("p90") shouldBe 7.9 +- 1e-9
  }

  test("typeHourRollup emits cell, subtotal and grand-total rows with grouping masks") {
    val got = Events.typeHourRollup(ev(
      (1L, "2024-01-01 10:15:00", 1L, "click", 1.0),
      (2L, "2024-01-01 11:15:00", 1L, "click", 2.0),
      (3L, "2024-01-01 10:30:00", 2L, "view", 4.0)))
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Timestamp]("hour_start").toString,
        r.getAs[Long]("g_type"), r.getAs[Long]("g_hour"),
        r.getAs[Long]("n_events"), r.getAs[Double]("value_sum")))
    got.toSet shouldBe Set(
      ("click", "2024-01-01 10:00:00.0", 0L, 0L, 1L, 1.0),
      ("click", "2024-01-01 11:00:00.0", 0L, 0L, 1L, 2.0),
      ("view", "2024-01-01 10:00:00.0", 0L, 0L, 1L, 4.0),
      ("click", "1970-01-01 00:00:00.0", 0L, 1L, 2L, 3.0), // per-type subtotal
      ("view", "1970-01-01 00:00:00.0", 0L, 1L, 1L, 4.0),
      ("ALL", "1970-01-01 00:00:00.0", 1L, 1L, 3L, 7.0))   // grand total
  }

  test("typeHourRollup masks disambiguate a real 'ALL' event type and epoch-hour rows") {
    // a literal 'ALL' event type must NOT merge with the grand total,
    // and an event in epoch hour 0 must not collide with subtotal rows
    val got = Events.typeHourRollup(ev(
      (1L, "2024-01-01 10:15:00", 1L, "click", 1.0),
      (2L, "1970-01-01 00:10:00", 2L, "ALL", 2.0)))
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Timestamp]("hour_start").toString,
        r.getAs[Long]("g_type"), r.getAs[Long]("g_hour"),
        r.getAs[Long]("n_events"), r.getAs[Double]("value_sum")))
    got.toSet shouldBe Set(
      ("click", "2024-01-01 10:00:00.0", 0L, 0L, 1L, 1.0),
      ("click", "1970-01-01 00:00:00.0", 0L, 1L, 1L, 1.0),
      ("ALL", "1970-01-01 00:00:00.0", 0L, 0L, 1L, 2.0),  // the REAL cell
      ("ALL", "1970-01-01 00:00:00.0", 0L, 1L, 1L, 2.0),  // 'ALL' subtotal
      ("ALL", "1970-01-01 00:00:00.0", 1L, 1L, 2L, 3.0))  // grand total
  }

  test("userMovingAvg averages over the last-n rows frame per user") {
    val got = Events.userMovingAvg(ev(
      (1L, "2024-01-01 00:00:00", 1L, "a", 2.0),
      (2L, "2024-01-01 00:01:00", 1L, "a", 4.0),
      (3L, "2024-01-01 00:02:00", 1L, "a", 6.0),
      (4L, "2024-01-01 00:00:00", 2L, "a", 8.0)), nRows = 2)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("moving_avg"))
      .toMap
    got(1L) shouldBe 2.0 +- 1e-9 // frame = [2]
    got(2L) shouldBe 3.0 +- 1e-9 // frame = [2, 4]
    got(3L) shouldBe 5.0 +- 1e-9 // frame = [4, 6] — row 1 slid out
    got(4L) shouldBe 8.0 +- 1e-9 // other user unaffected
  }

  test("cohortRetention builds the triangle; repeat same-day activity counts once") {
    val got = Events.cohortRetention(ev(
      // u1: cohort day 1, returns day 2 and day 4 (two events day 2 — counts once)
      (1L, "2024-01-01 09:00:00", 1L, "purchase", 1.0),
      (2L, "2024-01-02 09:00:00", 1L, "purchase", 1.0),
      (3L, "2024-01-02 21:00:00", 1L, "purchase", 1.0),
      (4L, "2024-01-04 09:00:00", 1L, "purchase", 1.0),
      // u2: cohort day 1, returns day 2
      (5L, "2024-01-01 10:00:00", 2L, "purchase", 1.0),
      (6L, "2024-01-02 10:00:00", 2L, "purchase", 1.0),
      // u3: cohort day 2 only; click noise never counts
      (7L, "2024-01-02 11:00:00", 3L, "purchase", 1.0),
      (8L, "2024-01-01 11:00:00", 3L, "click", 1.0)))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    got shouldBe Set(
      ("2024-01-01", 0L, 2L), // u1, u2 start
      ("2024-01-01", 1L, 2L), // both return next day
      ("2024-01-01", 3L, 1L), // u1 returns day 4
      ("2024-01-02", 0L, 1L)) // u3's cohort
  }

  test("downsampleOhlc picks open/close at the (ts, event_id) order, one row per bucket") {
    val got = Events.downsampleOhlc(ev(
      (2L, "2024-01-01 10:00:00", 1L, "click", 5.0), // same ts as id 1 —
      (1L, "2024-01-01 10:00:00", 1L, "click", 3.0), // id order decides open
      (3L, "2024-01-01 10:30:00", 1L, "click", 9.0),
      (4L, "2024-01-01 10:45:00", 1L, "click", 1.0), // low AND close
      (5L, "2024-01-01 11:05:00", 1L, "click", 7.0), // next hour
      (6L, "2024-01-01 10:10:00", 1L, "view", 2.0))) // other series
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7))).toMap
    got(("click", "2024-01-01 10:00:00.0")) shouldBe
      ((3.0, 9.0, 1.0, 1.0, 4L, 18.0)) // open=id1, high=9, low=close=1
    got(("click", "2024-01-01 11:00:00.0")) shouldBe
      ((7.0, 7.0, 7.0, 7.0, 1L, 7.0))
    got(("view", "2024-01-01 10:00:00.0")) shouldBe
      ((2.0, 2.0, 2.0, 2.0, 1L, 2.0))
  }

  test("downsampleOhlc plans one exchange (window partitioning reused by the agg)") {
    val plan = Events.downsampleOhlc(
      ev((1L, "2024-01-01 10:00:00", 1L, "click", 1.0)))
      .queryExecution.executedPlan.toString
    // the groupBy must NOT re-shuffle after the window's hash exchange
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
  }

  test("downsampleTwap: hold-until-next weighting incl. the cross-hour stitch") {
    val got = Events.downsampleTwap(ev(
      (1L, "2024-01-01 10:00:00", 1L, "click", 2.0), // holds 30 min
      (2L, "2024-01-01 10:30:00", 1L, "click", 4.0), // holds 40 min, INTO hour 11
      (3L, "2024-01-01 11:10:00", 1L, "click", 6.0), // holds 50 min
      (4L, "2024-01-01 12:00:00", 1L, "click", 8.0))) // no successor → dropped
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // hour 10: (2e6·1.8e9 + 4e6·2.4e9) / 4.2e9 = 3_142_857.14… → floor
    got(("click", "2024-01-01 10:00:00.0")) shouldBe ((2L, 4200000000L, 3142857L))
    got(("click", "2024-01-01 11:00:00.0")) shouldBe ((1L, 3000000000L, 6000000L))
    got.size shouldBe 2 // hour 12's only event has no successor
  }

  test("downsampleTwap: stitched plan ≡ flat per-type lead (incl. skipped hours)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 3 series × 60 events with growing gaps so several hours are
    // skipped entirely — the boundary stitch must cross them
    val rows = for (t <- 0 until 3; i <- 0 until 60) yield
      (t * 100L + i,
        f"2024-01-0${1 + i / 40}%d ${10 + (i % 40) / 10}%02d:${(i * 7) % 60}%02d:00",
        1L, s"type$t", (i % 13) + 0.5)
    val e = ev(rows: _*)
    val flat = e
      .withColumn("hour_start", date_trunc("hour", col("ts")))
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("vmicro", round(col("value") * 1e6).cast("long"))
      .withColumn("next_us", lead(col("tus"), 1).over(
        Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))))
      .where(col("next_us").isNotNull)
      .withColumn("dur_us", col("next_us") - col("tus"))
      .groupBy(col("event_type"), col("hour_start"))
      .agg(count(lit(1)).as("n_obs"), sum(col("dur_us")).as("dur_us"),
        sum(col("vmicro").cast("decimal(38,0)") * col("dur_us")).as("_num"))
      .withColumn("twap_micro",
        ((col("_num") - pmod(col("_num"), col("dur_us").cast("decimal(38,0)"))) /
          col("dur_us").cast("decimal(38,0)")).cast("long"))
      .select("event_type", "hour_start", "n_obs", "dur_us", "twap_micro")
    rowsOf(Events.downsampleTwap(e)) shouldBe rowsOf(flat)
  }

  test("downsampleTwap: hour-frame successor joins broadcast; big side shuffles once") {
    val plan = Events.downsampleTwap(
      ev((1L, "2024-01-01 10:00:00", 1L, "click", 1.0),
        (2L, "2024-01-01 11:00:00", 1L, "click", 2.0)))
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    // exchanges: full event rows move ONCE (the (type, hour) window);
    // the hour-frame branch adds two more that only carry (type, hour,
    // min-ts) partial aggregates — map-side combined, hour-level row
    // counts — plus its per-type lead over the tiny frame. The final
    // aggregate reuses the big window's partitioning (no 4th exchange).
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 3
  }

  test("hourlyAnomalies: hand-computed z, spike flagged, normal hours not") {
    // type "a": hourly counts 2, 2, 2, 2, 12 → h=5, S=20, Q=160
    //   mean 4, sample var (5·160 − 400)/(5·4) = 20, sd √20
    //   z(2)  = (2·5 − 20)/(5·√(400/20)/...) — use the closed form:
    //   z(n) = (n·h − S)/(h·√((h·Q − S²)/(h·(h−1))))
    //        = (n·5 − 20)/(5·√(400/20)) = (5n − 20)/(5·√20)
    //   z(12) = 40/(5·4.472135…) = 1.788854 → NOT an anomaly at 2.0
    // so use counts 1,1,1,1,11: h=5, S=15, Q=125, h·Q−S²=400, same sd
    //   z(11) = (55−15)/(5·√(400/20)) = 40/22.36067977 = 1.788854 hmm
    // counts 1,1,1,1,16: S=20, Q=260, hQ−S²=900, √(900/20)=6.708203932
    //   z(16) = (80−20)/(5·6.708203932) = 60/33.54101966 = 1.788854!
    // (constant-plus-one-spike series always gives z = 2(h−1)/√(h(h−1)·…);
    //  with h=5 a single spike caps at √(h−1)·…≈1.789 — so flag at a
    //  LOWER threshold instead of chasing a bigger spike)
    val rows = (0 until 4).flatMap { h =>
      Seq((h * 10L, f"2024-01-01 0$h%d:10:00", 1L, "a", 1.0))
    } ++ (0 until 16).map { i =>
      (100L + i, "2024-01-01 04:10:00", 1L, "a", 1.0)
    }
    val got = Events.hourlyAnomalies(ev(rows: _*), zThreshold = 1.5)
      .collect().map(r => r.getTimestamp(1).toString ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4))).toMap
    got("2024-01-01 04:00:00.0") shouldBe ((16L, Some(1.788854), true))
    got("2024-01-01 00:00:00.0")._3 shouldBe false
    // z of a baseline hour: (1·5 − 20)/(5·√45) = −15/33.54101966
    got("2024-01-01 00:00:00.0")._2 shouldBe Some(-0.447214)
  }

  test("hourlyAnomalies: constant series and short series get null z, never flagged") {
    val const = (0 until 4).map(h => (h.toLong, f"2024-01-01 0$h%d:10:00", 1L, "c", 1.0))
    val short = Seq((100L, "2024-01-01 00:10:00", 1L, "s", 1.0),
      (101L, "2024-01-01 01:10:00", 1L, "s", 1.0))
    val got = Events.hourlyAnomalies(ev(const ++ short: _*))
    got.where(col("z").isNotNull).count() shouldBe 0L
    got.where(col("is_anomaly")).count() shouldBe 0L
  }

  test("typeTransitions counts per-user successors with row-normalized p") {
    val got = Events.typeTransitions(ev(
      // user 1: view → view → buy ; user 2: view → buy
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "view", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "buy", 0.0),
      (4L, "2024-01-01 11:00:00", 2L, "view", 0.0),
      (5L, "2024-01-01 11:01:00", 2L, "buy", 0.0)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    got shouldBe Map(
      ("view", "view") -> ((1L, 0.333333)),
      ("view", "buy") -> ((2L, 0.666667)))
    // users never chain across each other: buy→view (u1 to u2) absent
  }

  test("typeTransitions: same-ts events order by event_id; last event has no successor") {
    val got = Events.typeTransitions(ev(
      (2L, "2024-01-01 10:00:00", 1L, "b", 0.0),
      (1L, "2024-01-01 10:00:00", 1L, "a", 0.0)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    got.toSeq shouldBe Seq(("a", "b", 1L))
  }

  test("topPaths counts consecutive type sequences per user, top-k with path tie-break") {
    val got = Events.topPaths(ev(
      // u1: view view buy ; u2: view view buy ; u3: view buy view
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "view", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "buy", 0.0),
      (4L, "2024-01-01 10:00:00", 2L, "view", 0.0),
      (5L, "2024-01-01 10:01:00", 2L, "view", 0.0),
      (6L, "2024-01-01 10:02:00", 2L, "buy", 0.0),
      (7L, "2024-01-01 10:00:00", 3L, "view", 0.0),
      (8L, "2024-01-01 10:01:00", 3L, "buy", 0.0),
      (9L, "2024-01-01 10:02:00", 3L, "view", 0.0)), pathLen = 3, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    got.toSeq shouldBe Seq(("view>view>buy", 2L), ("view>buy>view", 1L))
  }

  test("topPaths: users never chain into each other; short users emit nothing") {
    val got = Events.topPaths(ev(
      (1L, "2024-01-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "b", 0.0),
      (3L, "2024-01-01 10:02:00", 2L, "c", 0.0)), pathLen = 3, k = 10)
    got.count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Events.topPaths(ev(), pathLen = 1)
    an[IllegalArgumentException] should be thrownBy
      Events.topPaths(ev(), k = 0)
  }

  test("seasonalBaseline: each hour compares to its own hour-of-day slot") {
    // type a, hod 10 over three days: counts 2, 2, 8 → slot mean 4
    val rows = Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:30:00"),
      (3L, "2024-01-02 10:00:00"), (4L, "2024-01-02 10:30:00")) ++
      (10L to 17L).map(i => (i, "2024-01-03 10:15:00")) ++
      Seq((30L, "2024-01-01 23:00:00")) // hod 23: its own slot, ratio 1
    val got = Events.seasonalBaseline(
        ev(rows.map { case (id, ts) => (id, ts, 1L, "a", 1.0) }: _*))
      .collect().map(r => r.getTimestamp(1).toString ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .toMap
    got("2024-01-01 10:00:00.0") shouldBe ((10L, 2L, 3L, 12L, 0.5))
    got("2024-01-03 10:00:00.0") shouldBe ((10L, 8L, 3L, 12L, 2.0))
    got("2024-01-01 23:00:00.0") shouldBe ((23L, 1L, 1L, 1L, 1.0))
  }

  test("transitionTimes: floor mean and median gaps per (from, to) pair") {
    val got = Events.transitionTimes(ev(
      // u1: a →(60s)→ b, a →(180s)→ b via u2, plus b →(30s)→ a on u1
      (1L, "2024-01-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "b", 0.0),
      (3L, "2024-01-01 10:01:30", 1L, "a", 0.0),
      (4L, "2024-01-01 11:00:00", 2L, "a", 0.0),
      (5L, "2024-01-01 11:03:00", 2L, "b", 0.0)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // a→b gaps: 60s, 180s → mean 120s, median 120s (interpolated)
    got(("a", "b")) shouldBe ((2L, 120000000L, 1.2e8))
    got(("b", "a")) shouldBe ((1L, 30000000L, 3.0e7))
  }

  test("sessionize splits on gaps > threshold") {
    val got = Events.sessionize(ev(
      (1L, "2024-01-01 00:00:00", 7L, "a", 1.0),
      (2L, "2024-01-01 00:10:00", 7L, "a", 2.0),  // same session (10 min)
      (3L, "2024-01-01 01:00:00", 7L, "a", 4.0),  // 50 min gap → new session
      (4L, "2024-01-01 00:00:00", 8L, "a", 8.0)), // other user
      gapMinutes = 30)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[Long]("n_events"), r.getAs[Double]("value_sum")))
    got.toSet shouldBe Set((7L, 1L, 2L, 3.0), (7L, 2L, 1L, 4.0), (8L, 1L, 1L, 8.0))
  }

  test("sessionize boundary: exactly gap minutes is same session") {
    val got = Events.sessionize(ev(
      (1L, "2024-01-01 00:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 00:30:00", 1L, "a", 1.0)), gapMinutes = 30)
    got.count() shouldBe 1L
  }

  test("userEwma weights recent events by the literal decay table") {
    val got = Events.userEwma(ev(
      (1L, "2024-01-01 00:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 00:01:00", 1L, "a", 2.0),
      (3L, "2024-01-01 00:02:00", 1L, "a", 3.0),
      (4L, "2024-01-01 00:00:00", 2L, "a", 7.0)), nRows = 10, alpha = 0.2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // frame [1]: 1.0; [1,2]: (0.8+2)/1.8; [1,2,3]: (0.64+1.6+3)/2.44
    got(1L) shouldBe 1.0
    got(2L) shouldBe (2.8 / 1.8 +- 1e-6)
    got(3L) shouldBe (5.24 / 2.44 +- 1e-6)
    got(4L) shouldBe 7.0 // other user: frames never cross partitions
  }

  test("userEwma truncation: only the last nRows events contribute") {
    val rows = (1 to 12).map(i =>
      (i.toLong, f"2024-01-01 00:$i%02d:00", 1L, "a", if (i <= 2) 1e9 else 1.0))
    val got = Events.userEwma(ev(rows: _*), nRows = 10, alpha = 0.2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // by event 12 the two 1e9 spikes have left the 10-row frame
    got(12L) shouldBe 1.0
    an[IllegalArgumentException] should be thrownBy
      Events.ewmaWeights(0, 0.2)
    an[IllegalArgumentException] should be thrownBy
      Events.ewmaWeights(10, 1.0)
  }

  test("hourlyAnomaliesRobust: MAD flags the spike the mean/std z masks; degenerate MAD null") {
    // type "a": counts 1,1,1,2,2,40 over 6 hours. Classic z: mean 7.83,
    // sd ≈ 15.8 → z(40) ≈ 2.03, barely over 2 (and a SECOND spike
    // would mask it entirely). Robust: med 1.5, |x−med| = .5,.5,.5,.5,.5,38.5
    // → mad .5 → z_r(40) = 0.6745·38.5/.5 = 51.9365 ≫ 3.5.
    val rows = Seq(
      (1L, "2024-01-01 00:10:00", 1L, "a", 1.0),
      (2L, "2024-01-01 01:10:00", 1L, "a", 1.0),
      (3L, "2024-01-01 02:10:00", 1L, "a", 1.0)) ++
      (0 until 2).map(i => (4L + i, "2024-01-01 03:10:00", 1L, "a", 1.0)) ++
      (0 until 2).map(i => (6L + i, "2024-01-01 04:10:00", 1L, "a", 1.0)) ++
      (0 until 40).map(i => (10L + i, "2024-01-01 05:10:00", 1L, "a", 1.0)) ++
      // type "b": over half the hours identical → mad 0 → null score
      Seq((100L, "2024-01-01 00:20:00", 1L, "b", 1.0),
        (101L, "2024-01-01 01:20:00", 1L, "b", 1.0),
        (102L, "2024-01-01 02:20:00", 1L, "b", 1.0))
    val got = Events.hourlyAnomaliesRobust(ev(rows: _*)).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.substring(11, 13)) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))).toMap
    got(("a", "05")) shouldBe ((Some(51.9365), true))
    // med 1.5, mad 0.5: a count-1 hour scores 0.6745·(−0.5)/0.5 = −0.6745
    got(("a", "00")) shouldBe ((Some(-0.6745), false))
    got(("b", "00")) shouldBe ((None, false))
  }

  test("typeCorrelation: perfect +/- correlation, zero-fill on the common grid, degenerate null") {
    // hours 0..2: a = 1, 2, 3; b = 2, 4, 6 (r = 1); c = 3, 2, 1 (r = -1
    // vs a); d fires ONLY in hour 0 (zero-filled elsewhere); e constant
    // (zero variance → null r against everyone)
    val rows = Seq(
      (1L, "2024-01-01 00:10:00", 1L, "a", 1.0),
      (2L, "2024-01-01 01:10:00", 1L, "a", 2.0),
      (3L, "2024-01-01 02:10:00", 1L, "a", 3.0),
      (4L, "2024-01-01 00:10:00", 1L, "b", 2.0),
      (5L, "2024-01-01 01:10:00", 1L, "b", 4.0),
      (6L, "2024-01-01 02:10:00", 1L, "b", 6.0),
      (7L, "2024-01-01 00:10:00", 1L, "c", 3.0),
      (8L, "2024-01-01 01:10:00", 1L, "c", 2.0),
      (9L, "2024-01-01 02:10:00", 1L, "c", 1.0),
      (10L, "2024-01-01 00:10:00", 1L, "d", 5.0),
      (11L, "2024-01-01 00:10:00", 1L, "e", 7.0),
      (12L, "2024-01-01 01:10:00", 1L, "e", 7.0),
      (13L, "2024-01-01 02:10:00", 1L, "e", 7.0))
    val got = Events.typeCorrelation(ev(rows: _*)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    got.size shouldBe 10 // all 5·4/2 pairs present
    got(("a", "b")) shouldBe ((3L, Some(1.0)))
    got(("a", "c")) shouldBe ((3L, Some(-1.0)))
    // d zero-fills hours 1, 2 → series 5, 0, 0 vs a's 1, 2, 3:
    // r = (3·5e12 − 5e6·6e6)/(sqrt(3·25e12 − 25e12)·sqrt(3·14e12 − 36e12))
    //   = −15/(sqrt(50)·sqrt(6)) = −0.866025
    got(("a", "d"))._2 shouldBe Some(-0.866025)
    // e has zero variance → null r in every pair it joins
    got(("a", "e"))._2 shouldBe None
    got(("d", "e"))._2 shouldBe None
  }

  test("userGrowth: first-seen cumulative equals the naive distinct replay") {
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L), (2L, "2024-01-01 11:00:00", 1L),
      (3L, "2024-01-01 12:00:00", 2L), // day 1: u1, u2 new
      (4L, "2024-01-02 09:00:00", 1L), // day 2: active 1, no new
      (5L, "2024-01-03 09:00:00", 3L), (6L, "2024-01-03 10:00:00", 1L))
    val got = Events.userGrowth(ev(rows.map { case (id, ts, u) =>
        (id, ts, u, "t", 1.0) }: _*))
      .collect().map(r => r.getTimestamp(0).toString.take(10) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    got("2024-01-01") shouldBe ((3L, 2L, 2L, 2L))
    got("2024-01-02") shouldBe ((1L, 1L, 0L, 2L))
    got("2024-01-03") shouldBe ((2L, 2L, 1L, 3L))
    // the invariant the first-seen trick must preserve: cum_users(d) =
    // |distinct users with any event ≤ d| — the naive replay
    val byDay = rows.groupBy(_._2.take(10)).view.mapValues(_.map(_._3).toSet)
    val days = byDay.keys.toSeq.sorted
    days.foreach { d =>
      val naive = days.filter(_ <= d).flatMap(byDay(_)).toSet.size.toLong
      got(d)._4 shouldBe naive
    }
  }

  test("growth-state merges are order-independent and equal the batch curve") {
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L), (2L, "2024-01-01 11:00:00", 2L),
      (3L, "2024-01-02 09:00:00", 1L), (4L, "2024-01-02 10:00:00", 3L),
      (5L, "2024-01-03 09:00:00", 2L), (6L, "2024-01-03 10:00:00", 1L))
    val e = ev(rows.map { case (id, ts, u) => (id, ts, u, "t", 1.0) }: _*)
    def curve(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("day")).collect().map(r =>
        (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    val batch = curve(Events.userGrowth(e))
    val slices = Seq(0, 1, 2).map(i =>
      Events.userGrowthState(e.where(col("event_id") % 3 === i)))
    val leftFold = curve(Events.renderGrowth(
      Events.mergeGrowthStates(
        Events.mergeGrowthStates(slices(0), slices(1)), slices(2))))
    val rightFold = curve(Events.renderGrowth(
      Events.mergeGrowthStates(slices(0),
        Events.mergeGrowthStates(slices(1), slices(2)))))
    leftFold shouldBe batch
    rightFold shouldBe batch
  }

  test("growth-state retraction equals the curve on surviving events") {
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L), (2L, "2024-01-01 11:00:00", 2L),
      (3L, "2024-01-02 09:00:00", 1L), (4L, "2024-01-02 10:00:00", 3L),
      (5L, "2024-01-03 09:00:00", 2L), (6L, "2024-01-03 10:00:00", 1L))
    val e = ev(rows.map { case (id, ts, u) => (id, ts, u, "t", 1.0) }: _*)
    def curve(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("day")).collect().map(r =>
        (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    val retracted = Events.renderGrowth(Events.retractGrowthState(
      Events.userGrowthState(e),
      Events.userGrowthState(e.where(col("user_id") === 1))))
    curve(retracted) shouldBe curve(
      Events.userGrowth(e.where(col("user_id") =!= 1)))
    // retracting everything leaves an empty curve, not zero-count rows
    Events.renderGrowth(Events.retractGrowthState(
      Events.userGrowthState(e), Events.userGrowthState(e))).count() shouldBe 0L
  }

  test("dailyTypeTrend: exact unit slope, null for single-day types") {
    val e = ev(
      // type a: 1, 2, 3 events on consecutive days -> slope exactly 1
      (1L, "2024-01-01 10:00:00", 1L, "a", 1.0),
      (2L, "2024-01-02 10:00:00", 1L, "a", 1.0),
      (3L, "2024-01-02 11:00:00", 1L, "a", 1.0),
      (4L, "2024-01-03 10:00:00", 1L, "a", 1.0),
      (5L, "2024-01-03 11:00:00", 1L, "a", 1.0),
      (6L, "2024-01-03 12:00:00", 1L, "a", 1.0),
      // type b: one active day -> zero x variance -> null slope
      (7L, "2024-01-01 10:00:00", 1L, "b", 1.0))
    val got = Events.dailyTypeTrend(e).orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    got shouldBe Array(("a", 3L, 1.0), ("b", 1L, null))
  }

  test("dailyAutocorrelation: hand-computed ACF, gap day counts as zero") {
    var id = 0L
    def day(d: Int, typ: String, k: Int): Seq[(Long, String, Long, String, Double)] =
      (1 to k).map { _ => id += 1; (id, f"2024-01-0$d 10:00:00", 1L, typ, 1.0) }
    val rows =
      // type a: daily counts 1,2,1,2 -> r1=-0.75, r2=0.5, r3=-0.25
      day(1, "a", 1) ++ day(2, "a", 2) ++ day(3, "a", 1) ++ day(4, "a", 2) ++
      // type b: days 1 and 3 only -> dense grid 1,0,1
      day(1, "b", 1) ++ day(3, "b", 1) ++
      // type c: constant 1,1 -> zero variance -> null acf
      day(1, "c", 1) ++ day(2, "c", 1)
    val got = Events.dailyAutocorrelation(ev(rows: _*), maxLag = 3)
      .orderBy(col("event_type"), col("lag")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    got shouldBe Array(
      ("a", 1L, 4L, -0.75), ("a", 2L, 4L, 0.5), ("a", 3L, 4L, -0.25),
      ("b", 1L, 3L, -0.666667), ("b", 2L, 3L, 0.166667),
      ("c", 1L, 2L, null))
  }

  test("sessionEntryExit: entry/exit by total order, bounces, gap split") {
    val e = ev(
      // user 1 session A: a -> b -> c (entry a, exit c)
      (1L, "2024-01-01 10:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 10:05:00", 1L, "b", 1.0),
      (3L, "2024-01-01 10:10:00", 1L, "c", 1.0),
      // user 1 session B after a 31-min gap: single event -> bounce
      (4L, "2024-01-01 10:41:00", 1L, "a", 1.0),
      // user 2: same-ts pair — entry/exit tie-broken by event_id
      (6L, "2024-01-01 10:00:00", 2L, "x", 1.0),
      (5L, "2024-01-01 10:00:00", 2L, "y", 1.0))
    val got = Events.sessionEntryExit(e, gapMinutes = 30).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    got shouldBe Map(
      ("a", "c") -> ((1L, 0L, 0.0)),
      ("a", "a") -> ((1L, 1L, 1.0)),
      ("y", "x") -> ((1L, 0L, 0.0))) // event_id 5 ("y") precedes 6 ("x")
  }

  test("uShapedAttribution: 40/20/40 credit, n=1 and n=2 degenerate splits") {
    val e = ev(
      // user 1: click, view, click, view then purchase(10) — first
      // click 4e6, last view 4e6, middles 1e6 each
      (1L, "2024-01-01 10:00:00", 1L, "click", 0.0),
      (2L, "2024-01-01 11:00:00", 1L, "view", 0.0),
      (3L, "2024-01-01 12:00:00", 1L, "click", 0.0),
      (4L, "2024-01-01 13:00:00", 1L, "view", 0.0),
      (5L, "2024-01-01 14:00:00", 1L, "purchase", 10.0),
      // user 2: single view then purchase(3) — all 3e6 to it
      (6L, "2024-01-01 10:00:00", 2L, "view", 0.0),
      (7L, "2024-01-01 11:00:00", 2L, "purchase", 3.0),
      // user 3: two clicks then purchase(5) — 2.5e6 each
      (8L, "2024-01-01 10:00:00", 3L, "click", 0.0),
      (9L, "2024-01-01 11:00:00", 3L, "click", 0.0),
      (10L, "2024-01-01 12:00:00", 3L, "purchase", 5.0))
    val got = Events.uShapedAttribution(e).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    got shouldBe Map(
      "click" -> ((4L, 2L, 10000000L)), // u1: 4e6 + 1e6; u3: 5e6
      "view" -> ((3L, 2L, 8000000L)))   // u1: 1e6 + 4e6; u2: 3e6
  }

  test("userGini: zero on even traffic, hand-computed 0.25 on a skewed pair") {
    val even = ev(
      (1L, "2024-01-01 10:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 11:00:00", 1L, "a", 1.0),
      (3L, "2024-01-01 10:00:00", 2L, "a", 1.0),
      (4L, "2024-01-01 11:00:00", 2L, "a", 1.0))
    val g0 = Events.userGini(even).collect()(0)
    (g0.getLong(0), g0.getLong(1), g0.getDouble(2)) shouldBe ((2L, 4L, 0.0))
    // counts (1, 3): G = Σ|xi−xj| / (2n²µ) = 4/16 = 0.25
    val skew = ev(
      (1L, "2024-01-01 10:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 10:00:00", 2L, "a", 1.0),
      (3L, "2024-01-01 11:00:00", 2L, "a", 1.0),
      (4L, "2024-01-01 12:00:00", 2L, "a", 1.0))
    Events.userGini(skew).collect()(0).getDouble(2) shouldBe 0.25
  }

  test("gapHistogram: power-of-two second bins per type, per-user chains only") {
    val e = ev(
      // user 1, type a: gaps 1s (bin 0) and 4s (bin 2)
      (1L, "2024-01-01 10:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 10:00:01", 1L, "a", 1.0),
      (3L, "2024-01-01 10:00:05", 1L, "a", 1.0),
      // user 1, type b: same-second double fire -> gap 0 (bin -1)
      (4L, "2024-01-01 10:00:00", 1L, "b", 1.0),
      (5L, "2024-01-01 10:00:00", 1L, "b", 1.0),
      // user 2, type a: single event -> no gap
      (6L, "2024-01-01 10:00:00", 2L, "a", 1.0))
    val got = Events.gapHistogram(e).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    got shouldBe Map(
      ("a", 0L) -> ((1L, 1L)),
      ("a", 2L) -> ((4L, 1L)),
      ("b", -1L) -> ((0L, 1L)))
  }

  test("rollingActiveUsers: dense grid, gap-day WAU carry, window truncation") {
    val e = ev(
      // day 1: users 1, 2; day 2: user 1 twice (distinct!); day 4: user 3
      (1L, "2024-01-01 10:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 11:00:00", 2L, "a", 1.0),
      (3L, "2024-01-02 10:00:00", 1L, "a", 1.0),
      (4L, "2024-01-02 11:00:00", 1L, "b", 1.0),
      (5L, "2024-01-04 10:00:00", 3L, "a", 1.0))
    val got = Events.rollingActiveUsers(e, windowDays = 3)
      .orderBy(col("day")).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    got shouldBe Array(
      ("2024-01-01 00:00:00.0", 2L, 2L, 1.0),
      ("2024-01-02 00:00:00.0", 1L, 2L, 0.5),
      // day 3: nobody active, but days 1-2 carry into the 3-day window
      ("2024-01-03 00:00:00.0", 0L, 2L, 0.0),
      // day 4: user 3 active; user 1's day-2 activity still in window
      ("2024-01-04 00:00:00.0", 1L, 2L, 0.5))
  }

  test("transitionStationary matches a local integer-recurrence replication") {
    // one user stream a a b a b -> transitions a->a:1, a->b:2, b->a:1
    val types = Seq("a", "a", "b", "a", "b")
    val e = ev(types.zipWithIndex.map { case (t, i) =>
      (i + 1L, f"2024-01-01 10:0$i%01d:00", 1L, t, 1.0)
    }: _*)
    // local replication of the floor-div power rounds
    var xa = 1000000L; var xb = 1000000L
    for (_ <- 1 to 20) {
      val na = (xa * 1) / 3 + (xb * 1) / 1
      val nb = (xa * 2) / 3
      xa = na; xb = nb
    }
    val got = Events.transitionStationary(e, iters = 20)
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    got shouldBe Array(("a", xa), ("b", xb))
    // sanity: the shares sit near the true stationary pi = (3/5, 2/5)
    val tot = (xa + xb).toDouble
    (xa / tot) shouldBe 0.6 +- 0.05
  }

  test("userGapRegularity: timer bot cv 0, bursty human cv > 0, same-second null") {
    val got = Events.userGapRegularity(ev(
      // user 1: perfect 10s timer (5 events, 4 equal gaps) → cv = 0
      (1L, "2024-01-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-01-01 10:00:10", 1L, "a", 0.0),
      (3L, "2024-01-01 10:00:20", 1L, "a", 0.0),
      (4L, "2024-01-01 10:00:30", 1L, "a", 0.0),
      (5L, "2024-01-01 10:00:40", 1L, "a", 0.0),
      // user 2: gaps 1, 1, 1, 97 — bursty
      (6L, "2024-01-01 10:00:00", 2L, "a", 0.0),
      (7L, "2024-01-01 10:00:01", 2L, "a", 0.0),
      (8L, "2024-01-01 10:00:02", 2L, "a", 0.0),
      (9L, "2024-01-01 10:00:03", 2L, "a", 0.0),
      (10L, "2024-01-01 10:01:40", 2L, "a", 0.0),
      // user 3: all five events in one second → Σg = 0 → null cv
      (11L, "2024-01-01 10:00:00", 3L, "a", 0.0),
      (12L, "2024-01-01 10:00:00", 3L, "a", 0.0),
      (13L, "2024-01-01 10:00:00", 3L, "a", 0.0),
      (14L, "2024-01-01 10:00:00", 3L, "a", 0.0),
      (15L, "2024-01-01 10:00:00", 3L, "a", 0.0),
      // user 4: below minEvents → absent
      (16L, "2024-01-01 10:00:00", 4L, "a", 0.0),
      (17L, "2024-01-01 10:00:09", 4L, "a", 0.0)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
    got.keySet shouldBe Set(1L, 2L, 3L)
    got(1L) shouldBe ((5L, 4L, 10.0, 0.0))
    // user 2: S = 100, Q = 3 + 9409 = 9412; cv = √((4·9412 − 10000)/10000)
    val cv2 = BigDecimal(math.sqrt((4.0 * 9412 - 10000) / 10000))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got(2L) shouldBe ((5L, 4L, 25.0, cv2))
    got(3L) shouldBe ((5L, 4L, 0.0, null))
    an[IllegalArgumentException] should be thrownBy
      Events.userGapRegularity(ev(), minEvents = 1)
  }

  test("timeDecayAttribution: half-life step weights, hand-computed credits") {
    // conversion value 10.0 (1e7 micros) at 12:00 on Jan 3; touches:
    //   click  Jan 3 11:00 — age  1h → k=0, w = 1_000_000
    //   view   Jan 2 10:00 — age 26h → k=1, w =   500_000
    //   click  Jan 1 10:00 — age 50h → k=2, w =   250_000
    //   view   Dec 20      — outside the 7-day lookback, ignored
    // Σw = 1_750_000; credits = ⌊1e7·w/Σw⌋ → 5_714_285 / 2_857_142 /
    // 1_428_571
    val got = Events.timeDecayAttribution(ev(
      (1L, "2024-01-03 11:00:00", 1L, "click", 0.0),
      (2L, "2024-01-02 10:00:00", 1L, "view", 0.0),
      (3L, "2024-01-01 10:00:00", 1L, "click", 0.0),
      (4L, "2023-12-20 10:00:00", 1L, "view", 0.0),
      (5L, "2024-01-03 12:00:00", 1L, "purchase", 10.0)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    got shouldBe Map(
      "click" -> ((2L, 1L, 5714285L + 1428571L)),
      "view" -> ((1L, 1L, 2857142L)))
    an[IllegalArgumentException] should be thrownBy
      Events.timeDecayAttribution(ev(), halflifeHours = 0)
  }

  test("linearAttribution: floor-division credit within the lookback only") {
    val e = ev(
      // user 1: two touches then a 10.000001-value purchase
      (1L, "2024-01-01 10:00:00", 1L, "click", 0.0),
      (2L, "2024-01-02 09:00:00", 1L, "view", 0.0),
      (3L, "2024-01-03 12:00:00", 1L, "purchase", 10.000001),
      // user 2: touch OUTSIDE the 7-day lookback, purchase unattributed
      (4L, "2024-01-01 08:00:00", 2L, "click", 0.0),
      (5L, "2024-01-09 09:00:00", 2L, "purchase", 5.0),
      // user 3: touch AFTER the purchase never counts
      (6L, "2024-01-05 10:00:00", 3L, "purchase", 7.0),
      (7L, "2024-01-05 11:00:00", 3L, "view", 0.0))
    val got = Events.linearAttribution(e)
      .orderBy(col("touch_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // purchase 3: 10000001 micros over 2 touches -> 5000000 each,
    // 1 micro remainder unattributed by contract
    got shouldBe Array(
      ("click", 1L, 1L, 5000000L),
      ("view", 1L, 1L, 5000000L))
    // hotTheta outside (0,1) opts out of the eager radar (plain lazy
    // equi-join) — the guard decision must be answer-invisible
    for (theta <- Seq(0.0, 1.0)) {
      Events.linearAttribution(e, hotTheta = theta)
        .orderBy(col("touch_type")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))) shouldBe got
    }
  }

  test("topUserShare: exact top-k mass, ties to the smaller user id") {
    val rows = Seq.tabulate(5)(i => (i + 1L, f"2024-01-01 10:0${i}:00", 7L)) ++
      Seq((10L, "2024-01-01 11:00:00", 8L), (11L, "2024-01-01 11:01:00", 8L),
        (12L, "2024-01-01 11:02:00", 9L))
    val got = Events.topUserShare(ev(rows.map { case (id, ts, u) =>
        (id, ts, u, "t", 1.0) }: _*), k = 2).head()
    got.getAs[Long]("n_events") shouldBe 8L
    got.getAs[Long]("n_users") shouldBe 3L
    got.getAs[Long]("topk_events") shouldBe 7L // u7 (5) + u8 (2)
    got.getAs[Double]("topk_share") shouldBe 0.875
    an[IllegalArgumentException] should be thrownBy
      Events.topUserShare(ev(), k = 0)
  }

  test("cusumChangepoints matches the literal Page recursion; degenerates never alarm") {
    // type m: six steady hours then a sustained +3 step — pointwise
    // each hour is in-band, the cumulative sum is not
    val vals = Seq(10.0, 11.0, 10.0, 9.0, 10.0, 10.0,
      13.0, 13.0, 12.0, 13.0, 14.0, 13.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i + 1L, f"2024-01-01 ${i}%02d:30:00", 1L, "m", v)
    } ++ Seq(
      (100L, "2024-01-01 00:05:00", 1L, "two", 5.0),
      (101L, "2024-01-01 01:05:00", 1L, "two", 6.0), // n=2 → degenerate
      (102L, "2024-01-01 00:05:00", 1L, "flat", 7.0),
      (103L, "2024-01-01 01:05:00", 1L, "flat", 7.0),
      (104L, "2024-01-01 02:05:00", 1L, "flat", 7.0)) // zero variance
    val got = Events.cusumChangepoints(ev(rows: _*), kappaSigmas = 0.5,
        hSigmas = 2.0).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          r.getBoolean(5), Option(r.getString(6))))).toMap

    // independent local replication: exact moments → σ, μ, κ, h, then
    // the literal two-sided recursion S = max(0, S + dev)
    val vm = vals.map(v => math.round(v * 1e6))
    val n = vm.size
    val s = vm.map(BigInt(_)).sum
    val q = vm.map(v => BigInt(v) * BigInt(v)).sum
    val sigma = math.sqrt((BigInt(n) * q - s * s).toDouble / (n * (n - 1)))
    val mu = math.floor(s.toDouble / n).toLong
    val kappa = math.floor(sigma * 0.5).toLong
    val h = math.floor(sigma * 2.0).toLong
    var sp = 0L; var sn = 0L
    vals.indices.foreach { i =>
      sp = math.max(0L, sp + (vm(i) - mu - kappa))
      sn = math.max(0L, sn + (mu - vm(i) - kappa))
      val key = ("m", f"2024-01-01 ${i}%02d:00:00.0")
      withClue(s"hour $i:") {
        got(key) shouldBe ((Some(sp), Some(sn),
          sp > h || sn > h,
          if (sp > h && sn > h) Some("both")
          else if (sp > h) Some("up")
          else if (sn > h) Some("down") else None))
      }
    }
    // the step trips the upper CUSUM late; the early low run, at 2σ,
    // trips the lower one — both sides exercised
    got.collect { case (("m", _), (_, _, alarm, side)) if alarm => side }
      .toSet shouldBe Set(Some("up"), Some("down"))
    // degenerate series: null statistics, never alarm
    got(("two", "2024-01-01 00:00:00.0")) shouldBe ((None, None, false, None))
    got(("flat", "2024-01-01 02:00:00.0")) shouldBe ((None, None, false, None))
    an[IllegalArgumentException] should be thrownBy
      Events.cusumChangepoints(ev(rows: _*), kappaSigmas = -0.1)
    an[IllegalArgumentException] should be thrownBy
      Events.cusumChangepoints(ev(rows: _*), hSigmas = 0.0)
  }
}
