package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Merge

class MergeSpec extends SparkSpec {

  private def st(rows: (Long, String, Long, String, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, ts, uid, typ, v) =>
      (id, Timestamp.valueOf(ts), uid, typ, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  private val keys = Seq("user_id", "event_type")
  private val ord = Seq("ts", "event_id")

  test("upsertLatest: insert, newer-wins update, out-of-order no-op") {
    val hist = st(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0),
      (2L, "2024-01-01 10:00:00", 2L, "click", 2.0))
    val delta = st(
      // newer than user 1's state → replaces it
      (10L, "2024-01-02 09:00:00", 1L, "click", 10.0),
      // OLDER than user 2's state → must be a no-op
      (11L, "2023-12-31 09:00:00", 2L, "click", 11.0),
      // key absent from history → inserts
      (12L, "2024-01-02 09:00:00", 3L, "view", 12.0))
    val got = Merge.upsertLatest(hist, delta, keys, ord)
      .select("event_id", "user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    got shouldBe Set((10L, 1L, "click"), (2L, 2L, "click"), (12L, 3L, "view"))
  }

  test("upsertLatest: many delta rows per key — single max-ord survivor") {
    val delta = st(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0),
      (2L, "2024-01-01 11:00:00", 1L, "click", 2.0),
      // same ts as event 2: event_id breaks the tie, 3 wins
      (3L, "2024-01-01 11:00:00", 1L, "click", 3.0))
    val got = Merge.upsertLatest(st().where(lit(false)), delta, keys, ord)
      .collect().map(_.getLong(0)).toSeq
    got shouldBe Seq(3L)
  }

  test("upsertLatest ≡ flat latest-per-key window over history ∪ delta") {
    val all = st((1L to 40L).map { i =>
      (i, f"2024-01-${(i % 5) + 1}%02d 0${i % 9}:00:00", i % 4, if (i % 2 == 0) "a" else "b", i.toDouble)
    }: _*)
    val cut = lit("2024-01-04 00:00:00").cast("timestamp")
    val hist = Merge.upsertLatest(
      all.where(lit(false)), all.where(col("ts") < cut), keys, ord)
    val got = Merge.upsertLatest(hist, all.where(col("ts") >= cut), keys, ord)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("ts").desc, col("event_id").desc)
    val flat = all.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
    rowsOf(got) shouldBe rowsOf(flat)
  }

  test("upsertLatest rejects empty key or order lists") {
    val e = st((1L, "2024-01-01 10:00:00", 1L, "a", 1.0))
    an[IllegalArgumentException] should be thrownBy
      Merge.upsertLatest(e, e, Nil, ord)
    an[IllegalArgumentException] should be thrownBy
      Merge.upsertLatest(e, e, keys, Nil)
  }

  private def snap(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("snapshotDiff classifies added / removed / changed / unchanged") {
    val a = snap(1L -> "one", 2L -> "two", 3L -> "three")
    val b = snap(2L -> "two", 3L -> "trois", 4L -> "four")
    val got = Merge.snapshotDiff(a, b, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    got shouldBe Set(
      (1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added"))
  }

  test("snapshotDiff of identical snapshots is all-unchanged") {
    val a = snap(1L -> "x", 2L -> "y")
    val got = Merge.snapshotDiff(a, a, "doc_id", "text")
      .where(col("change") =!= "unchanged")
    got.count() shouldBe 0L
  }

  test("cdcApply: latest wins, tombstone drops key, superseded delete is no-op") {
    val log = st(
      // user 1: write, delete, WRITE — the later write must survive
      // (naive filter-deletes-first would also keep the first write)
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0),
      (2L, "2024-01-01 11:00:00", 1L, "error", 0.0),
      (3L, "2024-01-01 12:00:00", 1L, "view", 3.0),
      // user 2: write then DELETE last — key absent from the state
      (4L, "2024-01-01 10:00:00", 2L, "click", 4.0),
      (5L, "2024-01-01 11:00:00", 2L, "error", 0.0),
      // user 3: same-ts tie broken by event_id
      (6L, "2024-01-01 10:00:00", 3L, "click", 6.0),
      (7L, "2024-01-01 10:00:00", 3L, "view", 7.0))
    val got = Merge.cdcApply(log, Seq("user_id"), Seq("ts", "event_id"),
        col("event_type") === "error")
      .select("user_id", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    got shouldBe Set((1L, 3L, "view"), (3L, 7L, "view"))
  }

  test("scd2Historize: chained half-open intervals, open current version") {
    val log = st(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0),
      (2L, "2024-01-02 10:00:00", 1L, "view", 2.0),
      (3L, "2024-01-03 10:00:00", 1L, "click", 3.0),
      (4L, "2024-01-01 10:00:00", 2L, "view", 4.0))
    val got = Merge.scd2Historize(log, Seq("user_id"), Seq("ts", "event_id"), "ts")
      .select("user_id", "event_id", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toString,
        if (r.isNullAt(3)) null else r.getTimestamp(3).toString,
        r.getBoolean(4))).toSet
    got shouldBe Set(
      (1L, 1L, "2024-01-01 10:00:00.0", "2024-01-02 10:00:00.0", false),
      (1L, 2L, "2024-01-02 10:00:00.0", "2024-01-03 10:00:00.0", false),
      (1L, 3L, "2024-01-03 10:00:00.0", null, true),
      (2L, 4L, "2024-01-01 10:00:00.0", null, true))
  }
}
