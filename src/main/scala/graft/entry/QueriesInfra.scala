package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.multimodal.Multimodal
import graft.operators.{Clustering, Dedup, Events, HotKeys, Layout, Rank, Search, Similarity, TfIdf}
import graft.entry.EntryShared._

/** Per-domain slice of the driver-contract query/oracle maps:
  * infrastructure - hot keys, skew/bloom joins, Z-order, upsert/CDC/SCD2, compaction. Entry text and oracle SQL are byte-identical to the
  * pre-split SparkEntry (the round-10 module split). */
private[graft] object QueriesInfra {
  val queries: scala.collection.immutable.ListMap[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(

    // Bloom-pruned join: nation-0 customers' orders — the bloom screen
    // drops ~24/25 of the fact scan before the shuffle; the inner join
    // removes false positives, so the oracle is the plain join verbatim
    // (the q81 answer-invisible contract).
    "q179_bloom_join" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val c = tbl(s, dir, "customer").where(col("c_nationkey") === 0)
        .select(col("c_custkey"), col("c_name"))
      graft.operators.HotKeys.bloomJoin(o, "o_custkey", c, "c_custkey")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          expr("CAST(round(o_totalprice * 1000000) AS BIGINT)")
            .as("price_micros"))
        .orderBy(col("o_orderkey"))
    }),


    // ── Z-order data layout (Layout.scala): Morton-interleaved
    //    (user, time) clustering for min/max file skipping ──────────────
    "q83_zorder_layout" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"),
        col("user_id").as("x"),
        expr("unix_micros(ts) div 1000000").as("y"))
      Layout.withZCells(e, "x", "y")
        .select(col("event_id"), col("zval"), col("cell"))
        .orderBy(col("event_id"))
    }),


    // Skipping contract: per-cell footer boxes for the z-layout vs the
    // insert-ordered strawman, scan-estimated against one SF-agnostic
    // box (x in the 25–45 % band, y the middle tercile — bounds derived
    // from min/max so the same SQL holds at every SF). LayoutSpec
    // asserts the zorder row scans strictly fewer cells AND rows.
    "q83b_zorder_skipping" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"),
        col("user_id").as("x"),
        expr("unix_micros(ts) div 1000000").as("y"))
      def fracPoint(mn: Column, mx: Column, num: Int, den: Int): Column =
        (mn + floor((mx - mn).cast("double") * num / den).cast("long"))
      val box = e.agg(
          min(col("x")).as("x_mn"), max(col("x")).as("x_mx"),
          min(col("y")).as("y_mn"), max(col("y")).as("y_mx"))
        .select(
          fracPoint(col("x_mn"), col("x_mx"), 1, 4).as("qx_lo"),
          fracPoint(col("x_mn"), col("x_mx"), 9, 20).as("qx_hi"),
          fracPoint(col("y_mn"), col("y_mx"), 1, 3).as("qy_lo"),
          fracPoint(col("y_mn"), col("y_mx"), 2, 3).as("qy_hi"))
      def est(stats: DataFrame, tag: String): DataFrame =
        Layout.scanEstimate(stats.crossJoin(broadcast(box)),
            col("qx_lo"), col("qx_hi"), col("qy_lo"), col("qy_hi"))
          .withColumn("layout", lit(tag))
      est(Layout.cellStats(Layout.withZCells(e, "x", "y"), "x", "y"),
          "zorder")
        .unionByName(est(
          Layout.cellStats(Layout.linearCells(e, "event_id"), "x", "y"),
          "linear"))
        .select(col("layout"), col("n_cells"), col("cells_scanned"),
          col("rows_scanned"))
        .orderBy(col("layout"))
    }),


    // Compaction plan: next-fit-decreasing target-size binning of
    // files (docs as file metadata) per partition — the OPTIMIZE
    // rewrite-task list, rolled up per bin.
    "q192_compaction_plan" -> ((s, dir) =>
      graft.operators.Layout.compactionPlan(
          tbl(s, dir, "documents")
            .select(col("source"), col("doc_id"), col("n_chars")),
          Seq("source"), "doc_id", "n_chars", targetBytes = 2048L)
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("bytes_total"))
        .orderBy(col("source"), col("bin"))),


    // CDC replay with tombstones: latest writer per user wins; users
    // whose LAST event is an error are tombstoned out entirely.
    "q185_cdc_apply" -> ((s, dir) =>
      graft.operators.Merge.cdcApply(
          events(s, dir).select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"),
            expr("CAST(round(value * 1000000) AS BIGINT)").as("value_micros")),
          Seq("user_id"), Seq("ts", "event_id"),
          col("event_type") === "error")
        .select(col("user_id"), col("event_id"),
          col("event_type").as("last_type"), col("value_micros"))
        .orderBy(col("user_id"))),


    // SCD Type-2 historization: per-user version chain with half-open
    // validity intervals cut on ts — q185's point-in-time complement.
    "q186_scd2_history" -> ((s, dir) =>
      graft.operators.Merge.scd2Historize(
          events(s, dir).select(col("user_id"), col("ts"), col("event_id"),
            col("event_type")),
          Seq("user_id"), Seq("ts", "event_id"), "ts")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))),


    // Hot-key (θ-heavy-hitter) detection on the event stream's user_id
    // — the skew radar that feeds salting (q5c) / AQE skew hints /
    // hot-bucket bounds. Exact tier: one key shuffle + broadcast total.
    "q78_hot_keys" -> ((s, dir) =>
      HotKeys.hotKeys(events(s, dir), "user_id", theta = 0.008)),


    // Count-min-screened twin — SAME oracle SQL as q78: the sketch only
    // over-counts, so the codegen'd estimate filter (which rides the
    // scan) keeps every true hot key, and the exact confirm agg drops
    // the false positives — identical answer for any sketch size. What
    // the screen changes at 100 TB is the confirm shuffle: it sees only
    // candidate-key rows, while the sketch stays depth×width counters
    // regardless of key cardinality. Screen effectiveness is pinned by
    // hotKeyScreenStats in HotKeysSpec.
    "q78b_hot_keys_sketched" -> ((s, dir) =>
      HotKeys.hotKeysSketched(events(s, dir), "user_id", theta = 0.008)),


    // Skew-aware join: events ⋈ per-user first-seen profile, hot users
    // (the q78 radar, ≤ 1/θ by construction) taking the salted path,
    // cold users the plain one — the oracle is the PLAIN join, which is
    // the whole contract: salting must be pure plan surgery, invisible
    // in the answer. Salted-exchange shape pinned under no-broadcast in
    // HotKeysSpec (the q5c recipe).
    "q81_skew_join" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val prof = e.groupBy(col("user_id")).agg(min(col("ts")).as("first_seen"))
      HotKeys.skewJoin(e, prof, "user_id", theta = 0.008)
        .select(col("event_id"), col("user_id"),
          expr("(unix_micros(ts) - unix_micros(first_seen)) div 1000000")
            .as("secs_since_first"))
        .orderBy(col("event_id"))
    }),


    // Latest-wins keyed UPSERT (MERGE INTO semantics): the per-(user,
    // type) state table built from pre-cutoff events, then a delta of
    // the last days merged in — out-of-order delta rows are no-ops,
    // absent keys insert. The delta-bounded semi/anti split is provably
    // invisible: the oracle is ONE flat latest-per-key window over all
    // events (the q81 plain-SQL pattern).
    "q119_upsert_latest" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val cut = lit("2024-01-25 00:00:00").cast("timestamp")
      val keys = Seq("user_id", "event_type")
      val ord = Seq("ts", "event_id")
      val hist = graft.operators.Merge.upsertLatest(
        e.where(lit(false)), e.where(col("ts") < cut), keys, ord)
      graft.operators.Merge.upsertLatest(
          hist, e.where(col("ts") >= cut), keys, ord)
        .orderBy(col("user_id"), col("event_type"))
    }),


    // SNAPSHOT DIFF change feed: two corpus snapshots derived from
    // documents by independent md5 rules (A drops 10 %, B drops a
    // different 10 % and mutates 5 % by reversal), diffed to row-level
    // added/removed/changed verdicts — fingerprints join, payloads
    // never shuffle.
    "q120_snapshot_diff" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      def bkt(prefix: String) = conv(substring(
          md5(concat(lit(prefix), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long") % 1000000L
      val a = d.where(bkt("snapA:") < 900000L)
        .select(col("doc_id"), col("text"))
      val b = d.where(bkt("snapB:") < 900000L)
        .select(col("doc_id"),
          when(bkt("mut:") < 50000L, reverse(col("text")))
            .otherwise(col("text")).as("text"))
      graft.operators.Merge.snapshotDiff(a, b, "doc_id", "text")
        .where(col("change") =!= "unchanged")
        .select(col("key").as("doc_id"), col("change"))
        .orderBy(col("doc_id"))
    })
  )

  val sql: Map[String, String] = Map(

    // Bloom-join mirror: the plain join — the sketch must be invisible.
    "q179_bloom_join" ->
      """SELECT o_orderkey, o_custkey, c_name,
        |       CAST(round(o_totalprice * 1000000) AS BIGINT) AS price_micros
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_nationkey = 0
        |ORDER BY o_orderkey""".stripMargin,


    // Z-order layout: the SQL is generated from Layout's constants
    // (bits, cell shift, the unrolled Morton interleave) — one source
    // of truth for engine and oracle.
    "q83_zorder_layout" -> zorderLayoutSql,

    "q83b_zorder_skipping" -> zorderSkippingSql,


    // Compaction mirror: one preceding-rows window sum, floor-divided
    // into bins, rolled up.
    "q192_compaction_plan" ->
      """WITH f AS (
        |  SELECT source, doc_id, n_chars,
        |         coalesce(sum(n_chars) OVER (PARTITION BY source
        |           ORDER BY n_chars DESC, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) AS cb
        |  FROM documents)
        |SELECT source, (cb // 2048)::BIGINT AS bin,
        |       count(*)::BIGINT AS n_files,
        |       sum(n_chars)::BIGINT AS bytes_total
        |FROM f GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,


    // CDC mirror: one flat latest-per-key window, tombstones filtered
    // after winner selection.
    "q185_cdc_apply" ->
      """WITH r AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(round(value * 1000000) AS BIGINT) AS value_micros,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, event_type AS last_type, value_micros
        |FROM r WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,


    // SCD2 mirror: one lead() per key under the same total order.
    "q186_scd2_history" ->
      """SELECT user_id, event_id, event_type,
        |       ts AS valid_from,
        |       lead(ts) OVER w AS valid_to,
        |       (lead(ts) OVER w IS NULL) AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, valid_from, event_id""".stripMargin,


    "q78_hot_keys" -> hotKeysSql,


    // Same oracle as q78 — the count-min screen is answer-invariant
    // (over-count-only sketch + exact confirm), which is the contract.
    "q78b_hot_keys_sketched" -> hotKeysSql,


    // The PLAIN join — q81's engine runs the salted/cold split; equality
    // to this is the skew-surgery-is-invisible contract.
    "q81_skew_join" ->
      """WITH prof AS (SELECT user_id, min(ts) AS first_seen FROM events GROUP BY 1)
        |SELECT e.event_id, e.user_id,
        |       ((epoch_us(e.ts) - epoch_us(p.first_seen)) // 1000000)::BIGINT
        |         AS secs_since_first
        |FROM events e JOIN prof p ON e.user_id = p.user_id
        |ORDER BY e.event_id""".stripMargin,


    // Latest-wins upsert: the engine's delta-bounded semi/anti split
    // must equal ONE flat latest-per-key window over all events.
    "q119_upsert_latest" ->
      """SELECT event_id, ts, user_id, event_type, value FROM (
        |  SELECT event_id, ts, user_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,


    // Snapshot diff: both engines derive snapshots A and B from
    // documents via the same md5 permille rules, then full-outer join
    // on doc_id comparing payloads.
    "q120_snapshot_diff" ->
      s"""WITH a AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE (${duckMd5Bucket("'snapA:' || doc_id")}) < 900000),
         |b AS (
         |  SELECT doc_id,
         |         CASE WHEN (${duckMd5Bucket("'mut:' || doc_id")}) < 50000
         |              THEN reverse(text) ELSE text END AS text
         |  FROM documents
         |  WHERE (${duckMd5Bucket("'snapB:' || doc_id")}) < 900000)
         |SELECT doc_id, change FROM (
         |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |         CASE WHEN a.doc_id IS NULL THEN 'added'
         |              WHEN b.doc_id IS NULL THEN 'removed'
         |              WHEN a.text IS DISTINCT FROM b.text THEN 'changed'
         |              ELSE 'unchanged' END AS change
         |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
         |WHERE change <> 'unchanged'
         |ORDER BY doc_id""".stripMargin
  )
}
