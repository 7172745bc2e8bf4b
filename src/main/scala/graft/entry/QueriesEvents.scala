package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.multimodal.Multimodal
import graft.operators.{Clustering, Dedup, Events, HotKeys, Layout, Rank, Search, Similarity, TfIdf}
import graft.entry.EntryShared._

/** Per-domain slice of the driver-contract query/oracle maps:
  * the events battery - sessions, funnels, time series, attribution, anomaly and growth accounting. Entry text and oracle SQL are byte-identical to the
  * pre-split SparkEntry (the round-10 module split). */
private[graft] object QueriesEvents {
  val queries: scala.collection.immutable.ListMap[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(

    // Per-type daily trend: exact-moment OLS slope of daily counts
    // (the q160 recipe on the events axis).
    "q184_daily_trend" -> ((s, dir) =>
      graft.operators.Events.dailyTypeTrend(events(s, dir))
        .orderBy(col("event_type"))),


    // Daily-count autocorrelation at lags 1..7 on the dense day grid:
    // exact n²-scaled integer moments, one round-6 division.
    "q187_daily_acf" -> ((s, dir) =>
      graft.operators.Events.dailyAutocorrelation(events(s, dir), maxLag = 7)
        .orderBy(col("event_type"), col("lag"))),


    // Rolling DAU/WAU/stickiness on the dense day grid — exact
    // distinct users, window via explicit explode.
    "q195_active_users" -> ((s, dir) =>
      graft.operators.Events.rollingActiveUsers(events(s, dir), windowDays = 7)
        .orderBy(col("day"))),


    // Per-user activity Gini: the rank-formula concentration summary,
    // exact integer moments off the two-stage global rank.
    "q197_user_gini" -> ((s, dir) =>
      graft.operators.Events.userGini(events(s, dir))),


    // Inter-arrival gap histogram: power-of-two second bins per type,
    // per-(user, type) chains only — never a global per-type sort.
    "q198_gap_histogram" -> ((s, dir) =>
      graft.operators.Events.gapHistogram(events(s, dir))
        .orderBy(col("event_type"), col("bin"))),


    // Per-user gap regularity (the bot radar): CV of inter-event gaps
    // as ONE √ of an exact integer ratio — scripted timers → cv ≈ 0.
    "q215_gap_regularity" -> ((s, dir) =>
      graft.operators.Events.userGapRegularity(events(s, dir), minEvents = 5)
        .orderBy(col("user_id"))),


    // Winsorized per-type value sums: values clipped to the corpus
    // [p01, p99] band (1-row percentile broadcast), then aggregated.
    "q66_events_winsorize" -> ((s, dir) =>
      Events.winsorizeValues(events(s, dir))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value_w")), 6).as("value_w_sum"))
        .orderBy(col("event_type"))),


    // ── Event analytics (batch twins of the streaming ops) ──────────────

    "q22_events_hourly" -> ((s, dir) =>
      Events.hourlyTypeStats(events(s, dir))
        .orderBy(col("hour_start"), col("event_type"))),


    // Sliding 1h windows advancing 15 min: each event lands in 4
    // overlapping windows (map-side expansion, same one-shuffle agg).
    "q60_events_sliding" -> ((s, dir) =>
      Events.slidingTypeStats(events(s, dir))
        .orderBy(col("window_start"), col("event_type"))),


    "q23_events_json" -> ((s, dir) =>
      Events.propsKeyStats(events(s, dir))
        .orderBy(col("event_type"))),


    "q24_events_sessions" -> ((s, dir) =>
      Events.sessionize(events(s, dir), gapMinutes = 30)
        .orderBy(col("user_id"), col("session_seq"))),


    // Session entry/exit matrix: landing/exit-type counts with bounce
    // rate — q24's boundaries under the total (ts, event_id) order.
    "q200_session_entry_exit" -> ((s, dir) =>
      graft.operators.Events.sessionEntryExit(events(s, dir), gapMinutes = 30)
        .orderBy(col("entry_type"), col("exit_type"))),


    // Exact per-type value quantiles (quantile_cont semantics).
    "q43_events_quantiles" -> ((s, dir) =>
      Events.valueQuantiles(events(s, dir))
        .orderBy(col("event_type"))),


    // Sketch contract for the approx tier (the 100 TB path: mergeable
    // percentile_approx, map-side partials, bounded memory) — approx
    // must land within 2 % + 0.1 of exact per percentile; the q31b
    // recipe applied to quantiles.
    "q43b_events_quantiles_approx" -> ((s, dir) => {
      val e = events(s, dir)
      val ex = Events.valueQuantiles(e)
      val ap = Events.valueQuantiles(e, exact = false)
        .select(col("event_type"), col("p50").as("a50"),
          col("p90").as("a90"), col("p99").as("a99"))
      // The approx tier is graded against the DISCRETE exact quantile —
      // the definition percentile_approx actually implements (it returns
      // an order statistic; its documented guarantee is a RANK bound).
      // Grading it against the INTERPOLATED exact (the report columns,
      // which stay cont/oracle-pinned) made the contract wrong at small
      // n, where the p99 interpolation gap (|disc − cont|, e.g. 56.6 for
      // sf0.001's view type) dwarfs any sketch error and the flags went
      // false with a PERFECT sketch — an inherited r12 latent failure
      // surfaced by the first sf0.001 verify this round. At n ≤ accuracy
      // approx ≡ disc exactly; past it the rank-error bound keeps
      // |approx − disc| inside the same 2 % + 0.1 envelope (measured
      // sf0.1: ≤ 0.52 vs bound ≥ 4.3).
      val disc = e.groupBy(col("event_type")).agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("d50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("d90"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").as("d99"))
      def ok(a: String, d: String, x: String) =
        (abs(col(a) - col(d)) <= abs(col(d)) * 0.02 + 0.1).as(s"${x}_ok")
      ex.join(broadcast(ap), Seq("event_type"))
        .join(broadcast(disc), Seq("event_type"))
        .select(col("event_type"), col("p50"), col("p90"), col("p99"),
          ok("a50", "d50", "p50"), ok("a90", "d90", "p90"),
          ok("a99", "d99", "p99"))
        .orderBy(col("event_type"))
    }),


    // ROLLUP grouping sets: cell + per-type subtotal + grand total, 1 pass;
    // grouping() masks make subtotal rows collision-proof vs real values.
    "q29_events_rollup" -> ((s, dir) =>
      Events.typeHourRollup(events(s, dir))
        .orderBy(col("g_type"), col("event_type"), col("g_hour"), col("hour_start"))),


    // ROWS-frame window: per-user moving average of the last 10 events.
    "q30_events_moving_avg" -> ((s, dir) =>
      Events.userMovingAvg(events(s, dir), nRows = 10)
        .orderBy(col("user_id"), col("ts"), col("event_id"))),


    // As-of join: each event ← its user's latest COMPLETED-hour snapshot
    // (snapshot of hour H becomes available at H+1h); -1 = no snapshot yet.
    "q32_events_asof_snapshot" -> ((s, dir) => {
      val e = events(s, dir)
      val snap = e
        .groupBy(col("user_id"),
          (date_trunc("hour", col("ts")) + expr("INTERVAL 1 HOUR")).as("ts"))
        .agg(round(sum(col("value")), 6).as("hour_sum"))
      graft.operators.AsOfJoin
        .asOfJoin(e.select("event_id", "user_id", "ts"), snap,
          keys = Seq("user_id"), tsCol = "ts", valCol = "hour_sum",
          as = "asof_hour_sum")
        .withColumn("asof_hour_sum", coalesce(col("asof_hour_sum"), lit(-1.0)))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),


    // As-of with a STALENESS bound: matches older than 30 min null out
    // (-1 sentinel) — the feature-store "don't join an ancient
    // snapshot" guard; same one-shuffle union+window plan.
    "q62_events_asof_tolerance" -> ((s, dir) => {
      val e = events(s, dir)
      val snap = e
        .groupBy(col("user_id"),
          (date_trunc("hour", col("ts")) + expr("INTERVAL 1 HOUR")).as("ts"))
        .agg(round(sum(col("value")), 6).as("hour_sum"))
      graft.operators.AsOfJoin
        .asOfJoin(e.select("event_id", "user_id", "ts"), snap,
          keys = Seq("user_id"), tsCol = "ts", valCol = "hour_sum",
          as = "asof_hour_sum", toleranceMs = Some(30L * 60 * 1000))
        .withColumn("asof_hour_sum", coalesce(col("asof_hour_sum"), lit(-1.0)))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),


    // Funnel / time-to-conversion: each click forward-as-of-joined to the
    // user's next purchase (−1 = never converts).
    "q41_events_funnel" -> ((s, dir) => {
      val e = events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts")).distinct()
        .withColumn("p_ts", col("ts"))
      graft.operators.AsOfJoin
        .asOfJoin(clicks, purchases, Seq("user_id"), "ts", "p_ts",
          as = "next_purchase_ts", forward = true)
        .withColumn("secs_to_purchase",
          coalesce(
            expr("(unix_micros(next_purchase_ts) - unix_micros(ts)) div 1000000"),
            lit(-1L)))
        .select(col("event_id"), col("user_id"), col("ts"), col("secs_to_purchase"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),


    // Cohort retention triangle over purchase activity.
    "q76_events_retention" -> ((s, dir) =>
      Events.cohortRetention(events(s, dir), eventType = "purchase")
        .orderBy(col("cohort"), col("day_offset"))),


    // OHLC DOWNSAMPLE: per (event_type, hour) open/high/low/close of
    // value + count/sum — raw events collapsed to one row per series
    // per bucket; open/close picked at the total (ts, event_id) order.
    "q113_events_ohlc" -> ((s, dir) =>
      graft.operators.Events.downsampleOhlc(events(s, dir))
        .orderBy(col("event_type"), col("hour_start"))),


    // TWAP downsample: time-weighted hourly mean via exact integer
    // arithmetic (micro-quantized value, microsecond hold durations,
    // decimal product sums, floor division) — engine-exact with no
    // float-sum order sensitivity. The engine's boundary-stitched
    // plan (per-(type,hour) lead + tiny hour-frame successor) equals
    // the oracle's flat per-type lead by construction.
    "q114_events_twap" -> ((s, dir) =>
      graft.operators.Events.downsampleTwap(events(s, dir))
        .orderBy(col("event_type"), col("hour_start"))),


    // Per-user EWMA over the last 10 events (α = 0.2): the
    // recency-weighted twin of q30's flat moving average. Weight
    // literals are generated once and shared with the oracle SQL, so
    // no libm pow parity dependence.
    "q149_events_ewma" -> ((s, dir) =>
      Events.userEwma(events(s, dir), nRows = 10, alpha = 0.2)
        .orderBy(col("user_id"), col("ts"), col("event_id"))),


    // Growth curve: DAU + cumulative reach via first-seen — the
    // growing-window COUNT DISTINCT replaced by one per-user min and
    // a days-bounded running sum.
    "q175_user_growth" -> ((s, dir) =>
      graft.operators.Events.userGrowth(events(s, dir))
        .orderBy(col("day"))),


    // Incremental growth: per-slice mergeable states (even/odd ids)
    // rendered — must equal q175's all-at-once curve (its oracle
    // verbatim: merge ≡ union by construction).
    "q175b_growth_incremental" -> ((s, dir) => {
      val e = events(s, dir)
      val ops = graft.operators.Events
      ops.renderGrowth(ops.mergeGrowthStates(
          ops.userGrowthState(e.where(col("event_id") % 2 === 0)),
          ops.userGrowthState(e.where(col("event_id") % 2 === 1))))
        .orderBy(col("day"))
    }),


    // Deletion propagation: retract the user_id%10==0 slice's state
    // from the full state — the curve must equal one computed on the
    // surviving events directly (right-to-be-forgotten repair without
    // re-scanning history).
    "q175c_growth_retract" -> ((s, dir) => {
      val e = events(s, dir)
      val ops = graft.operators.Events
      ops.renderGrowth(ops.retractGrowthState(
          ops.userGrowthState(e),
          ops.userGrowthState(e.where(col("user_id") % 10 === 0))))
        .orderBy(col("day"))
    }),


    // Linear multi-touch attribution: purchase value floor-divided
    // across the user's click/view touches in the prior 7 days —
    // integer micro credit, remainder unattributed by contract.
    "q181_attribution_linear" -> ((s, dir) =>
      graft.operators.Events.linearAttribution(events(s, dir))
        .orderBy(col("touch_type"))),


    // U-shaped attribution: 40/20/40 position credit on q181's
    // lookback relation — the attribution sensitivity analysis.
    "q206_attribution_ushaped" -> ((s, dir) =>
      graft.operators.Events.uShapedAttribution(events(s, dir))
        .orderBy(col("touch_type"))),


    // Time-decay attribution completes the standard trio: half-life
    // step weights w = 10⁶ div 2^⌊age/24h⌋, exact integral credit.
    "q216_attribution_decay" -> ((s, dir) =>
      graft.operators.Events.timeDecayAttribution(events(s, dir))
        .orderBy(col("touch_type"))),


    // Traffic concentration: top-10-user share per type — the
    // distribution-shape radar next to q78's θ-threshold hot keys.
    "q176_top_user_share" -> ((s, dir) =>
      graft.operators.Events.topUserShare(events(s, dir), k = 10)
        .orderBy(col("event_type"))),


    // CUSUM changepoints: two-sided Page statistic over hourly value
    // sums, the max(0,·) recursion unrolled to prefix-sum − running-min
    // — sustained small drifts the pointwise q123/q138 z-scores miss.
    "q170_cusum_changepoints" -> ((s, dir) =>
      graft.operators.Events.cusumChangepoints(events(s, dir))
        .orderBy(col("event_type"), col("hour_start"))),


    // Frozen-parameter CUSUM: (μ,κ,h) fit on the even-id slice,
    // odd-id events scored against those constants — the deployment
    // split (self-fit σ would let drift hide itself).
    "q170b_cusum_frozen" -> ((s, dir) => {
      val e = events(s, dir)
      graft.operators.Events.cusumScoresAgainst(
          e.where(col("event_id") % 2 === 0),
          e.where(col("event_id") % 2 === 1))
        .orderBy(col("event_type"), col("ts"), col("event_id"))
    }),


    // Per-type HOURLY ANOMALY z-scores from integer window sums only —
    // (n·h − S) / (h·√((h·Q − S²)/(h·(h−1)))) applied to exact longs in
    // a fixed expression tree, so engine and oracle agree bit-for-bit
    // (no stddev-algorithm drift).
    "q123_events_anomaly" -> ((s, dir) =>
      graft.operators.Events.hourlyAnomalies(events(s, dir), zThreshold = 2.0)
        .orderBy(col("event_type"), col("hour_start"))),


    // Robust anomalies: the q123 monitor's median/MAD twin (modified
    // z-score, 0.6745, threshold 3.5) — 50 %-breakdown estimators that
    // one spike cannot drag (masking).
    "q161_events_anomaly_robust" -> ((s, dir) =>
      graft.operators.Events.hourlyAnomaliesRobust(events(s, dir))
        .orderBy(col("event_type"), col("hour_start"))),


    // Pairwise metric correlation: Pearson r over hourly micro-sums on
    // the common hour grid, moments exact in DECIMAL(38,0), one final
    // round-6 double — the q123 recipe lifted to two series.
    "q159_type_correlation" -> ((s, dir) =>
      graft.operators.Events.typeCorrelation(events(s, dir))
        .orderBy(col("type_a"), col("type_b"))),


    // First-order Markov TRANSITION matrix over user event streams:
    // one user-keyed successor window + a (from, to) aggregate; the
    // probability normalizer is a window over the tiny types² frame.
    "q125_event_transitions" -> ((s, dir) =>
      graft.operators.Events.typeTransitions(events(s, dir))
        .orderBy(col("from_type"), col("to_type"))),


    // Long-run traffic shares: 20 exact-integer power rounds over the
    // q125 transition matrix (the q117 floor-div micro recipe).
    "q182_transition_stationary" -> ((s, dir) =>
      graft.operators.Events.transitionStationary(events(s, dir), iters = 20)
        .orderBy(col("event_type"))),


    // Top event PATHS (3-step sequence mining): one user window
    // produces both leads, counts partial-aggregate, top-20 plans
    // TakeOrderedAndProject.
    "q133_event_paths" -> ((s, dir) =>
      graft.operators.Events.topPaths(events(s, dir), pathLen = 3, k = 20)
        .orderBy(col("n_paths").desc, col("path"))),


    // TRANSITION gap times: the q125 matrix with the clock attached —
    // exact floor-div mean + interpolated median per (from, to) pair.
    "q141_transition_times" -> ((s, dir) =>
      graft.operators.Events.transitionTimes(events(s, dir))
        .orderBy(col("from_type"), col("to_type"))),


    // SEASONAL baseline ratios: each (type, hour) vs its own
    // hour-of-day slot mean — n·h_slot/S_slot on exact integers.
    "q138_seasonal_baseline" -> ((s, dir) =>
      graft.operators.Events.seasonalBaseline(events(s, dir))
        .orderBy(col("event_type"), col("hour_start")))
  )

  val sql: Map[String, String] = Map(

    // Trend mirror: the q160 moment recipe over (epoch-day, count).
    "q184_daily_trend" ->
      """WITH d AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |         count(*)::BIGINT AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type,
        |         datediff('day', DATE '1970-01-01', day)::BIGINT AS x, y
        |  FROM d),
        |agg AS (
        |  SELECT event_type, count(*)::BIGINT AS n_days,
        |         sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
        |         sum(x::HUGEINT * x::HUGEINT) AS qx,
        |         sum(x::HUGEINT * y::HUGEINT) AS sxy
        |  FROM m GROUP BY 1)
        |SELECT event_type, n_days,
        |       CASE WHEN (n_days::HUGEINT * qx - sx * sx) > 0 THEN
        |         round((n_days::HUGEINT * sxy - sx * sy)::DOUBLE /
        |               (n_days::HUGEINT * qx - sx * sx)::DOUBLE, 6)
        |       END AS slope
        |FROM agg ORDER BY event_type""".stripMargin,


    // ACF mirror: the same dense grid, head/tail partial sums, and
    // n²-scaled integer moments as HUGEINTs.
    "q187_daily_acf" ->
      """WITH d AS (
        |  SELECT event_type,
        |         datediff('day', DATE '1970-01-01',
        |                  date_trunc('day', ts))::BIGINT AS x,
        |         count(*)::BIGINT AS y
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(x) AS lo, max(x) AS hi FROM d GROUP BY 1),
        |g0 AS (SELECT event_type, unnest(range(lo, hi + 1))::BIGINT AS x FROM b),
        |g AS (SELECT g0.event_type, g0.x, coalesce(d.y, 0)::BIGINT AS y
        |      FROM g0 LEFT JOIN d USING (event_type, x)),
        |m AS (SELECT event_type, count(*)::BIGINT AS n_days,
        |             sum(y::HUGEINT) AS sy,
        |             sum(y::HUGEINT * y::HUGEINT) AS syy
        |      FROM g GROUP BY 1),
        |l AS (SELECT unnest(range(1, 8))::BIGINT AS k),
        |p AS (SELECT a.event_type, l.k,
        |             sum(a.y::HUGEINT * c.y::HUGEINT) AS sxy,
        |             sum(a.y::HUGEINT) AS h, sum(c.y::HUGEINT) AS t
        |      FROM g a, l, g c
        |      WHERE c.event_type = a.event_type AND c.x = a.x + l.k
        |      GROUP BY 1, 2)
        |SELECT p.event_type, p.k AS "lag", m.n_days,
        |       CASE WHEN (m.n_days::HUGEINT * m.n_days * m.syy
        |                  - m.n_days * m.sy * m.sy) > 0 THEN
        |         round((m.n_days::HUGEINT * m.n_days * p.sxy
        |                - m.n_days * m.sy * (p.h + p.t)
        |                + (m.n_days - p.k)::HUGEINT * m.sy * m.sy)::DOUBLE
        |               / (m.n_days::HUGEINT * m.n_days * m.syy
        |                  - m.n_days * m.sy * m.sy)::DOUBLE, 6)
        |       END AS acf
        |FROM p JOIN m USING (event_type)
        |ORDER BY event_type, "lag"""".stripMargin,


    // Active-users mirror: distinct (day, user), ×7 window expansion
    // + distinct, left joins on the dense grid.
    "q195_active_users" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id,
        |         datediff('day', DATE '1970-01-01',
        |                  date_trunc('day', ts))::BIGINT AS x
        |  FROM events),
        |b AS (SELECT min(x) AS lo, max(x) AS hi FROM du),
        |g AS (SELECT unnest(range(lo, hi + 1))::BIGINT AS x FROM b),
        |dau AS (SELECT x, count(*)::BIGINT AS dau FROM du GROUP BY 1),
        |wau AS (SELECT x, count(*)::BIGINT AS wau FROM (
        |          SELECT DISTINCT du.user_id, du.x + i AS x
        |          FROM du, unnest(range(0, 7)) r(i)) w
        |        GROUP BY 1)
        |SELECT make_timestamp(g.x * 86400000000) AS day,
        |       coalesce(dau.dau, 0)::BIGINT AS dau,
        |       coalesce(wau.wau, 0)::BIGINT AS wau,
        |       CASE WHEN coalesce(wau.wau, 0) > 0 THEN
        |         round(coalesce(dau.dau, 0)::DOUBLE / wau.wau, 6)
        |       END AS stickiness
        |FROM g LEFT JOIN dau ON g.x = dau.x LEFT JOIN wau ON g.x = wau.x
        |ORDER BY day""".stripMargin,


    // Gini mirror: the same rank formula, one flat row_number.
    "q197_user_gini" ->
      """WITH c AS (SELECT user_id, count(*)::BIGINT AS cnt
        |           FROM events GROUP BY 1),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, user_id) AS rk
        |      FROM c),
        |a AS (SELECT count(*)::BIGINT AS n, sum(cnt)::HUGEINT AS sc,
        |             sum(rk::HUGEINT * cnt) AS src FROM r)
        |SELECT n AS n_users, sc::BIGINT AS total_events,
        |       round((2 * src - (n + 1)::HUGEINT * sc)::DOUBLE /
        |             (n::HUGEINT * sc)::DOUBLE, 6) AS gini
        |FROM a""".stripMargin,


    // Gap-histogram mirror: one per-(user, type) lag, the bit-length
    // bin, shiftleft lo.
    "q198_gap_histogram" ->
      """WITH g AS (
        |  SELECT event_type,
        |         (epoch_us(ts) - epoch_us(lag(ts, 1) OVER
        |            (PARTITION BY user_id, event_type
        |             ORDER BY ts, event_id))) // 1000000 AS gap
        |  FROM events),
        |b AS (
        |  SELECT event_type,
        |         CASE WHEN gap = 0 THEN -1::BIGINT
        |              ELSE length(bin(gap))::BIGINT - 1 END AS bin
        |  FROM g WHERE gap IS NOT NULL)
        |SELECT event_type, bin,
        |       CASE WHEN bin < 0 THEN 0::BIGINT
        |            ELSE (1::BIGINT << bin::INTEGER) END AS lo,
        |       count(*)::BIGINT AS n_gaps
        |FROM b GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin,


    // Gap CV: lag per user (ts, event_id order), HUGEINT moments,
    // cv = sqrt of the one exact ratio; Σg = 0 → null.
    "q215_gap_regularity" ->
      """WITH g AS (
        |  SELECT user_id,
        |         (epoch_us(ts) - epoch_us(lag(ts) OVER (
        |            PARTITION BY user_id ORDER BY ts, event_id))) // 1000000
        |           AS gap
        |  FROM events),
        |m AS (
        |  SELECT user_id, count(*)::BIGINT AS n_events,
        |         count(gap)::BIGINT AS n_gaps,
        |         coalesce(sum(gap::HUGEINT), 0) AS s,
        |         coalesce(sum(gap::HUGEINT * gap), 0) AS q
        |  FROM g GROUP BY 1 HAVING count(*) >= 5)
        |SELECT user_id, n_events, n_gaps,
        |       round(s * 1.0 / n_gaps, 6) AS mean_gap_s,
        |       CASE WHEN s > 0 THEN
        |         round(sqrt((n_gaps::HUGEINT * q - s * s) * 1.0 / (s * s)), 6)
        |       END AS cv
        |FROM m ORDER BY user_id""".stripMargin,


    // Winsorize mirror: same rounded quantile_cont band, same clip.
    "q66_events_winsorize" ->
      """WITH thr AS (
        |  SELECT round(quantile_cont(value, 0.01), 6) AS lo,
        |         round(quantile_cont(value, 0.99), 6) AS hi
        |  FROM events)
        |SELECT event_type, count(*)::BIGINT AS n_events,
        |       round(sum(least(greatest(value, thr.lo), thr.hi)), 6) AS value_w_sum
        |FROM events CROSS JOIN thr
        |GROUP BY event_type, thr.lo, thr.hi
        |ORDER BY event_type""".stripMargin,


    "q22_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n_events, round(sum(value), 6) AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,


    // Sliding-window mirror: the 4 covering 1h/15min window starts per
    // event generated by integer µs arithmetic (floor to the slide,
    // back i slides — same epoch alignment as Spark's window()).
    "q60_events_sliding" ->
      """WITH w AS (
        |  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
        |                        - i * 900000000) AS window_start,
        |         event_type, value
        |  FROM events, unnest(range(0, 4)) AS t(i))
        |SELECT window_start, event_type, count(*)::BIGINT AS n_events,
        |       round(sum(value), 6) AS value_sum
        |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,


    "q23_events_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS k_sum,
        |  round(avg(json_extract_string(props, '$.k')::BIGINT), 6) AS k_avg
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,


    "q24_events_sessions" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN prev_ts IS NULL
        |                OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM x),
        |z AS (
        |  SELECT user_id, ts, value,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                                ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
        |  FROM y)
        |SELECT user_id, session_seq, min(ts) AS session_start,
        |  max(ts) AS session_end, count(*) AS n_events,
        |  round(sum(value), 6) AS value_sum
        |FROM z GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin,


    // Entry/exit mirror: the q24 gap rule under the (ts, event_id)
    // total order, ordered-aggregate first/last per session.
    "q200_session_entry_exit" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
        |                 > 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s2 AS (
        |  SELECT *, sum(ns) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        |  FROM s),
        |g AS (
        |  SELECT user_id, seq,
        |         first(event_type ORDER BY ts, event_id) AS entry_type,
        |         last(event_type ORDER BY ts, event_id) AS exit_type,
        |         count(*) AS n
        |  FROM s2 GROUP BY 1, 2)
        |SELECT entry_type, exit_type, count(*)::BIGINT AS n_sessions,
        |       sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounces,
        |       round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE
        |             / count(*), 6) AS bounce_rate
        |FROM g GROUP BY 1, 2 ORDER BY entry_type, exit_type""".stripMargin,


    "q43_events_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,


    // Oracle pins the exact side and asserts the contract flags hold;
    // the t-digest estimates themselves are engine-specific.
    "q43b_events_quantiles_approx" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99,
        |  true AS p50_ok, true AS p90_ok, true AS p99_ok
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,


    "q29_events_rollup" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |  coalesce(date_trunc('hour', ts), TIMESTAMP '1970-01-01') AS hour_start,
        |  grouping(event_type)::BIGINT AS g_type,
        |  grouping(date_trunc('hour', ts))::BIGINT AS g_hour,
        |  count(*) AS n_events, round(sum(value), 6) AS value_sum
        |FROM events
        |GROUP BY ROLLUP (event_type, date_trunc('hour', ts))
        |ORDER BY g_type, event_type, g_hour, hour_start""".stripMargin,


    "q30_events_moving_avg" ->
      """SELECT event_id, user_id, ts,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6)
        |    AS moving_avg
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,


    "q32_events_asof_snapshot" ->
      """WITH snap AS (
        |  SELECT user_id, date_trunc('hour', ts) + INTERVAL 1 HOUR AS ts,
        |         round(sum(value), 6) AS hour_sum
        |  FROM events GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts,
        |       coalesce(s.hour_sum, -1) AS asof_hour_sum
        |FROM events e ASOF LEFT JOIN snap s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY e.user_id, e.ts, e.event_id""".stripMargin,


    // Tolerance mirror: DuckDB's native ASOF picks the same closest
    // match; staleness beyond 30 min nulls to the -1 sentinel.
    "q62_events_asof_tolerance" ->
      """WITH snap AS (
        |  SELECT user_id, date_trunc('hour', ts) + INTERVAL 1 HOUR AS ts,
        |         round(sum(value), 6) AS hour_sum
        |  FROM events GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts,
        |       coalesce(CASE WHEN e.ts - s.ts <= INTERVAL 30 MINUTE
        |                     THEN s.hour_sum END, -1) AS asof_hour_sum
        |FROM events e ASOF LEFT JOIN snap s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY e.user_id, e.ts, e.event_id""".stripMargin,


    "q41_events_funnel" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts,
        |       coalesce((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000, -1)
        |         AS secs_to_purchase
        |FROM clicks c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.user_id, c.ts, c.event_id""".stripMargin,


    // Retention triangle: (user, day) is unique after the GROUP BY, so
    // count(*) == count(DISTINCT user) — mirrored in the Spark plan.
    "q76_events_retention" ->
      """WITH a AS (
        |  SELECT user_id, date_trunc('day', ts)::DATE AS d FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (SELECT user_id, min(d) AS cohort FROM a GROUP BY 1)
        |SELECT c.cohort, (a.d - c.cohort) AS day_offset,
        |       count(*)::BIGINT AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin,


    // OHLC: same first/last-by-(ts, event_id) picks via row_number,
    // min/max/count and the round-6 double sum.
    "q113_events_ohlc" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour_start,
        |         ts, event_id, value
        |  FROM events),
        |w AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY event_type, hour_start
        |                            ORDER BY ts, event_id) AS rn,
        |         count(*) OVER (PARTITION BY event_type, hour_start) AS cnt
        |  FROM e)
        |SELECT event_type, hour_start,
        |       max(CASE WHEN rn = 1 THEN value END) AS open,
        |       max(value) AS high,
        |       min(value) AS low,
        |       max(CASE WHEN rn = cnt THEN value END) AS close,
        |       count(*) AS n_events,
        |       round(sum(value), 6) AS value_sum
        |FROM w GROUP BY 1, 2
        |ORDER BY event_type, hour_start""".stripMargin,


    // TWAP: flat per-type lead successor (≡ the engine's stitched
    // per-hour windows), exact integer micro arithmetic, floor div.
    // DuckDB's BIGINT sum promotes to HUGEINT, so both sides of the
    // division are exact; `//` is floor division like the engine's
    // (num − mod)/den.
    "q114_events_twap" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour_start,
        |         epoch_us(ts) AS tus,
        |         CAST(round(value * 1e6) AS BIGINT) AS vmicro,
        |         lead(epoch_us(ts)) OVER (PARTITION BY event_type
        |                                  ORDER BY ts, event_id) AS next_us
        |  FROM events),
        |d AS (
        |  SELECT event_type, hour_start, vmicro, next_us - tus AS dur
        |  FROM e WHERE next_us IS NOT NULL)
        |SELECT event_type, hour_start,
        |       count(*)::BIGINT AS n_obs,
        |       sum(dur)::BIGINT AS dur_us,
        |       (sum(vmicro::HUGEINT * dur) // sum(dur))::BIGINT AS twap_micro
        |FROM d GROUP BY 1, 2
        |ORDER BY event_type, hour_start""".stripMargin,


    // EWMA from the SAME weight/normalizer literals the engine embeds
    // (Events.ewmaWeights) — shortest-roundtrip decimals parse to
    // identical doubles, and both engines fold the frame list in
    // order, so round-6 values agree without libm pow.
    "q149_events_ewma" -> {
      val (wts, cum) = Events.ewmaWeights(10, 0.2)
      val wArr = wts.mkString("[", ", ", "]")
      val dArr = cum.mkString("[", ", ", "]")
      s"""SELECT event_id, user_id, ts,
         |  round(
         |    list_sum(list_transform(range(len(l)),
         |             i -> l[(i + 1)::INTEGER] * ($wArr)[(len(l) - i)::INTEGER]))
         |    / ($dArr)[len(l)::INTEGER], 6) AS ewma
         |FROM (
         |  SELECT event_id, user_id, ts,
         |         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS l
         |  FROM events)
         |ORDER BY user_id, ts, event_id""".stripMargin
    },


    // Growth mirror: the same first-seen construction. q175b (the
    // merged per-slice states) answers to the IDENTICAL oracle —
    // merge ≡ union is the contract.
    "q175_user_growth" -> userGrowthSql(),

    "q175b_growth_incremental" -> userGrowthSql(),


    // Retraction mirror: the surviving-events curve, computed directly.
    "q175c_growth_retract" -> userGrowthSql("WHERE user_id % 10 <> 0"),


    // Attribution mirror: the same equi-join + floor-division credit.
    "q181_attribution_linear" ->
      """WITH conv AS (
        |  SELECT event_id AS conv_id, user_id, ts AS conv_ts,
        |         CAST(round(value * 1000000) AS BIGINT) AS value_micros
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, event_type AS touch_type, ts AS touch_ts
        |  FROM events WHERE event_type IN ('click', 'view')),
        |pairs AS (
        |  SELECT c.conv_id, c.value_micros, t.touch_type
        |  FROM conv c JOIN touch t ON c.user_id = t.user_id
        |   AND t.touch_ts < c.conv_ts
        |   AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY),
        |n AS (SELECT conv_id, count(*) AS n_t FROM pairs GROUP BY 1)
        |SELECT touch_type, count(*)::BIGINT AS n_touches,
        |       count(DISTINCT p.conv_id)::BIGINT AS n_conversions,
        |       sum(p.value_micros // n.n_t)::BIGINT AS attributed_micros
        |FROM pairs p JOIN n USING (conv_id)
        |GROUP BY touch_type ORDER BY touch_type""".stripMargin,


    // U-shaped mirror: the q181 pair relation + the (ts, event_id)
    // position window and the same floor-division credit table.
    "q206_attribution_ushaped" ->
      """WITH conv AS (
        |  SELECT event_id AS conv_id, user_id, ts AS conv_ts,
        |         CAST(round(value * 1000000) AS BIGINT) AS value_micros
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, event_type AS touch_type, ts AS touch_ts,
        |         event_id AS touch_id
        |  FROM events WHERE event_type IN ('click', 'view')),
        |pairs AS (
        |  SELECT c.conv_id, c.value_micros, t.touch_type, t.touch_ts,
        |         t.touch_id
        |  FROM conv c JOIN touch t ON c.user_id = t.user_id
        |   AND t.touch_ts < c.conv_ts
        |   AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY),
        |w AS (
        |  SELECT *,
        |         count(*) OVER (PARTITION BY conv_id) AS n_t,
        |         row_number() OVER (PARTITION BY conv_id
        |                            ORDER BY touch_ts, touch_id) AS pos
        |  FROM pairs),
        |c2 AS (
        |  SELECT touch_type, conv_id,
        |         CASE WHEN n_t = 1 THEN value_micros
        |              WHEN n_t = 2 THEN value_micros // 2
        |              WHEN pos = 1 OR pos = n_t THEN (value_micros * 2) // 5
        |              ELSE (value_micros - 2 * ((value_micros * 2) // 5))
        |                   // (n_t - 2) END AS credit
        |  FROM w)
        |SELECT touch_type, count(*)::BIGINT AS n_touches,
        |       count(DISTINCT conv_id)::BIGINT AS n_conversions,
        |       sum(credit)::BIGINT AS attributed_micros
        |FROM c2 GROUP BY touch_type ORDER BY touch_type""".stripMargin,


    // Time-decay mirror: the q181 pair relation + half-life step
    // weights (integer shift, never pow) and the one integral division
    // per credit in HUGEINT.
    "q216_attribution_decay" ->
      """WITH conv AS (
        |  SELECT event_id AS conv_id, user_id, ts AS conv_ts,
        |         CAST(round(value * 1000000) AS BIGINT) AS value_micros
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, event_type AS touch_type, ts AS touch_ts
        |  FROM events WHERE event_type IN ('click', 'view')),
        |pairs AS (
        |  SELECT c.conv_id, c.value_micros, t.touch_type,
        |         (epoch_us(c.conv_ts) - epoch_us(t.touch_ts)) AS age_us
        |  FROM conv c JOIN touch t ON c.user_id = t.user_id
        |   AND t.touch_ts < c.conv_ts
        |   AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY),
        |wts AS (
        |  SELECT conv_id, value_micros, touch_type,
        |         1000000 // (1::BIGINT << least(age_us // 86400000000, 40))
        |           AS w
        |  FROM pairs),
        |sw AS (
        |  SELECT *, sum(w) OVER (PARTITION BY conv_id) AS swv FROM wts)
        |SELECT touch_type, count(*)::BIGINT AS n_touches,
        |       count(DISTINCT conv_id)::BIGINT AS n_conversions,
        |       sum((value_micros::HUGEINT * w) // swv)::BIGINT
        |         AS attributed_micros
        |FROM sw WHERE swv > 0
        |GROUP BY touch_type ORDER BY touch_type""".stripMargin,


    // Concentration mirror: same counts frame, same rank rule.
    "q176_top_user_share" ->
      """WITH c AS (
        |  SELECT event_type, user_id, count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY cnt DESC, user_id) AS rn,
        |         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n_events,
        |         count(*) OVER (PARTITION BY event_type)::BIGINT AS n_users
        |  FROM c)
        |SELECT event_type, max(n_events)::BIGINT AS n_events,
        |       max(n_users)::BIGINT AS n_users,
        |       sum(cnt)::BIGINT AS topk_events,
        |       round(sum(cnt)::DOUBLE / max(n_events)::DOUBLE, 6) AS topk_share
        |FROM r WHERE rn <= 10
        |GROUP BY event_type ORDER BY event_type""".stripMargin,


    // CUSUM mirror: identical micro-long cells, exact HUGEINT moments,
    // σ→(κ,h) floored once, then pure-integer running sum + running
    // min windows; alarms compare longs.
    "q170_cusum_changepoints" ->
      """WITH cells AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour_start,
        |         sum(CAST(round(value * 1e6) AS BIGINT))::BIGINT AS v_micro
        |  FROM events GROUP BY 1, 2),
        |mom AS (
        |  SELECT *,
        |         count(*) OVER w AS n,
        |         sum(v_micro) OVER w AS s,
        |         sum(v_micro::HUGEINT * v_micro::HUGEINT) OVER w AS q
        |  FROM cells WINDOW w AS (PARTITION BY event_type)),
        |par AS (
        |  SELECT *,
        |         (n >= 3 AND (n::HUGEINT * q - s::HUGEINT * s::HUGEINT) > 0) AS ok,
        |         CASE WHEN n >= 3 AND (n::HUGEINT * q - s::HUGEINT * s::HUGEINT) > 0
        |              THEN sqrt((n::HUGEINT * q - s::HUGEINT * s::HUGEINT)::DOUBLE
        |                        / (n * (n - 1))::DOUBLE) END AS sigma,
        |         floor(s::DOUBLE / n::DOUBLE)::BIGINT AS mu
        |  FROM mom),
        |kh AS (
        |  SELECT *, floor(sigma * 0.5)::BIGINT AS kappa,
        |            floor(sigma * 4.0)::BIGINT AS h
        |  FROM par),
        |ps AS (
        |  SELECT *,
        |         sum(v_micro - mu - kappa) OVER r AS psp,
        |         sum(mu - v_micro - kappa) OVER r AS psn
        |  FROM kh WINDOW r AS (PARTITION BY event_type ORDER BY hour_start
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |cs AS (
        |  SELECT *,
        |         CASE WHEN ok THEN
        |           (psp - least(0, min(psp) OVER r))::BIGINT END AS s_pos,
        |         CASE WHEN ok THEN
        |           (psn - least(0, min(psn) OVER r))::BIGINT END AS s_neg
        |  FROM ps WINDOW r AS (PARTITION BY event_type ORDER BY hour_start
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, hour_start, v_micro, s_pos, s_neg,
        |       coalesce(s_pos > h OR s_neg > h, FALSE) AS is_alarm,
        |       CASE WHEN s_pos > h AND s_neg > h THEN 'both'
        |            WHEN s_pos > h THEN 'up'
        |            WHEN s_neg > h THEN 'down' END AS side
        |FROM cs ORDER BY event_type, hour_start""".stripMargin,


    // Frozen-CUSUM mirror: params from even ids, the same unrolled
    // windows over odd ids in (ts, event_id) order.
    "q170b_cusum_frozen" ->
      """WITH fit AS (
        |  SELECT event_type,
        |         count(*) AS n,
        |         sum(CAST(round(value * 1e6) AS BIGINT)) AS s,
        |         sum(CAST(round(value * 1e6) AS BIGINT)::HUGEINT *
        |             CAST(round(value * 1e6) AS BIGINT)::HUGEINT) AS q
        |  FROM events WHERE event_id % 2 = 0 GROUP BY 1),
        |par AS (
        |  SELECT event_type,
        |         (n >= 3 AND (n::HUGEINT * q - s::HUGEINT * s::HUGEINT) > 0) AS ok,
        |         CASE WHEN n >= 3 AND (n::HUGEINT * q - s::HUGEINT * s::HUGEINT) > 0
        |              THEN sqrt((n::HUGEINT * q - s::HUGEINT * s::HUGEINT)::DOUBLE
        |                        / (n * (n - 1))::DOUBLE) END AS sigma,
        |         floor(s::DOUBLE / n::DOUBLE)::BIGINT AS mu
        |  FROM fit),
        |kh AS (
        |  SELECT event_type, ok, mu, floor(sigma * 0.5)::BIGINT AS kappa,
        |         floor(sigma * 4.0)::BIGINT AS h
        |  FROM par),
        |live AS (
        |  SELECT e.event_type, e.ts, e.event_id,
        |         CAST(round(e.value * 1e6) AS BIGINT) AS v_micro,
        |         k.ok, k.mu, k.kappa, k.h
        |  FROM events e LEFT JOIN kh k ON e.event_type = k.event_type
        |  WHERE e.event_id % 2 = 1),
        |ps AS (
        |  SELECT *,
        |         sum(v_micro - mu - kappa) OVER r AS psp,
        |         sum(mu - v_micro - kappa) OVER r AS psn
        |  FROM live WINDOW r AS (PARTITION BY event_type
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |cs AS (
        |  SELECT *,
        |         CASE WHEN ok THEN
        |           (psp - least(0, min(psp) OVER r))::BIGINT END AS s_pos,
        |         CASE WHEN ok THEN
        |           (psn - least(0, min(psn) OVER r))::BIGINT END AS s_neg
        |  FROM ps WINDOW r AS (PARTITION BY event_type
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, ts, event_id, v_micro, s_pos, s_neg,
        |       coalesce(s_pos > h OR s_neg > h, FALSE) AS is_alarm,
        |       CASE WHEN s_pos > h AND s_neg > h THEN 'both'
        |            WHEN s_pos > h THEN 'up'
        |            WHEN s_neg > h THEN 'down' END AS side
        |FROM cs ORDER BY event_type, ts, event_id""".stripMargin,


    // Hourly anomaly z-scores: the identical integer-sum expression
    // tree — (n·h − S) / (h·√((h·Q − S²)/(h·(h−1)))) — on both sides,
    // so every float op sees the same exact operands.
    "q123_events_anomaly" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour_start,
        |         count(*)::BIGINT AS n_events
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, hour_start, n_events,
        |         count(*) OVER (PARTITION BY event_type) AS h,
        |         sum(n_events) OVER (PARTITION BY event_type) AS s,
        |         sum(n_events * n_events) OVER (PARTITION BY event_type) AS q
        |  FROM c),
        |z AS (
        |  SELECT event_type, hour_start, n_events,
        |         CASE WHEN h >= 3 AND (h * q - s * s) > 0 THEN
        |           round((n_events * h - s)::DOUBLE /
        |                 (h::DOUBLE * sqrt((h * q - s * s)::DOUBLE /
        |                                   (h * (h - 1))::DOUBLE)), 6)
        |         END AS z
        |  FROM w)
        |SELECT event_type, hour_start, n_events, z,
        |       coalesce(abs(z) > 2.0, false) AS is_anomaly
        |FROM z
        |ORDER BY event_type, hour_start""".stripMargin,


    // Robust-anomaly mirror: quantile_cont windows (the interpolated-
    // percentile twin), identical modified-z expression.
    "q161_events_anomaly_robust" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour_start,
        |         count(*)::BIGINT AS n_events
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, hour_start, n_events,
        |         quantile_cont(n_events, 0.5)
        |           OVER (PARTITION BY event_type) AS med
        |  FROM c),
        |m AS (
        |  SELECT event_type, hour_start, n_events, med,
        |         quantile_cont(abs(n_events - med), 0.5)
        |           OVER (PARTITION BY event_type) AS mad
        |  FROM w),
        |z AS (
        |  SELECT event_type, hour_start, n_events,
        |         CASE WHEN mad > 0 THEN
        |           round(0.6745 * (n_events - med) / mad, 6)
        |         END AS z_robust
        |  FROM m)
        |SELECT event_type, hour_start, n_events, z_robust,
        |       coalesce(abs(z_robust) > 3.5, false) AS is_anomaly
        |FROM z
        |ORDER BY event_type, hour_start""".stripMargin,


    // Correlation mirror: HUGEINT moments (DuckDB's exact 128-bit
    // integer — the decimal(38,0) twin), identical double formula.
    "q159_type_correlation" ->
      """WITH cells AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour_start,
        |         sum(CAST(round(value * 1e6) AS BIGINT))::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT t.event_type, h.hour_start, coalesce(c.v, 0)::BIGINT AS v
        |  FROM (SELECT DISTINCT hour_start FROM cells) h
        |  CROSS JOIN (SELECT DISTINCT event_type FROM cells) t
        |  LEFT JOIN cells c
        |    ON c.event_type = t.event_type AND c.hour_start = h.hour_start),
        |m AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         count(*)::BIGINT AS n_hours,
        |         sum(a.v::HUGEINT) AS sa, sum(b.v::HUGEINT) AS sb,
        |         sum(a.v::HUGEINT * a.v::HUGEINT) AS qa,
        |         sum(b.v::HUGEINT * b.v::HUGEINT) AS qb,
        |         sum(a.v::HUGEINT * b.v::HUGEINT) AS sab
        |  FROM grid a JOIN grid b
        |    ON a.hour_start = b.hour_start AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_hours,
        |       CASE WHEN (n_hours::HUGEINT * qa - sa * sa) > 0
        |             AND (n_hours::HUGEINT * qb - sb * sb) > 0 THEN
        |         round((n_hours::HUGEINT * sab - sa * sb)::DOUBLE /
        |               (sqrt((n_hours::HUGEINT * qa - sa * sa)::DOUBLE) *
        |                sqrt((n_hours::HUGEINT * qb - sb * sb)::DOUBLE)), 6)
        |       END AS r
        |FROM m
        |ORDER BY type_a, type_b""".stripMargin,


    // Markov transition matrix: one successor window per user, pair
    // counts, row-normalized probability over the tiny matrix frame.
    "q125_event_transitions" ->
      """WITH nx AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |t AS (
        |  SELECT from_type, to_type, count(*)::BIGINT AS n_transitions
        |  FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_transitions,
        |       round(n_transitions * 1.0 /
        |             sum(n_transitions) OVER (PARTITION BY from_type), 6) AS p
        |FROM t ORDER BY from_type, to_type""".stripMargin,


    // Stationary mirror: the same floor-div power rounds, unrolled.
    "q182_transition_stationary" -> transitionStationarySql(iters = 20),


    // Top event paths: both leads from one window spec, top-20 by
    // count then path.
    "q133_event_paths" ->
      """WITH x AS (
        |  SELECT event_type,
        |         lead(event_type, 1) OVER w AS t1,
        |         lead(event_type, 2) OVER w AS t2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type || '>' || t1 || '>' || t2 AS path,
        |       count(*)::BIGINT AS n_paths
        |FROM x WHERE t2 IS NOT NULL
        |GROUP BY 1 ORDER BY n_paths DESC, path LIMIT 20""".stripMargin,


    // Transition times: same successor window, integer floor-div mean
    // (DuckDB // on BIGINT), quantile_cont median.
    "q141_transition_times" ->
      """WITH nx AS (
        |  SELECT event_type AS from_type,
        |         epoch_us(ts) AS tus,
        |         lead(event_type) OVER w AS to_type,
        |         lead(epoch_us(ts)) OVER w AS next_tus
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT from_type, to_type,
        |       count(*)::BIGINT AS n_transitions,
        |       (sum(next_tus - tus) // count(*))::BIGINT AS mean_gap_us,
        |       round(quantile_cont(next_tus - tus, 0.5), 6) AS p50_gap_us
        |FROM nx WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,


    // Seasonal baseline: per-type hour counts, hour-of-day slots,
    // integer ratio n·h/S.
    "q138_seasonal_baseline" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour_start,
        |         count(*)::BIGINT AS n_events
        |  FROM events GROUP BY 1, 2),
        |h AS (SELECT *, hour(hour_start)::BIGINT AS hod FROM c)
        |SELECT event_type, hour_start, hod, n_events,
        |       count(*) OVER w ::BIGINT AS slot_hours,
        |       sum(n_events) OVER w ::BIGINT AS slot_total,
        |       round((n_events * (count(*) OVER w))::DOUBLE /
        |             (sum(n_events) OVER w)::DOUBLE, 6) AS ratio
        |FROM h
        |WINDOW w AS (PARTITION BY event_type, hod)
        |ORDER BY event_type, hour_start""".stripMargin
  )
}
