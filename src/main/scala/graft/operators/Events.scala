package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics in batch form (the Structured Streaming
 * equivalents live in graft.streaming — same aggregation semantics, so
 * these batch plans double as the oracle for the streaming path).
 *
 * Input shape: events(event_id, ts timestamp, user_id, event_type,
 * value double, props json-string).
 */
object Events {

  /**
   * Tumbling-window aggregate: events per (1-hour window, event_type)
   * with count and value sum. `window()` is epoch-aligned in session TZ
   * (UTC here) — identical to date_trunc('hour', ts).
   */
  def hourlyTypeStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("value_sum"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("value_sum"))

  /**
   * SLIDING-window aggregate: overlapping windows of `windowDuration`
   * advancing by `slideDuration` (must divide it), per event_type — the
   * trailing-rate shape tumbling windows can't express (an event
   * contributes to windowDuration/slideDuration windows). Spark's
   * `window()` expands the covering windows MAP-SIDE (a projection, not
   * a join against a window table), so the plan is the same
   * one-shuffle aggregate as the tumbling twin, on k× the rows — at
   * 100 TB size the slide ratio, not the operator.
   */
  def slidingTypeStats(
      events: DataFrame,
      windowDuration: String = "1 hour",
      slideDuration: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowDuration, slideDuration), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** JSON prop extraction + per-type aggregate (scalar JSON path only —
    * the reference has no JSON; this covers the pipeline-utility need). */
  def propsKeyStats(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("k_sum"),
        round(avg(col("k")), 6).as("k_avg"))

  /**
   * WINSORIZATION: clip `value` into its corpus [pLo, pHi] percentile
   * band — the outlier-taming preprocessing step for value-derived
   * training signals. Thresholds are one exact interpolated percentile
   * aggregate (rounded to 6, the engine's determinism convention)
   * broadcast as a 1-row cross; the clip itself is map-only. At 100 TB
   * swap the exact percentile for `percentile_approx` — same plan.
   *
   * @return input columns + `value_w` (the clipped value)
   */
  def winsorizeValues(
      events: DataFrame,
      pLo: Double = 0.01,
      pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got $pLo, $pHi")
    Seq("_lo", "_hi", "value_w").foreach(c =>
      require(!events.columns.contains(c),
        s"'$c' is reserved by winsorizeValues — rename that input column"))
    val thr = events.agg(
      round(expr(s"percentile(value, $pLo)"), 6).as("_lo"),
      round(expr(s"percentile(value, $pHi)"), 6).as("_hi"))
    events.crossJoin(broadcast(thr))
      // null stays null: least/greatest SKIP nulls, so without the
      // guard a missing value would silently become the low threshold
      .withColumn("value_w",
        when(col("value").isNotNull,
          least(greatest(col("value"), col("_lo")), col("_hi"))))
      .drop("_lo", "_hi")
  }

  /**
   * ROLLUP aggregate over (event_type, hour): per-cell, per-type subtotal
   * and grand-total rows in ONE pass (Catalyst expands the grouping sets
   * map-side — no second scan, one shuffle). Subtotal rows are marked by
   * explicit `grouping()` mask columns (g_type/g_hour, 1 = rolled up), so
   * a real `event_type = 'ALL'` or an epoch-hour-0 event can never
   * masquerade as a subtotal; the coalesced display labels remain only
   * for readability and cross-engine null-free ordering.
   */
  def typeHourRollup(events: DataFrame): DataFrame =
    events
      .withColumn("hour_start", date_trunc("hour", col("ts")))
      .rollup(col("event_type"), col("hour_start"))
      .agg(
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("hour_start")).cast("long").as("g_hour"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("value_sum"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("hour_start"), lit("1970-01-01 00:00:00").cast("timestamp"))
          .as("hour_start"),
        col("g_type"), col("g_hour"), col("n_events"), col("value_sum"))

  /**
   * Per-user moving average over the last `nRows` events (ROWS frame —
   * bounded per-row state under Tungsten, one shuffle on user_id).
   * Deterministic tie-break on event_id for equal timestamps.
   */
  def userMovingAvg(events: DataFrame, nRows: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(nRows - 1), Window.currentRow)
    events.select(col("event_id"), col("user_id"), col("ts"),
      round(avg(col("value")).over(w), 6).as("moving_avg"))
  }

  /**
   * Per-type value quantiles. Exact tier (default): linear
   * interpolation at rank (n−1)·p — the same definition as DuckDB's
   * quantile_cont; buffers each group's values, and is the oracle-able
   * contract. Approx tier (`exact = false`): `percentile_approx`
   * (mergeable sketch, map-side partial aggregation, bounded memory) —
   * the 100 TB production path; EventsSpec pins its error against the
   * exact tier. Same output schema either way.
   */
  def valueQuantiles(
      events: DataFrame,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
      exact: Boolean = true,
      approxAccuracy: Int = 10000): DataFrame = {
    val aggs = ps.map { p =>
      val q =
        if (exact) expr(s"percentile(value, $p)")
        else expr(s"percentile_approx(value, $p, $approxAccuracy)")
      round(q, 6).as(s"p${math.round(p * 100)}")
    }
    events.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Sessionization (batch): a session breaks after `gapMinutes` of user
   * inactivity. Window lag + running sum of break flags — one shuffle on
   * user_id. (Streaming variant: flatMapGroupsWithState, graft.streaming.)
   */
  /**
   * Cohort retention: users grouped by first-activity day; for each
   * (cohort, day_offset) the number of cohort users active again that
   * many days later — the classic retention triangle.
   *
   * Scale shape — TWO hash shuffles, no self-join and no distinct
   * count: one `groupBy(user_id)` collects each user's distinct active
   * days (`collect_set` state is bounded by the corpus's day span, not
   * by event volume — partial aggregation dedups map-side), the cohort
   * is element 0 of the sorted set (no second pass, no window), and
   * because each (user, day) survives exactly once, the triangle's
   * `n_users` is a plain `count`, not a `countDistinct` — which would
   * otherwise cost a third, (cohort, offset, user)-keyed exchange.
   */
  def cohortRetention(
      events: DataFrame,
      eventType: String = "purchase"): DataFrame =
    events
      .where(col("event_type") === eventType)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(to_date(col("ts")))).as("days"))
      .select(col("user_id"), col("days").getItem(0).as("cohort"),
        explode(col("days")).as("d"))
      .withColumn("day_offset", datediff(col("d"), col("cohort")).cast("long"))
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))

  /**
   * OHLC DOWNSAMPLE — the time-series compaction every metrics/market
   * pipeline runs: per (event_type, hour) the Open/High/Low/Close of
   * `value` plus count and sum, collapsing raw events to one row per
   * series per bucket. Open/close are the values at the window's first/
   * last event in (ts, event_id) order — the unique tie-break keeps the
   * pick total-ordered and engine-portable (two events in the same
   * microsecond can't flip it).
   *
   * Scale shape: ONE exchange — the row_number/count window partitions
   * by (event_type, hour) and the final aggregate groups by the same
   * key, so Catalyst reuses the window's hash partitioning (no second
   * shuffle); open/close fold into the aggregate as conditional maxes
   * over the rank columns.
   */
  def downsampleOhlc(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hour = date_trunc("hour", col("ts"))
    val w = Window.partitionBy(col("event_type"), col("hour_start"))
    val ranked = events
      .withColumn("hour_start", hour)
      .withColumn("_rn",
        row_number().over(w.orderBy(col("ts"), col("event_id"))))
      .withColumn("_cnt", count(lit(1)).over(w))
    ranked
      .groupBy(col("event_type"), col("hour_start"))
      .agg(
        max(when(col("_rn") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("_rn") === col("_cnt"), col("value"))).as("close"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("value_sum"))
  }

  /**
   * TWAP DOWNSAMPLE — time-weighted average of `value` per
   * (event_type, hour), the companion compaction to [[downsampleOhlc]]
   * for irregularly-sampled series: each observation "holds" until the
   * next observation of the same series (last-observation-carried-
   * forward), so a value that persisted 50 minutes weighs 50× one that
   * was replaced after a minute. The weight is the exact microsecond
   * gap to the series' next event in (ts, event_id) order; the gap is
   * attributed to the hour of the CURRENT event, and each series' final
   * event (no successor) is excluded. All arithmetic is integer —
   * value micro-quantized via round(value·1e6), products summed as
   * DECIMAL(38,0), and the average taken by exact floor division — so
   * the result is engine-exact (no float-sum order sensitivity).
   *
   * Scale shape: the successor lookup is NOT one total-order window per
   * event_type (event types are few — that window would funnel the
   * whole series through one task). Instead: a lead window partitioned
   * by (event_type, hour) handles every within-hour successor, and the
   * cross-hour boundary (each hour's last event) is stitched from a
   * TINY hour-level frame — groupBy (type, hour) min-start, then a
   * per-type lead over hours (series × hours rows, KBs at any corpus
   * size) broadcast back. Equal to the flat per-type lead by
   * construction: the successor of an hour's last event is exactly the
   * next present hour's first event. The stitched plan's big exchanges
   * are all (event_type, hour)-keyed — parallel in the number of
   * series-hours, not series.
   */
  def downsampleTwap(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val typeHour = Window.partitionBy(col("event_type"), col("hour_start"))
    val e = events
      .withColumn("hour_start", date_trunc("hour", col("ts")))
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("vmicro", round(col("value") * 1e6).cast("long"))
      .withColumn("next_in_hour",
        lead(col("tus"), 1).over(typeHour.orderBy(col("ts"), col("event_id"))))
    // Hour-level frame: first event time per (type, hour); the next
    // PRESENT hour's first event closes each hour's last observation.
    val hourFirsts = e
      .groupBy(col("event_type"), col("hour_start"))
      .agg(min(col("tus")).as("hour_first"))
      .withColumn("next_hour_first",
        lead(col("hour_first"), 1)
          .over(Window.partitionBy(col("event_type")).orderBy(col("hour_start"))))
      .select(col("event_type"), col("hour_start"), col("next_hour_first"))
    e.join(broadcast(hourFirsts), Seq("event_type", "hour_start"))
      .withColumn("dur_us",
        coalesce(col("next_in_hour"), col("next_hour_first")) - col("tus"))
      .where(col("dur_us").isNotNull)
      .groupBy(col("event_type"), col("hour_start"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col("dur_us")).as("dur_us"),
        // multiply IN decimal — a long×long product can overflow when a
        // series goes quiet for days (vmicro ~5e8 × dur ~1e11)
        sum(col("vmicro").cast("decimal(38,0)") * col("dur_us")).as("_num"))
      // exact floor division on exact integers: (num - num mod den) / den
      .withColumn("twap_micro",
        ((col("_num") - pmod(col("_num"), col("dur_us").cast("decimal(38,0)"))) /
          col("dur_us").cast("decimal(38,0)")).cast("long"))
      .select(col("event_type"), col("hour_start"), col("n_obs"),
        col("dur_us"), col("twap_micro"))
  }

  /**
   * HOURLY ANOMALY detection — per event_type, z-scores of hourly event
   * counts against that type's own mean/spread (each series judged on
   * its own scale; an absolute threshold can't compare a login stream
   * to a checkout stream). The monitoring primitive that pages on a
   * traffic collapse or a bot spike.
   *
   * Engine-exactness: the z-score is derived from INTEGER window sums
   * only — with h hours, S = Σn, Q = Σn² (exact longs, order-free),
   *   z = (n·h − S) / (h · sqrt(((h·Q − S²) / (h·(h−1)))))
   * i.e. (n − mean)/sd(sample) with every float op (one divide, one
   * sqrt, one multiply, one divide) applied to exact integers in a
   * fixed expression tree — bit-identical across engines, no Welford
   * vs two-pass stddev drift, no float-sum order sensitivity. Exact
   * while h·Q < 2^63: counts to ~10⁹/hour over a year of hours.
   *
   * Scale shape: one (type, hour) count aggregate (map-side partial),
   * then windows over the TINY per-type hour frame (series × hours
   * rows). Types with < 3 hours or zero spread get a null z (flagged
   * false) — a constant series has no anomalies, not infinite ones.
   *
   * @return per (event_type, hour_start): n_events, z (round 6),
   *         is_anomaly (|z| > zThreshold, on the rounded z)
   */
  def hourlyAnomalies(events: DataFrame, zThreshold: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n_events"))
    val byType = Window.partitionBy(col("event_type"))
    counts
      .withColumn("_h", count(lit(1)).over(byType))
      .withColumn("_s", sum(col("n_events")).over(byType))
      .withColumn("_q", sum(col("n_events") * col("n_events")).over(byType))
      .withColumn("_vnum", col("_h") * col("_q") - col("_s") * col("_s"))
      .withColumn("z",
        when(col("_h") >= 3 && col("_vnum") > 0,
          round((col("n_events") * col("_h") - col("_s")).cast("double") /
            (col("_h").cast("double") *
              sqrt(col("_vnum").cast("double") /
                (col("_h") * (col("_h") - 1)).cast("double"))), 6)))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > zThreshold, lit(false)))
      .select(col("event_type"), col("hour_start"), col("n_events"),
        col("z"), col("is_anomaly"))
  }

  /**
   * Event-type TRANSITION matrix — the first-order Markov view of user
   * behavior (what follows what): per ordered pair (from_type, to_type),
   * how many times a user's next event was `to_type` given `from_type`,
   * plus the row-normalized transition probability. Feeds funnel
   * design, anomaly baselines ("checkout after view dropped 40 %"),
   * and session-model features.
   *
   * Scale shape: ONE user-keyed window for the successor lookup
   * (parallel in users; per-user sequences are the natural skew bound)
   * + one aggregate on the (from, to) pair — whose output is
   * |types|² rows, so the probability normalizer is a window over
   * that TINY matrix frame, not another corpus exchange. The
   * probability is one exact-integer division (n/row-total), rounded
   * — engine-portable like every derived double here.
   */
  def typeTransitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("p",
        round(col("n_transitions").cast("double") /
          sum(col("n_transitions"))
            .over(Window.partitionBy(col("from_type"))), 6))
  }

  /**
   * STATIONARY DISTRIBUTION of the event-type Markov chain — where the
   * [[typeTransitions]] matrix sends long-run traffic ("after enough
   * clicks, what fraction of the stream is errors?"). Fixed-iteration
   * power method in the q117 PageRank integer recipe: mass starts at
   * 1e6 micro per observed type and each round moves
   * ⌊x_i · n_ij / n_i⌋ along every transition — multiply-before-divide
   * exact longs, so 20 rounds are digit-identical on any engine and
   * partitioning (floor losses shave mass slightly; relative shares
   * are the signal). Bound: x·n_ij stays under 2⁶³ while
   * Σx · max n_ij < 9e18 — with T types Σx ≈ T·1e6, comfortable
   * through ~1e12 transitions per cell.
   *
   * Scale shape: the only corpus-scale work is the one windowed
   * transition count; the chain itself is T² cells, so the matrix
   * COLLECTS (the q88 NB-model / hot-keys bounded-collect convention —
   * bounded by the type-cardinality contract, never by data size) and
   * the power rounds run driver-local. The distributed per-round
   * DataFrame loop ([[Graph.termPageRank]]'s shape, right for
   * vocabulary-scale graphs) is WRONG here: ~2·iters chained
   * un-materialized rounds over a 25-cell matrix hit a measured
   * exponential AQE re-planning blowup past ~12 rounds — jobs of
   * seconds for microseconds of arithmetic.
   *
   * @return (event_type, prob_micro) for types with incoming mass
   */
  def transitionStationary(events: DataFrame, iters: Int = 20): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters must be in [1,100], got $iters")
    val tr = typeTransitions(events)
      .select(col("from_type"), col("to_type"), col("n_transitions").as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nOut: Map[String, Long] =
      tr.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val states = events.select(col("event_type")).distinct()
      .collect().map(_.getString(0))
    var x: Map[String, Long] = states.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      // ⌊x_i · n_ij / n_i⌋ per edge, summed per destination — all
      // quantities non-negative, so / is the oracle's floor division
      x = tr.flatMap { case (from, to, n) =>
          x.get(from).map(xi => to -> xi * n / nOut(from))
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    val spark = events.sparkSession
    import spark.implicits._
    x.toSeq.toDF("event_type", "prob_micro")
  }

  /**
   * TOP event PATHS — lightweight sequence mining: the k most common
   * length-`pathLen` consecutive event-type sequences across user
   * streams ("view>view>buy beats view>buy — where does the extra
   * view come from?"). The product-analytics staple between single
   * transitions ([[typeTransitions]]) and full funnel analysis (q41).
   *
   * Scale shape: ONE user-keyed window produces all pathLen−1 leads
   * in a single pass (same window spec ⇒ one exchange, one sort), the
   * path string folds map-side, counts partial-aggregate, and the
   * top-k plans TakeOrderedAndProject — a k-row heap per partition,
   * never a global sort.
   */
  def topPaths(
      events: DataFrame,
      pathLen: Int = 3,
      k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pathLen >= 2 && pathLen <= 8,
      s"pathLen must be in [2,8], got $pathLen")
    require(k >= 1, s"k must be >= 1, got $k")
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = col("event_type") +:
      (1 until pathLen).map(i => lead(col("event_type"), i).over(byUser))
    events
      .withColumn("_last", steps.last)
      .withColumn("path", concat_ws(">", steps: _*))
      // a non-null FINAL step implies every intermediate lead is
      // non-null (leads null out only past the sequence end)
      .where(col("_last").isNotNull)
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path"))
      .limit(k)
  }

  /**
   * SEASONAL BASELINE ratios — [[hourlyAnomalies]]' seasonality-aware
   * sibling: traffic has a daily shape, so "3× the per-type mean" at
   * 9am is normal while the same count at 3am is an incident. Each
   * (type, hour) compares against ITS OWN hour-of-day slot: ratio =
   * observed / slot-mean, computed as n·h_slot / S_slot — one exact
   * integer product over one exact integer sum (no float mean), one
   * division, round 6. Slots cover only hours that HAVE events (an
   * absent hour contributes no zero — document gaps upstream if the
   * series can go fully silent).
   *
   * Scale shape: one (type, hour) count aggregate, then windows over
   * the tiny per-type hour frame (the q123 shape); hod slots add a
   * second window on the same frame.
   */
  def seasonalBaseline(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("hod", hour(col("hour_start")).cast("long"))
    val slot = Window.partitionBy(col("event_type"), col("hod"))
    counts
      .withColumn("slot_hours", count(lit(1)).over(slot))
      .withColumn("slot_total", sum(col("n_events")).over(slot))
      .withColumn("ratio", round(
        (col("n_events") * col("slot_hours")).cast("double") /
          col("slot_total").cast("double"), 6))
      .select(col("event_type"), col("hour_start"), col("hod"),
        col("n_events"), col("slot_hours"), col("slot_total"), col("ratio"))
  }

  /**
   * TRANSITION gap TIMES — [[typeTransitions]] with the clock attached:
   * per (from_type, to_type), how LONG the step takes (mean and median
   * gap) — the funnel-latency table ("users reach checkout, but 40
   * minutes after the view — why?"). Mean is exact-integer floor
   * division over microsecond sums; the median interpolates on exact
   * longs (the q43 percentile convention).
   *
   * Same scale shape as the matrix: one user-keyed successor window
   * (lead serves type AND timestamp from the same spec — still one
   * exchange), one (from, to) aggregate whose exact-percentile buffer
   * is per-pair; swap `percentile_approx` in at 100 TB, same plan.
   */
  def transitionTimes(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .withColumn("next_tus", lead(col("tus"), 1).over(byUser))
      .where(col("next_type").isNotNull)
      .withColumn("gap_us", col("next_tus") - col("tus"))
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"),
        // exact floor mean on exact integer sums
        expr("sum(gap_us) div count(1)").as("mean_gap_us"),
        round(expr("percentile(gap_us, 0.5)"), 6).as("p50_gap_us"))
  }

  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        // exact micros, not truncated seconds (matches epoch_us semantics)
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("value_sum"))
  }

  /**
   * Session ENTRY/EXIT matrix — per (first event type, last event
   * type) of each [[sessionize]]-style session: session count, bounce
   * count (single-event sessions), and the bounce rate. The classic
   * landing/exit-page analysis: "sessions entering on `view` and
   * dying on `error`" is a funnel leak located in one row, and an
   * entry type whose bounce rate jumps is a broken entry point.
   *
   * Determinism: session boundaries are the exact-micros gap rule
   * (the q24 convention), but ordered by the TOTAL (ts, event_id)
   * order — same-timestamp entry/exit picks are deterministic where a
   * ts-only order would tie — and entry/exit come from min_by/max_by
   * over that same composite. The rate is ONE round-6 division of
   * exact counts.
   *
   * Scale shape: one user-keyed window pass (per-user streams are
   * ingest-bounded) + a types²-bounded rollup. Nothing collects.
   *
   * @return (entry_type, exit_type, n_sessions, n_bounces, bounce_rate)
   */
  def sessionEntryExit(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    require(gapMinutes >= 1, s"gapMinutes must be >= 1, got $gapMinutes")
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ord = struct(col("ts"), col("event_id"))
    val sessions = events
      .withColumn("_prev", lag(col("ts"), 1).over(byUser))
      .withColumn("_ns",
        when(col("_prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("_prev")) >
            gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("_seq", sum(col("_ns")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("_seq"))
      .agg(
        min_by(col("event_type"), ord).as("entry_type"),
        max_by(col("event_type"), ord).as("exit_type"),
        count(lit(1)).as("_n"))
    sessions.groupBy(col("entry_type"), col("exit_type"))
      .agg(count(lit(1)).as("n_sessions"),
        coalesce(sum(when(col("_n") === 1L, 1L)), lit(0L)).as("n_bounces"))
      .withColumn("bounce_rate",
        round(col("n_bounces").cast("double") / col("n_sessions"), 6))
  }

  /**
   * Per-user EXPONENTIALLY weighted moving average over the last
   * `nRows` events — the recency-weighted twin of [[userMovingAvg]]:
   * weight (1−α)^k for the value k rows back, normalized over the
   * frame, so recent events dominate (α = 0.2, 10 rows ⇒ the newest
   * event carries ~22% where the flat average gives 10%).
   *
   * The textbook EWMA recurrence (s_t = α·x_t + (1−α)·s_{t−1}) is a
   * sequential scan — the wrong shape for a distributed engine. The
   * DECLARED variant is the frame-bounded weighted mean: exact to the
   * (1−α)^nRows truncation (0.8¹⁰ ≈ 0.11 of the weight mass at the
   * defaults), computable per row from a ROWS window — bounded state
   * under Tungsten, one shuffle on user_id, like the flat twin.
   *
   * Float-parity design: the weight table and its prefix sums are
   * computed ONCE here ([[ewmaWeights]]) and embedded as literals in
   * both the plan and the oracle SQL (shortest-roundtrip decimals
   * parse back to identical doubles), so neither engine ever calls
   * libm `pow` — the only float ops left are a multiply and an
   * in-list-order fold, identical on both sides.
   */
  def userEwma(events: DataFrame, nRows: Int = 10, alpha: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (wts, cum) = ewmaWeights(nRows, alpha)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(nRows - 1), Window.currentRow)
    val warr = array(wts.map(lit): _*)
    val darr = array(cum.map(lit): _*)
    // element i of the frame list (oldest first, size m) sits m−1−i
    // rows back ⇒ weight warr[m−1−i] (element_at is 1-based: m−i)
    def num(l: Column): Column =
      aggregate(
        transform(l, (x, i) => x * element_at(warr, size(l) - i)),
        lit(0.0), (acc, x) => acc + x)
    events
      .withColumn("l", collect_list(col("value")).over(w))
      .select(col("event_id"), col("user_id"), col("ts"),
        round(num(col("l")) / element_at(darr, size(col("l"))), 6).as("ewma"))
  }

  /** EWMA weight table: ((1−α)^k for k rows back, prefix sums =
    * normalizers per frame size) — shared by the plan and the oracle
    * SQL generator so both engines read the same decimal literals. */
  def ewmaWeights(nRows: Int, alpha: Double): (Seq[Double], Seq[Double]) = {
    require(nRows >= 1 && alpha > 0 && alpha < 1,
      s"need nRows >= 1 and alpha in (0,1), got $nRows, $alpha")
    val wts = (0 until nRows).map(k => math.pow(1.0 - alpha, k))
    (wts, wts.scanLeft(0.0)(_ + _).tail)
  }

  /**
   * ROBUST hourly anomalies — [[hourlyAnomalies]]' median/MAD twin
   * (the Iglewicz–Hoberg modified z-score, constant 0.6745): a mean/
   * stddev z is itself dragged by the outliers it hunts — one huge
   * spike inflates σ enough to hide a second spike (masking). The
   * median and MAD are 50 %-breakdown estimators, so the flag
   * threshold holds even when a third of the hours are bad — the
   * monitoring-literature default of 3.5 replaces the z-score's 2.
   *
   * Determinism: hourly counts are integers; median and MAD are exact
   * interpolated percentiles over integers (the q43 convention — at
   * worst k.5 values, exactly representable), and the score is ONE
   * double expression round-6, identical token-for-token in the
   * oracle. MAD = 0 (over half the hours identical) → null score,
   * never a division blow-up.
   *
   * Scale shape: identical to [[hourlyAnomalies]] — one (type, hour)
   * count aggregate, then type-partitioned windows over the
   * hours-per-type frame (dashboard-sized).
   */
  def hourlyAnomaliesRobust(
      events: DataFrame,
      zThreshold: Double = 3.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy(col("event_type"))
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("_med",
        expr("percentile(n_events, 0.5)").over(byType))
      .withColumn("_mad",
        expr("percentile(abs(n_events - _med), 0.5)").over(byType))
      .withColumn("z_robust",
        when(col("_mad") > 0,
          round(lit(0.6745) * (col("n_events") - col("_med")) / col("_mad"), 6)))
      .withColumn("is_anomaly",
        coalesce(abs(col("z_robust")) > zThreshold, lit(false)))
      .select(col("event_type"), col("hour_start"), col("n_events"),
        col("z_robust"), col("is_anomaly"))
  }

  /**
   * Pairwise event-type CORRELATION over hourly value series — the
   * metric-dashboard "which signals move together" matrix (capacity
   * coupling, cascading-failure detection, redundant-metric pruning):
   * Pearson r between every pair of event types' hourly value sums,
   * on the COMMON hour grid — hours where any event fired, with an
   * absent (type, hour) cell counting 0 (a type silent while another
   * spikes is anti-correlated, which dropping the row would hide).
   *
   * Determinism, the q123 z-score recipe generalized: values lift to
   * micro longs, every moment (Σx, Σx², Σxy) accumulates as exact
   * DECIMAL(38,0) — the q113 covering type for micro² × hours
   * products — and r evaluates ONCE in double from those exact
   * integers, round-6. Degenerate series (zero variance) emit null r.
   *
   * Scale shape: the only event-scale exchange is the (type, hour)
   * cell aggregate (map-side combined); the grid completion is a
   * hours×types frame (dashboard-sized), the pair join fans each hour
   * row to T² pairs with T bounded, and the final aggregate is
   * pair-keyed. Decimals never surface in the output (the q134
   * rendering lesson) — r is double, counts are long.
   *
   * @return (type_a, type_b, n_hours, r) with type_a < type_b
   */
  def typeCorrelation(events: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = graft.Caching.persist(events
      .withColumn("hour_start", date_trunc("hour", col("ts")))
      .withColumn("vmicro", round(col("value") * 1e6).cast("long"))
      .groupBy(col("event_type"), col("hour_start"))
      .agg(sum(col("vmicro")).as("v")))
    val grid = cells.select(col("hour_start")).distinct()
      .crossJoin(broadcast(cells.select(col("event_type")).distinct()))
      .join(cells, Seq("event_type", "hour_start"), "left")
      .withColumn("v", coalesce(col("v"), lit(0L)))
    val a = grid.select(col("hour_start"),
      col("event_type").as("type_a"), col("v").as("_va"))
    val b = grid.select(col("hour_start"),
      col("event_type").as("type_b"), col("v").as("_vb"))
    a.join(b, Seq("hour_start")).where(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(dec(col("_va"))).as("_sa"),
        sum(dec(col("_vb"))).as("_sb"),
        sum(dec(col("_va")) * dec(col("_va"))).as("_qa"),
        sum(dec(col("_vb")) * dec(col("_vb"))).as("_qb"),
        sum(dec(col("_va")) * dec(col("_vb"))).as("_sab"))
      .withColumn("_num",
        dec(col("n_hours")) * col("_sab") - col("_sa") * col("_sb"))
      .withColumn("_da",
        dec(col("n_hours")) * col("_qa") - col("_sa") * col("_sa"))
      .withColumn("_db",
        dec(col("n_hours")) * col("_qb") - col("_sb") * col("_sb"))
      .withColumn("r",
        when(col("_da") > 0 && col("_db") > 0,
          round(col("_num").cast("double") /
            (sqrt(col("_da").cast("double")) * sqrt(col("_db").cast("double"))),
            6)))
      .select(col("type_a"), col("type_b"), col("n_hours"), col("r"))
  }

  /**
   * CUSUM CHANGEPOINT detection over hourly value series — the
   * sequential drift detector (Page 1954) that catches what the
   * pointwise q123/q138 z-scores can't: a SUSTAINED small shift (each
   * hour individually in-band) accumulates until the cumulative sum
   * trips. The classic two-sided recursion
   *
   *   S⁺_t = max(0, S⁺_{t-1} + x_t − μ − κ)
   *   S⁻_t = max(0, S⁻_{t-1} + μ − x_t − κ)
   *
   * is computed here WITHOUT the recursion: max(0, ·) unrolls to
   * S_t = PS_t − min(0, min_{j≤t} PS_j) where PS is the plain prefix
   * sum of deviations — so both statistics are two stock window
   * functions (running sum + running min) over the hourly frame, a
   * shape every engine executes identically.
   *
   * Determinism: hourly sums are micro longs; μ is the exact-moment
   * mean floored to a micro long (bias < 1 micro/hour, noise against
   * h ≈ 4σ); κ and h derive from the exact integer moments' σ via ONE
   * double sqrt each, floored to micro longs (the klNovelty
   * floor-once convention) — every PS, min, and S after that point is
   * exact long arithmetic, and the emitted statistics are integers.
   * Degenerate series (< 3 hours or zero variance) emit null S and
   * never alarm.
   *
   * Scale shape: the only event-scale exchange is the (type, hour)
   * cell aggregate (map-side combined); the moments and both CUSUM
   * windows run per-type over the hours×types dashboard-bounded cell
   * frame, sharing one sort. Nothing collects.
   *
   * @param kappaSigmas slack per step in σ units (tune to half the
   *                    shift you want to detect; 0.5 is the textbook
   *                    default)
   * @param hSigmas decision threshold in σ units (ARL knob)
   * @return per (event_type, hour_start): v_micro, s_pos, s_neg,
   *         is_alarm, side ('up'/'down'/'both'/null)
   */
  def cusumChangepoints(
      events: DataFrame,
      kappaSigmas: Double = 0.5,
      hSigmas: Double = 4.0): DataFrame = {
    require(kappaSigmas >= 0, s"kappaSigmas must be >= 0, got $kappaSigmas")
    require(hSigmas > 0, s"hSigmas must be positive, got $hSigmas")
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val byType = Window.partitionBy(col("event_type"))
    val ordered = byType.orderBy(col("hour_start"))
    val run = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cells = events
      .withColumn("hour_start", date_trunc("hour", col("ts")))
      .withColumn("_vm", round(col("value") * 1e6).cast("long"))
      .groupBy(col("event_type"), col("hour_start"))
      .agg(sum(col("_vm")).as("v_micro"))
    val withParams = cells
      .withColumn("_n", count(lit(1)).over(byType))
      .withColumn("_s", sum(col("v_micro")).over(byType))
      .withColumn("_q", sum(dec(col("v_micro")) * dec(col("v_micro"))).over(byType))
      .withColumn("_vnum", dec(col("_n")) * col("_q") - dec(col("_s")) * dec(col("_s")))
      .withColumn("_ok", col("_n") >= 3 && col("_vnum") > 0)
      // σ from exact integer moments, then ONE floor each → longs
      .withColumn("_sigma",
        when(col("_ok"), sqrt(col("_vnum").cast("double") /
          (col("_n") * (col("_n") - 1)).cast("double"))))
      .withColumn("_mu", floor(col("_s").cast("double") / col("_n").cast("double")).cast("long"))
      .withColumn("_kappa", floor(col("_sigma") * lit(kappaSigmas)).cast("long"))
      .withColumn("_h", floor(col("_sigma") * lit(hSigmas)).cast("long"))
    withParams
      .withColumn("_psp", sum(col("v_micro") - col("_mu") - col("_kappa")).over(run))
      .withColumn("_psn", sum(col("_mu") - col("v_micro") - col("_kappa")).over(run))
      .withColumn("s_pos",
        when(col("_ok"), col("_psp") - least(lit(0L), min(col("_psp")).over(run))))
      .withColumn("s_neg",
        when(col("_ok"), col("_psn") - least(lit(0L), min(col("_psn")).over(run))))
      .withColumn("is_alarm",
        coalesce(col("s_pos") > col("_h") || col("s_neg") > col("_h"), lit(false)))
      .withColumn("side",
        when(col("s_pos") > col("_h") && col("s_neg") > col("_h"), "both")
          .when(col("s_pos") > col("_h"), "up")
          .when(col("s_neg") > col("_h"), "down"))
      .select(col("event_type"), col("hour_start"), col("v_micro"),
        col("s_pos"), col("s_neg"), col("is_alarm"), col("side"))
  }

  /**
   * GROWTH CURVE — daily actives + cumulative reach via the FIRST-SEEN
   * trick: cumulative distinct users through day d equals the count of
   * users whose first event is ≤ d, so the "distinct over a growing
   * window" (quadratic re-scan as the window grows, the classic
   * dashboard scale-killer) becomes one per-user min + a running sum
   * over the days-bounded daily frame. All counts exact longs.
   *
   * Scale shape: one (day, user) partial-agg exchange (dedups events
   * to active pairs), one user-keyed min for first-seen, then every
   * window runs on the #days-bounded frame — the harmless
   * single-partition corner. Nothing re-scans history as the curve
   * extends.
   *
   * @return per day: n_events, n_active_users, n_new_users, cum_users
   */
  def userGrowth(events: DataFrame): DataFrame =
    renderGrowth(userGrowthState(events))

  /** The growth curve's MERGEABLE STATE: the (day, user, n_events)
    * active-pair frame — commutative by construction
    * (`state(h ∪ d) ≡ merge(state(h), state(d))`, the dataCardState
    * convention), so the curve refreshes from per-slice states without
    * re-scanning history. Actives-bounded, ≪ events. */
  def userGrowthState(events: DataFrame): DataFrame =
    events
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .groupBy(col("day"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Merge two growth states (slices may share (day, user) cells). */
  def mergeGrowthStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("day"), col("user_id"))
      .agg(sum(col("n_events")).as("n_events"))

  /** RETRACT a slice from a growth state — the deletion-propagation
    * (right-to-be-forgotten) path: counts subtract exactly (integers),
    * and (day, user) cells whose count reaches 0 are dropped so they
    * stop counting as active. `retract(state(all), state(del)) ≡
    * state(all ∖ del)` whenever `del ⊆ all` — history is repaired
    * from the actives-bounded state, never by re-scanning events. */
  def retractGrowthState(total: DataFrame, retract: DataFrame): DataFrame =
    total.unionByName(
        retract.withColumn("n_events", -col("n_events")))
      .groupBy(col("day"), col("user_id"))
      .agg(sum(col("n_events")).as("n_events"))
      .where(col("n_events") > 0)

  /** Render the curve from a (day, user, n_events) state — the
    * [[userGrowth]] rollups: one persisted frame feeds both the daily
    * aggregate and the first-seen derivation (one pass over the state,
    * and the state itself was one corpus scan). */
  def renderGrowth(state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = graft.Caching.persist(
      state.select(col("day"), col("user_id"), col("n_events").as("_n")))
    val daily = pairs.groupBy(col("day"))
      .agg(sum(col("_n")).as("n_events"),
        count(lit(1)).as("n_active_users"))
    val newPerDay = pairs.groupBy(col("user_id"))
      .agg(min(col("day")).as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_new_users"))
    val run = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(newPerDay, Seq("day"), "left_outer")
      .withColumn("n_new_users", coalesce(col("n_new_users"), lit(0L)))
      .withColumn("cum_users", sum(col("n_new_users")).over(run))
      .select(col("day"), col("n_events"), col("n_active_users"),
        col("n_new_users"), col("cum_users"))
  }

  /**
   * TRAFFIC CONCENTRATION — per event type, how much of the volume the
   * top-k users account for: the bot/abuse/whale radar next to the
   * q78 hot-key detector (that one finds individually-heavy keys by a
   * frequency threshold; this one measures how top-heavy the whole
   * distribution is, catching "1 % of users are 60 % of signups" even
   * when no single user crosses θ). Counts exact longs; the share is
   * one round-6 division.
   *
   * Scale shape: one (type, user) partial-agg exchange; the top-k pick
   * is a per-type window over that counts frame with rank ≤ k (user-id
   * tie-break), and the totals ride the same frame — types-bounded
   * output, nothing collects.
   *
   * @return per type: n_events, n_users, topk_events, topk_share
   */
  def topUserShare(events: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val counts = events.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val byType = Window.partitionBy(col("event_type"))
    val ranked = counts
      .withColumn("_rn", row_number().over(
        byType.orderBy(col("cnt").desc, col("user_id"))))
      .withColumn("n_events", sum(col("cnt")).over(byType))
      .withColumn("n_users", count(lit(1)).over(byType))
    ranked.where(col("_rn") <= k)
      .groupBy(col("event_type"))
      .agg(max(col("n_events")).as("n_events"),
        max(col("n_users")).as("n_users"),
        sum(col("cnt")).as("topk_events"))
      .withColumn("topk_share",
        round(col("topk_events").cast("double") / col("n_events").cast("double"), 6))
  }

  /**
   * Per-type DAILY TREND — least-squares slope of daily event count
   * over the day index, the "is this stream growing or dying?" summary
   * next to [[seasonalBaseline]]'s within-week shape. Exactly the
   * zipfSlope/q159 moment recipe: integer (x, y) pairs (x = epoch day,
   * y = daily count), moments accumulated as exact DECIMAL(38,0), one
   * double division at the end, round-6. Degenerate groups (a single
   * active day — zero x variance) emit null slope.
   *
   * Scale shape: one (type, day) partial-aggregated shuffle, then a
   * types-bounded moment aggregate. Nothing collects.
   *
   * @return (event_type, n_days, slope) — slope in events/day
   */
  def dailyTypeTrend(events: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("x", datediff(col("day"), lit("1970-01-01")).cast("long"))
    daily.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(dec(col("x"))).as("_sx"),
        sum(dec(col("y"))).as("_sy"),
        sum(dec(col("x")) * dec(col("x"))).as("_qx"),
        sum(dec(col("x")) * dec(col("y"))).as("_sxy"))
      .withColumn("_num",
        dec(col("n_days")) * col("_sxy") - col("_sx") * col("_sy"))
      .withColumn("_den",
        dec(col("n_days")) * col("_qx") - col("_sx") * col("_sx"))
      .withColumn("slope",
        when(col("_den") > 0,
          round(col("_num").cast("double") / col("_den").cast("double"), 6)))
      .select(col("event_type"), col("n_days"), col("slope"))
  }

  /**
   * Per-type DAILY AUTOCORRELATION — the sample ACF of the daily event
   * count at lags 1..`maxLag`, over the DENSE day grid (absent days
   * count 0 — a gap is a real zero in arrival-rate terms, not missing
   * data). [[dailyTypeTrend]] answers "growing or dying?"; this
   * answers "is there memory / weekly rhythm?" — a spike at lag 7 is
   * the numeric form of [[seasonalBaseline]]'s day-of-week shape, and
   * a slow decay across all lags flags a trending (non-stationary)
   * stream whose z-score anomaly bands need detrending first.
   *
   * Exactness: the classic estimator r_k = Σ(y_t−ȳ)(y_{t+k}−ȳ) /
   * Σ(y_t−ȳ)², both sides multiplied through by n² so every moment is
   * exact integer arithmetic in DECIMAL(38,0):
   *   num·n² = n²·Σy_t·y_{t+k} − n·Sy·(H_k + T_k) + (n−k)·Sy²
   *   den·n² = n²·Syy − n·Sy²
   * with H_k/T_k the head/tail partial sums; one double division at
   * the end, round-6. Constant series (zero variance) emit null.
   *
   * Scale shape: events collapse to (type, day) counts in one
   * partial-aggregated shuffle; everything after runs on the dense
   * grid — types × days rows, ~5 orders below the event count — so
   * the lag self-join and the two moment aggregates are noise. No
   * per-type sequential scan, nothing collects.
   *
   * @return (event_type, lag, n_days, acf) for lag = 1..maxLag
   */
  def dailyAutocorrelation(events: DataFrame, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    // the daily-counts + dense-grid persists outlive the method (five
    // sub-plans read them); scope required
    graft.Caching.requireScope("Events.dailyAutocorrelation")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // (type, day) counts: the ONE events scan; tiny thereafter, and
    // persisted because the grid build reads it twice and the grid
    // itself feeds three sub-plans (moments, lag heads, lag tails)
    val daily = graft.Caching.persist(events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("x", datediff(col("day"), lit("1970-01-01")).cast("long"))
      .select(col("event_type"), col("x"), col("y")))
    // dense per-type grid: absent days are y = 0
    val grid = graft.Caching.persist(daily.groupBy(col("event_type"))
      .agg(min(col("x")).as("_lo"), max(col("x")).as("_hi"))
      .select(col("event_type"),
        explode(sequence(col("_lo"), col("_hi"))).as("x"))
      .join(daily, Seq("event_type", "x"), "left")
      .select(col("event_type"), col("x"),
        coalesce(col("y"), lit(0L)).as("y")))
    val moments = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(dec(col("y"))).as("_sy"),
        sum(dec(col("y")) * dec(col("y"))).as("_syy"))
    val lags = grid
      .crossJoin(broadcast(
        grid.sparkSession.range(1, maxLag + 1).select(col("id").as("lag"))))
      .withColumn("_x2", col("x") + col("lag"))
    val pairs = lags.alias("a")
      .join(grid.alias("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a._x2") === col("b.x"))
      .groupBy(col("a.event_type").as("event_type"), col("a.lag").as("lag"))
      .agg(sum(dec(col("a.y")) * dec(col("b.y"))).as("_sxy"),
        sum(dec(col("a.y"))).as("_h"),
        sum(dec(col("b.y"))).as("_t"))
    pairs.join(moments, Seq("event_type"))
      .withColumn("_n", dec(col("n_days")))
      .withColumn("_num",
        col("_n") * col("_n") * col("_sxy") -
          col("_n") * col("_sy") * (col("_h") + col("_t")) +
          (col("_n") - dec(col("lag"))) * col("_sy") * col("_sy"))
      .withColumn("_den",
        col("_n") * col("_n") * col("_syy") -
          col("_n") * col("_sy") * col("_sy"))
      .withColumn("acf",
        when(col("_den") > 0,
          round(col("_num").cast("double") / col("_den").cast("double"), 6)))
      .select(col("event_type"), col("lag"), col("n_days"), col("acf"))
  }

  /**
   * Per-user activity GINI COEFFICIENT — the one-number concentration
   * summary next to [[topUserShare]]'s top-k view: 0 = perfectly even
   * traffic, (n−1)/n = one user generates everything. The bot/abuse
   * radar and the partitioning-skew forecast (a high-Gini key column
   * WILL produce straggler partitions — this prices it before the
   * shuffle does).
   *
   * Determinism: the classic rank formula G = (2·Σr·cᵣ − (n+1)·Σc) /
   * (n·Σc) over counts ranked ASCENDING by (cnt, user_id) — ranks from
   * the two-stage [[Ranking.withGlobalRank]], moments exact in
   * DECIMAL(38,0), ONE round-6 division.
   *
   * Scale shape: one user-keyed count shuffle, the rank's range
   * exchange over the users-bounded count frame, one 1-row aggregate.
   *
   * @return one row: (n_users, total_events, gini)
   */
  def userGini(events: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cnts = events.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val ranked = Ranking.withGlobalRank(
      cnts, Seq(col("cnt"), col("user_id")), rankCol = "_rk",
      errorHint = "re-run userGini, or checkpoint its input")
    ranked.agg(
        count(lit(1)).as("n_users"),
        sum(col("cnt")).as("total_events"),
        sum((dec(col("_rk")) + 1) * dec(col("cnt"))).as("_src"))
      .select(col("n_users"), col("total_events"),
        round((lit(2) * col("_src") -
            (dec(col("n_users")) + 1) * dec(col("total_events")))
            .cast("double") /
          (dec(col("n_users")) * dec(col("total_events"))).cast("double"),
          6).as("gini"))
  }

  /**
   * INTER-ARRIVAL GAP histogram — per event type, the distribution of
   * seconds between a user's consecutive events of that type, in
   * power-of-two bins (the [[graft.operators.Pipeline.lengthHistogram]]
   * integer bit-length binning — never float log2). The arrival-rhythm
   * fingerprint: bot traffic spikes the sub-second bins, engagement
   * decay fattens the day-plus tail, and a bin that empties
   * week-over-week is the retention alarm in distribution form.
   *
   * Scale shape: one (user, type)-keyed window (per-user streams are
   * ingest-bounded — never a global per-type sort) + one ≤64-row-per-
   * type aggregate.
   *
   * @return per (event_type, bin): lo (2^bin seconds; bin -1 = 0 s),
   *         n_gaps
   */
  def gapHistogram(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .where(col("_prev").isNotNull)
      .withColumn("_gap",
        expr("(unix_micros(ts) - unix_micros(_prev)) div 1000000"))
      .withColumn("bin",
        when(col("_gap") === 0L, lit(-1L))
          .otherwise(length(conv(col("_gap"), 10, 2)).cast("long") - 1L))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n_gaps"))
      .withColumn("lo",
        when(col("bin") < 0L, lit(0L))
          .otherwise(expr("shiftleft(1L, cast(bin AS int))")))
      .select(col("event_type"), col("bin"), col("lo"), col("n_gaps"))
  }

  /**
   * PER-USER GAP REGULARITY — the bot/automation radar next to
   * [[gapHistogram]]'s corpus-level bins: per user, the coefficient of
   * variation of inter-event gaps. Human activity is bursty (CV ≈ 1 or
   * above); scripted traffic fires on a timer (CV → 0); a near-zero CV
   * over many events is the canonical scheduled-bot fingerprint, and
   * the downstream cut is a plain filter over this frame.
   *
   * Determinism: gaps are whole epoch seconds (integer floor-division
   * of the µs delta — [[gapHistogram]]'s convention), moments are the
   * exact integer sums (n, Σg, Σg²) in DECIMAL(38,0), and
   * cv = √((n·Σg² − (Σg)²) / (Σg)²) — the algebraic collapse of
   * σ/μ to ONE exact integer ratio under a √ (the one power IEEE 754
   * requires correctly rounded — the q85 precedent) and one round-6.
   * All-zero-gap users (Σg = 0: every event in the same second) emit a
   * null cv — unmeasurable rate, not "perfectly regular".
   *
   * Scale shape: one user-partitioned lag window + one user-keyed
   * partial aggregate — both exchanges carry event-or-user-scale rows;
   * nothing collects.
   *
   * @param minEvents emit only users with at least this many events
   *        (CV over two gaps is noise)
   * @return (user_id, n_events, n_gaps, mean_gap_s round-6, cv round-6)
   */
  def userGapRegularity(events: DataFrame, minEvents: Int = 5): DataFrame = {
    require(minEvents >= 2, s"minEvents must be >= 2, got $minEvents")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    events
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .withColumn("_gap",
        expr("(unix_micros(ts) - unix_micros(_prev)) div 1000000"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("_gap")).as("n_gaps"),
        coalesce(sum(dec(col("_gap"))), lit(0).cast("decimal(38,0)")).as("_s"),
        coalesce(sum(dec(col("_gap")) * dec(col("_gap"))),
          lit(0).cast("decimal(38,0)")).as("_q"))
      .where(col("n_events") >= minEvents.toLong)
      .select(col("user_id"), col("n_events"), col("n_gaps"),
        round(col("_s").cast("double") / col("n_gaps").cast("double"), 6)
          .as("mean_gap_s"),
        when(col("_s") > 0,
          round(sqrt(
            (dec(col("n_gaps")) * col("_q") - col("_s") * col("_s"))
              .cast("double") / (col("_s") * col("_s")).cast("double")), 6))
          .as("cv"))
  }

  /**
   * ROLLING ACTIVE USERS — per day on the dense grid: DAU (distinct
   * users that day), WAU (distinct users over the trailing
   * `windowDays` days), and the DAU/WAU STICKINESS ratio — the
   * engagement dashboard triple. Exact distinct counts, not sketches:
   * the (day, user) frame this builds on is |users|·|active days|
   * rows, already 3-4 orders below the event count.
   *
   * Determinism: day indexes are epoch-day integers, the window
   * expansion is an explicit explode of each (day, user) row to the
   * `windowDays` window-ends it serves (no sliding-window state), and
   * stickiness is ONE round-6 division. Days past the data's max day
   * never appear (the grid caps the expansion's phantom tail); gap
   * days inside the range emit dau = 0 with whatever WAU carry their
   * trailing window holds, null stickiness only when wau = 0.
   *
   * Scale shape: one distinct shuffle to (day, user), a ×windowDays
   * map-side fan-out + second distinct for the window sets, two
   * day-keyed aggregates on frames bounded by users × days. At
   * extreme user counts the same plan runs with
   * `approx_count_distinct` per window-end instead of the explode +
   * distinct — the q31b swap.
   *
   * @return (day, dau, wau, stickiness) on the dense day grid
   */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val du = graft.Caching.persist(events
      .select(col("user_id"),
        datediff(date_trunc("day", col("ts")), lit("1970-01-01"))
          .cast("long").as("x"))
      .distinct())
    val grid = du.agg(min(col("x")).as("_lo"), max(col("x")).as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"))).as("x"))
    val dau = du.groupBy(col("x")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(col("user_id"),
        explode(sequence(col("x"), col("x") + lit(windowDays - 1))).as("x"))
      .distinct()
      .groupBy(col("x")).agg(count(lit(1)).as("wau"))
    grid.join(dau, Seq("x"), "left").join(wau, Seq("x"), "left")
      .select(timestamp_seconds(col("x") * 86400).as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"),
        when(coalesce(col("wau"), lit(0L)) > 0,
          round(coalesce(col("dau"), lit(0L)).cast("double") / col("wau"), 6))
          .as("stickiness"))
  }

  /**
   * Shared conversion⋈touch lookback relation of the attribution trio
   * ([[linearAttribution]], [[uShapedAttribution]],
   * [[timeDecayAttribution]]) — the equi-join on user_id with the
   * window condition as a post-join filter, GUARDED against hot users:
   * the [[HotKeys]] count-min radar screens the touch side at
   * `hotTheta`, and rows of hyperactive users (a bot with 10⁶ touches
   * and 10³ conversions would otherwise materialize 10⁹ pairs in ONE
   * task) take [[HotKeys.skewJoin]]'s salted path, spreading each hot
   * user's pair production over `salts` reducers. Salting replicates
   * the build side only — the pair multiset is EXACTLY the plain
   * join's (the q81 answer-invisible contract; the oracle stays the
   * plain SQL join), and every downstream statistic is an
   * order-free aggregate or a totally-ordered window over conv_id,
   * so the answer is unchanged by construction.
   *
   * LAZINESS: the radar is EAGER — [[HotKeys.skewJoin]] runs a
   * count-min treeAggregate plus a bounded hot-key collect over the
   * touch side AT CONSTRUCTION, before any caller action (the hot set
   * must be known to pick the plan). `hotTheta` outside (0, 1) opts
   * out: the plain equi-join is returned with ZERO eager work — for
   * callers that build plans they may never execute, or whose user
   * cardinality is known to be flat.
   */
  private def attributionPairs(
      events: DataFrame,
      conversionType: String,
      touchTypes: Seq[String],
      lookbackDays: Int,
      touchExtra: Seq[Column],
      hotTheta: Double,
      salts: Int): DataFrame = {
    require(lookbackDays >= 1, s"lookbackDays must be >= 1, got $lookbackDays")
    val conv = events.where(col("event_type") === conversionType)
      .select(col("event_id").as("conv_id"), col("user_id"),
        col("ts").as("conv_ts"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("value_micros"))
    val touch = events.where(col("event_type").isin(touchTypes: _*))
      .select(Seq(col("user_id"), col("event_type").as("touch_type"),
        col("ts").as("touch_ts")) ++ touchExtra: _*)
    val joined =
      if (hotTheta > 0 && hotTheta < 1)
        HotKeys.skewJoin(touch, conv, "user_id", theta = hotTheta, salts = salts)
      else touch.join(conv, Seq("user_id"))
    joined
      .where(col("touch_ts") < col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") - expr(s"INTERVAL $lookbackDays DAYS"))
  }

  /**
   * Per-touch-type rollup shared by the attribution trio. The naive
   * single aggregate (count + countDistinct(conv_id) + sum) forces an
   * Expand (every pair row duplicated per distinct-aggregate group);
   * pre-aggregating on (touch_type, conv_id) makes the distinct count
   * a plain `count(1)` of the pre-aggregate — one extra (tiny,
   * conversions-bounded) shuffle instead of a pairs-sized Expand.
   */
  private def attributionRollup(credited: DataFrame, credit: Column): DataFrame =
    credited
      .groupBy(col("touch_type"), col("conv_id"))
      .agg(count(lit(1)).as("_nt"), sum(credit).as("_cm"))
      .groupBy(col("touch_type"))
      .agg(
        sum(col("_nt")).as("n_touches"),
        // count(conv_id), not count(1): a NULL conv_id group must not
        // count as a conversion — exact countDistinct(conv_id) (null-
        // skipping) semantics, matching the oracle's COUNT(DISTINCT)
        count(col("conv_id")).as("n_conversions"),
        sum(col("_cm")).as("attributed_micros"))

  /**
   * LINEAR multi-touch attribution — distribute each conversion's value
   * evenly across the user's touch events in the preceding lookback
   * window, then roll credit up per touch type (the marketing-science
   * cousin of q41's funnel: the funnel counts progressions, this prices
   * them). Credit math is EXACT integers: conversion value lifts to
   * micro-longs once, each touch takes ⌊value_micros / n_touches⌋ (the
   * floor-division remainder stays unattributed — a declared contract,
   * in the reference's own floor-div idf spirit), so sums are
   * order-independent across partitions.
   *
   * Scale shape: conversions ⋈ touches is [[attributionPairs]]'
   * hot-user-guarded equi-join on user_id — per-user pair fan-out is
   * bounded by per-user activity in the lookback, never corpus², and a
   * single hyperactive user's pairs spread over `salts` tasks instead
   * of one straggler. The per-conversion touch count is a window over
   * conv_id (pair partitions, bounded); nothing data-sized collects
   * (the radar's hot set is ≤ ⌊1/hotTheta⌋ keys by construction).
   *
   * @note the hot-user radar runs EAGERLY at plan construction (two
   *       bounded scans of the touch slice — see [[attributionPairs]]);
   *       pass `hotTheta = 0` (or any value outside (0,1)) to skip the
   *       radar entirely and build the plain lazy equi-join.
   * @return per touch_type: n_touches, n_conversions, attributed_micros
   */
  def linearAttribution(
      events: DataFrame,
      conversionType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view"),
      lookbackDays: Int = 7,
      hotTheta: Double = 0.001,
      salts: Int = 16): DataFrame = {
    val pairs = attributionPairs(events, conversionType, touchTypes,
      lookbackDays, Nil, hotTheta, salts)
    val withN = pairs.withColumn("_n",
      count(lit(1)).over(Window.partitionBy(col("conv_id"))))
    attributionRollup(withN, expr("value_micros div _n"))
  }

  /**
   * TIME-DECAY multi-touch attribution — the third of the standard
   * model trio ([[linearAttribution]] = equal, [[uShapedAttribution]]
   * = positional): recency-weighted credit, the model for short
   * consideration cycles where the touch that happened an hour before
   * the conversion plainly mattered more than last week's.
   *
   * Determinism — the EXACT-INTEGER half-life form: a touch aged `a`
   * takes weight w = ⌊10⁶ / 2^⌊a / halflife⌋⌋ (whole half-life STEPS,
   * floor-quantized — never a libm pow; k caps at 40 where w hits 0),
   * and its credit is ⌊value_micros · w / Σw⌋ over the conversion's
   * touch window — one integral division over exact integer operands
   * (DECIMAL product, so value·w cannot wrap), remainder dropped per
   * the q181 floor-division convention. Conversions whose every touch
   * decayed to weight 0 attribute nothing (Σw = 0 rows drop).
   *
   * Scale shape: q181's hot-user-guarded conversion ⋈ touch lookback
   * equi-join ([[attributionPairs]]) + one conversion-keyed window;
   * the rollup is touch-types-bounded.
   *
   * @note the hot-user radar runs EAGERLY at plan construction (two
   *       bounded scans of the touch slice — see [[attributionPairs]]);
   *       pass `hotTheta = 0` (or any value outside (0,1)) to skip the
   *       radar entirely and build the plain lazy equi-join.
   * @return per touch_type: n_touches, n_conversions, attributed_micros
   */
  def timeDecayAttribution(
      events: DataFrame,
      conversionType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view"),
      lookbackDays: Int = 7,
      halflifeHours: Int = 24,
      hotTheta: Double = 0.001,
      salts: Int = 16): DataFrame = {
    require(halflifeHours >= 1, s"halflifeHours must be >= 1, got $halflifeHours")
    val pairs = attributionPairs(events, conversionType, touchTypes,
      lookbackDays, Nil, hotTheta, salts)
    val halflifeMicros = 3600000000L * halflifeHours
    val credited = pairs
      .withColumn("_k", least(
        expr(s"(unix_micros(conv_ts) - unix_micros(touch_ts)) div ${halflifeMicros}L"),
        lit(40L)))
      .withColumn("_w", expr("1000000L div shiftleft(1L, cast(_k AS int))"))
      .withColumn("_sw",
        sum(col("_w")).over(Window.partitionBy(col("conv_id"))))
      .where(col("_sw") > 0)
    attributionRollup(credited, expr(
      "(CAST(value_micros AS DECIMAL(38,0)) * CAST(_w AS DECIMAL(38,0))) div _sw"))
  }

  /**
   * U-SHAPED (position-based) multi-touch attribution — the
   * [[linearAttribution]] sibling crediting DISCOVERY and CLOSING:
   * first and last touch get 40 % each, the middles split the
   * remaining 20 % evenly (n = 1 → 100 %, n = 2 → 50/50). The model
   * marketers actually compare against linear — running both on the
   * same lookback relation is the attribution sensitivity analysis.
   *
   * Determinism: positions come from a per-conversion window under
   * the TOTAL (touch_ts, touch event_id) order; credits are exact
   * integer micros by floor division — 40 % = (2v) div 5 — with the
   * q181 convention on remainders (the ≤ 4-micro floor loss per
   * conversion is dropped, not redistributed).
   *
   * Scale shape: q181's hot-user-guarded conversion⋈touch lookback
   * join ([[attributionPairs]]) + one conversion-keyed window; the
   * rollup is touch-types-bounded.
   *
   * @note the hot-user radar runs EAGERLY at plan construction (two
   *       bounded scans of the touch slice — see [[attributionPairs]]);
   *       pass `hotTheta = 0` (or any value outside (0,1)) to skip the
   *       radar entirely and build the plain lazy equi-join.
   * @return per touch_type: n_touches, n_conversions, attributed_micros
   */
  def uShapedAttribution(
      events: DataFrame,
      conversionType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view"),
      lookbackDays: Int = 7,
      hotTheta: Double = 0.001,
      salts: Int = 16): DataFrame = {
    val pairs = attributionPairs(events, conversionType, touchTypes,
      lookbackDays, Seq(col("event_id").as("touch_id")),
      hotTheta, salts)
    val byConv = Window.partitionBy(col("conv_id"))
    val posW = byConv.orderBy(col("touch_ts"), col("touch_id"))
    val scored = pairs
      .withColumn("_n", count(lit(1)).over(byConv))
      .withColumn("_pos", row_number().over(posW))
      .withColumn("_credit",
        when(col("_n") === 1, col("value_micros"))
          .when(col("_n") === 2, expr("value_micros div 2"))
          .when(col("_pos") === 1 || col("_pos") === col("_n"),
            expr("(value_micros * 2) div 5"))
          .otherwise(expr(
            "(value_micros - 2 * ((value_micros * 2) div 5)) div (_n - 2)")))
    attributionRollup(scored, col("_credit"))
  }

  /**
   * Per-type CUSUM parameters FIT on a reference slice — (μ, κ, h) in
   * micro longs from the slice's exact value moments, the
   * [[cusumChangepoints]] math at event level. Output is types-bounded
   * and feeds [[cusumScoresAgainst]] in-plan or, collected, the
   * streaming twin's frozen state — the same fit-on-history /
   * score-live split as the frozen-reference KL scorer.
   *
   * @return (event_type, mu, kappa, h, ok) — ok=false (null params)
   *         for degenerate slices (< 3 events or zero variance)
   */
  def cusumParams(
      fit: DataFrame,
      kappaSigmas: Double = 0.5,
      hSigmas: Double = 4.0): DataFrame = {
    require(kappaSigmas >= 0, s"kappaSigmas must be >= 0, got $kappaSigmas")
    require(hSigmas > 0, s"hSigmas must be positive, got $hSigmas")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    fit
      .withColumn("_vm", round(col("value") * 1e6).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("_n"), sum(col("_vm")).as("_s"),
        sum(dec(col("_vm")) * dec(col("_vm"))).as("_q"))
      .withColumn("_vnum",
        dec(col("_n")) * col("_q") - dec(col("_s")) * dec(col("_s")))
      .withColumn("ok", col("_n") >= 3 && col("_vnum") > 0)
      .withColumn("_sigma",
        when(col("ok"), sqrt(col("_vnum").cast("double") /
          (col("_n") * (col("_n") - 1)).cast("double"))))
      .withColumn("mu",
        floor(col("_s").cast("double") / col("_n").cast("double")).cast("long"))
      .withColumn("kappa", floor(col("_sigma") * lit(kappaSigmas)).cast("long"))
      .withColumn("h", floor(col("_sigma") * lit(hSigmas)).cast("long"))
      .select(col("event_type"), col("mu"), col("kappa"), col("h"), col("ok"))
  }

  /**
   * FROZEN-PARAMETER CUSUM scoring — the deployment shape of
   * [[cusumChangepoints]]: (μ, κ, h) fit on a reference slice
   * ([[cusumParams]]), the live slice scored event-by-event against
   * those frozen constants, exactly what a monitor does in production
   * (fitting on the stream being judged would let the drift inflate σ
   * and hide itself — the q170 unit test's lesson). Same unrolled
   * recursion, same all-integer statistics; types degenerate in the
   * fit slice score null and never alarm.
   *
   * Scale shape: one types-bounded aggregate on the fit slice,
   * broadcast onto the live scan, and one (ts, event_id)-ordered
   * window per type on the live side. The streaming twin
   * ([[graft.streaming.StreamingOps.cusumStream]]) replays the same
   * fold from per-type state and must emit byte-equal rows on
   * in-order replays.
   *
   * @return per live event: (event_type, ts, event_id, v_micro,
   *         s_pos, s_neg, is_alarm, side)
   */
  def cusumScoresAgainst(
      fit: DataFrame,
      live: DataFrame,
      kappaSigmas: Double = 0.5,
      hSigmas: Double = 4.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val params = cusumParams(fit, kappaSigmas, hSigmas)
    val run = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    live
      .withColumn("v_micro", round(col("value") * 1e6).cast("long"))
      .join(broadcast(params), Seq("event_type"), "left_outer")
      .withColumn("_psp", sum(col("v_micro") - col("mu") - col("kappa")).over(run))
      .withColumn("_psn", sum(col("mu") - col("v_micro") - col("kappa")).over(run))
      .withColumn("s_pos",
        when(col("ok"), col("_psp") - least(lit(0L), min(col("_psp")).over(run))))
      .withColumn("s_neg",
        when(col("ok"), col("_psn") - least(lit(0L), min(col("_psn")).over(run))))
      .withColumn("is_alarm",
        coalesce(col("s_pos") > col("h") || col("s_neg") > col("h"), lit(false)))
      .withColumn("side",
        when(col("s_pos") > col("h") && col("s_neg") > col("h"), "both")
          .when(col("s_pos") > col("h"), "up")
          .when(col("s_neg") > col("h"), "down"))
      .select(col("event_type"), col("ts"), col("event_id"), col("v_micro"),
        col("s_pos"), col("s_neg"), col("is_alarm"), col("side"))
  }
}
