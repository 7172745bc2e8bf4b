package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TfIdf

/**
 * Structured Streaming variants of the engine's aggregations (extension
 * surface — the reference has no streaming at all, SURVEY.md §2.1).
 * Batch twins in graft.operators.Events define the expected semantics;
 * tests replay fixed rows through MemoryStream and compare.
 *
 * Scale notes: all stateful ops are keyed (shuffle-partitioned) and
 * watermarked so state is bounded — no per-key unbounded growth (the
 * reference's in-reducer HashMap anti-pattern, SURVEY.md §4, must not
 * reappear as unbounded state stores).
 */
object StreamingOps {

  /** Streaming tumbling-window stats per event_type. Watermark bounds
    * state; late rows beyond it are dropped. Append-mode compatible. */
  def hourlyTypeStats(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("value_sum"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** Streaming doc-word-count: same tokenizer + aggregation as the batch
    * O2/O3 path, over a stream of (doc, line). Update/complete mode. */
  def termCounts(docs: DataFrame): DataFrame =
    TfIdf.docWordCount(TfIdf.tokenize(docs))

  /**
   * Streaming windowed term counts over a (doc, line, ts) stream:
   * tumbling-window counts with the reference tokenizer, watermark-
   * bounded state, append-mode safe (each window emits once, when the
   * watermark closes it) — the term-trend twin of the complete-mode
   * running `termCounts`.
   */
  def windowedTermCounts(
      docs: DataFrame,
      windowDuration: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"),
        explode(split(col("line"), TfIdf.TokenPattern)).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(window(col("ts"), windowDuration), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("term"), col("cnt"))

  /**
   * Streaming windowed TERM FREQUENCY — the streaming tier of the
   * reference's TF stage (TermFrequency.java semantics: tf = 1 +
   * log10(count), quirk Q2) over tumbling event-time windows with the
   * O2 tokenizer. Per (window, doc, term): count + tf; append-mode safe
   * (a window's rows emit once, when the watermark closes it). A full
   * streaming TF-IDF would chain a second (window, term) aggregation for
   * df and join window-to-window; the windowed tf is the streaming unit
   * whose batch twin (TfIdf.termFrequency per window slice) defines the
   * semantics.
   */
  def windowedTermFrequency(
      docs: DataFrame,
      windowDuration: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"), col("doc"),
        explode(split(col("line"), TfIdf.TokenPattern)).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(window(col("ts"), windowDuration), col("doc"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("doc"), col("term"),
        col("cnt"), round(lit(1.0) + log10(col("cnt")), 6).as("tf"))

  /**
   * Streaming TF-IDF against a STATIC df model — the production shape of
   * "streaming TF-IDF": windowed term frequencies from the stream join a
   * precomputed document-frequency snapshot (e.g. yesterday's corpus
   * model, refreshed by the batch `TfIdf` job). A fully-streaming df
   * would require joining two streaming aggregates (unsupported by the
   * engine, and semantically dubious — the idf would drift mid-window);
   * a stream-static join after the windowed aggregation is append-safe
   * and broadcastable. Score formula matches the batch quirk chain:
   * (1 + log10(cnt)) · log10(1 + floor(N / df)).
   *
   * @param dfModel static (term, df) snapshot
   * @param numDocs corpus size N behind the snapshot (idf numerator)
   */
  def windowedTfIdf(
      docs: DataFrame,
      dfModel: DataFrame,
      numDocs: Long,
      windowDuration: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    windowedTermFrequency(docs, windowDuration, watermark)
      .join(broadcast(dfModel), Seq("term"))
      .withColumn("tfidf", round(
        (lit(1.0) + log10(col("cnt"))) *
          log10(lit(1.0) + floor(lit(numDocs) / col("df"))), 6))
      .select(col("window_start"), col("doc"), col("term"), col("cnt"),
        col("tf"), col("tfidf"))

  /**
   * Streaming exact dedup over a (doc, line, ts) stream: first arrival of
   * each payload fingerprint passes, later duplicates are dropped. State
   * is the fingerprint set bounded by the watermark
   * (`dropDuplicatesWithinWatermark`) — a duplicate arriving more than
   * `watermarkDelay` after the original MAY be re-emitted; the batch twin
   * (graft.operators.Dedup.exactDedup) is the exact-once spec. Keyed on
   * the 32-byte md5, so state per retained row is O(1) and the dedup
   * shuffle partitions by fingerprint exactly like the batch plan.
   */
  def dedupExact(docs: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", md5(col("line")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /**
   * Streaming twin of `graft.operators.Pipeline.cleanCorpus`: exact
   * dedup (watermark-bounded state) then map-side language + quality
   * filters — the full training-data ingest loop as a continuous query.
   * The filters are stateless column expressions, so the only state is
   * the dedup fingerprint set.
   */
  def cleanStream(
      docs: DataFrame,
      langs: Seq[String],
      minQuality: Double,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.functions.TextAnalysis
    dedupExact(docs, watermarkDelay)
      .withColumn("_st", TextAnalysis.textStatsCol(col("line")))
      .withColumn("lang_pred", TextAnalysis.langPredFromStats(col("_st")))
      .withColumn("quality_score", TextAnalysis.qualityScoreFromStats(col("_st")))
      .where(col("lang_pred").isin(langs: _*) &&
        col("quality_score") >= minQuality)
      .drop("_st")
  }

  /**
   * Streaming twin of the q51 ingest front-half: clean (dedup + lang +
   * quality) then redact then chunk to `maxTokens`-token windows. Every
   * stage past the dedup is a stateless map/explode, so the chunked
   * stream stays append-mode with only the fingerprint state. Sequence
   * PACKING is deliberately absent: it is a prefix-sum over a bucket
   * ordering, which streams can't finalize without a window barrier —
   * pack the chunked sink in micro-batch/batch instead
   * (`Chunking.packSequences`).
   */
  def prepStream(
      docs: DataFrame,
      langs: Seq[String],
      minQuality: Double,
      maxTokens: Int = 512,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.functions.TextAnalysis
    val cleaned = cleanStream(docs, langs, minQuality, watermarkDelay)
      .select(col("doc"), TextAnalysis.redactCol(col("line")).as("line"))
    graft.operators.Chunking.chunkDocs(cleaned, maxTokens)
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionSummary(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, value_sum: Double)

  // public: Spark's generated encoder code (Janino) must access members
  final case class SessionState(
      start: Long, last: Long, n: Long, sum: Double)

  /**
   * Streaming sessionization with explicit state: a session closes after
   * `gapMinutes` of event-time inactivity. A later event from the same
   * user closes it inline; otherwise the watermark passing `last + gap`
   * fires an event-time timeout that flushes it. Event-time (not
   * processing-time) timeouts keep replays deterministic and avoid the
   * engine's continuous no-data-batch polling. Emits one summary per
   * closed session. State per key is O(1) — four scalars — regardless of
   * session length.
   */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionSummary(user, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionSummary]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // out-of-order within the gap: extend, never shrink —
                  // keeps session_start/session_end consistent with the
                  // batch twin (Events.sessionize) on late arrivals
                  cur = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t), n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionSummary(user, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire once the watermark passes the inactivity gap; guard
              // against a watermark already beyond it (very late data)
              val fireAt = s.last + gapMs
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(fireAt, wm + 1))
            }
            closed.reverseIterator
          }
      }
  }
}
