package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.multimodal.Multimodal
import graft.operators.{Clustering, Dedup, Events, HotKeys, Layout, Rank, Search, Similarity, TfIdf}
import graft.entry.EntryShared._

/** Per-domain slice of the driver-contract query/oracle maps:
  * multimodal decode + perceptual-hash tiers (image/audio/video aHash, windows, segments, resize). Entry text and oracle SQL are byte-identical to the
  * pre-split SparkEntry (the round-10 module split). */
private[graft] object QueriesMultimodal {
  val queries: scala.collection.immutable.ListMap[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(

    // ── Multimodal plumbing (metadata/schema surface; decode is a stub
    //    tested in ScalaTest — not SQL-expressible) ───────────────────────
    "q21_multimodal_meta" -> ((s, dir) =>
      Multimodal.assetsFromDocuments(docs(s, dir))
        .select(col("asset_id"), col("meta.kind").as("kind"),
          col("meta.n_bytes").as("n_bytes"), md5(col("payload")).as("payload_md5"))
        .orderBy(col("asset_id"))),


    // REAL multimodal decode: genuine PPM/WAV/Y4M containers built
    // deterministically from the corpus, then parsed back by
    // magic-sniffing header parsers. The oracle recomputes every
    // header field and sample sum straight from the text (the
    // encodings are pure functions of it), so a header-math bug on
    // either side is a red row.
    "q144_media_decode" -> ((s, dir) =>
      Multimodal.decodeMedia(Multimodal.encodeAssets(docs(s, dir)))
        .toDF()
        .withColumn("mean_value",
          when(col("n_samples") > 0,
            round(col("value_sum").cast("double") / col("n_samples"), 6)))
        .orderBy(col("asset_id"))),


    // Perceptual aHash over DECODED pixels: 56 exact-integer
    // mean-threshold bits per image — the oracle rebuilds every bit
    // straight from the text the encoder rasterized.
    "q172_image_ahash" -> ((s, dir) =>
      Multimodal.imageAHash(Multimodal.encodeAssets(docs(s, dir)))
        .orderBy(col("asset_id"))),


    // Banded Hamming near-dup pairs over the aHashes (7×8-bit bands);
    // oracle = all-pairs brute force — pigeonhole says banding must
    // agree exactly at maxDist ≤ 6.
    "q172b_image_neardup" -> ((s, dir) =>
      Multimodal.imageNearDupPairs(
          Multimodal.imageAHash(Multimodal.encodeAssets(docs(s, dir))),
          maxDist = 6)
        .orderBy(col("d1"), col("d2"))),


    // Incremental image screen: delta images (id ≥ 250) probe the
    // history band index — never each other (the q52 split, aHash
    // domain); closest history match per hit.
    "q172c_image_neardup_incr" -> ((s, dir) => {
      val ah = graft.Caching.persist(
        Multimodal.imageAHash(Multimodal.encodeAssets(docs(s, dir))))
      Multimodal.imageNearDupAgainst(
          ah.where(col("asset_id") >= 250), ah.where(col("asset_id") < 250))
        .orderBy(col("asset_id"))
    }),


    // Audio perceptual hash: the q172 aHash rule over the decoded PCM
    // ENERGY envelope (|int16|) — the oracle rebuilds every bit from
    // the text the WAV encoder sampled (the q144/q172 lockstep recipe).
    "q217_audio_ahash" -> ((s, dir) =>
      Multimodal.audioAHash(Multimodal.encodeAssets(docs(s, dir)))
        .orderBy(col("asset_id"))),


    // Banded Hamming near-dups over the audio hashes — the SAME 7×8-bit
    // pigeonhole machinery as q172b, modality-agnostic by construction;
    // oracle = all-pairs brute force, exact agreement at maxDist ≤ 6.
    "q217b_audio_neardup" -> ((s, dir) =>
      Multimodal.ahashNearDupPairs(
          Multimodal.audioAHash(Multimodal.encodeAssets(docs(s, dir))),
          maxDist = 6)
        .orderBy(col("d1"), col("d2"))),


    // Video perceptual hash: KEYFRAME-sampled aHash — every 2nd frame's
    // luma plane through the 56-bucket rule; sampling decided inside
    // the container walk (FRAME markers make raw slicing wrong).
    "q218_video_ahash" -> ((s, dir) =>
      Multimodal.videoAHash(Multimodal.encodeAssets(docs(s, dir)), everyNth = 2)
        .orderBy(col("asset_id"))),


    "q218b_video_neardup" -> ((s, dir) =>
      Multimodal.ahashNearDupPairs(
          Multimodal.videoAHash(Multimodal.encodeAssets(docs(s, dir)),
            everyNth = 2),
          maxDist = 6)
        .orderBy(col("d1"), col("d2"))),


    // Integer image RESIZE: the aHash bucketing as a standalone
    // floor-mean downsample — the oracle rebuilds each resized pixel
    // from the text the encoder rasterized (the q172 lockstep recipe).
    "q219_image_resize" -> ((s, dir) =>
      Multimodal.imageResize(Multimodal.encodeAssets(docs(s, dir)),
          targetW = 16)
        .orderBy(col("asset_id"), col("bucket"))),


    // WINDOWED audio fingerprints: one aHash per fixed 64-sample span
    // (trailing partial included) — the long-media segment key; every
    // per-window bit rebuilt by the oracle from the encoder text with
    // window-LOCAL positions and length.
    "q220_audio_ahash_windows" -> ((s, dir) =>
      Multimodal.audioAHashWindows(Multimodal.encodeAssets(docs(s, dir)),
          windowSamples = 64)
        .orderBy(col("asset_id"), col("window_id"))),


    // Any-window banded near-dup rolled up to asset pairs — shared-
    // SEGMENT detection; oracle = brute force over all cross-asset
    // window pairs, exact agreement (pigeonhole, no hot buckets here).
    "q220b_audio_window_neardup" -> ((s, dir) =>
      Multimodal.ahashWindowNearDupPairs(
          Multimodal.audioAHashWindows(Multimodal.encodeAssets(docs(s, dir)),
            windowSamples = 64),
          maxDist = 6)
        .orderBy(col("d1"), col("d2"))),

    // OVERLAPPING windows (stride = W/2, the classic fingerprint
    // shape): reuse at arbitrary offsets becomes detectable to stride
    // granularity — every per-window bit rebuilt by the oracle with
    // the overlapped coverage (each sample in up to two windows).
    "q220d_audio_ahash_overlap" -> ((s, dir) =>
      Multimodal.audioAHashWindows(Multimodal.encodeAssets(docs(s, dir)),
          windowSamples = 64, strideSamples = 32)
        .orderBy(col("asset_id"), col("window_id"))),

    // INCREMENTAL window screen: delta assets' windows (id ≥ 250)
    // probe the history window bands (id < 250) — never each other
    // (the q172c split at window granularity); closest history ASSET
    // per arrival by (min window-pair hamming, id), hit count carried.
    "q220c_audio_window_neardup_incr" -> ((s, dir) => {
      val wh = graft.Caching.persist(Multimodal.audioAHashWindows(
        Multimodal.encodeAssets(docs(s, dir)), windowSamples = 64))
      Multimodal.ahashWindowNearDupAgainst(
          wh.where(col("asset_id") >= 250), wh.where(col("asset_id") < 250),
          maxDist = 6)
        .orderBy(col("asset_id"))
    }),


    // SEGMENTED video fingerprints: one aHash per 4 consecutive SAMPLED
    // frames (everyNth = 2), segment-local fold — reused-footage keys.
    "q221_video_ahash_segments" -> ((s, dir) =>
      Multimodal.videoAHashSegments(Multimodal.encodeAssets(docs(s, dir)),
          segmentFrames = 4, everyNth = 2)
        .orderBy(col("asset_id"), col("segment_id"))),


    "q221b_video_segment_neardup" -> ((s, dir) =>
      Multimodal.ahashWindowNearDupPairs(
          Multimodal.videoAHashSegments(Multimodal.encodeAssets(docs(s, dir)),
            segmentFrames = 4, everyNth = 2),
          maxDist = 6)
        .orderBy(col("d1"), col("d2"))),


    // WIDE band layout (4×14-bit, maxDist ≤ 3): the documented escape
    // hatch for corpora where the 7×8 key space runs hot — shares the
    // image-hash CTEs, brute-force oracle at the tighter threshold.
    "q172d_image_neardup_wide" -> ((s, dir) =>
      Multimodal.ahashNearDupPairs(
          Multimodal.imageAHash(Multimodal.encodeAssets(docs(s, dir))),
          maxDist = 3, nBands = 4, bandBits = 14)
        .orderBy(col("d1"), col("d2"))),


    // SATURATION-RADAR auto layout (BandAuto) on the WINDOW tier (the
    // aHash family's non-vacuous pair surface — thousands of window
    // rows): the radar measures the guard-skip mass and keeps the
    // first unsaturated ladder rung — on this (unsaturated) corpus
    // that is the conventional 7×8 — and the rollup equals the brute
    // force at the requested bound, because every layout whose buckets
    // survive the guard agrees exactly (the pigeonhole contract).
    // Oracle = q220b's rollup at maxDist 3 — a radar that silently
    // changed the answer on an unsaturated corpus would hash-mismatch
    // here; the saturated arm (widen + loud failure) is spec-pinned in
    // MultimodalSpec.
    "q227_media_band_auto" -> ((s, dir) =>
      Multimodal.ahashWindowNearDupPairs(
          Multimodal.audioAHashWindows(Multimodal.encodeAssets(docs(s, dir)),
            windowSamples = 64),
          maxDist = 3, nBands = Multimodal.BandAuto)
        .orderBy(col("d1"), col("d2")))
  )

  val sql: Map[String, String] = Map(

    "q21_multimodal_meta" ->
      """SELECT doc_id AS asset_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY asset_id""".stripMargin,


    // Media decode: the PPM/WAV/Y4M encodings are deterministic
    // functions of the text, so the oracle derives every decoded
    // header field and sample sum directly — image pixels are the
    // char codes ×3 channels, audio samples are (c−110)·200, video
    // frames take the leading ⌊len/12⌋·12 char codes.
    "q144_media_decode" ->
      """WITH b AS (
        |  SELECT doc_id, length(text) AS len,
        |         coalesce(list_sum(list_transform(
        |             range(1, length(text) + 1),
        |             i -> ord(substr(text, i::INTEGER, 1)))), 0) AS sum_ord,
        |         coalesce(list_sum(list_transform(
        |             range(1, (length(text) // 12) * 12 + 1),
        |             i -> ord(substr(text, i::INTEGER, 1)))), 0) AS sum_ord12
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image'
        |                    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CASE doc_id % 3 WHEN 0 THEN len WHEN 2 THEN 4 END AS width,
        |    CASE doc_id % 3 WHEN 0 THEN 1 WHEN 2 THEN 2 END AS height,
        |    CASE doc_id % 3 WHEN 1 THEN 8000 END AS sample_rate,
        |    CASE doc_id % 3 WHEN 1 THEN 1 END AS channels,
        |    CASE doc_id % 3 WHEN 0 THEN 1
        |                    WHEN 2 THEN len // 12 END AS n_frames,
        |    CASE doc_id % 3 WHEN 0 THEN len * 3
        |                    WHEN 1 THEN len
        |                    ELSE (len // 12) * 12 END AS n_samples,
        |    CASE doc_id % 3 WHEN 0 THEN 3 * sum_ord
        |                    WHEN 1 THEN 200 * (sum_ord - 110 * len)
        |                    ELSE sum_ord12 END AS value_sum
        |  FROM b)
        |SELECT doc_id AS asset_id, kind,
        |  width::BIGINT AS width, height::BIGINT AS height,
        |  sample_rate::BIGINT AS sample_rate, channels::BIGINT AS channels,
        |  n_frames::BIGINT AS n_frames, n_samples::BIGINT AS n_samples,
        |  value_sum::BIGINT AS value_sum,
        |  CASE WHEN n_samples > 0
        |       THEN round(value_sum * 1.0 / n_samples, 6) END AS mean_value
        |FROM d ORDER BY asset_id""".stripMargin,


    // aHash mirror: every bucket bit rebuilt from the text the encoder
    // rasterized; exact integer cross-products, no division.
    "q172_image_ahash" ->
      s"""WITH $ahashCtes
         |SELECT doc_id AS asset_id, w AS width, 1::BIGINT AS height, ahash
         |FROM hs ORDER BY asset_id""".stripMargin,


    // Near-dup mirror: ALL-PAIRS brute force — the banded engine must
    // reproduce it exactly at maxDist ≤ 6 (7-band pigeonhole).
    "q172b_image_neardup" ->
      s"""WITH $ahashCtes
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |       bit_count(xor(a.ahash, b.ahash))::BIGINT AS hamming
         |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.ahash, b.ahash)) <= 6
         |ORDER BY d1, d2""".stripMargin,


    // Incremental-screen mirror: brute delta×history over the aHash
    // CTE, closest match by (hamming, id).
    "q172c_image_neardup_incr" ->
      s"""WITH $ahashCtes,
         |pm AS (
         |  SELECT d.doc_id AS asset_id, h.doc_id AS match_id,
         |         bit_count(xor(d.ahash, h.ahash))::BIGINT AS hamming
         |  FROM hs d JOIN hs h ON d.doc_id >= 250 AND h.doc_id < 250
         |  WHERE bit_count(xor(d.ahash, h.ahash)) <= 6)
         |SELECT asset_id, match_id, hamming FROM (
         |  SELECT *, row_number() OVER (PARTITION BY asset_id
         |      ORDER BY hamming, match_id) AS rn
         |  FROM pm)
         |WHERE rn = 1 ORDER BY asset_id""".stripMargin,


    // Audio aHash mirror: energy-envelope bits rebuilt from the text
    // the WAV encoder sampled; exact integer cross-products.
    "q217_audio_ahash" ->
      s"""WITH $audioAhashCtes
         |SELECT doc_id AS asset_id, n AS n_samples, ahash
         |FROM hs ORDER BY asset_id""".stripMargin,


    // Audio near-dup mirror: all-pairs brute force over the same CTEs
    // — the banded engine must agree exactly (7-band pigeonhole).
    "q217b_audio_neardup" ->
      s"""WITH $audioAhashCtes
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |       bit_count(xor(a.ahash, b.ahash))::BIGINT AS hamming
         |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.ahash, b.ahash)) <= 6
         |ORDER BY d1, d2""".stripMargin,


    // Video aHash mirror: every-2nd-frame luma bits rebuilt from the
    // text the Y4M encoder framed.
    "q218_video_ahash" ->
      s"""WITH $videoAhashCtes
         |SELECT doc_id AS asset_id, nf AS n_frames,
         |       nsf AS n_sampled_frames, ahash
         |FROM hs ORDER BY asset_id""".stripMargin,


    "q218b_video_neardup" ->
      s"""WITH $videoAhashCtes
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |       bit_count(xor(a.ahash, b.ahash))::BIGINT AS hamming
         |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.ahash, b.ahash)) <= 6
         |ORDER BY d1, d2""".stripMargin,


    // Resize mirror: floor-mean gray per 16-bucket span, rebuilt from
    // the rasterized text; exact integer division.
    "q219_image_resize" ->
      """WITH img AS (
        |  SELECT doc_id, length(text)::BIGINT AS w,
        |         list_transform(range(1, length(text) + 1),
        |                        i -> ord(substr(text, i::INTEGER, 1))::BIGINT) AS g
        |  FROM documents WHERE doc_id % 3 = 0),
        |px AS (
        |  SELECT doc_id, w, unnest(range(0, w)) AS i0, g FROM img),
        |bk AS (
        |  SELECT doc_id, w, (i0 * 16) // w AS j,
        |         sum(g[(i0 + 1)::INTEGER])::BIGINT AS bsum,
        |         count(*)::BIGINT AS bcnt
        |  FROM px GROUP BY 1, 2, 3)
        |SELECT doc_id AS asset_id, w AS width, j AS bucket,
        |       bsum // bcnt AS px
        |FROM bk ORDER BY asset_id, bucket""".stripMargin,


    // Windowed-audio mirror: per-64-sample-span bits rebuilt with
    // window-local positions and length from the encoder text.
    "q220_audio_ahash_windows" ->
      s"""WITH $audioWindowCtes
         |SELECT doc_id AS asset_id, w_id AS window_id, wn AS n_samples,
         |       ahash
         |FROM hs ORDER BY asset_id, window_id""".stripMargin,


    // Any-window near-dup mirror: brute force over ALL cross-asset
    // window pairs, rolled up to (min_hamming, n_window_hits).
    "q220b_audio_window_neardup" ->
      s"""WITH $audioWindowCtes,
         |$windowPairRollupSql""".stripMargin,

    // Overlapping-window mirror: stride-32 coverage, window-local fold.
    "q220d_audio_ahash_overlap" ->
      s"""WITH $audioWindowStrideCtes
         |SELECT doc_id AS asset_id, w_id AS window_id, wn AS n_samples,
         |       ahash
         |FROM hs ORDER BY asset_id, window_id""".stripMargin,

    // Incremental window mirror: brute delta-window × history-window
    // over the same CTEs, rolled up per (delta, history) asset pair,
    // closest history asset by (min_hamming, match_id).
    "q220c_audio_window_neardup_incr" ->
      s"""WITH $audioWindowCtes,
         |pm AS (
         |  SELECT d.doc_id AS asset_id, h.doc_id AS match_id,
         |         bit_count(xor(d.ahash, h.ahash))::BIGINT AS hamming
         |  FROM hs d JOIN hs h ON d.doc_id >= 250 AND h.doc_id < 250
         |  WHERE bit_count(xor(d.ahash, h.ahash)) <= 6),
         |pg AS (
         |  SELECT asset_id, match_id, min(hamming)::BIGINT AS min_hamming,
         |         count(*)::BIGINT AS n_window_hits
         |  FROM pm GROUP BY 1, 2)
         |SELECT asset_id, match_id, min_hamming, n_window_hits FROM (
         |  SELECT *, row_number() OVER (PARTITION BY asset_id
         |      ORDER BY min_hamming, match_id) AS rn
         |  FROM pg)
         |WHERE rn = 1 ORDER BY asset_id""".stripMargin,


    // Segmented-video mirror: per-4-sampled-frame bits, segment-local.
    "q221_video_ahash_segments" ->
      s"""WITH $videoSegmentCtes
         |SELECT doc_id AS asset_id, seg_id AS segment_id,
         |       nsf AS n_sampled_frames, ahash
         |FROM hs ORDER BY asset_id, segment_id""".stripMargin,


    "q221b_video_segment_neardup" ->
      s"""WITH $videoSegmentCtes,
         |$windowPairRollupSql""".stripMargin,


    // Wide-band mirror: the same image-hash CTEs, all-pairs brute
    // force at the 4-band pigeonhole threshold (hamming ≤ 3).
    "q172d_image_neardup_wide" ->
      s"""WITH $ahashCtes
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |       bit_count(xor(a.ahash, b.ahash))::BIGINT AS hamming
         |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
         |ORDER BY d1, d2""".stripMargin,

    // q227 = q220b's brute-force rollup at the 4-band pigeonhole
    // threshold (3): the auto-resolved layout must reproduce the exact
    // pair set (layout answer-invariance under the guard contract).
    "q227_media_band_auto" ->
      s"""WITH $audioWindowCtes,
         |${windowPairRollupSqlAt(3)}""".stripMargin
  )
}
