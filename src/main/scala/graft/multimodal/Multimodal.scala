package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing (builder-prompt extension surface): treat
 * image/audio/video payloads as opaque `binary` columns with typed
 * metadata, and run decode / feature-extract as partition-local batch
 * functions.
 *
 * ── STUB BOUNDARY ────────────────────────────────────────────────────
 * This container has no image/audio codecs, so `decodeStub` is a
 * clearly-marked DETERMINISTIC FAKE (byte statistics standing in for
 * pixel decoding). Everything around it — the schema contract, the
 * binary column handling, the mapPartitions batching shape, and the
 * partition sizing — is the real 100 TB plumbing: swap `decodeStub`
 * for a real codec call and nothing else changes.
 * ─────────────────────────────────────────────────────────────────────
 */
object Multimodal {

  /** Typed metadata carried alongside every binary payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("n_bytes", LongType, nullable = false),
    StructField("codec", StringType, nullable = true)
  ))

  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", MetaSchema, nullable = false)
  ))

  /**
   * Build an asset table from the documents corpus: text bytes stand in
   * for an encoded media payload. Real pipelines read payloads straight
   * from parquet binary columns — same schema, same plan shape.
   */
  def assetsFromDocuments(docs: DataFrame): DataFrame = {
    val id = col("doc").cast("long")
    // deterministic kind mix so every branch of the typed-metadata
    // contract (and any per-kind dispatch) is exercised
    val kind = when(id % 3 === 0, "image")
      .when(id % 3 === 1, "audio")
      .otherwise("video")
    docs.select(
      id.as("asset_id"),
      encode(col("line"), "UTF-8").as("payload"),
      struct(
        kind.as("kind"),
        octet_length(encode(col("line"), "UTF-8")).cast("long").as("n_bytes"),
        lit("fake/utf8").as("codec")
      ).as("meta"))
  }

  /** Output row of the (stubbed) decoder. */
  final case class DecodedFeatures(
      asset_id: Long,
      n_bytes: Long,
      // STUB features — a real decoder emits e.g. width/height/mean-pixel:
      byte_mean: Double,
      byte_hist_head: Seq[Long], // first 8 buckets of a 16-bucket histogram
      content_md5: String)

  /**
   * STUB decode / feature-extract. Deterministic fake: byte statistics in
   * place of pixel decoding. Runs partition-local over an iterator of
   * rows — exactly the batch shape a real decoder (or an Arrow-batched
   * python worker) would use; one task per input partition, no shuffle.
   */
  def decodeStub(assets: DataFrame): Dataset[DecodedFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload")).mapPartitions { rows =>
      // partition-local "codec init" would go here (once per task, not per row)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r: Row =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Long](16)
        var sum = 0L
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          hist(b % 16) += 1
          sum += b
          i += 1
        }
        val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
        md.reset()
        val hex = md.digest(bytes).map("%02x".format(_)).mkString
        DecodedFeatures(id, bytes.length.toLong,
          math.rint(mean * 1e6) / 1e6, hist.take(8).toSeq, hex)
      }
    }
  }

  /**
   * Frame sampling with REAL binary plumbing (the codec boundary is the
   * frame size, not the slicing): treat the payload as fixed-size frames
   * and keep every `everyNth` one — a video pipeline's keyframe
   * subsampling shape. Pure column expressions over BinaryType (codegen
   * substring slicing, no UDF); a real container format would only
   * change `frameBytes`/offsets, not the plan.
   */
  def frameSample(assets: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    require(frameBytes > 0 && everyNth > 0)
    val nFrames = ceil(col("meta.n_bytes") / lit(frameBytes.toDouble)).cast("long")
    assets
      .select(col("asset_id"), col("payload"), col("meta"), nFrames.as("n_frames"))
      // zero-byte payloads have no frames at all — without this filter the
      // greatest(…, 0) clamp below would fabricate a phantom frame_idx=0
      .where(col("n_frames") > 0)
      .select(col("asset_id"), col("payload"), col("meta"), col("n_frames"),
        explode(sequence(lit(0L), greatest(col("n_frames") - 1, lit(0L)),
          lit(everyNth.toLong))).as("frame_idx"))
      .select(
        col("asset_id"),
        col("frame_idx"),
        expr(s"substring(payload, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)")
          .as("frame_bytes"),
        col("meta.kind").as("kind"))
  }

  /**
   * Resize/frame-sample placeholder with the real partitioning story:
   * heavy per-asset work wants smaller input partitions (payloads are
   * MBs, not rows) — repartition by byte budget before the decode pass.
   *
   * NOTE: this runs ONE driver-side scalar action (`.head()` on a 1-row
   * aggregate) to learn the total payload size before planning the
   * repartition — a deliberate, documented exception to the engine's
   * no-mid-pipeline-action rule. AQE can split post-shuffle partitions
   * by shuffle bytes, but it cannot size by a *computed* per-row weight
   * (decode cost ∝ payload bytes, not row count), so the scalar
   * pre-pass is the 100 TB-correct choice; its cost is one column-
   * pruned scan of `meta.n_bytes`.
   */
  def repartitionForDecode(assets: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val stats = assets.agg(sum(col("meta.n_bytes"))).head()
    val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytesPerPartition).toInt)
    assets.repartition(parts, col("asset_id"))
  }
}
