package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing (builder-prompt extension surface): treat
 * image/audio/video payloads as opaque `binary` columns with typed
 * metadata, and run decode / feature-extract as partition-local batch
 * functions.
 *
 * The DECODE path is REAL for the three codec-free container formats —
 * PPM P6 (image), RIFF/WAVE PCM16 (audio), YUV4MPEG2 (video):
 * [[decodeMedia]] sniffs the magic bytes and parses each payload's
 * actual headers and raster/sample/frame data ([[encodeAssets]] builds
 * genuine such payloads deterministically from the documents corpus, so
 * the tier is exercisable end-to-end and oracle-checkable — q144).
 * [[decodeStub]] remains only to demonstrate the batch shape for
 * formats that DO need an external codec (JPEG/MP3/H.264 — absent in
 * this container): swap its byte statistics for a codec call and the
 * schema contract, binary handling, mapPartitions batching, and
 * partition sizing around it do not change.
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

  // ── Real codec-free containers: PPM P6 / RIFF-WAVE PCM16 / YUV4MPEG2 ──

  /** WAV constants for the deterministic audio encoding: PCM16 mono. */
  private val WavSampleRate = 8000
  /** Y4M geometry: W4 H2 C420 → 4·2 luma + 2+2 chroma = 12 bytes/frame. */
  private val Y4mWidth = 4
  private val Y4mHeight = 2
  private val Y4mFrameBytes = Y4mWidth * Y4mHeight * 3 / 2

  /**
   * Deterministic REAL media payloads from the documents corpus — the
   * fixture generator that makes the decode tier exercisable without
   * external codecs. Per `doc_id % 3` the text becomes a genuine:
   *
   *  - `image` — PPM P6, `len(text)`×1, maxval 255, each char c the
   *    grayscale pixel (c, c, c);
   *  - `audio` — RIFF/WAVE PCM16 mono 8 kHz, one int16 sample
   *    `(c − 110)·200` per char (all of [a-z ] stays well inside
   *    int16);
   *  - `video` — YUV4MPEG2 W4 H2 F25:1 C420, ⌊len/12⌋ frames filled
   *    with the text's leading bytes (12 payload bytes per frame;
   *    shorter docs yield a legal zero-frame stream).
   *
   * The headers are the real formats' real headers — [[decodeMedia]]
   * parses them as any other tool would (`ffplay` accepts all three).
   * Construction is partition-local (mapPartitions), no shuffle.
   */
  def encodeAssets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val enc = docs.select(col("doc").cast("long").as("asset_id"), col("line"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          (id % 3) match {
            case 0 => (id, encodePpm(text), "image", "ppm")
            case 1 => (id, encodeWav(text), "audio", "wav")
            case _ => (id, encodeY4m(text), "video", "y4m")
          }
        }
      }
      .toDF("asset_id", "payload", "kind", "codec")
    enc.select(
      col("asset_id"),
      col("payload"),
      struct(
        col("kind"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        col("codec")).as("meta"))
  }

  private[multimodal] def encodePpm(text: String): Array[Byte] = {
    val w = text.length
    val header = s"P6\n$w 1\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < w) {
      val b = text.charAt(i).toByte
      val o = header.length + 3 * i
      out(o) = b; out(o + 1) = b; out(o + 2) = b
      i += 1
    }
    out
  }

  private[multimodal] def encodeWav(text: String): Array[Byte] = {
    val n = text.length
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1)                       // PCM
    bb.putShort(1)                       // mono
    bb.putInt(WavSampleRate)
    bb.putInt(WavSampleRate * 2)         // byte rate
    bb.putShort(2)                       // block align
    bb.putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      // the q144 oracle computes value_sum as the UNWRAPPED
      // 200·(Σord − 110·len); codepoints ≥ 274 would wrap the int16
      // here and silently diverge — fail loudly instead (the corpus
      // contract is [a-z ]; anything else is a fixture bug)
      require(text.charAt(i) < 274,
        s"encodeWav: codepoint ${text.charAt(i).toInt} overflows int16")
      bb.putShort(((text.charAt(i) - 110) * 200).toShort)
      i += 1
    }
    bb.array()
  }

  private[multimodal] def encodeY4m(text: String): Array[Byte] = {
    val nFrames = text.length / Y4mFrameBytes
    val header =
      s"YUV4MPEG2 W$Y4mWidth H$Y4mHeight F25:1 Ip A1:1 C420\n"
        .getBytes("US-ASCII")
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      header.length + nFrames * (frameHdr.length + Y4mFrameBytes))
    out.write(header)
    var f = 0
    while (f < nFrames) {
      out.write(frameHdr)
      var i = 0
      while (i < Y4mFrameBytes) {
        out.write(text.charAt(f * Y4mFrameBytes + i).toInt)
        i += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** Decoded header + content summary of one media payload. Integer
    * `value_sum` (sum of decoded scalar samples) instead of a float
    * mean keeps the row engine-exact; the query layer derives
    * `mean_value = value_sum / n_samples` with one rounded division. */
  final case class MediaInfo(
      asset_id: Long,
      kind: String,
      width: Option[Long],
      height: Option[Long],
      sample_rate: Option[Long],
      channels: Option[Long],
      n_frames: Option[Long],
      n_samples: Long,
      value_sum: Long)

  /**
   * REAL decode over the binary payload column: sniff the magic bytes,
   * parse the container's actual header, and fold the decoded samples
   * (pixel bytes / int16 PCM samples / frame payload bytes) into
   * (count, sum) — the schema a feature-extraction stage consumes.
   * Unknown magic fails loudly (a corrupt payload must never decode as
   * silence).
   *
   * Scale shape: partition-local mapPartitions over (asset_id,
   * payload) — the [[decodeStub]] batch shape with the stub replaced
   * by three genuine parsers; one task per input partition, no
   * shuffle; compose with [[repartitionForDecode]] when payloads are
   * MBs. This is deliberately NOT a Column expression: header parsing
   * is imperative byte-walking, the legitimate mapPartitions corner.
   */
  def decodeMedia(assets: DataFrame): Dataset[MediaInfo] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload")).mapPartitions { rows =>
      rows.map { r: Row =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        decodeOne(id, bytes)
      }
    }
  }

  private[graft] def decodeOne(id: Long, b: Array[Byte]): MediaInfo = {
    def startsWith(magic: String): Boolean = {
      val m = magic.getBytes("US-ASCII")
      b.length >= m.length && m.indices.forall(i => b(i) == m(i))
    }
    if (startsWith("P6")) parsePpm(id, b)
    else if (startsWith("RIFF")) parseWav(id, b)
    else if (startsWith("YUV4MPEG2")) parseY4m(id, b)
    else throw new IllegalArgumentException(
      s"asset $id: unrecognized magic bytes " +
        b.take(8).map(x => f"${x & 0xff}%02x").mkString(" "))
  }

  /** PPM P6: "P6" ws width ws height ws maxval ONE-ws raster(w·h·3). */
  private def parsePpm(id: Long, b: Array[Byte]): MediaInfo = {
    var pos = 2
    def isWs(c: Int) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    def nextInt(): Long = {
      while (pos < b.length &&
        (isWs(b(pos)) || b(pos) == '#')) {
        if (b(pos) == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else pos += 1
      }
      var v = 0L
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval == 255, s"asset $id: unsupported PPM maxval $maxval")
    // bound BEFORE the raster-size multiply: absurd header digits could
    // overflow w·h·3 to a negative n, turning the truncation require
    // into a silent pass (2³⁰ each keeps the product < 2⁶²)
    require(w > 0 && h > 0 && w <= (1L << 30) && h <= (1L << 30),
      s"asset $id: corrupt PPM dimensions ${w}x$h")
    pos += 1 // the single whitespace after maxval
    val n = w * h * 3
    require(b.length - pos >= n, s"asset $id: truncated PPM raster")
    var sum = 0L
    var i = 0
    while (i < n) { sum += (b(pos + i) & 0xff); i += 1 }
    MediaInfo(id, "image", Some(w), Some(h), None, None, Some(1L), n, sum)
  }

  /** RIFF/WAVE: walk chunks; `fmt ` gives rate/channels/bits, `data`
    * gives the int16 little-endian samples. */
  private def parseWav(id: Long, b: Array[Byte]): MediaInfo = {
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int): String = new String(b, o, 4, "US-ASCII")
    require(tag(8) == "WAVE", s"asset $id: RIFF but not WAVE")
    var pos = 12
    var rate = -1L; var channels = -1L; var bits = -1
    var nSamples = 0L; var sum = 0L; var sawData = false
    while (pos + 8 <= b.length) {
      val id4 = tag(pos); val size = le32(pos + 4); pos += 8
      // validate BEFORE processing/advancing: a chunk size ≥ 2³¹ reads
      // as a negative Int and would walk pos BACKWARDS forever (the
      // loop guard stays true), and an oversized size would index past
      // the buffer — both must fail loudly, not hang or throw raw AIOOBE
      require(size >= 0 && pos + size <= b.length,
        s"asset $id: corrupt/truncated $id4 chunk (size $size at ${pos - 8})")
      id4 match {
        case "fmt " =>
          require(le16(pos) == 1, s"asset $id: non-PCM WAV")
          channels = le16(pos + 2)
          rate = le32(pos + 4) & 0xffffffffL
          bits = le16(pos + 14)
          require(bits == 16, s"asset $id: only PCM16 supported, got $bits")
        case "data" =>
          // order-strict like [[wavDataChunk]]: fmt must already have
          // validated PCM16, and a second data chunk is rejected
          // instead of silently double-counting
          require(bits == 16,
            s"asset $id: data chunk before/without fmt — refusing to " +
              "decode unvalidated samples")
          require(!sawData, s"asset $id: duplicate data chunk")
          sawData = true
          nSamples = size / 2
          var i = 0
          while (i < size - 1) {
            sum += le16(pos + i).toShort.toLong // sign-extend int16
            i += 2
          }
        case _ => // skip unknown chunk
      }
      pos += size + (size & 1) // RIFF chunks pad to even length
    }
    require(sawData && rate > 0, s"asset $id: missing fmt/data chunk")
    MediaInfo(id, "audio", None, None, Some(rate), Some(channels),
      None, nSamples, sum)
  }

  /** YUV4MPEG2: params line (W/H/F...), then per frame "FRAME[...]\n"
    * + w·h·3/2 bytes (C420). */
  private def parseY4m(id: Long, b: Array[Byte]): MediaInfo = {
    var pos = 0
    while (pos < b.length && b(pos) != '\n') pos += 1
    val params = new String(b, 0, pos, "US-ASCII").split(' ')
    pos += 1
    val w = params.collectFirst { case p if p.startsWith("W") => p.tail.toLong }
      .getOrElse(throw new IllegalArgumentException(s"asset $id: y4m missing W"))
    val h = params.collectFirst { case p if p.startsWith("H") => p.tail.toLong }
      .getOrElse(throw new IllegalArgumentException(s"asset $id: y4m missing H"))
    require(!params.exists(p => p.startsWith("C") && p != "C420"),
      s"asset $id: only C420 supported")
    val frameLen = (w * h * 3 / 2).toInt
    var frames = 0L; var sum = 0L; var nSamples = 0L
    while (pos < b.length) {
      require(pos + 5 <= b.length &&
        new String(b, pos, 5, "US-ASCII") == "FRAME",
        s"asset $id: corrupt y4m frame header at $pos")
      pos += 5
      while (pos < b.length && b(pos) != '\n') pos += 1 // frame params
      pos += 1
      require(b.length - pos >= frameLen, s"asset $id: truncated y4m frame")
      var i = 0
      while (i < frameLen) { sum += (b(pos + i) & 0xff); i += 1 }
      pos += frameLen
      frames += 1
      nSamples += frameLen
    }
    MediaInfo(id, "video", Some(w), Some(h), None, None, Some(frames),
      nSamples, sum)
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

  /** aHash width: 56 bits — 7 clean 8-bit bands, and (unlike the
    * classic 64) the top bit stays clear of the BIGINT sign on every
    * engine that has to band, XOR, and popcount it. */
  val AHashBits = 56

  /**
   * PERCEPTUAL average hash (aHash) over decoded image pixels — the
   * content-level image near-dup key the raw-byte md5 can't be (a
   * re-encoded header or comment byte changes the payload, not the
   * picture). The flattened pixel sequence buckets into [[AHashBits]]
   * equal spans (pixel i → bucket ⌊i·56/n⌋, the integer downsample);
   * bit j is set iff bucket j's mean ≥ the image mean, compared as
   * the EXACT cross-product `bsum_j·n_px ≥ total·bcnt_j` — no
   * division, no float, engine-identical by construction (bounds: a
   * 10⁸-pixel image keeps bsum·n_px < 2.6e18, inside int64). Empty
   * buckets (images narrower than 56 px) and empty rasters hash 0 on
   * that bit.
   *
   * Scale shape: partition-local decode+fold, one (id, 3-long) row
   * out per image — the [[decodeMedia]] mapPartitions corner;
   * compose with [[repartitionForDecode]] for MB payloads.
   *
   * @return (asset_id, width, height, ahash) for image assets
   */
  def imageAHash(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("meta.kind") === "image")
      .select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r: Row =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val (w, h, gray) = ppmGray(id, b)
          // the exact cross-product bound, asserted (not assumed): a
          // raster past 6·10⁸ pixels would silently flip threshold
          // bits — no real image is 600 MP, so loud is right here
          require(gray.length <= MaxExactLumaSamples,
            s"asset $id: ${gray.length} pixels exceed the exact " +
              "cross-product bound")
          (id, w, h, ahash56(gray))
        }
      }
      .toDF("asset_id", "width", "height", "ahash")
  }

  /** Exact cross-product bounds for the 56-bucket rule: values ≤ V
    * need n ≤ √(2⁶³/V) so `sum_j·n` stays inside int64. */
  private[graft] val MaxExactAudioSamples = 16000000L // V = 32767
  private[graft] val MaxExactLumaSamples = 600000000L // V = 255

  /** Mutable accumulator behind the 56-bucket exact mean-threshold
    * fold ([[imageAHash]]/[[audioAHash]]/[[videoAHash]] and the
    * windowed variants): value i → bucket ⌊i·56/n⌋, bit j set iff
    * bucket j's mean ≥ the overall mean, compared as the EXACT
    * cross-product `sum_j·n ≥ total·cnt_j` — no division, no float,
    * engine-identical by construction. Callers bound the value domain
    * so the cross-product stays inside int64 (see
    * [[MaxExactAudioSamples]]/[[MaxExactLumaSamples]]; over-bound
    * clips route through the windowed floor-mean downsample at the
    * call sites instead of failing). Empty buckets and empty inputs
    * hash 0 on their bits. The accessor form exists so callers fold
    * decoded values STRAIGHT from the payload bytes — no per-clip
    * sample array (the round-9 shape materialized up to 64 MB per
    * audio task). */
  private final class Ahash56Acc(n: Long) {
    private val sums = new Array[Long](AHashBits)
    private val cnts = new Array[Long](AHashBits)
    def add(i: Long, v: Long): Unit = {
      val j = (i * AHashBits / n).toInt
      sums(j) += v; cnts(j) += 1
    }
    def hash: Long = {
      val total = sums.sum
      var h = 0L
      var j = 0
      while (j < AHashBits) {
        if (cnts(j) > 0 && sums(j) * n >= total * cnts(j))
          h |= 1L << j
        j += 1
      }
      h
    }
  }

  /** Fold `n` values (accessor form) through the 56-bucket rule. */
  private def ahashFold(n: Long)(valueAt: Long => Long): Long = {
    val acc = new Ahash56Acc(n)
    var i = 0L
    while (i < n) { acc.add(i, valueAt(i)); i += 1 }
    acc.hash
  }

  private def ahash56(values: Array[Int]): Long =
    ahashFold(values.length.toLong)(i => values(i.toInt).toLong)

  /**
   * PERCEPTUAL audio hash — the [[imageAHash]] recipe over the decoded
   * PCM ENERGY ENVELOPE: the int16 samples' absolute values bucket
   * into [[AHashBits]] equal time spans, bit j set iff span j's mean
   * energy ≥ the clip's mean (the exact cross-product rule — see
   * [[ahash56]]). Loudness-profile fingerprint: byte-level md5 changes
   * with any container tweak, this only when the ENERGY SHAPE moves —
   * the content-level near-dup key for audio.
   *
   * Scale shape: partition-local WAV walk + fold (the [[decodeMedia]]
   * mapPartitions corner), one (id, n, hash) row per clip out, energy
   * folded STRAIGHT from the payload bytes (no sample array); compose
   * with [[repartitionForDecode]] for MB payloads. Int64 bound:
   * |sample| ≤ 32767 keeps the exact cross-product inside int64 to
   * n = 1.6·10⁷ samples (~33 min at 8 kHz); LONGER clips take the
   * WINDOWED PATH automatically — energies collapse to the floor-mean
   * of each `fallbackWindow`-sample span (the [[imageResize]] integer
   * downsample) and the 56-bucket rule folds the window means, which
   * stays exact to 1.6·10⁷ windows (≈ 94 days at 8 kHz / 4 096 — the
   * remaining `require` is an absurdity backstop, not a usable limit).
   * Short clips are bit-identical to round 9 (the q217 contract);
   * the long path is pinned against a local replica in MultimodalSpec.
   *
   * @return (asset_id, n_samples, ahash) for audio assets
   */
  def audioAHash(assets: DataFrame, fallbackWindow: Int = 4096): DataFrame = {
    require(fallbackWindow > 0,
      s"fallbackWindow must be positive, got $fallbackWindow")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("meta.kind") === "audio")
      .select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r: Row =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val (off, n) = wavDataChunk(id, b)
          val hash =
            if (n <= MaxExactAudioSamples) ahashFold(n)(wavEnergyAt(b, off))
            else {
              val nW = (n - 1) / fallbackWindow + 1
              require(nW <= MaxExactAudioSamples,
                s"asset $id: $n samples exceed the exact bound even at " +
                  s"$fallbackWindow-sample window means ($nW windows)")
              ahashFold(nW) { w =>
                val lo = w * fallbackWindow
                val hi = math.min(lo + fallbackWindow, n)
                var s = 0L; var i = lo
                while (i < hi) { s += wavEnergyAt(b, off)(i); i += 1 }
                s / (hi - lo) // floor mean, ≤ 32767
              }
            }
          (id, n, hash)
        }
      }
      .toDF("asset_id", "n_samples", "ahash")
  }

  /** |int16| PCM energy accessor over the located data chunk. */
  private def wavEnergyAt(b: Array[Byte], off: Int)(i: Long): Long = {
    val o = off + 2 * i.toInt
    math.abs((((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toShort).toLong)
  }

  /**
   * SEGMENT-level audio fingerprints — the long-media near-dup key a
   * whole-clip hash cannot be: one [[audioAHash]]-rule hash PER
   * fixed-span window of `windowSamples` PCM samples (window w covers
   * samples [w·W, min((w+1)·W, n)); the trailing partial window is
   * hashed too — winnowing's every-position coverage in hash space).
   * A clip that REUSES a span of another clip (sampled footage, a
   * quoted jingle) matches on the shared windows even when the whole
   * clips differ — feed the rows to [[ahashWindowNearDupPairs]] for
   * the asset-level verdict. Each window's fold is the exact
   * cross-product rule over ≤ `windowSamples` values, so the int64
   * bound holds per window BY CONSTRUCTION for any clip length.
   *
   * GRID ALIGNMENT: fixed spans match reuse that lands on the same
   * window offsets (the common same-source case — whole-file copies,
   * aligned concatenations). For arbitrary-offset reuse pass
   * `strideSamples < windowSamples` — OVERLAPPING windows (the
   * classic audio-fingerprint shape: window w starts at w·stride),
   * which detects reuse to stride granularity at the price of
   * W/stride× more index rows — the recall ↔ index-size dial, a
   * parameter rather than a hidden limitation.
   *
   * Scale shape: partition-local walk, ⌈n/stride⌉ rows per clip,
   * energies folded straight from the payload bytes; empty clips
   * emit no rows.
   *
   * @param strideSamples start-to-start distance between windows;
   *        0 (the default) means non-overlapping (stride = W)
   * @return (asset_id, window_id, n_samples, ahash) for audio assets
   */
  def audioAHashWindows(
      assets: DataFrame,
      windowSamples: Int = 65536,
      strideSamples: Int = 0): DataFrame = {
    require(windowSamples > 0 && windowSamples <= MaxExactAudioSamples,
      s"windowSamples must be in [1, $MaxExactAudioSamples], got $windowSamples")
    val stride = if (strideSamples == 0) windowSamples else strideSamples
    require(stride > 0 && stride <= windowSamples,
      s"strideSamples must be in [1, windowSamples] (or 0 = no overlap), " +
        s"got $strideSamples")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("meta.kind") === "audio")
      .select(col("asset_id"), col("payload"))
      .flatMap { r: Row =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        val (off, n) = wavDataChunk(id, b)
        val nW = if (n == 0) 0L else (n - 1) / stride + 1
        (0L until nW).map { w =>
          val lo = w * stride
          val hi = math.min(lo + windowSamples, n)
          val hash = ahashFold(hi - lo)(i => wavEnergyAt(b, off)(lo + i))
          (id, w, hi - lo, hash)
        }
      }
      .toDF("asset_id", "window_id", "n_samples", "ahash")
  }

  /**
   * PERCEPTUAL video hash — KEYFRAME-sampled [[imageAHash]]: every
   * `everyNth` frame's LUMA plane (C420's leading w·h bytes — the
   * channel perceptual hashing uses; chroma is ignored exactly like
   * classic pHash pipelines), concatenated in frame order and folded
   * through the same 56-bucket exact mean-threshold rule. A re-muxed
   * or chroma-tweaked stream keeps its hash; a different CONTENT
   * moves it. Frame sampling is the [[frameSample]] decision applied
   * inside the container walk (the FRAME markers make raw byte
   * slicing wrong for y4m — position comes from the parse, the
   * sampling economics are identical).
   *
   * Scale shape: partition-local Y4M walk + fold, one row per stream,
   * luma folded STRAIGHT from the payload bytes (two cheap walks —
   * count then fold — instead of materializing the sampled luma, which
   * at round 9 built a per-task array as large as the sampled stream).
   * Sampled luma is w·h·⌈frames/everyNth⌋ values ≤ 255: int64-exact to
   * 6·10⁸ sampled pixels, now ASSERTED by routing — longer streams
   * take the WINDOWED PATH automatically (each sampled frame collapses
   * to its floor-mean luma and the 56-bucket rule folds the frame
   * means — exact to 6·10⁸ sampled FRAMES, ≈ 380 years at 25 fps; the
   * remaining `require` is an absurdity backstop). Short streams are
   * bit-identical to round 9 (the q218 contract); the long path is
   * pinned against a local replica in MultimodalSpec. Zero-frame
   * streams hash 0 (empty raster).
   *
   * @return (asset_id, n_frames, n_sampled_frames, ahash) for video
   *         assets
   */
  def videoAHash(assets: DataFrame, everyNth: Int = 2): DataFrame =
    videoAHashBounded(assets, everyNth, MaxExactLumaSamples)

  /** [[videoAHash]] with the exact-path bound injectable — the TEST
    * seam for the windowed fallback (a real over-bound stream is
    * ≥ 900 MB, too big for a spec; audio's fallback is pinned for
    * real at 32 MB). Production callers use [[videoAHash]]. */
  private[graft] def videoAHashBounded(
      assets: DataFrame, everyNth: Int, exactBound: Long): DataFrame = {
    require(everyNth > 0, s"everyNth must be positive, got $everyNth")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("meta.kind") === "video")
      .select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r: Row =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val (lumaLen, frameLen, start) = y4mGeometry(id, b)
          // pass 1: count frames (validates the container end to end)
          val (nFrames, nSampled) =
            y4mWalk(id, b, start, frameLen, everyNth)((_, _) => ())
          val n = nSampled * lumaLen
          val hash =
            if (n <= exactBound) {
              // pass 2: fold every sampled luma byte, global index
              // s·lumaLen + i → bucket
              val acc = new Ahash56Acc(n)
              y4mWalk(id, b, start, frameLen, everyNth) { (s, pos) =>
                var i = 0
                while (i < lumaLen) {
                  acc.add(s * lumaLen + i, (b(pos + i) & 0xff).toLong)
                  i += 1
                }
              }
              acc.hash
            } else {
              require(nSampled <= MaxExactLumaSamples,
                s"asset $id: $nSampled sampled frames exceed the exact " +
                  "bound even at frame-mean luma")
              // pass 2: one floor-mean luma value per sampled frame
              val acc = new Ahash56Acc(nSampled)
              y4mWalk(id, b, start, frameLen, everyNth) { (s, pos) =>
                var sum = 0L; var i = 0
                while (i < lumaLen) { sum += (b(pos + i) & 0xff); i += 1 }
                acc.add(s, sum / lumaLen)
              }
              acc.hash
            }
          (id, nFrames, nSampled, hash)
        }
      }
      .toDF("asset_id", "n_frames", "n_sampled_frames", "ahash")
  }

  /**
   * SEGMENT-level video fingerprints — the shared-footage near-dup key
   * a whole-stream hash cannot be ([[audioAHashWindows]]' video twin):
   * the keyframe-sampled luma stream (every `everyNth` frame, the
   * [[videoAHash]] stride) groups into segments of `segmentFrames`
   * consecutive SAMPLED frames, and each segment's concatenated luma
   * folds through the 56-bucket rule — one (asset_id, segment_id,
   * ahash) row per segment (trailing partial segment included). A
   * stream that reuses a SEGMENT of another (sampled clips, recut
   * footage) matches on the shared segments even when the streams
   * differ — feed the rows to [[ahashWindowNearDupPairs]]. Per-segment
   * value count is ≤ segmentFrames·w·h, required ≤ the exact luma
   * bound at runtime (first frame, once geometry is known) — size
   * `segmentFrames` so a segment also fits task memory.
   *
   * @return (asset_id, segment_id, n_sampled_frames, ahash) for video
   *         assets; zero-frame streams emit no rows
   */
  def videoAHashSegments(
      assets: DataFrame,
      segmentFrames: Int = 128,
      everyNth: Int = 2): DataFrame = {
    require(segmentFrames > 0, s"segmentFrames must be positive, got $segmentFrames")
    require(everyNth > 0, s"everyNth must be positive, got $everyNth")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("meta.kind") === "video")
      .select(col("asset_id"), col("payload"))
      .flatMap { r: Row =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        val (lumaLen, frameLen, start) = y4mGeometry(id, b)
        require(segmentFrames.toLong * lumaLen <= MaxExactLumaSamples,
          s"asset $id: a $segmentFrames-frame segment of $lumaLen-byte " +
            "luma planes exceeds the exact cross-product bound — lower " +
            "segmentFrames")
        // buffer ONE segment's luma (bounded by segmentFrames·lumaLen),
        // flush to a hash row at each segment boundary
        val buf = new Array[Byte](segmentFrames * lumaLen)
        var filled = 0
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        def flush(): Unit = if (filled > 0) {
          val m = filled
          val hash = ahashFold(m.toLong)(i => (buf(i.toInt) & 0xff).toLong)
          out += ((id, out.size.toLong, (m / lumaLen).toLong, hash))
          filled = 0
        }
        y4mWalk(id, b, start, frameLen, everyNth) { (s, pos) =>
          System.arraycopy(b, pos, buf, filled, lumaLen)
          filled += lumaLen
          if ((s + 1) % segmentFrames == 0) flush()
        }
        flush() // trailing partial segment continues the id sequence
        out
      }
      .toDF("asset_id", "segment_id", "n_sampled_frames", "ahash")
  }

  /** Locate + validate the WAV data chunk: (byte offset, n int16
    * samples) — the [[parseWav]] RIFF walk yielding the PCM's position
    * instead of its (count, sum), so callers fold samples straight
    * from the bytes. Validation is ORDER-STRICT: the `fmt ` chunk must
    * PRECEDE `data` (a payload whose fmt is missing or trails its data
    * must not decode unvalidated — PCM16 is asserted before a single
    * sample is read), and a second `data` chunk is rejected instead of
    * silently replacing the first. */
  private def wavDataChunk(id: Long, b: Array[Byte]): (Int, Long) = {
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int): String = new String(b, o, 4, "US-ASCII")
    require(b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"asset $id: not a RIFF/WAVE payload")
    var pos = 12
    var sawFmt = false
    var dataOff = -1
    var nSamples = 0L
    while (pos + 8 <= b.length) {
      val id4 = tag(pos); val size = le32(pos + 4); pos += 8
      require(size >= 0 && pos + size <= b.length,
        s"asset $id: corrupt/truncated $id4 chunk (size $size at ${pos - 8})")
      id4 match {
        case "fmt " =>
          require(le16(pos) == 1, s"asset $id: non-PCM WAV")
          require(le16(pos + 14) == 16,
            s"asset $id: only PCM16 supported, got ${le16(pos + 14)}")
          sawFmt = true
        case "data" =>
          require(sawFmt,
            s"asset $id: data chunk before/without fmt — refusing to " +
              "decode unvalidated samples")
          require(dataOff < 0, s"asset $id: duplicate data chunk")
          dataOff = pos
          nSamples = size / 2L
        case _ => // skip unknown chunk
      }
      pos += size + (size & 1)
    }
    require(dataOff >= 0, s"asset $id: missing data chunk")
    (dataOff, nSamples)
  }

  /** Y4M header parse + validation: (lumaLen, frameLen, first frame
    * position) — the [[parseY4m]] prologue shared by the hashers. */
  private def y4mGeometry(id: Long, b: Array[Byte]): (Int, Int, Int) = {
    var pos = 0
    while (pos < b.length && b(pos) != '\n') pos += 1
    val params = new String(b, 0, pos, "US-ASCII").split(' ')
    require(params.nonEmpty && params(0) == "YUV4MPEG2",
      s"asset $id: not a y4m payload")
    pos += 1
    val w = params.collectFirst { case p if p.startsWith("W") => p.tail.toLong }
      .getOrElse(throw new IllegalArgumentException(s"asset $id: y4m missing W"))
    val h = params.collectFirst { case p if p.startsWith("H") => p.tail.toLong }
      .getOrElse(throw new IllegalArgumentException(s"asset $id: y4m missing H"))
    require(!params.exists(p => p.startsWith("C") && p != "C420"),
      s"asset $id: only C420 supported")
    require(w > 0 && h > 0 && w * h * 3 / 2 <= Int.MaxValue.toLong,
      s"asset $id: corrupt y4m dimensions ${w}x$h")
    ((w * h).toInt, (w * h * 3 / 2).toInt, pos)
  }

  /** Y4M frame walk from `start`: visits every `everyNth`-th frame's
    * payload as `onSampled(sampledIndex, payloadPos)`; returns
    * (n_frames, n_sampled). Callers fold luma straight from the bytes
    * — the walk materializes nothing. */
  private def y4mWalk(
      id: Long, b: Array[Byte], start: Int, frameLen: Int, everyNth: Int)(
      onSampled: (Long, Int) => Unit): (Long, Long) = {
    var pos = start
    var frames = 0L; var sampled = 0L
    while (pos < b.length) {
      require(pos + 5 <= b.length &&
        new String(b, pos, 5, "US-ASCII") == "FRAME",
        s"asset $id: corrupt y4m frame header at $pos")
      pos += 5
      while (pos < b.length && b(pos) != '\n') pos += 1 // frame params
      pos += 1
      require(b.length - pos >= frameLen, s"asset $id: truncated y4m frame")
      if (frames % everyNth == 0) {
        onSampled(sampled, pos)
        sampled += 1
      }
      pos += frameLen
      frames += 1
    }
    (frames, sampled)
  }

  /**
   * INTEGER image RESIZE (downsample) — the aHash bucketing promoted
   * to a standalone transform: the decoded gray raster collapses to
   * `targetW` equal spans (pixel i → bucket ⌊i·targetW/n⌋) and each
   * present bucket emits its FLOOR-MEAN gray value ⌊bsum/bcnt⌋ —
   * exact integer arithmetic end to end, so any engine replays the
   * resized raster bit-for-bit (the reference's floor-division idf
   * spirit applied to pixels). This is the thumbnail/feature-grid
   * stage of a multimodal training pipeline; images NARROWER than
   * `targetW` emit only the buckets the downsample map reaches
   * (an upsample would have to invent pixels — out of scope, and the
   * sparse output makes the limitation visible instead of silent).
   *
   * Scale shape: partition-local decode+fold ([[decodeMedia]]'s
   * mapPartitions corner), ≤ targetW rows out per image; compose with
   * [[repartitionForDecode]] for MB payloads.
   *
   * @return (asset_id, width, bucket, px) for image assets, one row
   *         per present bucket
   */
  def imageResize(assets: DataFrame, targetW: Int = 16): DataFrame = {
    require(targetW >= 1 && targetW <= 65536,
      s"targetW must be in [1, 65536], got $targetW")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("meta.kind") === "image")
      .select(col("asset_id"), col("payload"))
      .flatMap { r: Row =>
        val id = r.getLong(0)
        val (w, _, gray) = ppmGray(id, r.getAs[Array[Byte]](1))
        val n = gray.length
        val sums = new Array[Long](targetW)
        val cnts = new Array[Long](targetW)
        var i = 0
        while (i < n) {
          val j = (i.toLong * targetW / n).toInt
          sums(j) += gray(i); cnts(j) += 1
          i += 1
        }
        (0 until targetW).collect {
          case j if cnts(j) > 0 => (id, w, j.toLong, sums(j) / cnts(j))
        }
      }
      .toDF("asset_id", "width", "bucket", "px")
  }

  /** PPM P6 pixel extraction: header walk as [[parsePpm]], gray value =
    * the first channel byte of each pixel (our encoder writes equal
    * channels; for true color this is the R plane — documented, cheap,
    * and stable). */
  private def ppmGray(id: Long, b: Array[Byte]): (Long, Long, Array[Int]) = {
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6',
      s"asset $id: not a PPM payload")
    var pos = 2
    def isWs(c: Int) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    def nextInt(): Long = {
      while (pos < b.length && (isWs(b(pos)) || b(pos) == '#')) {
        if (b(pos) == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else pos += 1
      }
      var v = 0L
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval == 255, s"asset $id: unsupported PPM maxval $maxval")
    require(w * h <= Int.MaxValue.toLong,
      s"asset $id: raster too large for a single in-memory decode")
    pos += 1
    val n = (w * h).toInt
    require(b.length - pos >= n.toLong * 3, s"asset $id: truncated PPM raster")
    val gray = new Array[Int](n)
    var i = 0
    while (i < n) { gray(i) = b(pos + 3 * i) & 0xff; i += 1 }
    (w, h, gray)
  }

  /**
   * Banded HAMMING near-dup pairs over [[imageAHash]] fingerprints —
   * the q14 SimHash shape at 56 bits: 7 bands of 8 bits, candidates
   * meet only on an equal (band, band_bits) key (pigeonhole: any pair
   * within hamming ≤ 6 shares at least one untouched band, so banding
   * loses NOTHING the threshold admits — the oracle is the all-pairs
   * brute force and must agree exactly), and multi-band duplicates
   * drop via the first-matching-band filter — decidable per row from
   * h1^h2, no distinct exchange.
   *
   * @param maxDist Hamming threshold, ≤ 6 (the 7-band guarantee)
   * @return (d1, d2, hamming) with d1 < d2
   */
  def imageNearDupPairs(hashes: DataFrame, maxDist: Int = 6): DataFrame =
    ahashNearDupPairs(hashes, maxDist)

  /** The band layouts the 56-bit hash admits: nBands·bandBits must
    * tile the hash exactly (so every bit is covered and the pigeonhole
    * guarantee maxDist ≤ nBands−1 holds), and bandBits ≤ 16 keeps the
    * hot-bucket key space (nBands·2^bandBits ≤ 65 536) driver-safe BY
    * CONSTRUCTION. Admissible: 56×1, 28×2, 14×4, 8×7, 7×8, 4×14. */
  private[graft] def requireBandLayout(
      nBands: Int, bandBits: Int, maxDist: Int): Unit = {
    require(nBands >= 1 && bandBits >= 1 && nBands * bandBits == AHashBits,
      s"band layout must tile the $AHashBits-bit hash exactly — " +
        s"got $nBands bands x $bandBits bits")
    require(bandBits <= 16,
      s"bandBits > 16 makes the hot-bucket key space driver-unsafe, got $bandBits")
    require(maxDist >= 0 && maxDist <= nBands - 1,
      s"$nBands-band pigeonhole covers hamming <= ${nBands - 1}, got $maxDist")
  }

  // ── Band-layout saturation radar ────────────────────────────────────
  //
  // The round-10 media-window stress measured the boundary the default
  // 7×8 layout hits (BASELINE.md): at ×10 duplication the 1,792-key
  // space saturates — the hot-bucket guard drops most buckets WHOLE,
  // the state artifact SHRINKS while the corpus grows, and recall
  // collapses answer-invariantly (496 → 115 matched arrivals). It
  // wrote down two rules as prose; this radar is those rules as code
  // (the deriveLshBits / deriveHashedDims / dfAuto precedent):
  //  (1) the guard bound must scale with a caller-declared duplication
  //      factor — [[scaledGuardBound]];
  //  (2) saturation is observable (state rows shrinking relative to
  //      corpus rows ⇔ guard-skip mass above a fraction of band rows —
  //      the same drop, counted from either side) and the layout must
  //      widen when it trips — [[bandSaturation]] measures it,
  //      [[BandAuto]] acts on it.

  /** Sentinel `nBands` value for the banded-Hamming operators: measure
    * saturation and derive the layout from the corpus (the `dfAuto`
    * convention). The `bandBits` argument is ignored under auto. */
  val BandAuto: Int = 0

  /** A layout is saturated when the guard would skip more than this
    * fraction of the corpus's band rows — past it, the banded join is
    * mostly blind and the verdict set shrinks with the corpus (the
    * BASELINE.md shrinking-state telltale). */
  val SaturationFrac: Double = 0.5

  /** Guard bound scaled by a caller-declared duplication factor —
    * BASELINE.md media-window rule (1): D salted copies pile IDENTICAL
    * hashes into one bucket, so a bound sized for unique corpora drops
    * exactly the reuse mass the tier exists to find (at the default
    * bound the ×10 stress lost ~16 of 250 reuse arrivals; at 10× the
    * bound it lost none). */
  def scaledGuardBound(
      duplication: Int,
      base: Int = graft.operators.Dedup.MaxPairBucket): Int = {
    require(duplication >= 1,
      s"duplication factor must be >= 1, got $duplication")
    require(base > 0, s"base guard bound must be positive, got $base")
    val b = base.toLong * duplication
    if (b > Int.MaxValue) Int.MaxValue else b.toInt
  }

  /** Fraction of the corpus's band rows the hot-bucket guard skips at
    * this layout and bound — the saturation signal, measured (one
    * bounded aggregation over the ≤ 65 536-key bucket space plus a
    * count; call on a persisted frame). */
  def bandSaturation(
      hashes: DataFrame,
      maxBucketSize: Int = graft.operators.Dedup.MaxPairBucket,
      nBands: Int = 7,
      bandBits: Int = 8): Double = {
    requireBandLayout(nBands, bandBits, 0)
    require(maxBucketSize > 0,
      s"maxBucketSize must be positive, got $maxBucketSize")
    val n = hashes.count()
    if (n == 0L) return 0.0
    val skipped = ahashSkippedBuckets(hashes, maxBucketSize, nBands, bandBits)
      .agg(coalesce(sum(col("bucket_n")), lit(0L))).head().getLong(0)
    skipped.toDouble / (n.toDouble * nBands)
  }

  /** Every layout the 56-bit hash admits, bandBits ascending. */
  private val AllBandLayouts: Seq[(Int, Int)] =
    Seq((56, 1), (28, 2), (14, 4), (8, 7), (7, 8), (4, 14))

  /** The widen ladder for a threshold: layouts whose pigeonhole covers
    * `maxDist`, from the conventional key space upward — (7,8) → (4,14)
    * for maxDist ≤ 3, (7,8) alone for 4–6, (8,7) alone for 7, … Narrow
    * layouts below the conventional one are excluded: they cost more
    * band rows for a SMALLER key space, the wrong direction under
    * saturation. */
  private[graft] def bandLayoutLadder(maxDist: Int): Seq[(Int, Int)] = {
    val adm = AllBandLayouts.filter { case (nb, _) => nb - 1 >= maxDist }
    require(adm.nonEmpty,
      s"no band layout of the $AHashBits-bit hash covers maxDist=$maxDist")
    val maxBits = adm.map(_._2).max
    adm.filter(_._2 >= math.min(8, maxBits))
  }

  /** Resolve [[BandAuto]]: walk the ladder measuring skip mass, keep
    * the first unsaturated layout; when even the widest admissible
    * layout saturates, fail LOUDLY naming the next wider layout and
    * the tighter threshold that would unlock it (never silently serve
    * a mostly-blind join). */
  private def resolveBandLayout(
      hashes: DataFrame, maxDist: Int, maxBucketSize: Int): (Int, Int) = {
    val ladder = bandLayoutLadder(maxDist)
    val found = ladder.iterator.map { case (nb, bb) =>
      (nb, bb, bandSaturation(hashes, maxBucketSize, nb, bb))
    }.find(_._3 <= SaturationFrac)
    found match {
      case Some((nb, bb, _)) => (nb, bb)
      case None =>
        val (nb, bb) = ladder.last
        val wider = AllBandLayouts.find(_._2 > bb)
        val unlock = wider match {
          case Some((wnb, wbb)) =>
            s"the wider ${wnb}x$wbb layout would spread the mass over " +
              s"${wnb.toLong * (1L << wbb)} keys but its pigeonhole only " +
              s"covers maxDist <= ${wnb - 1}; "
          case None => ""
        }
        throw new IllegalArgumentException(
          s"band-layout radar: every layout admissible at maxDist=$maxDist " +
            s"is SATURATED (guard-skip mass > $SaturationFrac of band rows " +
            s"at ${nb}x$bb, bound=$maxBucketSize) — the banded join would " +
            s"be mostly blind and the verdict set would shrink with the " +
            s"corpus. $unlock" +
            "raise the bound to the corpus's known duplication " +
            "(scaledGuardBound) or tighten maxDist")
    }
  }

  /** Shared [[BandAuto]] dispatch: explicit layouts validate as before;
    * auto measures and derives (`hashes` must already be persisted —
    * the radar runs a count plus one bounded aggregation per rung).
    * `private[graft]`: the streaming state builders run the same
    * dispatch at their build boundary (the FromState starts then read
    * the resolved layout from the artifact's meta row). */
  private[graft] def resolvedBandLayout(
      hashes: DataFrame, maxDist: Int, maxBucketSize: Int,
      nBands: Int, bandBits: Int): (Int, Int) =
    if (nBands == BandAuto) resolveBandLayout(hashes, maxDist, maxBucketSize)
    else { requireBandLayout(nBands, bandBits, maxDist); (nBands, bandBits) }

  /**
   * The modality-agnostic banded-Hamming engine behind
   * [[imageNearDupPairs]] — any (asset_id, ahash) frame
   * ([[imageAHash]], [[audioAHash]], [[videoAHash]]) goes through the
   * same banding with the same pigeonhole guarantee: every pair within
   * hamming ≤ nBands−1 shares an untouched band, so the banded join
   * loses nothing the threshold admits (oracle = all-pairs brute
   * force, exact agreement WHENEVER no bucket exceeds the guard —
   * the same conditional contract as the text tiers' lshCandidates).
   *
   * BAND LAYOUT (parameterized — the escape hatch the default's key
   * space eventually forces): the default 7×8-bit layout has only
   * 7×256 = 1 792 bucket keys, so at millions of assets EVERY bucket
   * is populated and the join's candidate volume grows as Σ bucket² ≈
   * n²/256 per band — the quadratic the banding was supposed to
   * avoid. WIDER bands spread the same mass over a bigger key space
   * at the price of a tighter threshold: 4×14-bit has 65 536 keys and
   * guarantees maxDist ≤ 3 — at the scale where most 8-bit buckets
   * are legitimately hot, that is the right trade
   * ([[requireBandLayout]] lists the admissible layouts). Either way
   * the key space stays ≤ 65 536, so the guard's eager collect stays
   * driver-safe BY CONSTRUCTION. Pass `nBands =` [[BandAuto]] to let
   * the SATURATION RADAR measure the skip mass and widen (or fail
   * loudly naming the trade) instead of trusting a hand-picked layout
   * — the round-10 stress's prose rules as code.
   *
   * HOT-BUCKET GUARD: buckets above `maxBucketSize` members are
   * excluded WHOLE before the join (observable via
   * [[ahashSkippedBuckets]], the lshSkippedBuckets convention); a
   * pair whose every shared band was skipped is not reported — the
   * declared recall trade on degenerate hash masses. The hot set is
   * resolved ONCE at construction (an eager bounded aggregate, the
   * nearDupScreen/skewJoin radar precedent) and the guard stays a
   * codegen'd literal filter: the zero-exchange first-SURVIVING-band
   * dedup (a skipped band produced no join row, so the next surviving
   * matching band claims the pair — batch-guard semantics identical
   * to the streaming screens').
   *
   * The hashes frame is persisted for the call's lifetime
   * ([[graft.Caching.persist]] — release via `Caching.scoped`, the
   * repo convention): its lineage is a full media decode, and the hot
   * collect plus the self-join's two sides would otherwise evaluate
   * it three times.
   */
  def ahashNearDupPairs(
      hashes: DataFrame,
      maxDist: Int = 6,
      maxBucketSize: Int = graft.operators.Dedup.MaxPairBucket,
      nBands: Int = 7,
      bandBits: Int = 8): DataFrame = {
    require(maxBucketSize > 0,
      s"maxBucketSize must be positive, got $maxBucketSize")
    val h = graft.Caching.persist(hashes.select(col("asset_id"), col("ahash")))
    val (nb, bb) = resolvedBandLayout(h, maxDist, maxBucketSize, nBands, bandBits)
    val hot = ahashHotByBand(h, maxBucketSize, nb, bb)
    val banded = ahashDropHot(ahashBands(h, nb, bb), hot, nb)
    val a = banded.select(col("asset_id").as("d1"), col("ahash").as("h1"),
      col("band"), col("band_bits"))
    val b = banded.select(col("asset_id").as("d2"), col("ahash").as("h2"),
      col("band"), col("band_bits"))
    a.join(b, Seq("band", "band_bits"))
      .where(col("d1") < col("d2") &&
        col("band") === ahashFirstSurvivingBand(hot, nb, bb))
      .withColumn("hamming", bit_count(expr("h1 ^ h2")).cast("long"))
      .where(col("hamming") <= maxDist)
      .select(col("d1"), col("d2"), col("hamming"))
  }

  /**
   * ASSET-level near-dup verdicts from WINDOW/SEGMENT fingerprints
   * ([[audioAHashWindows]] / [[videoAHashSegments]]) — near-dup on a
   * shared SEGMENT, the long-media production ask (reused footage,
   * sampled clips) a whole-clip hash cannot see: window rows go
   * through the SAME banded join + hot-bucket guard as
   * [[ahashNearDupPairs]] (window identity is irrelevant to the
   * banding — every window row is a candidate key), pairs are
   * CROSS-ASSET only (same-asset window pairs never report), and the
   * qualifying window pairs roll up to one row per asset pair: the
   * minimum window-pair hamming and the number of qualifying window
   * pairs. Oracle = brute force over all cross-asset window pairs —
   * exact agreement whenever no bucket exceeds the guard.
   *
   * @param windowHashes (asset_id, …, ahash) — one row per window;
   *        any extra columns are ignored
   * @return (d1, d2, min_hamming, n_window_hits) with d1 < d2
   */
  def ahashWindowNearDupPairs(
      windowHashes: DataFrame,
      maxDist: Int = 6,
      maxBucketSize: Int = graft.operators.Dedup.MaxPairBucket,
      nBands: Int = 7,
      bandBits: Int = 8): DataFrame = {
    require(maxBucketSize > 0,
      s"maxBucketSize must be positive, got $maxBucketSize")
    val h = graft.Caching.persist(
      windowHashes.select(col("asset_id"), col("ahash")))
    val (nb, bb) = resolvedBandLayout(h, maxDist, maxBucketSize, nBands, bandBits)
    val hot = ahashHotByBand(h, maxBucketSize, nb, bb)
    val banded = ahashDropHot(ahashBands(h, nb, bb), hot, nb)
    val a = banded.select(col("asset_id").as("d1"), col("ahash").as("h1"),
      col("band"), col("band_bits"))
    val b = banded.select(col("asset_id").as("d2"), col("ahash").as("h2"),
      col("band"), col("band_bits"))
    a.join(b, Seq("band", "band_bits"))
      .where(col("d1") < col("d2") &&
        col("band") === ahashFirstSurvivingBand(hot, nb, bb))
      .withColumn("hamming", bit_count(expr("h1 ^ h2")).cast("long"))
      .where(col("hamming") <= maxDist)
      .groupBy(col("d1"), col("d2"))
      .agg(min(col("hamming")).as("min_hamming"),
        count(lit(1)).as("n_window_hits"))
  }

  /**
   * INCREMENTAL window near-dup — arriving assets' windows probe the
   * HISTORY's window bands and never each other (the
   * [[imageNearDupAgainst]] bookend for the segment tier): a delta
   * asset any of whose windows lands within `maxDist` of any history
   * window reports its closest history asset — min window-pair
   * hamming, asset-id tie-break — plus how many of its window pairs
   * hit that asset. Hot buckets are a HISTORY property (a hot history
   * bucket fans out every probing delta window); the history frame is
   * persisted for the call's lifetime (hot collect + band join).
   *
   * @param deltaWindows   (asset_id, …, ahash) window rows of the
   *        arrivals ([[audioAHashWindows]]/[[videoAHashSegments]])
   * @param historyWindows same shape for the history corpus
   * @return (asset_id, match_id, min_hamming, n_window_hits) — one
   *         row per MATCHED delta asset
   */
  def ahashWindowNearDupAgainst(
      deltaWindows: DataFrame,
      historyWindows: DataFrame,
      maxDist: Int = 6,
      maxBucketSize: Int = graft.operators.Dedup.MaxPairBucket,
      nBands: Int = 7,
      bandBits: Int = 8): DataFrame = {
    require(maxBucketSize > 0,
      s"maxBucketSize must be positive, got $maxBucketSize")
    val hist = graft.Caching.persist(
      historyWindows.select(col("asset_id"), col("ahash")))
    // saturation is a HISTORY property, like the hot set itself
    val (nb, bb) = resolvedBandLayout(hist, maxDist, maxBucketSize, nBands, bandBits)
    val hot = ahashHotByBand(hist, maxBucketSize, nb, bb)
    val d = ahashBands(deltaWindows.select(col("asset_id"), col("ahash")),
      nb, bb)
      .select(col("asset_id"), col("ahash").as("h1"),
        col("band"), col("band_bits"))
    val h = ahashDropHot(ahashBands(hist, nb, bb), hot, nb)
      .select(col("asset_id").as("match_id"),
        col("ahash").as("h2"), col("band"), col("band_bits"))
    d.join(h, Seq("band", "band_bits"))
      .where(col("band") === ahashFirstSurvivingBand(hot, nb, bb))
      .withColumn("hamming", bit_count(expr("h1 ^ h2")).cast("long"))
      .where(col("hamming") <= maxDist)
      .groupBy(col("asset_id"), col("match_id"))
      .agg(min(col("hamming")).as("_mh"), count(lit(1)).as("_hits"))
      // closest history ASSET per arrival: (min hamming, id) — _hits
      // rides third in the struct and is never reached (match_id is
      // unique within the group)
      .groupBy(col("asset_id"))
      .agg(min(struct(col("_mh"), col("match_id"), col("_hits"))).as("_b"))
      .select(col("asset_id"), col("_b.match_id").as("match_id"),
        col("_b._mh").as("min_hamming"), col("_b._hits").as("n_window_hits"))
  }

  /** Audit twin of [[ahashNearDupPairs]]' hot-bucket guard: the
    * (band, band_bits, bucket_n) buckets the join excludes at this
    * bound — the [[graft.operators.Dedup.lshSkippedBuckets]]
    * observability contract for the perceptual tier. */
  def ahashSkippedBuckets(
      hashes: DataFrame,
      maxBucketSize: Int = graft.operators.Dedup.MaxPairBucket,
      nBands: Int = 7,
      bandBits: Int = 8): DataFrame =
    ahashBands(hashes, nBands, bandBits).groupBy(col("band"), col("band_bits"))
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > maxBucketSize)

  /** The nBands×bandBits band explosion of an (asset_id, ahash) frame
    * (multiple rows per asset_id are fine — the window tier). */
  private def ahashBands(
      hashes: DataFrame, nBands: Int, bandBits: Int): DataFrame = {
    val mask = (1L << bandBits) - 1
    hashes.select(col("asset_id"), col("ahash"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b.toLong).as("band"),
          shiftright(col("ahash"), bandBits * b).bitwiseAND(lit(mask))
            .as("band_bits"))): _*)).as("bb"))
      .select(col("asset_id"), col("ahash"),
        col("bb.band").as("band"), col("bb.band_bits").as("band_bits"))
  }

  /** The hot-bucket set (band → hot band_bits values), resolved
    * eagerly — driver-safe BY CONSTRUCTION: the key space
    * nBands·2^bandBits is ≤ 65 536 for every admissible layout
    * ([[requireBandLayout]]), bounding the collect no matter the
    * input. */
  private def ahashHotByBand(
      hashes: DataFrame, maxBucketSize: Int,
      nBands: Int, bandBits: Int): Map[Long, Seq[Long]] =
    ahashSkippedBuckets(hashes, maxBucketSize, nBands, bandBits)
      .select(col("band"), col("band_bits")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  private def ahashIsHot(
      hot: Map[Long, Seq[Long]], band: Int, bits: Column): Column =
    hot.get(band.toLong) match {
      case Some(vals) => bits.isin(vals: _*)
      case None       => lit(false)
    }

  /** Drop band rows that fall in a hot bucket — a codegen'd literal
    * filter, never a join (the hot set is a plan literal). */
  private def ahashDropHot(
      banded: DataFrame, hot: Map[Long, Seq[Long]], nBands: Int): DataFrame =
    if (hot.isEmpty) banded
    else banded.where(!(0 until nBands).map(b =>
      col("band") === b.toLong && ahashIsHot(hot, b, col("band_bits")))
      .reduce(_ || _))

  /** First band where h1 and h2 agree AND whose bucket survived the
    * guard — both decidable per row (h1^h2 + the literal hot set), so
    * multi-band candidate duplicates drop via a codegen'd filter
    * instead of a distinct exchange (the simhashPairs idiom); a
    * skipped band produced no join row and must not claim the pair —
    * the next surviving matching band's row carries it (the streaming
    * screens' guard semantics). */
  private def ahashFirstSurvivingBand(
      hot: Map[Long, Seq[Long]], nBands: Int, bandBits: Int): Column = {
    val diff = expr("h1 ^ h2")
    val mask = (1L << bandBits) - 1
    (0 until nBands)
      .map { j =>
        val agrees = shiftright(diff, bandBits * j).bitwiseAND(lit(mask)) === 0L
        // both sides share the band value on an agreeing band, so the
        // h1-side bits stand for the bucket key
        val survives = !ahashIsHot(hot, j,
          shiftright(col("h1"), bandBits * j).bitwiseAND(lit(mask)))
        (agrees && survives, j)
      }
      .foldRight(lit(null).cast("long"): Column) { case ((claims, j), tail) =>
        when(claims, lit(j.toLong)).otherwise(tail)
      }
  }

  /**
   * INCREMENTAL image near-dup screen — arriving images probe the
   * HISTORY's band index and never each other: the daily-ingest
   * bookend of [[imageNearDupPairs]], same shape as the text tiers'
   * delta⋈history screens (no delta self-join, history bands build
   * once). A delta image within `maxDist` of any history image
   * reports its closest history match (min hamming, id tie-break).
   *
   * The history frame is persisted for the call's lifetime
   * ([[graft.Caching.persist]] — release via `Caching.scoped`): its
   * lineage is a full media decode, and the hot collect plus the band
   * join would otherwise evaluate it twice.
   *
   * @return (asset_id, match_id, hamming) — one row per MATCHED delta
   *         image
   */
  def imageNearDupAgainst(
      deltaHashes: DataFrame,
      historyHashes: DataFrame,
      maxDist: Int = 6,
      maxBucketSize: Int = graft.operators.Dedup.MaxPairBucket,
      nBands: Int = 7,
      bandBits: Int = 8): DataFrame = {
    requireBandLayout(nBands, bandBits, maxDist)
    require(maxBucketSize > 0,
      s"maxBucketSize must be positive, got $maxBucketSize")
    // hot buckets are a HISTORY property here (a hot history bucket
    // fans out every probing delta row); delta rows keep their bands
    // and simply miss on the pruned keys
    val hist = graft.Caching.persist(
      historyHashes.select(col("asset_id"), col("ahash")))
    val hot = ahashHotByBand(hist, maxBucketSize, nBands, bandBits)
    val d = ahashBands(deltaHashes, nBands, bandBits).select(col("asset_id"),
      col("ahash").as("h1"), col("band"), col("band_bits"))
    val h = ahashDropHot(ahashBands(hist, nBands, bandBits), hot, nBands)
      .select(col("asset_id").as("match_id"),
        col("ahash").as("h2"), col("band"), col("band_bits"))
    d.join(h, Seq("band", "band_bits"))
      .where(col("band") === ahashFirstSurvivingBand(hot, nBands, bandBits))
      .withColumn("hamming", bit_count(expr("h1 ^ h2")).cast("long"))
      .where(col("hamming") <= maxDist)
      .groupBy(col("asset_id"))
      .agg(min(struct(col("hamming"), col("match_id"))).as("_best"))
      .select(col("asset_id"), col("_best.match_id").as("match_id"),
        col("_best.hamming").as("hamming"))
  }
}
