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
          (id, w, h, ahash56(gray))
        }
      }
      .toDF("asset_id", "width", "height", "ahash")
  }

  /** The shared 56-bucket exact mean-threshold fold behind
    * [[imageAHash]]/[[audioAHash]]/[[videoAHash]]: value i → bucket
    * ⌊i·56/n⌋, bit j set iff bucket j's mean ≥ the overall mean,
    * compared as the EXACT cross-product `sum_j·n ≥ total·cnt_j` — no
    * division, no float, engine-identical by construction. Callers
    * bound the value domain so the cross-product stays inside int64
    * (values ≤ V need n ≤ √(2⁶³/V): 6·10⁸ at V = 255, 1.6·10⁷ at
    * V = 32767 — asserted loudly at the audio call site). Empty
    * buckets and empty inputs hash 0 on their bits. */
  private def ahash56(values: Array[Int]): Long = {
    val n = values.length
    val sums = new Array[Long](AHashBits)
    val cnts = new Array[Long](AHashBits)
    var i = 0
    while (i < n) {
      val j = (i.toLong * AHashBits / n).toInt
      sums(j) += values(i); cnts(j) += 1
      i += 1
    }
    val total = sums.sum
    var hash = 0L
    var j = 0
    while (j < AHashBits) {
      if (cnts(j) > 0 && sums(j) * n >= total * cnts(j))
        hash |= 1L << j
      j += 1
    }
    hash
  }

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
   * mapPartitions corner), one (id, n, hash) row per clip out;
   * compose with [[repartitionForDecode]] for MB payloads. Int64
   * bound: |sample| ≤ 32767 needs n ≤ 1.6·10⁷ samples (~33 min at
   * 8 kHz) for the cross-product — asserted loudly; longer clips
   * should hash bounded windows.
   *
   * @return (asset_id, n_samples, ahash) for audio assets
   */
  def audioAHash(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("meta.kind") === "audio")
      .select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r: Row =>
          val id = r.getLong(0)
          val samples = wavSamples(id, r.getAs[Array[Byte]](1))
          require(samples.length <= 16000000,
            s"asset $id: ${samples.length} samples exceeds the exact " +
              "cross-product int64 bound (1.6e7) — hash bounded windows")
          val energy = new Array[Int](samples.length)
          var i = 0
          while (i < samples.length) {
            energy(i) = math.abs(samples(i)); i += 1
          }
          (id, samples.length.toLong, ahash56(energy))
        }
      }
      .toDF("asset_id", "n_samples", "ahash")
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
   * Scale shape: partition-local Y4M walk + fold, one row per stream;
   * sampled luma is w·h·⌈frames/everyNth⌉ values ≤ 255 (int64-safe to
   * 6·10⁸ sampled pixels). Zero-frame streams hash 0 (empty raster).
   *
   * @return (asset_id, n_frames, n_sampled_frames, ahash) for video
   *         assets
   */
  def videoAHash(assets: DataFrame, everyNth: Int = 2): DataFrame = {
    require(everyNth > 0, s"everyNth must be positive, got $everyNth")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("meta.kind") === "video")
      .select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r: Row =>
          val id = r.getLong(0)
          val (nFrames, nSampled, luma) =
            y4mSampledLuma(id, r.getAs[Array[Byte]](1), everyNth)
          (id, nFrames, nSampled, ahash56(luma))
        }
      }
      .toDF("asset_id", "n_frames", "n_sampled_frames", "ahash")
  }

  /** WAV data-chunk samples (int16, sign-extended) — the [[parseWav]]
    * RIFF walk yielding the raw PCM instead of its (count, sum). */
  private def wavSamples(id: Long, b: Array[Byte]): Array[Int] = {
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int): String = new String(b, o, 4, "US-ASCII")
    require(b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"asset $id: not a RIFF/WAVE payload")
    var pos = 12
    var out: Array[Int] = null
    while (pos + 8 <= b.length) {
      val id4 = tag(pos); val size = le32(pos + 4); pos += 8
      require(size >= 0 && pos + size <= b.length,
        s"asset $id: corrupt/truncated $id4 chunk (size $size at ${pos - 8})")
      id4 match {
        case "fmt " =>
          require(le16(pos) == 1, s"asset $id: non-PCM WAV")
          require(le16(pos + 14) == 16,
            s"asset $id: only PCM16 supported, got ${le16(pos + 14)}")
        case "data" =>
          out = new Array[Int](size / 2)
          var i = 0
          while (i < size - 1) {
            out(i / 2) = le16(pos + i).toShort.toInt // sign-extend int16
            i += 2
          }
        case _ => // skip unknown chunk
      }
      pos += size + (size & 1)
    }
    require(out != null, s"asset $id: missing data chunk")
    out
  }

  /** Y4M walk yielding (n_frames, n_sampled, sampled luma bytes) for
    * frames 0, everyNth, 2·everyNth, … — the [[parseY4m]] structure
    * with per-frame keep/skip instead of a global (count, sum). */
  private def y4mSampledLuma(
      id: Long, b: Array[Byte], everyNth: Int): (Long, Long, Array[Int]) = {
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
    val lumaLen = (w * h).toInt
    val frameLen = (w * h * 3 / 2).toInt
    val luma = new scala.collection.mutable.ArrayBuffer[Int]()
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
        var i = 0
        while (i < lumaLen) { luma += (b(pos + i) & 0xff); i += 1 }
        sampled += 1
      }
      pos += frameLen
      frames += 1
    }
    (frames, sampled, luma.toArray)
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

  /**
   * The modality-agnostic banded-Hamming engine behind
   * [[imageNearDupPairs]] — any (asset_id, ahash) frame
   * ([[imageAHash]], [[audioAHash]], [[videoAHash]]) goes through the
   * same 7×8-bit banding with the same pigeonhole guarantee: every
   * pair within hamming ≤ 6 shares an untouched band, so the banded
   * join loses nothing the threshold admits (oracle = all-pairs brute
   * force, exact agreement WHENEVER no bucket exceeds the guard —
   * the same conditional contract as the text tiers' lshCandidates).
   *
   * HOT-BUCKET GUARD (the scale boundary this key space forces): a
   * band value is 8 bits, so the whole banding has only 7×256 = 1 792
   * bucket keys — at millions of assets EVERY bucket is populated and
   * the join's candidate volume is Σ bucket² ≈ n²/256 per band, the
   * quadratic the banding was supposed to avoid. Buckets above
   * `maxBucketSize` members are therefore excluded WHOLE before the
   * join (observable via [[ahashSkippedBuckets]], the
   * lshSkippedBuckets convention); a pair whose every shared band was
   * skipped is not reported — the declared recall trade on degenerate
   * hash masses. At the scale where most buckets are legitimately hot,
   * banding stops being the right index — widen the bands (fewer,
   * wider blocks guarantee a smaller maxDist) or route hashes through
   * an exact-rerank candidate tier.
   *
   * The hot set is resolved ONCE at construction (an eager bounded
   * aggregate, the nearDupScreen/skewJoin radar precedent) — the key
   * space caps it at 1 792 rows BY CONSTRUCTION, so the collect is
   * driver-safe no matter the input, and the guard stays a codegen'd
   * literal filter: the zero-exchange first-SURVIVING-band dedup
   * (a skipped band produced no join row, so the next surviving
   * matching band claims the pair — batch-guard semantics identical
   * to the streaming screens').
   */
  def ahashNearDupPairs(
      hashes: DataFrame,
      maxDist: Int = 6,
      maxBucketSize: Int = graft.operators.Dedup.MaxPairBucket): DataFrame = {
    require(maxDist >= 0 && maxDist <= 6,
      s"7-band pigeonhole covers hamming <= 6, got $maxDist")
    require(maxBucketSize > 0,
      s"maxBucketSize must be positive, got $maxBucketSize")
    val hot = ahashHotByBand(hashes, maxBucketSize)
    val banded = ahashDropHot(ahashBands(hashes), hot)
    val a = banded.select(col("asset_id").as("d1"), col("ahash").as("h1"),
      col("band"), col("band_bits"))
    val b = banded.select(col("asset_id").as("d2"), col("ahash").as("h2"),
      col("band"), col("band_bits"))
    a.join(b, Seq("band", "band_bits"))
      .where(col("d1") < col("d2") &&
        col("band") === ahashFirstSurvivingBand(hot))
      .withColumn("hamming", bit_count(expr("h1 ^ h2")).cast("long"))
      .where(col("hamming") <= maxDist)
      .select(col("d1"), col("d2"), col("hamming"))
  }

  /** Audit twin of [[ahashNearDupPairs]]' hot-bucket guard: the
    * (band, band_bits, bucket_n) buckets the join excludes at this
    * bound — the [[graft.operators.Dedup.lshSkippedBuckets]]
    * observability contract for the perceptual tier. */
  def ahashSkippedBuckets(
      hashes: DataFrame,
      maxBucketSize: Int = graft.operators.Dedup.MaxPairBucket): DataFrame =
    ahashBands(hashes).groupBy(col("band"), col("band_bits"))
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > maxBucketSize)

  /** The 7×8-bit band explosion of an (asset_id, ahash) frame. */
  private def ahashBands(hashes: DataFrame): DataFrame =
    hashes.select(col("asset_id"), col("ahash"),
      explode(array((0 until 7).map(b =>
        struct(lit(b.toLong).as("band"),
          shiftright(col("ahash"), 8 * b).bitwiseAND(lit(255L))
            .as("band_bits"))): _*)).as("bb"))
      .select(col("asset_id"), col("ahash"),
        col("bb.band").as("band"), col("bb.band_bits").as("band_bits"))

  /** The ≤ 1 792-key hot-bucket set (band → hot band_bits values),
    * resolved eagerly — driver-safe BY CONSTRUCTION (7 bands × 256
    * values bound the collect no matter the input). */
  private def ahashHotByBand(
      hashes: DataFrame, maxBucketSize: Int): Map[Long, Seq[Long]] =
    ahashSkippedBuckets(hashes, maxBucketSize)
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
      banded: DataFrame, hot: Map[Long, Seq[Long]]): DataFrame =
    if (hot.isEmpty) banded
    else banded.where(!(0 until 7).map(b =>
      col("band") === b.toLong && ahashIsHot(hot, b, col("band_bits")))
      .reduce(_ || _))

  /** First band where h1 and h2 agree AND whose bucket survived the
    * guard — both decidable per row (h1^h2 + the literal hot set), so
    * multi-band candidate duplicates drop via a codegen'd filter
    * instead of a distinct exchange (the simhashPairs idiom); a
    * skipped band produced no join row and must not claim the pair —
    * the next surviving matching band's row carries it (the streaming
    * screens' guard semantics). */
  private def ahashFirstSurvivingBand(hot: Map[Long, Seq[Long]]): Column = {
    val diff = expr("h1 ^ h2")
    (0 until 7)
      .map { j =>
        val agrees = shiftright(diff, 8 * j).bitwiseAND(lit(255L)) === 0L
        // both sides share the band value on an agreeing band, so the
        // h1-side bits stand for the bucket key
        val survives = !ahashIsHot(hot, j,
          shiftright(col("h1"), 8 * j).bitwiseAND(lit(255L)))
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
   * @return (asset_id, match_id, hamming) — one row per MATCHED delta
   *         image
   */
  def imageNearDupAgainst(
      deltaHashes: DataFrame,
      historyHashes: DataFrame,
      maxDist: Int = 6,
      maxBucketSize: Int = graft.operators.Dedup.MaxPairBucket): DataFrame = {
    require(maxDist >= 0 && maxDist <= 6,
      s"7-band pigeonhole covers hamming <= 6, got $maxDist")
    require(maxBucketSize > 0,
      s"maxBucketSize must be positive, got $maxBucketSize")
    // hot buckets are a HISTORY property here (a hot history bucket
    // fans out every probing delta row); delta rows keep their bands
    // and simply miss on the pruned keys
    val hot = ahashHotByBand(historyHashes, maxBucketSize)
    val d = ahashBands(deltaHashes).select(col("asset_id"),
      col("ahash").as("h1"), col("band"), col("band_bits"))
    val h = ahashDropHot(ahashBands(historyHashes), hot)
      .select(col("asset_id").as("match_id"),
        col("ahash").as("h2"), col("band"), col("band_bits"))
    d.join(h, Seq("band", "band_bits"))
      .where(col("band") === ahashFirstSurvivingBand(hot))
      .withColumn("hamming", bit_count(expr("h1 ^ h2")).cast("long"))
      .where(col("hamming") <= maxDist)
      .groupBy(col("asset_id"))
      .agg(min(struct(col("hamming"), col("match_id"))).as("_best"))
      .select(col("asset_id"), col("_best.match_id").as("match_id"),
        col("_best.hamming").as("hamming"))
  }
}
