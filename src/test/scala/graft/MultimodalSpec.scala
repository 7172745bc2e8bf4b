package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private def assets = Multimodal.assetsFromDocuments(
    corpus("1" -> "ab", "2" -> "hello world"))

  test("asset schema carries binary payload + typed metadata") {
    // structural match modulo nullability (expression-derived columns
    // carry conservative nullability marks)
    assets.schema.simpleString shouldBe Multimodal.AssetSchema.simpleString
    val r = assets.where(col("asset_id") === 1).head()
    r.getAs[Array[Byte]]("payload") shouldBe "ab".getBytes("UTF-8")
    r.getStruct(2).getAs[Long]("n_bytes") shouldBe 2L
  }

  test("decodeStub: deterministic fake features over partition batches") {
    val feats = Multimodal.decodeStub(assets).collect()
      .map(f => f.asset_id -> f).toMap
    val ab = feats(1L)
    ab.n_bytes shouldBe 2L
    ab.byte_mean shouldBe ((97 + 98) / 2.0) +- 1e-9 // 'a','b'
    ab.content_md5 shouldBe "187ef4436122d1cc2f40dc2b92f0eba0" // md5("ab")
    ab.byte_hist_head.length shouldBe 8
    // 'a'=97 → bucket 1, 'b'=98 → bucket 2
    ab.byte_hist_head(1) shouldBe 1L
    ab.byte_hist_head(2) shouldBe 1L
  }

  test("asset kinds follow the deterministic id mix") {
    val kinds = assets.select(col("asset_id"), col("meta.kind")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    kinds(1L) shouldBe "audio" // 1 % 3
    kinds(2L) shouldBe "video" // 2 % 3
  }

  test("frameSample slices fixed-size frames, keeping every nth") {
    // payload "hello world" (11 bytes), 4-byte frames → 3 frames; nth=2
    // keeps frames 0 and 2 ("hell", "orld" — last frame short)
    val frames = Multimodal.frameSample(
      assets.where(col("asset_id") === 2), frameBytes = 4, everyNth = 2)
      .collect()
      .map(r => r.getAs[Long]("frame_idx") ->
        new String(r.getAs[Array[Byte]]("frame_bytes"), "UTF-8"))
      .toMap
    frames.keySet shouldBe Set(0L, 2L)
    frames(0L) shouldBe "hell"
    frames(2L) shouldBe "rld" // bytes 9..11 — substring truncates at end
  }

  test("frameSample emits no phantom frame for zero-byte payloads") {
    val withEmpty = Multimodal.assetsFromDocuments(
      corpus("1" -> "", "2" -> "hello world"))
    val frames = Multimodal.frameSample(withEmpty, frameBytes = 4, everyNth = 1)
      .collect()
    // the empty payload contributes NOTHING (n_frames = 0), not a
    // frame_idx = 0 row with empty bytes
    frames.map(_.getAs[Long]("asset_id")).toSet shouldBe Set(2L)
    frames.length shouldBe 3 // ceil(11 / 4)
  }

  test("encodeAssets -> decodeMedia round-trips headers and sample sums") {
    // ids pick the kind: 0 image (PPM), 1 audio (WAV), 2 video (Y4M)
    val docs = corpus("0" -> "abc", "1" -> "ab", "2" -> "abcdefghijklmnop")
    val got = Multimodal.decodeMedia(Multimodal.encodeAssets(docs))
      .collect().sortBy(_.asset_id)

    // image "abc": 3x1 grayscale pixels (97,97,97)(98,98,98)(99,99,99)
    got(0) shouldBe Multimodal.MediaInfo(0L, "image", Some(3L), Some(1L),
      None, None, Some(1L), 9L, 3L * (97 + 98 + 99))
    // audio "ab": PCM16 samples (97-110)*200 = -2600, (98-110)*200 = -2400
    got(1) shouldBe Multimodal.MediaInfo(1L, "audio", None, None,
      Some(8000L), Some(1L), None, 2L, -5000L)
    // video, 16 chars -> one 12-byte C420 frame of 'a'..'l'
    got(2) shouldBe Multimodal.MediaInfo(2L, "video", Some(4L), Some(2L),
      None, None, Some(1L), 12L, (97 to 108).sum.toLong)
  }

  test("video shorter than one frame decodes as a legal zero-frame stream") {
    val got = Multimodal.decodeMedia(
        Multimodal.encodeAssets(corpus("2" -> "short")))
      .collect()
    got should have length 1
    got.head shouldBe Multimodal.MediaInfo(2L, "video", Some(4L), Some(2L),
      None, None, Some(0L), 0L, 0L)
  }

  test("the WAV parser walks chunks per the RIFF spec, not the encoder") {
    // hand-built bytes: an unknown odd-size chunk (padded) BEFORE fmt,
    // to pin the chunk walk against the spec rather than encodeWav's
    // fixed layout
    val bb = java.nio.ByteBuffer.allocate(60)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(52)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("junk".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0)) // 3 bytes + 1 pad to even
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(176400)
      .putShort(4).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(4)
      .putShort(300).putShort(-100)
    val got = Multimodal.decodeOne(7L, bb.array())
    got shouldBe Multimodal.MediaInfo(7L, "audio", None, None,
      Some(44100L), Some(2L), None, 2L, 200L)
  }

  test("the PPM parser honors comments and multi-digit dimensions") {
    val px = Array.tabulate(12 * 2 * 3)(i => (i % 7).toByte)
    val bytes = "P6\n# a comment\n12 2\n255\n".getBytes("US-ASCII") ++ px
    val got = Multimodal.decodeOne(9L, bytes)
    got shouldBe Multimodal.MediaInfo(9L, "image", Some(12L), Some(2L),
      None, None, Some(1L), 72L, px.map(_.toLong).sum)
  }

  test("decodeMedia fails loudly on unknown magic and truncated payloads") {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeOne(1L, Array[Byte](0x42, 0x4d, 0, 0)) // BMP magic
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeOne(2L, "P6\n4 1\n255\n__".getBytes("US-ASCII"))
  }

  test("corrupt chunk sizes fail loudly instead of hanging or indexing out") {
    // a RIFF chunk whose size reads as a NEGATIVE Int (0x80000000) used
    // to walk pos backwards forever: the 'fails loudly' contract must
    // catch it before the chunk is processed
    val neg = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    neg.put("RIFF".getBytes("US-ASCII")).putInt(16)
    neg.put("WAVE".getBytes("US-ASCII"))
    neg.put("junk".getBytes("US-ASCII")).putInt(0x80000000)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeOne(3L, neg.array())
    // an oversized data chunk must require-fail, not raw-AIOOBE
    val over = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    over.put("RIFF".getBytes("US-ASCII")).putInt(40)
    over.put("WAVE".getBytes("US-ASCII"))
    over.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    over.put("data".getBytes("US-ASCII")).putInt(9999)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeOne(4L, over.array())
    // absurd PPM header digits must fail the dimension bound, not
    // overflow the raster size into a silent negative-n pass
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeOne(5L,
        "P6\n99999999999 99999999999\n255\n".getBytes("US-ASCII"))
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeOne(6L, "P6\n0 4\n255\n".getBytes("US-ASCII"))
  }

  test("decodeMedia is stable across the byte-budget repartition") {
    val docs = corpus("0" -> "abc", "1" -> "ab", "2" -> "abcdefghijklmnop")
    val enc = Multimodal.encodeAssets(docs)
    val a = Multimodal.decodeMedia(enc).collect().sortBy(_.asset_id).toSeq
    val b = Multimodal.decodeMedia(
        Multimodal.repartitionForDecode(enc, targetBytesPerPartition = 8))
      .collect().sortBy(_.asset_id).toSeq
    a shouldBe b
  }

  test("decodeStub is stable across repartitioning (partition-local only)") {
    val a = Multimodal.decodeStub(assets).collect().sortBy(_.asset_id).toSeq
    val b = Multimodal.decodeStub(
      Multimodal.repartitionForDecode(assets, targetBytesPerPartition = 4))
      .collect().sortBy(_.asset_id).toSeq
    a shouldBe b
  }

  /** Local 56-bucket exact mean-threshold fold — the ahash56 math. */
  private def local56(g: Seq[Long]): Long = {
    val n = g.length
    if (n == 0) return 0L
    val sums = new Array[Long](56); val cnts = new Array[Long](56)
    g.zipWithIndex.foreach { case (v, i) =>
      val j = (i.toLong * 56 / n).toInt; sums(j) += v; cnts(j) += 1
    }
    val total = g.sum
    (0 until 56).map { j =>
      if (cnts(j) > 0 && sums(j) * n >= total * cnts(j)) 1L << j else 0L
    }.sum
  }

  /** Local aHash replication: the exact integer bucket/threshold math. */
  private def localAHash(text: String): Long = local56(text.map(_.toLong))

  /** Local audio energy-envelope hash: |(c − 110)·200| per char. */
  private def localAudioHash(text: String): Long =
    local56(text.map(c => math.abs((c - 110).toLong) * 200L))

  /** Local keyframe-sampled video hash: every `everyNth` frame's 8
    * luma bytes (chars f·12 … f·12+7). */
  private def localVideoHash(text: String, everyNth: Int): Long = {
    val nf = text.length / 12
    val luma = (0 until nf by everyNth)
      .flatMap(f => (0 until 8).map(k => text.charAt(f * 12 + k).toLong))
    local56(luma)
  }

  test("imageAHash: gradient image sets exactly the bright-half bits") {
    // 112 pixels: 56 dark 'a' (97) then 56 bright 'z' (122); mean is
    // midway, so buckets 0..27 clear and 28..55 set
    val text = "a" * 56 + "z" * 56
    val d = corpus("0" -> text) // doc 0 → image
    val r = Multimodal.imageAHash(Multimodal.encodeAssets(d)).head()
    r.getAs[Long]("width") shouldBe 112L
    r.getAs[Long]("height") shouldBe 1L
    val expected = (28 until 56).map(1L << _).sum
    r.getAs[Long]("ahash") shouldBe expected
    r.getAs[Long]("ahash") shouldBe localAHash(text)
  }

  test("imageAHash matches the local replication on irregular widths") {
    // widths below, at, and off multiples of 56 exercise empty and
    // uneven buckets
    val texts = Seq("kk", "abcxyz", "m" * 55, "quick brown fox " * 9)
    val d = corpus(texts.zipWithIndex.map { case (t, i) =>
      (i * 3).toString -> t }: _*) // ids 0,3,6,9 → all images
    val got = Multimodal.imageAHash(Multimodal.encodeAssets(d)).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Long]("ahash")).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      withClue(s"text '$t':") { got(i * 3L) shouldBe localAHash(t) }
    }
  }

  test("imageNearDupPairs equals the local brute force (pigeonhole recall)") {
    // base text + flips of k chars for k = 0..9: distances from 0 to
    // past the threshold, including multi-bit flips via the shifted
    // global mean
    val base = ('a' to 'z').mkString * 8 // 208 px
    val variants = (0 to 9).map { k =>
      val sb = new StringBuilder(base)
      (0 until k).foreach(f => sb.setCharAt(f * 19 + 3, '~'))
      sb.toString
    } :+ base // one exact duplicate of variant 0
    val d = corpus(variants.zipWithIndex.map { case (t, i) =>
      (i * 3).toString -> t }: _*)
    val got = Multimodal.imageNearDupPairs(
        Multimodal.imageAHash(Multimodal.encodeAssets(d)), maxDist = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hashes = variants.zipWithIndex
      .map { case (t, i) => i * 3L -> localAHash(t) }
    val brute = (for {
      (i1, h1) <- hashes; (i2, h2) <- hashes if i1 < i2
      dist = java.lang.Long.bitCount(h1 ^ h2) if dist <= 6
    } yield (i1, i2) -> dist.toLong).toMap
    got shouldBe brute
    // the exact duplicate must surface at distance 0
    got((0L, 30L)) shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Multimodal.imageNearDupPairs(
        Multimodal.imageAHash(Multimodal.encodeAssets(d)), maxDist = 7)
  }

  test("imageNearDupAgainst: delta probes history only, closest match wins") {
    val base = ('a' to 'z').mkString * 8
    def flip(k: Int) = {
      val sb = new StringBuilder(base)
      (0 until k).foreach(f => sb.setCharAt(f * 19 + 3, '~'))
      sb.toString
    }
    val histTexts = Seq(0L -> base, 3L -> flip(1), 6L -> flip(2))
    val deltaTexts = Seq(300L -> base, 303L -> flip(1), 306L -> ("~" * 208),
      309L -> ("~" * 208)) // 306~309 are a delta-delta pair: must NOT report
    def hashes(rows: Seq[(Long, String)]) = Multimodal.imageAHash(
      Multimodal.encodeAssets(corpus(rows.map { case (i, t) =>
        i.toString -> t }: _*)))
    val got = Multimodal.imageNearDupAgainst(
        hashes(deltaTexts), hashes(histTexts)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // local replication: per delta, closest history hash within 6
    val hh = histTexts.map { case (i, t) => i -> localAHash(t) }
    val expect = deltaTexts.flatMap { case (di, dt) =>
      val dh = localAHash(dt)
      val cands = hh.map { case (hi, h) =>
        (java.lang.Long.bitCount(dh ^ h).toLong, hi)
      }.filter(_._1 <= 6)
      if (cands.isEmpty) None
      else { val (dist, hi) = cands.min; Some(di -> ((hi, dist))) }
    }.toMap
    got shouldBe expect
    // the delta-delta duplicates never surface (history-only probes)
    got.keySet.intersect(Set(306L, 309L)).foreach { k =>
      // if they matched it must be via history, not each other
      Set(0L, 3L, 6L) should contain(got(k)._1)
    }
  }

  test("ahash hot-bucket guard: degenerate masses skip, cold pairs survive") {
    // 20 identical images (one degenerate hash mass: every band bucket
    // holds 20) + one near-dup pair of a DIFFERENT text (its buckets
    // hold 2) — at maxBucketSize = 10 the mass's pairs vanish while the
    // cold pair still surfaces; the audit reports exactly the 7 hot
    // buckets; raising the bound restores the full brute answer
    val hotText = ('a' to 'z').mkString * 4
    val base = "the quick brown fox jumps over the lazy dog " * 3
    val flip = { val sb = new StringBuilder(base); sb.setCharAt(5, '~'); sb.toString }
    val rows = (0 until 20).map(i => (i * 3).toString -> hotText) ++
      Seq("90" -> base, "93" -> flip)
    val hashes = Multimodal.imageAHash(
      Multimodal.encodeAssets(corpus(rows: _*)))
    val guarded = Multimodal.ahashNearDupPairs(hashes, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    guarded shouldBe Set((90L, 93L)) // the cold pair only
    Multimodal.ahashSkippedBuckets(hashes, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet shouldBe
      (0L until 7L).map(_ -> 20L).toSet
    // bound above the mass: full brute answer returns (20-clique + pair)
    val open = Multimodal.ahashNearDupPairs(hashes, maxBucketSize = 100)
      .collect()
    open.length shouldBe 20 * 19 / 2 + 1
    // incremental screen: a delta copy of the hot mass finds no match
    // through hot history buckets; a near-dup of the cold doc does
    val hist = Multimodal.imageAHash(Multimodal.encodeAssets(
      corpus(((0 until 15).map(i => (i * 3).toString -> hotText) :+
        ("90" -> base)): _*)))
    val delta = Multimodal.imageAHash(Multimodal.encodeAssets(
      corpus("300" -> hotText, "303" -> flip)))
    val got = Multimodal.imageNearDupAgainst(delta, hist, maxBucketSize = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(303L -> 90L)
  }

  test("imageResize: floor-mean downsample, sparse buckets below targetW") {
    // 32 px resized to 16 buckets: each bucket is the floor-mean of 2
    // adjacent pixels; 'ab' -> (97+98)/2 = 97 (floor)
    val text = ('a' to 'z').mkString + "abcdef" // 32 chars
    val d = corpus("0" -> text)
    val got = Multimodal.imageResize(Multimodal.encodeAssets(d), targetW = 16)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    val expect = (0 until 16).map { j =>
      val vals = text.slice(j * 2, j * 2 + 2).map(_.toLong)
      j.toLong -> vals.sum / vals.length
    }.toMap
    got shouldBe expect
    // narrower than targetW: only reached buckets emit (i -> i*16/n map)
    val narrow = Multimodal.imageResize(
        Multimodal.encodeAssets(corpus("3" -> "xyz")), targetW = 16)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    narrow.map(_._1).toSet shouldBe Set(0L, 5L, 10L) // ⌊i·16/3⌋ for i=0,1,2
    narrow.toMap shouldBe Map(0L -> 'x'.toLong, 5L -> 'y'.toLong,
      10L -> 'z'.toLong)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.imageResize(Multimodal.encodeAssets(d), targetW = 0)
  }

  test("audioAHash matches the local energy-envelope replication") {
    // ids ≡ 1 (mod 3) → audio; lengths below/at/past 56 samples
    // exercise empty and uneven buckets
    val texts = Seq("hum", "low low loud LOUD" /* caps = loud |c-110| */,
      "m" * 56, "quiet passage then SHOUTING FINALE " * 4)
    val d = corpus(texts.zipWithIndex.map { case (t, i) =>
      (i * 3 + 1).toString -> t }: _*)
    val got = Multimodal.audioAHash(Multimodal.encodeAssets(d)).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[Long]("n_samples"), r.getAs[Long]("ahash")))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      withClue(s"text '$t':") {
        got(i * 3L + 1) shouldBe ((t.length.toLong, localAudioHash(t)))
      }
    }
  }

  test("audio near-dups: banded pairs equal the brute force and DO pair") {
    // q217b is 0 rows on the corpus fixture, so the pigeonhole contract
    // needs a constructed positive: a base clip + small perturbations
    // (one char per flip barely moves one bucket's energy) + an exact
    // duplicate — banded ≡ brute, with pairs actually present
    val base = "the quiet hum of a steady machine drones on " * 5 // 225 samples
    val variants = (0 to 4).map { k =>
      val sb = new StringBuilder(base)
      (0 until k).foreach(f => sb.setCharAt(f * 41 + 7, 'z'))
      sb.toString
    } :+ base
    val d = corpus(variants.zipWithIndex.map { case (t, i) =>
      (i * 3 + 1).toString -> t }: _*)
    val got = Multimodal.ahashNearDupPairs(
        Multimodal.audioAHash(Multimodal.encodeAssets(d)), maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hashes = variants.zipWithIndex
      .map { case (t, i) => i * 3L + 1 -> localAudioHash(t) }
    val brute = (for {
      (i1, h1) <- hashes; (i2, h2) <- hashes if i1 < i2
      dist = java.lang.Long.bitCount(h1 ^ h2) if dist <= 6
    } yield (i1, i2) -> dist.toLong).toMap
    got shouldBe brute
    got should not be empty // the contract is exercised, not vacuous
    got((1L, 16L)) shouldBe 0L // the exact duplicate at distance 0
  }

  test("videoAHash: keyframe sampling, counts, and zero-frame streams") {
    // ids ≡ 2 (mod 3) → video; 12 chars per frame
    val texts = Seq(
      "x" * 11,            // 0 frames: legal zero-frame stream, hash 0
      "abcdefghijkl",      // 1 frame
      ('a' to 'z').mkString * 6) // 13 frames → 7 sampled at everyNth=2
    val d = corpus(texts.zipWithIndex.map { case (t, i) =>
      (i * 3 + 2).toString -> t }: _*)
    val got = Multimodal.videoAHash(Multimodal.encodeAssets(d), everyNth = 2)
      .collect().map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[Long]("n_frames"), r.getAs[Long]("n_sampled_frames"),
          r.getAs[Long]("ahash")))).toMap
    got(2L) shouldBe ((0L, 0L, 0L))
    got(5L) shouldBe ((1L, 1L, localVideoHash(texts(1), 2)))
    got(8L) shouldBe ((13L, 7L, localVideoHash(texts(2), 2)))
    // sampling matters: the full-frame hash differs from the sampled one
    Multimodal.videoAHash(Multimodal.encodeAssets(d), everyNth = 1)
      .where(col("asset_id") === 8L).head().getAs[Long]("ahash") shouldBe
      localVideoHash(texts(2), 1)
  }

  test("video near-dups: banded pairs equal the brute force") {
    val base = ('a' to 'z').mkString * 6 // 13 frames
    val variants = (0 to 3).map { k =>
      val sb = new StringBuilder(base)
      (0 until k).foreach(f => sb.setCharAt(f * 29 + 2, '~'))
      sb.toString
    } :+ base
    val d = corpus(variants.zipWithIndex.map { case (t, i) =>
      (i * 3 + 2).toString -> t }: _*)
    val got = Multimodal.ahashNearDupPairs(
        Multimodal.videoAHash(Multimodal.encodeAssets(d), everyNth = 2),
        maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hashes = variants.zipWithIndex
      .map { case (t, i) => i * 3L + 2 -> localVideoHash(t, 2) }
    val brute = (for {
      (i1, h1) <- hashes; (i2, h2) <- hashes if i1 < i2
      dist = java.lang.Long.bitCount(h1 ^ h2) if dist <= 6
    } yield (i1, i2) -> dist.toLong).toMap
    got shouldBe brute
    got should not be empty
    got((2L, 14L)) shouldBe 0L // exact duplicate
  }

  // ── windowed/segmented hashing (long media) ──────────────────────────

  /** Local replica of audioAHashWindows: per fixed-span window of W
    * samples, the 56-bucket rule over that window's energies. */
  private def localAudioWindows(text: String, w: Int): Seq[(Long, Long, Long)] =
    text.map(c => math.abs((c - 110).toLong) * 200L)
      .grouped(w).zipWithIndex
      .map { case (g, i) => (i.toLong, g.length.toLong, local56(g)) }
      .toSeq

  test("audioAHashWindows: per-window hashes, trailing partial, empty clip") {
    val texts = Seq("a" /* 1 window of 1 */,
      "the quiet hum of a steady machine drones on" * 5 /* 215 → 4 windows */,
      "" /* empty: NO rows */)
    val d = corpus(texts.zipWithIndex.map { case (t, i) =>
      (i * 3 + 1).toString -> t }: _*)
    val got = Multimodal.audioAHashWindows(
        Multimodal.encodeAssets(d), windowSamples = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val expect = texts.zipWithIndex.flatMap { case (t, i) =>
      localAudioWindows(t, 64).map { case (wId, n, h) =>
        (i * 3L + 1, wId) -> ((n, h)) }
    }.toMap
    got shouldBe expect
    // 4 windows of 64,64,64,len−192 — the trailing partial is hashed too
    got((4L, 3L))._1 shouldBe (texts(1).length - 192).toLong
    got.keySet.map(_._1) shouldBe Set(1L, 4L) // the empty clip emits nothing
    an[IllegalArgumentException] should be thrownBy
      Multimodal.audioAHashWindows(Multimodal.encodeAssets(d), 0)
  }

  /** Local replica of videoAHashSegments: sampled-frame luma grouped
    * into segments of `segFrames` sampled frames. */
  private def localVideoSegments(
      text: String, segFrames: Int, everyNth: Int): Seq[(Long, Long, Long)] = {
    val nf = text.length / 12
    (0 until nf by everyNth).map(f =>
        (0 until 8).map(k => text.charAt(f * 12 + k).toLong))
      .grouped(segFrames).zipWithIndex
      .map { case (seg, i) =>
        (i.toLong, seg.length.toLong, local56(seg.flatten)) }
      .toSeq
  }

  test("videoAHashSegments: per-segment hashes, trailing partial, zero-frame") {
    val texts = Seq(
      "x" * 11,                    // 0 frames: NO rows
      ('a' to 'z').mkString * 6,   // 13 frames → 7 sampled → segs 3,3,1
      ('a' to 'z').mkString * 12)  // 26 frames → 13 sampled → 3,3,3,3,1
    val d = corpus(texts.zipWithIndex.map { case (t, i) =>
      (i * 3 + 2).toString -> t }: _*)
    val got = Multimodal.videoAHashSegments(
        Multimodal.encodeAssets(d), segmentFrames = 3, everyNth = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val expect = texts.zipWithIndex.flatMap { case (t, i) =>
      localVideoSegments(t, 3, 2).map { case (sId, n, h) =>
        (i * 3L + 2, sId) -> ((n, h)) }
    }.toMap
    got shouldBe expect
    got.keySet.map(_._1) shouldBe Set(5L, 8L)
    got((5L, 2L))._1 shouldBe 1L // trailing partial segment
  }

  test("ahashWindowNearDupPairs: asset rollup equals the window brute force") {
    // two clips sharing a middle SEGMENT (the reused-footage case the
    // whole-clip hash cannot see), plus an unrelated clip; windows of 64,
    // prefixes window-ALIGNED (64 and 128 chars) so the shared span fills
    // identical windows — the grid-alignment contract the scaladoc states
    val shared = "a shared jingle segment that both clips reuse yes " +
      "a shared jingle segment that both clips reuse yes "     // 102 chars
    val a = ("intro of clip a " * 4) + shared + ("outro a " * 8)   // 64 + …
    val b = ("b opening here! " * 8) + shared + ("its own end " * 6) // 128 + …
    val c = "completely unrelated audio content with nothing shared " * 4
    val d = corpus("1" -> a, "4" -> b, "7" -> c)
    val wh = Multimodal.audioAHashWindows(
      Multimodal.encodeAssets(d), windowSamples = 64)
    val got = Multimodal.ahashWindowNearDupPairs(wh, maxDist = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // local brute force over ALL cross-asset window pairs
    val wins = Seq(1L -> a, 4L -> b, 7L -> c).flatMap { case (id, t) =>
      localAudioWindows(t, 64).map { case (_, _, h) => (id, h) } }
    val brutePairs = for {
      (i1, h1) <- wins; (i2, h2) <- wins if i1 < i2
      dist = java.lang.Long.bitCount(h1 ^ h2) if dist <= 6
    } yield (i1, i2) -> dist.toLong
    val brute = brutePairs.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.map(_._2).min, vs.size.toLong)) }
    got shouldBe brute
    got should not be empty // the shared segment DOES pair (1, 4)
    assert(got.contains((1L, 4L)))
  }

  /** Local replica of the overlapped grid: window w = [w·s, w·s+W). */
  private def localAudioWindowsStride(
      text: String, w: Int, s: Int): Seq[(Long, Long, Long)] = {
    val e = text.map(c => math.abs((c - 110).toLong) * 200L)
    val nW = if (e.isEmpty) 0 else (e.length - 1) / s + 1
    (0 until nW).map { wi =>
      val g = e.slice(wi * s, math.min(wi * s + w, e.length))
      (wi.toLong, g.length.toLong, local56(g))
    }
  }

  test("overlapping windows detect reuse the aligned grid misses") {
    // engine ≡ replica on the overlapped grid
    val t = "the quiet hum of a steady machine drones on" * 5 // 215
    val d1 = corpus("1" -> t)
    val got = Multimodal.audioAHashWindows(Multimodal.encodeAssets(d1),
        windowSamples = 64, strideSamples = 32)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    got shouldBe localAudioWindowsStride(t, 64, 32)
      .map { case (w, n, h) => w -> ((n, h)) }.toMap
    // a shared segment at a 96-char offset (3 strides, NOT a multiple
    // of W=64): invisible to the aligned grid, found by the overlap
    val shared = "a shared jingle segment that both clips reuse yes " +
      "a shared jingle segment that both clips reuse yes "
    val a = ("intro of clip a " * 4) + shared + ("outro a " * 8) // 64 + …
    val b = ("b opens here... " * 6) + shared + ("its own end " * 6) // 96 + …
    val d = corpus("1" -> a, "4" -> b)
    def pairsAt(stride: Int) = Multimodal.ahashWindowNearDupPairs(
        Multimodal.audioAHashWindows(Multimodal.encodeAssets(d),
          windowSamples = 64, strideSamples = stride),
        maxDist = 0) // exact window equality: the reused span only
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairsAt(0) shouldBe empty            // aligned grid: offsets differ
    pairsAt(32) should contain((1L, 4L)) // stride 32: grids meet
    an[IllegalArgumentException] should be thrownBy
      Multimodal.audioAHashWindows(Multimodal.encodeAssets(d), 64, 65)
  }

  test("ahashWindowNearDupAgainst: delta windows probe history only") {
    // history = clips a, c; delta = b (shares a window-aligned segment
    // with a) and two IDENTICAL novel clips (delta-delta: must not pair)
    val shared = "a shared jingle segment that both clips reuse yes " +
      "a shared jingle segment that both clips reuse yes "
    val a = ("intro of clip a " * 4) + shared + ("outro a " * 8)
    val b = ("b opening here! " * 8) + shared + ("its own end " * 6)
    val c = "completely unrelated audio content with nothing shared " * 4
    val novel = "some never seen material entirely its own thing here " * 3
    def winsOf(rows: (String, String)*) = Multimodal.audioAHashWindows(
      Multimodal.encodeAssets(corpus(rows: _*)), windowSamples = 64)
    val got = Multimodal.ahashWindowNearDupAgainst(
        winsOf("301" -> b, "304" -> novel, "307" -> novel),
        winsOf("1" -> a, "4" -> c), maxDist = 6)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // local brute replica: delta windows x history windows only
    val hWins = Seq(1L -> a, 4L -> c).flatMap { case (id, t) =>
      localAudioWindows(t, 64).map { case (_, _, h) => (id, h) } }
    val dWins = Seq(301L -> b, 304L -> novel, 307L -> novel)
      .flatMap { case (id, t) =>
        localAudioWindows(t, 64).map { case (_, _, h) => (id, h) } }
    val expect = dWins.map(_._1).distinct.flatMap { d =>
      val hits = for {
        (di, dh) <- dWins if di == d
        (hi, hh) <- hWins
        dist = java.lang.Long.bitCount(dh ^ hh) if dist <= 6
      } yield (hi, dist.toLong)
      if (hits.isEmpty) None
      else {
        val byAsset = hits.groupBy(_._1).map { case (hi, vs) =>
          (vs.map(_._2).min, hi, vs.size.toLong) }
        val best = byAsset.minBy(x => (x._1, x._2))
        Some(d -> ((best._2, best._1, best._3)))
      }
    }.toMap
    got shouldBe expect
    assert(got.contains(301L) && got(301L)._1 == 1L) // the shared segment
    // the identical delta-delta pair never reports through each other
    got.get(304L).foreach { case (m, _, _) => Set(1L, 4L) should contain(m) }
    got.get(307L).foreach { case (m, _, _) => Set(1L, 4L) should contain(m) }
  }

  test("long audio clips route through the windowed floor-mean fallback") {
    // a REAL over-bound clip: 16e6 + 1009 samples (32 MB payload) — the
    // round-9 hard `require` is gone; the hash equals the local replica
    // of 4096-sample window floor-means through the 56-bucket rule
    val n = 16000000 + 1009
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { bb.putShort((((i % 26) + 97 - 110) * 200).toShort); i += 1 }
    val payload = bb.array()
    val s = spark
    import s.implicits._
    val assets = Seq((1L, payload)).toDF("asset_id", "payload")
      .select(col("asset_id"), col("payload"),
        struct(lit("audio").as("kind"), lit(44L + dataLen).as("n_bytes"),
          lit("wav").as("codec")).as("meta"))
    val r = Multimodal.audioAHash(assets).head()
    r.getAs[Long]("n_samples") shouldBe n.toLong
    // local replica: window floor-means of |sample| then local56
    def energyAt(k: Int): Long = math.abs((((k % 26) + 97 - 110) * 200).toLong)
    val means = (0 until n by 4096).map { lo =>
      val hi = math.min(lo + 4096, n)
      (lo until hi).map(energyAt).sum / (hi - lo)
    }
    r.getAs[Long]("ahash") shouldBe local56(means)
  }

  test("over-bound video streams route through the frame-mean fallback") {
    // via the test seam (a real over-bound stream is >= 900 MB): a tiny
    // exactBound forces the fallback on a normal fixture, and the hash
    // equals the local per-sampled-frame floor-mean replica
    val text = ('a' to 'z').mkString * 12 // 26 frames → 13 sampled
    val assets = Multimodal.encodeAssets(corpus("2" -> text))
    val r = Multimodal.videoAHashBounded(assets, everyNth = 2, exactBound = 10)
      .head()
    val frameMeans = (0 until 26 by 2).map { f =>
      (0 until 8).map(k => text.charAt(f * 12 + k).toLong).sum / 8
    }
    r.getAs[Long]("ahash") shouldBe local56(frameMeans)
    r.getAs[Long]("n_sampled_frames") shouldBe 13L
    // and the exact path (the default) differs — the fallback is a
    // coarser fingerprint, not a re-labeling
    Multimodal.videoAHash(assets, everyNth = 2).head()
      .getAs[Long]("ahash") should not be r.getAs[Long]("ahash")
  }

  // ── parameterized band layout ────────────────────────────────────────

  /** Brute-force pairs at a threshold over (id, hash) rows. */
  private def brutePairs(
      hs: Seq[(Long, Long)], maxDist: Int): Map[(Long, Long), Long] =
    (for {
      (i1, h1) <- hs; (i2, h2) <- hs if i1 < i2
      d = java.lang.Long.bitCount(h1 ^ h2) if d <= maxDist
    } yield (i1, i2) -> d.toLong).toMap

  test("wide 4x14 band layout un-hots a bucket mass the 7x8 guard drops") {
    // twelve assets sharing 8-bit bands {0,2,4,6} (values 5A/33/0F/21)
    // but distinct in every 14-bit band, plus a hamming-3 pair (A=200,
    // B=201) sharing ONLY those four hot bands: the 7x8 guard must drop
    // the pair (every shared band hot), the 4x14 layout must find it
    def lanes(b0: Long, b1: Long, b2: Long, b3: Long, b4: Long, b5: Long,
        b6: Long): Long =
      b0 | (b1 << 8) | (b2 << 16) | (b3 << 24) | (b4 << 32) | (b5 << 40) |
        (b6 << 48)
    val mass = (1 to 12).map(m =>
      m.toLong -> lanes(0x5a, m, 0x33, m, 0x0f, m, 0x21))
    val pairA = 200L -> lanes(0x5a, 20, 0x33, 20, 0x0f, 20, 0x21)
    val pairB = 201L -> lanes(0x5a, 21, 0x33, 21, 0x0f, 21, 0x21)
    val all = mass :+ pairA :+ pairB
    java.lang.Long.bitCount(pairA._2 ^ pairB._2) shouldBe 3 // fixture sanity
    val s = spark
    import s.implicits._
    val hashes = all.toDF("asset_id", "ahash")
    // 7x8 at bound 10: bands 0,2,4,6 are hot (14 members each)…
    Multimodal.ahashSkippedBuckets(hashes, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Set((0L, 0x5aL), (2L, 0x33L), (4L, 0x0fL), (6L, 0x21L))
    // …and the wide layout has NO hot bucket at the same bound
    Multimodal.ahashSkippedBuckets(hashes, maxBucketSize = 10,
      nBands = 4, bandBits = 14).collect() shouldBe empty
    val brute = brutePairs(all, 3)
    assert(brute.contains((200L, 201L)))
    // wide layout: full pigeonhole recall at maxDist <= 3
    Multimodal.ahashNearDupPairs(hashes, maxDist = 3, maxBucketSize = 10,
        nBands = 4, bandBits = 14)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap shouldBe brute
    // default layout at the same bound: the guard drops the pair whose
    // every shared band is hot — the declared recall trade
    val narrow = Multimodal.ahashNearDupPairs(hashes, maxDist = 3,
        maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    narrow should not contain ((200L, 201L))
    narrow.foreach(p => assert(brute.contains(p))) // no false positives
  }

  test("band layouts that break the pigeonhole or the key space are rejected") {
    val s = spark
    import s.implicits._
    val hashes = Seq((1L, 7L)).toDF("asset_id", "ahash")
    an[IllegalArgumentException] should be thrownBy // 5x11 != 56
      Multimodal.ahashNearDupPairs(hashes, nBands = 5, bandBits = 11)
    an[IllegalArgumentException] should be thrownBy // 2x28: key space unsafe
      Multimodal.ahashNearDupPairs(hashes, maxDist = 1, nBands = 2, bandBits = 28)
    an[IllegalArgumentException] should be thrownBy // maxDist past pigeonhole
      Multimodal.ahashNearDupPairs(hashes, maxDist = 4, nBands = 4, bandBits = 14)
  }

  test("WAV validation is order-strict: fmt must precede data, once") {
    // data BEFORE fmt: must refuse to decode unvalidated samples
    def wav(chunks: Array[Byte]*): Array[Byte] = {
      val body = chunks.flatten.toArray
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      bb.put("WAVE".getBytes("US-ASCII")).put(body)
      bb.array()
    }
    def fmtChunk: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
      bb.array()
    }
    def dataChunk: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("data".getBytes("US-ASCII")).putInt(4).putShort(100).putShort(-50)
      bb.array()
    }
    // the RIFF walk in decodeMedia (parseWav) and the hash walk
    // (wavDataChunk) both reject data-before-fmt and duplicate data
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeOne(1L, wav(dataChunk, fmtChunk))
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeOne(2L, wav(fmtChunk, dataChunk, dataChunk))
    val s = spark
    import s.implicits._
    def assetsOf(p: Array[Byte]) = Seq((1L, p)).toDF("asset_id", "payload")
      .select(col("asset_id"), col("payload"),
        struct(lit("audio").as("kind"), lit(p.length.toLong).as("n_bytes"),
          lit("wav").as("codec")).as("meta"))
    an[Exception] should be thrownBy
      Multimodal.audioAHash(assetsOf(wav(dataChunk, fmtChunk))).collect()
    an[Exception] should be thrownBy
      Multimodal.audioAHash(assetsOf(wav(fmtChunk, dataChunk, dataChunk)))
        .collect()
    // the valid layout still decodes
    Multimodal.decodeOne(3L, wav(fmtChunk, dataChunk)).n_samples shouldBe 2L
  }

  test("band-layout saturation radar: detects the saturated 7x8 space, widens, recovers the dropped reuse") {
    val s = spark
    import s.implicits._
    // the ×10-duplication stress shape, synthetic: 20 000 distinct
    // 56-bit hashes × 10 salted copies — every 7×8 bucket holds ~780
    // rows (20 000/256 distinct values × 10 copies), so at a bound of
    // 100 every bucket is hot WITH CERTAINTY (a cold bucket needs
    // ≤ 10 distinct values where the mean is 78), while the 4×14
    // space (16 384 keys per band) holds ~12 rows per bucket
    val distinctHashes = (0 until 20000)
      .map(i => (i.toLong * 0x9E3779B97F4A7C15L) & ((1L << 56) - 1))
    val hist = distinctHashes.zipWithIndex.flatMap { case (h, i) =>
      (0 until 10).map(c => (i.toLong * 16 + c, h))
    }.toDF("asset_id", "ahash")
    // 250 reuse arrivals: exact copies of history hashes (hamming 0)
    val delta = distinctHashes.take(250).zipWithIndex
      .map { case (h, i) => (100000L + i, h) }.toDF("asset_id", "ahash")
    val bound = Multimodal.scaledGuardBound(10, base = 10) // = 100
    // the measured signal: skip mass ~1 at 7×8, ~0 at 4×14
    val hp = graft.Caching.persist(hist)
    Multimodal.bandSaturation(hp, bound, 7, 8) should be > Multimodal.SaturationFrac
    Multimodal.bandSaturation(hp, bound, 4, 14) should be < 0.05
    // explicit 7×8 at this bound: the guard drops EVERY bucket whole —
    // all reuse arrivals vanish (the round-10 recall collapse)
    Multimodal.ahashWindowNearDupAgainst(
      delta, hist, maxDist = 3, maxBucketSize = bound,
      nBands = 7, bandBits = 8).count() shouldBe 0L
    // BandAuto: the radar measures the saturation and widens to 4×14 —
    // every reuse arrival recovered, answer identical to the wide
    // explicit layout
    val gotAuto = Multimodal.ahashWindowNearDupAgainst(
      delta, hist, maxDist = 3, maxBucketSize = bound,
      nBands = Multimodal.BandAuto).count()
    gotAuto shouldBe 250L
    gotAuto shouldBe Multimodal.ahashWindowNearDupAgainst(
      delta, hist, maxDist = 3, maxBucketSize = bound,
      nBands = 4, bandBits = 14).count()
    // maxDist > 3 admits no wider layout: the radar fails LOUDLY naming
    // the saturation and the trade that would unlock the 4×14 space
    val sat = intercept[IllegalArgumentException] {
      Multimodal.ahashWindowNearDupAgainst(
        delta, hist, maxDist = 6, maxBucketSize = bound,
        nBands = Multimodal.BandAuto).count()
    }
    sat.getMessage should include("SATURATED")
    sat.getMessage should include("4x14")
    // the pair tier shares the dispatch: auto recovers the duplicate
    // families the saturated 7×8 guard dropped entirely
    Multimodal.ahashNearDupPairs(
      hist, maxDist = 3, maxBucketSize = bound,
      nBands = 7, bandBits = 8).count() shouldBe 0L
    Multimodal.ahashNearDupPairs(
      hist, maxDist = 3, maxBucketSize = bound,
      nBands = Multimodal.BandAuto).count() shouldBe 20000L * 10 * 9 / 2
    // the STATE-BUILD boundary enforces the same rule: packaging a
    // saturated 7×8 index fails loudly (a stream from it would
    // silently miss most reuse); the wide layout and the explicit
    // opt-in both build
    val histWins = hist.withColumn("window_id", lit(0L))
    val satBuild = intercept[IllegalArgumentException] {
      graft.streaming.StreamingOps.mediaWindowScreenState(
        histWins, maxBucketDocs = bound)
    }
    satBuild.getMessage should include("SATURATED")
    graft.streaming.StreamingOps.mediaWindowScreenState(
      histWins, maxBucketDocs = bound, nBands = 4, bandBits = 14)
      .where(col("section") === "meta").count() shouldBe 1L
    graft.streaming.StreamingOps.mediaWindowScreenState(
      histWins, maxBucketDocs = bound, allowSaturated = true)
      .where(col("section") === "meta").count() shouldBe 1L
  }
}
