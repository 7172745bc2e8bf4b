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

  test("decodeStub is stable across repartitioning (partition-local only)") {
    val a = Multimodal.decodeStub(assets).collect().sortBy(_.asset_id).toSeq
    val b = Multimodal.decodeStub(
      Multimodal.repartitionForDecode(assets, targetBytesPerPartition = 4))
      .collect().sortBy(_.asset_id).toSeq
    a shouldBe b
  }
}
