package graft

import org.apache.spark.sql.functions.{col => C}
import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {

  test("chunkDocs splits into maxTokens-sized chunks with a short tail") {
    val got = Chunking.chunkDocs(corpus("d" -> "a b c d e"), maxTokens = 2)
      .orderBy(C("chunk_id")).collect()
    got.map(_.getAs[Long]("chunk_id")).toSeq shouldBe Seq(0L, 1L, 2L)
    got.map(_.getAs[String]("chunk_text")).toSeq shouldBe Seq("a b", "c d", "e")
    got.map(_.getAs[Long]("n_tokens")).toSeq shouldBe Seq(2L, 2L, 1L)
  }

  test("chunkSliding: overlapping windows cover the tail, stride=size is chunkDocs") {
    // 5 tokens, size 3, stride 2 -> starts 0, 2 (last = ceil((5-3)/2)=1)
    val got = Chunking.chunkSliding(corpus("d" -> "a b c d e"), size = 3, stride = 2)
      .orderBy(C("chunk_id")).collect()
    got.map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("start_token"),
      r.getAs[String]("chunk_text"), r.getAs[Long]("n_tokens"))).toSeq shouldBe
      Seq((0L, 0L, "a b c", 3L), (1L, 2L, "c d e", 3L))
    // short doc -> one window; empty doc -> nothing
    val short = Chunking.chunkSliding(corpus("e" -> "", "s" -> "x y"),
      size = 4, stride = 2).collect()
    short.length shouldBe 1
    short.head.getAs[String]("chunk_text") shouldBe "x y"
    // stride = size degenerates to the disjoint packing
    val disjoint = Chunking.chunkSliding(corpus("d" -> "a b c d e"),
      size = 2, stride = 2).orderBy(C("chunk_id")).collect()
      .map(_.getAs[String]("chunk_text")).toSeq
    disjoint shouldBe Seq("a b", "c d", "e")
  }

  test("packStats: fill rate, overflow count, and pack extremes by hand") {
    val s = spark
    import s.implicits._
    // token counts 2, 3, 2, 5 in one bucket, target 4 ->
    // packs (docs 0,1 | tk 5) and (docs 2,3 | tk 7), both overflowing
    val d = Seq((0L, "a a"), (1L, "b b b"), (2L, "c c"), (3L, "d d d d d"))
      .toDF("doc", "line")
    val got = Chunking.packStats(d, targetTokens = 4, buckets = 1).collect()(0)
    (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5), got.getDouble(6)) shouldBe
      ((2L, 4L, 12L, 5L, 7L, 2L, 1.5))
  }

  test("chunkDocs emits nothing for empty docs and one chunk for short docs") {
    val got = Chunking.chunkDocs(corpus("e" -> "", "s" -> "x y"), maxTokens = 64)
      .collect()
    got.length shouldBe 1
    got.head.getAs[String]("doc") shouldBe "s"
    got.head.getAs[Long]("n_tokens") shouldBe 2L
  }

  test("chunkDocs round-trips: chunks re-joined equal the tokenized doc") {
    val line = (1 to 157).map(i => s"t$i").mkString(" ")
    val got = Chunking.chunkDocs(corpus("d" -> line), maxTokens = 16)
      .orderBy(C("chunk_id")).collect()
    got.map(_.getAs[String]("chunk_text")).mkString(" ") shouldBe line
    got.map(_.getAs[Long]("n_tokens")).sum shouldBe 157L
  }

  private def numDocs(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc", "line")
  }

  test("packSequences assigns pack_id by exclusive prefix sum over the bucket") {
    // single bucket: 6 docs x 3 tokens, target 4 → prefix 0,3,6,9,12,15
    val got = Chunking.packSequences(
        numDocs((0L to 5L).map(i => i -> "x y z"): _*),
        targetTokens = 4, buckets = 1)
      .orderBy(C("doc")).collect()
    got.map(_.getAs[Long]("pack_id")).toSeq shouldBe Seq(0L, 0L, 1L, 2L, 3L, 3L)
    got.map(_.getAs[Long]("n_tokens")).toSeq shouldBe Seq.fill(6)(3L)
  }

  test("packSequences: over-long docs overflow their pack; buckets are independent") {
    val long = (1 to 10).map(_ => "w").mkString(" ")
    val got = Chunking.packSequences(
        numDocs(0L -> long, 1L -> "a b", 2L -> long, 3L -> "c d"),
        targetTokens = 4, buckets = 2)
      .orderBy(C("doc")).collect()
      .map(r => r.getAs[Long]("doc") ->
        (r.getAs[Long]("bucket"), r.getAs[Long]("pack_id"))).toMap
    // bucket 0: docs 0 (10 toks, prefix 0 → pack 0) and 2 (prefix 10 → pack 2)
    got(0L) shouldBe (0L, 0L)
    got(2L) shouldBe (0L, 2L)
    // bucket 1: docs 1 (prefix 0 → pack 0) and 3 (prefix 2 → pack 0)
    got(1L) shouldBe (1L, 0L)
    got(3L) shouldBe (1L, 0L)
  }

  test("chunkKey stays injective past 100 chunks per doc (no aliasing)") {
    // Two docs, each chunked into 150 one-token chunks at maxTokens=1 —
    // the shape that silently corrupted a doc*100 composed key.
    val line = (1 to 150).map(i => s"t$i").mkString(" ")
    val keyed = Chunking.chunkDocs(numDocs(1L -> line, 2L -> line), maxTokens = 1)
      .select(Chunking.chunkKey(C("doc"), C("chunk_id")).as("cid"))
    keyed.count() shouldBe 300L
    keyed.distinct().count() shouldBe 300L
  }

  test("chunkKey fails loudly when chunk_id reaches the aliasing bound") {
    val s = spark; import s.implicits._
    val bad = Seq((1L, Chunking.MaxChunksPerDoc)).toDF("doc", "chunk_id")
    val e = intercept[Exception] {
      bad.select(Chunking.chunkKey(C("doc"), C("chunk_id")).as("cid")).collect()
    }
    e.getMessage should include("alias")
  }

  test("epochShuffle is a sharded permutation with full contiguous batches") {
    val docs = numDocs((0L until 200L).map(i => i -> "x"): _*)
    val got = Chunking.epochShuffle(docs, "doc", seed = 1,
      numShards = 4, batchSize = 8).collect()
    // permutation: every input row exactly once
    got.length shouldBe 200
    got.map(_.getAs[Long]("doc")).toSet shouldBe (0L until 200L).toSet
    val byShard = got.groupBy(_.getAs[Long]("shard"))
    byShard.keySet.foreach(sh => sh should (be >= 0L and be < 4L))
    byShard.values.foreach { rows =>
      // seq is 1..n contiguous within the shard
      rows.map(_.getAs[Long]("seq")).sorted.toSeq shouldBe
        (1L to rows.length.toLong)
      // batch = (seq-1) div batchSize, so every batch holds <= 8 rows
      rows.foreach(r => r.getAs[Long]("batch") shouldBe
        (r.getAs[Long]("seq") - 1) / 8)
      rows.groupBy(_.getAs[Long]("batch")).values
        .foreach(_.length should be <= 8)
    }
  }

  test("epochShuffle: a new seed permutes order but not membership") {
    val docs = numDocs((0L until 300L).map(i => i -> "x"): _*)
    def posMap(seed: Int) = Chunking
      .epochShuffle(docs, "doc", seed, numShards = 4, batchSize = 16)
      .collect()
      .map(r => r.getAs[Long]("doc") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("seq"))).toMap
    val e1 = posMap(1)
    val e2 = posMap(2)
    e1.keySet shouldBe e2.keySet // same membership
    // a fresh epoch is a genuinely different permutation
    e1.count { case (d, pos) => e2(d) != pos } should be > 100
    // and the same seed replays identically (retry/speculation safety)
    posMap(1) shouldBe e1
  }

  test("writeTrainingShards round-trips, orders within shards, manifests the run") {
    import org.apache.spark.sql.functions.col
    val docs = numDocs((0L until 200L).map(i => i -> s"tok$i"): _*)
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val manifest = Chunking.writeTrainingShards(docs, "doc", seed = 7,
      numShards = 4, path = dir).collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("key_checksum"))).toMap
    manifest.keySet shouldBe Set(0L, 1L, 2L, 3L)
    manifest.values.map(_._1).sum shouldBe 200L
    // round trip: every row back, shard column restored from the path
    val back = spark.read.parquet(dir)
    back.count() shouldBe 200L
    back.select("doc").collect().map(_.getLong(0)).toSet shouldBe
      (0L until 200L).toSet
    // within a shard file, rows are physically in seq order
    val shard0 = spark.read.parquet(s"$dir/shard=0").select("seq")
      .collect().map(_.getLong(0)).toSeq
    shard0 shouldBe shard0.sorted
    // manifest counts match the data; manifest parquet matches the return
    // partition-path columns come back as INT — cast for the compare
    back.groupBy(col("shard").cast("long")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      manifest.view.mapValues(_._1).toMap
    val persisted = spark.read.parquet(s"$dir/_manifest").collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("key_checksum"))).toMap
    persisted shouldBe manifest
    // same membership + seed ⇒ identical manifest, regardless of retry order
    val dir2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString
    val again = Chunking.writeTrainingShards(
        docs.repartition(7), "doc", seed = 7, numShards = 4, path = dir2)
      .collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("key_checksum"))).toMap
    again shouldBe manifest
  }

  test("epochShuffle rejects bad parameters and reserved columns") {
    val docs = numDocs(1L -> "x")
    an[IllegalArgumentException] should be thrownBy
      Chunking.epochShuffle(docs, "doc", seed = 1, numShards = 0)
    an[IllegalArgumentException] should be thrownBy
      Chunking.epochShuffle(docs, "doc", seed = 1, batchSize = 0)
    an[IllegalArgumentException] should be thrownBy
      Chunking.epochShuffle(docs.withColumn("shard", C("doc")), "doc", seed = 1)
  }

  test("rendezvousShard: deterministic in-range assignment; n→n+1 moves only new-shard wins") {
    val docs = numDocs((1L to 200L).map(i => i -> s"doc $i"): _*)
    val a = Chunking.rendezvousShard(docs, "doc", 8).collect()
      .map(r => r.getAs[Long]("doc") -> r.getAs[Long]("shard")).toMap
    a.values.foreach { s => s should be >= 0L; s should be < 8L }
    // replay is identical
    Chunking.rendezvousShard(docs, "doc", 8).collect()
      .map(r => r.getAs[Long]("doc") -> r.getAs[Long]("shard")).toMap shouldBe a
    // HRW identity: a key moves on 8 → 9 IFF shard 8 wins it
    val b = Chunking.rendezvousShard(docs, "doc", 9).collect()
      .map(r => r.getAs[Long]("doc") -> r.getAs[Long]("shard")).toMap
    val moved = a.keySet.filter(k => a(k) != b(k))
    moved shouldBe b.filter(_._2 == 8L).keySet
    // non-degenerate: some keys moved, most did not
    moved.size should be > 0
    moved.size should be < 60 // expected 200/9 ≈ 22
  }

  test("rendezvousShard rejects bad shard counts and reserved columns") {
    val docs = numDocs(1L -> "x")
    an[IllegalArgumentException] should be thrownBy
      Chunking.rendezvousShard(docs, "doc", 0)
    an[IllegalArgumentException] should be thrownBy
      Chunking.rendezvousShard(docs, "doc", 5000)
    an[IllegalArgumentException] should be thrownBy
      Chunking.rendezvousShard(docs.withColumn("shard", C("doc")), "doc", 8)
  }

  test("packSequences rejects non-positive parameters") {
    an[IllegalArgumentException] should be thrownBy
      Chunking.packSequences(numDocs(0L -> "a"), targetTokens = 0)
    an[IllegalArgumentException] should be thrownBy
      Chunking.chunkDocs(corpus("d" -> "a"), maxTokens = 0)
  }
}
