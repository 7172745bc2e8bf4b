package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, explode, lit, when}

import graft.streaming.StreamingOps

/**
 * Property check for the round-12 screen-state EXTENSION law: for ANY
 * history/delta pair (tiny shared pools ⇒ dense duplication, so the
 * hot-bucket guard, the dropped-keys retention, and the exact-anchor
 * min reduction all fire across trials) and ANY hot bound,
 * `extend*State(state(h), d)` must equal `*State(h ∪ d)` SECTION FOR
 * SECTION — meta string (the composed checksum vs the fresh scan),
 * Bloom bytes, fp set, per-bucket sorted candidate lists, and the
 * dropped-key set — checked mechanically on random shapes, not just
 * the hand-built spec fixtures. Builds run `allowSaturated = true`:
 * random duplication trips the radar by design, and the law under test
 * is equivalence, not the radar (which has its own spec).
 */
object ExtendStateProperties extends Properties("ExtendState") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark

  // ── text tier ─────────────────────────────────────────────────────
  private val vocab = Seq("w0", "w1", "w2", "w3", "w4", "w5")

  private val lineGen: Gen[String] = for {
    len <- Gen.chooseNum(4, 9)
    toks <- Gen.listOfN(len, Gen.oneOf(vocab))
  } yield toks.mkString(" ")

  private case class TextFx(
      hist: List[(String, String)], delta: List[(String, String)],
      bound: Int)

  private val textFxGen: Gen[TextFx] = for {
    nh <- Gen.chooseNum(2, 6)
    histLines <- Gen.listOfN(nh, lineGen)
    nd <- Gen.chooseNum(1, 6)
    deltaLines <- Gen.listOfN(nd, Gen.frequency(
      2 -> Gen.oneOf(histLines), // duplicate content, new row id
      2 -> lineGen))
    bound <- Gen.chooseNum(1, 4)
  } yield TextFx(
    histLines.zipWithIndex.map { case (l, i) => (s"h$i", l) },
    deltaLines.zipWithIndex.map { case (l, i) => (s"n$i", l) },
    bound)

  private def splitsOf(d: DataFrame): DataFrame =
    d.select(col("doc"),
      when(org.apache.spark.sql.functions.xxhash64(col("doc")) % 2 === 0,
        lit("val")).otherwise(lit("train")).as("split"))

  private def textCanon(st: DataFrame) = {
    val meta = st.where(col("section") === "meta")
      .select(col("fp")).head().getString(0)
    val bloom = st.where(col("section") === "bloom")
      .select(col("bloom")).head().getAs[Array[Byte]](0).toSeq
    val fps = st.where(col("section") === "fp")
      .select(col("fp")).collect().map(_.getString(0)).toSet
    val idx = st.where(col("section") === "index")
      .select(col("band"), col("band_val"), explode(col("cands")).as("c"))
      .select(col("band"), col("band_val"), col("c.hd"), col("c.hsh"),
        col("c.hsp"))
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getString(2), r.getSeq[String](3).toList,
          Option(r.getString(4)))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    val dropped = st.where(col("section") === "dropped")
      .select(col("band"), col("band_val")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    (meta, bloom, fps, idx, dropped)
  }

  property("extendIngestState(state(h), d) ≡ ingestState(h ∪ d), any bound") =
    forAll(textFxGen) { fx =>
      val s = spark
      import s.implicits._
      graft.Caching.scoped {
        val hist = fx.hist.toDF("doc", "line")
        val delta = fx.delta.toDF("doc", "line")
        val union = hist.unionByName(delta)
        val ext = StreamingOps.extendIngestState(
          StreamingOps.ingestState(hist, splitsOf(hist),
            maxBucketSize = fx.bound, allowSaturated = true),
          delta, splitsOf(delta), allowSaturated = true)
        val fresh = StreamingOps.ingestState(union, splitsOf(union),
          maxBucketSize = fx.bound, allowSaturated = true)
        val ok = textCanon(ext) == textCanon(fresh)
        if (!ok) println(s"MISMATCH on $fx")
        ok
      }
    }

  // ── embedding tier ────────────────────────────────────────────────
  private val vecPool: Seq[Seq[Float]] = Seq(
    Seq(1f, 2f, 3f, 4f), Seq(-4f, 3f, -2f, 1f),
    Seq(0.5f, -0.5f, 0.25f, -0.25f), Seq(2f, 2f, -1f, 3f))

  private val vecGen: Gen[Seq[Float]] = Gen.frequency(
    3 -> Gen.oneOf(vecPool), // duplicates ⇒ hot buckets + min-anchor law
    1 -> Gen.listOfN(4, Gen.chooseNum(-5, 5)).map(_.map(_.toFloat)))

  private case class EmbFx(
      hist: List[(Long, Seq[Float])], delta: List[(Long, Seq[Float])],
      bound: Int)

  private val embFxGen: Gen[EmbFx] = for {
    nh <- Gen.chooseNum(2, 6)
    histVecs <- Gen.listOfN(nh, vecGen)
    nd <- Gen.chooseNum(1, 5)
    deltaVecs <- Gen.listOfN(nd, vecGen)
    bound <- Gen.chooseNum(1, 3)
  } yield EmbFx(
    // delta ids BELOW history ids so the merged exact anchor must move
    histVecs.zipWithIndex.map { case (v, i) => (100L + i, v) },
    deltaVecs.zipWithIndex.map { case (v, i) => (i.toLong, v) },
    bound)

  private def embCanon(st: DataFrame) = {
    val meta = st.where(col("section") === "meta")
      .select(col("meta")).head().getString(0)
    val exact = st.where(col("section") === "index")
      .select(col("hkey"), explode(col("cands")).as("c"))
      .select(col("hkey"), col("c.hemb"), col("c.hid"))
      .collect()
      .map(r => (r.getLong(0), (r.getSeq[Double](1).toList, r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nd = st.where(col("section") === "ndindex")
      .select(col("t"), col("bucket"), explode(col("ndcands")).as("c"))
      .select(col("t"), col("bucket"), col("c.hid"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val ndDropped = st.where(col("section") === "nddropped")
      .select(col("t"), col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (meta, exact, nd, ndDropped)
  }

  property("extendEmbeddingIngestState(state(h), d) ≡ embeddingIngestState(h ∪ d)") =
    forAll(embFxGen) { fx =>
      val s = spark
      import s.implicits._
      graft.Caching.scoped {
        val hist = fx.hist.toDF("vec_id", "embedding")
        val delta = fx.delta.toDF("vec_id", "embedding")
        val union = hist.unionByName(delta)
        val ext = StreamingOps.extendEmbeddingIngestState(
          StreamingOps.embeddingIngestState(hist,
            maxBucketSize = fx.bound, allowSaturated = true),
          delta, allowSaturated = true)
        val fresh = StreamingOps.embeddingIngestState(union,
          maxBucketSize = fx.bound, allowSaturated = true)
        val ok = embCanon(ext) == embCanon(fresh)
        if (!ok) println(s"MISMATCH on $fx")
        ok
      }
    }

  // ── media tiers (whole-asset + window) ────────────────────────────
  // small hash pool ⇒ dense band-key collisions: the hot guard, the
  // dropped-key retention, and the merged-size re-decision all fire;
  // the ≤65,536-value band-key space is exactly where the merge law's
  // corner cases (old-dropped bucket with no delta members, kept
  // bucket pushed past the bound) concentrate.
  private val hashPool: Seq[Long] = Seq(
    0x0123456789abcdefL, 0x0123456789abcd00L, // differ in one band
    -0x123456789abcdefL, 0x00000000000000ffL, 0x7fffffffffffffffL)

  private val ahashGen: Gen[Long] = Gen.frequency(
    3 -> Gen.oneOf(hashPool),
    1 -> Gen.chooseNum(Long.MinValue, Long.MaxValue))

  // admissible explicit layouts (nBands·bandBits must tile the 56-bit
  // hash exactly AND keep bandBits ≤ 16 — the requireBandLayout
  // contract; (2, 28) would trip the driver-safety cap by design)
  private val layoutGen: Gen[(Int, Int)] =
    Gen.oneOf((7, 8), (4, 14), (8, 7), (14, 4), (28, 2))

  private case class MediaFx(
      hist: List[(Long, Long)], delta: List[(Long, Long)],
      bound: Int, nBands: Int, bandBits: Int)

  private val mediaFxGen: Gen[MediaFx] = for {
    nh <- Gen.chooseNum(2, 6)
    histHashes <- Gen.listOfN(nh, ahashGen)
    nd <- Gen.chooseNum(1, 5)
    deltaHashes <- Gen.listOfN(nd, ahashGen)
    bound <- Gen.chooseNum(1, 3)
    layout <- layoutGen
  } yield MediaFx(
    histHashes.zipWithIndex.map { case (h, i) => (100L + i, h) },
    deltaHashes.zipWithIndex.map { case (h, i) => (i.toLong, h) },
    bound, layout._1, layout._2)

  private def mediaCanon(st: DataFrame) = {
    val meta = st.where(col("section") === "meta")
      .select(col("meta")).head().getString(0)
    val idx = st.where(col("section") === "index")
      .select(col("band"), col("band_bits"), explode(col("cands")).as("c"))
      .select(col("band"), col("band_bits"), col("c.hid"), col("c.hh"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val dropped = st.where(col("section") === "dropped")
      .select(col("band"), col("band_bits")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (meta, idx, dropped)
  }

  property("extendMediaScreenState(state(h), d) ≡ mediaScreenState(h ∪ d), any layout/bound") =
    forAll(mediaFxGen) { fx =>
      val s = spark
      import s.implicits._
      graft.Caching.scoped {
        val hist = fx.hist.toDF("asset_id", "ahash")
        val delta = fx.delta.toDF("asset_id", "ahash")
        val union = hist.unionByName(delta)
        val ext = StreamingOps.extendMediaScreenState(
          StreamingOps.mediaScreenState(hist, maxBucketDocs = fx.bound,
            nBands = fx.nBands, bandBits = fx.bandBits,
            allowSaturated = true),
          delta, allowSaturated = true)
        val fresh = StreamingOps.mediaScreenState(union,
          maxBucketDocs = fx.bound, nBands = fx.nBands,
          bandBits = fx.bandBits, allowSaturated = true)
        val ok = mediaCanon(ext) == mediaCanon(fresh)
        if (!ok) println(s"MISMATCH on $fx")
        ok
      }
    }

  private case class WindowFx(
      hist: List[(Long, Long, Long)], delta: List[(Long, Long, Long)],
      bound: Int, nBands: Int, bandBits: Int)

  private val windowFxGen: Gen[WindowFx] = for {
    nh <- Gen.chooseNum(2, 6)
    histRows <- Gen.listOfN(nh, for {
      w <- Gen.chooseNum(0, 2); h <- ahashGen } yield (w.toLong, h))
    nd <- Gen.chooseNum(1, 5)
    deltaRows <- Gen.listOfN(nd, for {
      w <- Gen.chooseNum(0, 2); h <- ahashGen } yield (w.toLong, h))
    bound <- Gen.chooseNum(1, 3)
    layout <- layoutGen
  } yield WindowFx(
    histRows.zipWithIndex.map { case ((w, h), i) => (100L + i, w, h) },
    deltaRows.zipWithIndex.map { case ((w, h), i) => (i.toLong, w, h) },
    bound, layout._1, layout._2)

  private def windowCanon(st: DataFrame) = {
    val meta = st.where(col("section") === "meta")
      .select(col("meta")).head().getString(0)
    val idx = st.where(col("section") === "index")
      .select(col("band"), col("band_bits"), explode(col("cands")).as("c"))
      .select(col("band"), col("band_bits"), col("c.mid"), col("c.mwid"),
        col("c.hh"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val dropped = st.where(col("section") === "dropped")
      .select(col("band"), col("band_bits")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (meta, idx, dropped)
  }

  property("extendMediaWindowScreenState(state(h), d) ≡ mediaWindowScreenState(h ∪ d)") =
    forAll(windowFxGen) { fx =>
      val s = spark
      import s.implicits._
      graft.Caching.scoped {
        val hist = fx.hist.toDF("asset_id", "window_id", "ahash")
        val delta = fx.delta.toDF("asset_id", "window_id", "ahash")
        val union = hist.unionByName(delta)
        val ext = StreamingOps.extendMediaWindowScreenState(
          StreamingOps.mediaWindowScreenState(hist, maxBucketDocs = fx.bound,
            nBands = fx.nBands, bandBits = fx.bandBits,
            allowSaturated = true),
          delta, allowSaturated = true)
        val fresh = StreamingOps.mediaWindowScreenState(union,
          maxBucketDocs = fx.bound, nBands = fx.nBands,
          bandBits = fx.bandBits, allowSaturated = true)
        val ok = windowCanon(ext) == windowCanon(fresh)
        if (!ok) println(s"MISMATCH on $fx")
        ok
      }
    }
}
