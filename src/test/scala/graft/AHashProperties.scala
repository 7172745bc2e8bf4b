package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.multimodal.Multimodal

/**
 * Property check for the perceptual-hash tier: for ANY corpus-alphabet
 * text, the engine's decoded-payload hashes (PPM pixels / WAV energy /
 * sampled Y4M luma) must equal an independent local replication of the
 * 56-bucket exact mean-threshold rule — bucket boundaries, empty
 * buckets, the keyframe stride, and the zero-frame corner checked on
 * random lengths rather than hand-picked ones. This is the same
 * engine-vs-replica contract the q217/q218 oracles pin in SQL,
 * exercised across the length space.
 */
object AHashProperties extends Properties("AHash") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.spark

  // corpus-alphabet text: [a-z ] in the lengths that straddle the 56
  // buckets (empty buckets below, uneven above) and the 12-byte frame
  private val textGen: Gen[String] = for {
    len <- Gen.chooseNum(0, 140)
    cs <- Gen.listOfN(len, Gen.frequency(
      8 -> Gen.choose('a', 'z'), 1 -> Gen.const(' ')))
  } yield cs.mkString

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

  property("windowed audio / segmented video hashes equal the local replica") =
    forAll(Gen.listOfN(2, textGen), Gen.chooseNum(1, 80),
        Gen.chooseNum(1, 5)) { (texts, w, segF) =>
      val s = spark
      import s.implicits._
      val d = Seq("1" -> texts(0), "2" -> texts(1)).toDF("doc", "line")
      val assets = Multimodal.encodeAssets(d)
      val aw = Multimodal.audioAHashWindows(assets, windowSamples = w)
        .collect()
        .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
      val awExpect = texts(0).map(c => math.abs((c - 110).toLong) * 200L)
        .grouped(w).zipWithIndex
        .map { case (g, i) => i.toLong -> ((g.length.toLong, local56(g))) }
        .toMap
      val vs = Multimodal.videoAHashSegments(assets, segmentFrames = segF,
          everyNth = 2)
        .collect()
        .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
      val nf = texts(1).length / 12
      val vsExpect = (0 until nf by 2)
        .map(f => (0 until 8).map(k => texts(1).charAt(f * 12 + k).toLong))
        .grouped(segF).zipWithIndex
        .map { case (seg, i) =>
          i.toLong -> ((seg.length.toLong, local56(seg.flatten))) }
        .toMap
      aw == awExpect && vs == vsExpect
    }

  property("image/audio/video hashes equal the local 56-bucket replica") =
    forAll(Gen.listOfN(3, textGen)) { texts =>
      val s = spark
      import s.implicits._
      // one doc per modality lane: ids 0 (image), 1 (audio), 2 (video)
      val d = texts.zipWithIndex.map { case (t, i) => (s"$i", t) }
        .toDF("doc", "line")
      val assets = Multimodal.encodeAssets(d)
      val img = Multimodal.imageAHash(assets).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      val aud = Multimodal.audioAHash(assets).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val vid = Multimodal.videoAHash(assets, everyNth = 2).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val t0 = texts(0); val t1 = texts(1); val t2 = texts(2)
      val nf = t2.length / 12
      val luma = (0 until nf by 2)
        .flatMap(f => (0 until 8).map(k => t2.charAt(f * 12 + k).toLong))
      img(0L) == local56(t0.map(_.toLong)) &&
        aud(1L) == ((t1.length.toLong,
          local56(t1.map(c => math.abs((c - 110).toLong) * 200L)))) &&
        vid(2L) == ((nf.toLong, ((nf + 1) / 2).toLong, local56(luma)))
    }
}
