package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/**
 * Property check for the streaming daily-ingest decision log: for ANY
 * small history/delta pair (tiny shared vocabulary ⇒ dense overlap, so
 * all three stages — exact dup, near-dup, kept-with-inherit — and the
 * shingle-less corner are hit across trials) and ANY threshold,
 * `StreamingOps.ingestScreen` replayed through a MemoryStream must be
 * ROW-IDENTICAL to `Pipeline.dailyIngest` over the same inputs — the
 * one-row-per-doc stateless composition checked mechanically on random
 * shapes, not just the hand-built spec fixture. The delta generator
 * mixes verbatim history copies (exact prey), history lines with a
 * token appended (near-dup prey at low thresholds, split-anchor
 * inherits at high ones), fresh lines, and sub-shingle shorts.
 */
object IngestScreenProperties extends Properties("IngestScreen") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark

  private val vocab =
    Seq("w0", "w1", "w2", "w3", "w4", "w5", "w6", "w7")

  private val lineGen: Gen[String] = for {
    len <- Gen.chooseNum(4, 10)
    toks <- Gen.listOfN(len, Gen.oneOf(vocab))
  } yield toks.mkString(" ")

  private case class Fixture(
      hist: List[(String, String)], delta: List[(String, String)])

  private val fixtureGen: Gen[Fixture] = for {
    nh <- Gen.chooseNum(2, 6)
    histLines <- Gen.listOfN(nh, lineGen)
    nd <- Gen.chooseNum(2, 8)
    deltaLines <- Gen.listOfN(nd, Gen.frequency(
      2 -> Gen.oneOf(histLines),                       // exact dup
      2 -> Gen.oneOf(histLines).map(_ + " w9"),        // near/anchor
      2 -> lineGen,                                    // fresh (or dup by chance)
      1 -> Gen.oneOf("w0", "w0 w1")))                  // shingle-less
  } yield Fixture(
    histLines.zipWithIndex.map { case (l, i) => (s"h$i", l) },
    deltaLines.zipWithIndex.map { case (l, i) => (s"n$i", l) })

  property("stream ≡ batch decision log at any threshold") =
    forAll(fixtureGen, Gen.oneOf(0.3, 0.5, 0.9)) { (fx, tau) =>
      val s = spark
      import s.implicits._
      implicit val sqlCtx = spark.sqlContext
      val hist = fx.hist.toDF("doc", "line")
      val hsp = graft.Caching.scoped {
        val f = graft.operators.Dedup.leakageSafeSplit(hist, valPerMille = 300)
          .select(col("doc"), col("split")).persist()
        f.count(); f
      }
      try {
        val batch = graft.Caching.scoped {
          graft.operators.Pipeline.dailyIngest(
              fx.delta.toDF("doc", "line"), hist, Some(hsp),
              nearDupThreshold = tau)
            .collect()
            .map(r => r.getString(0) -> ((r.getString(1),
              Option(r.getString(2)), Option(r.getString(3))))).toMap
        }
        val input = MemoryStream[(String, String)]
        val name = s"ingest_prop_${System.nanoTime()}"
        val q = graft.streaming.StreamingOps.ingestScreen(
            input.toDF().toDF("doc", "line"), hist, hsp,
            nearDupThreshold = tau, allowDerivedState = true)
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Append())
          .start()
        try {
          input.addData(fx.delta: _*)
          q.processAllAvailable()
          val got = spark.table(name).collect()
            .map(r => r.getString(0) -> ((r.getString(1),
              Option(r.getString(2)), Option(r.getString(3))))).toMap
          got == batch
        } finally {
          q.stop()
          spark.catalog.dropTempView(name)
        }
      } finally hsp.unpersist()
    }
}
