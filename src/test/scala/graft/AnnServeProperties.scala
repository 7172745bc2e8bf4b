package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/**
 * Property check for streaming ANN serving: on RANDOM corpus shapes
 * drawn from a small vector pool — duplicates ON PURPOSE, so cosine
 * TIES are everywhere and the row-local (−cos, vec_id) sort must
 * reproduce the batch window's (cos desc, vec_id) tie-break exactly,
 * the seam a hand-built fixture with distinct cosines never stresses —
 * [[graft.streaming.StreamingOps.annSearchStream]] over a parquet-
 * roundtripped [[graft.streaming.StreamingOps.annServeState]] must be
 * ROW-IDENTICAL to `searchAnnIndexed` over the same materialized
 * index, for random k and nProbe, with and without a random tombstone
 * set folded at state build. (Zero vectors are excluded by
 * construction — the cosine tiers define no NaN contract, matching
 * the batch oracles.)
 */
object AnnServeProperties extends Properties("AnnServe") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark

  private val comp: Gen[Float] = Gen.oneOf(-2.0f, -1.0f, 0.5f, 1.0f, 2.0f)
  private val vecGen: Gen[Seq[Float]] = Gen.listOfN(4, comp).map(_.toSeq)

  private case class Fixture(
      corpus: List[(Long, Seq[Float])],
      deletes: List[Long],
      k: Int,
      nProbe: Int)

  private val fixtureGen: Gen[Fixture] = for {
    poolSize <- Gen.chooseNum(3, 6)
    pool <- Gen.listOfN(poolSize, vecGen)
    n <- Gen.chooseNum(15, 30)
    // draw WITH replacement from the small pool: duplicate vectors ⇒
    // exact cosine ties, broken only by vec_id
    vecs <- Gen.listOfN(n, Gen.oneOf(pool))
    nDel <- Gen.chooseNum(0, 4)
    deletes <- Gen.listOfN(nDel, Gen.chooseNum(0, n - 1))
    k <- Gen.chooseNum(1, 12)
    nProbe <- Gen.chooseNum(1, 3)
  } yield Fixture(
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) },
    deletes.map(_.toLong).distinct, k, nProbe)

  property("stream serve ≡ indexed batch probe under heavy ties") =
    forAll(fixtureGen) { fx =>
      val s = spark
      import s.implicits._
      import graft.operators.Similarity

      val corpus = fx.corpus.toDF("vec_id", "embedding")
      val queries = fx.corpus.take(3)
      val qDf = queries.toDF("vec_id", "embedding")
      val idx = java.nio.file.Files
        .createTempDirectory("ann_serve_prop").toString
      Similarity.buildAnnIndex(corpus, idx, stride = 7)
      if (fx.deletes.nonEmpty)
        Similarity.deleteFromAnnIndex(spark,
          fx.deletes.map(i => (i, fx.corpus(i.toInt)._2))
            .toDF("vec_id", "embedding"), idx)

      val batch = Similarity.searchAnnIndexed(
          spark, idx, qDf, k = fx.k, nProbe = fx.nProbe)
        .collect()
        .map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id"),
          r.getAs[Double]("cos"), r.getAs[Long]("rank"))).toSet

      val stateDir = java.nio.file.Files
        .createTempDirectory("ann_serve_prop_state").toString
      graft.streaming.StreamingOps.annServeState(spark, idx)
        .write.mode("overwrite").parquet(stateDir)
      val state = spark.read.parquet(stateDir)

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Seq[Float])]
      val name = s"ann_serve_prop_${System.nanoTime()}"
      val q = graft.streaming.StreamingOps.annSearchStream(
          input.toDF().toDF("vec_id", "embedding"), state,
          k = fx.k, nProbe = fx.nProbe)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(queries: _*)
        q.processAllAvailable()
        val got = spark.table(name).collect()
          .map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("n_vec_id"),
            r.getAs[Double]("cos"), r.getAs[Long]("rank"))).toSet
        got == batch
      } finally {
        q.stop()
        spark.catalog.dropTempView(name)
      }
    }
}
