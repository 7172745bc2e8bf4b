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

  // ── refresh ≡ rebuild, every tier, random corpora/deletes/filters ──

  private case class RefreshFx(
      base: List[(Long, Seq[Float])],
      delta: List[(Long, Seq[Float])],
      deletes: List[Long],
      tier: String,
      filtered: Boolean,
      k: Int,
      nProbe: Int)

  /** Base ids are 0..n-1 (so the IVF stride and the shrunken-PQ seed
    * ids 0 and 7 exist); delta ids start at 401 — past the PQ seed
    * ceiling (k·pqStride = 14 here, 400 for the defaults), so the
    * frozen-codebook patch and a from-scratch rebuild derive the SAME
    * codebook and parity is exact. Deletes never hit the PQ seed ids
    * {0, 7}: both builds must read identical live seed rows. */
  private val refreshFxGen: Gen[RefreshFx] = for {
    poolSize <- Gen.chooseNum(3, 6)
    pool <- Gen.listOfN(poolSize, vecGen)
    n <- Gen.chooseNum(15, 30)
    baseVecs <- Gen.listOfN(n, Gen.oneOf(pool))
    nd <- Gen.chooseNum(1, 6)
    deltaVecs <- Gen.listOfN(nd, Gen.oneOf(pool))
    nDel <- Gen.chooseNum(0, 4)
    deletes <- Gen.listOfN(nDel,
      Gen.chooseNum(1, n - 1).suchThat(i => i != 7))
    tier <- Gen.oneOf("float", "pq", "hamming", "int8")
    filtered <- Gen.oneOf(true, false)
    k <- Gen.chooseNum(1, 8)
    nProbe <- Gen.chooseNum(1, 3)
  } yield RefreshFx(
    baseVecs.zipWithIndex.map { case (v, i) => (i.toLong, v) },
    deltaVecs.zipWithIndex.map { case (v, i) => (401L + i, v) },
    deletes.map(_.toLong).distinct, tier, filtered, k, nProbe)

  property("refresh ≡ rebuild on every tier, random deletes + filters") =
    forAll(refreshFxGen) { fx =>
      val s = spark
      import s.implicits._
      import graft.operators.Similarity
      import graft.streaming.StreamingOps
      import org.apache.spark.sql.functions.col

      def labeled(rows: List[(Long, Seq[Float])]) =
        rows.map { case (id, v) => (id, v, (id % 2).toInt) }
          .toDF("vec_id", "embedding", "label")
      val base = labeled(fx.base)
      val idx = java.nio.file.Files
        .createTempDirectory("ann_refresh_prop").toString
      Similarity.buildAnnIndex(base, idx, stride = 7,
        metaCols = Seq("label"))
      if (fx.deletes.nonEmpty)
        Similarity.deleteFromAnnIndex(spark,
          fx.deletes.map(i => (i, fx.base(i.toInt)._2))
            .toDF("vec_id", "embedding"), idx)
      val pred =
        if (fx.filtered) Some(col("label") === 1) else None
      def build() = fx.tier match {
        case "pq" => StreamingOps.annServePqState(spark, idx,
          m = 2, subDim = 2, k = 2, pqStride = 7, filter = pred)
        case "hamming" =>
          StreamingOps.annServeHammingState(spark, idx, bits = 16,
            filter = pred)
        case "int8" => StreamingOps.annServeInt8State(spark, idx,
          filter = pred)
        case _ => StreamingOps.annServeState(spark, idx, pred)
      }
      def roundtrip(df: org.apache.spark.sql.DataFrame) = {
        val dir = java.nio.file.Files
          .createTempDirectory("ann_refresh_prop_st").toString
        df.write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      }
      val st0 = roundtrip(build())
      Similarity.appendAnnIndex(spark, labeled(fx.delta), idx)
      val refreshed =
        roundtrip(StreamingOps.refreshAnnServeState(spark, idx, st0))
      StreamingOps.requireServeStateCurrent(spark, idx, refreshed)
      val rebuilt = roundtrip(build())
      // the serving screens reduce the carried arrays order-insensitively
      // (row-local sort), so SEARCH OUTPUT identity is the law — array
      // member order may legitimately differ between patch and rebuild
      val q = fx.base.take(3).toDF("vec_id", "embedding")
      def screen(state: org.apache.spark.sql.DataFrame) =
        (fx.tier match {
          case "pq" =>
            StreamingOps.annSearchStreamPq(q, state, fx.k, fx.nProbe)
          case "hamming" =>
            StreamingOps.annSearchStreamHamming(q, state, fx.k, fx.nProbe)
          case "int8" =>
            StreamingOps.annSearchStreamInt8(q, state, fx.k, fx.nProbe)
          case _ => StreamingOps.annSearchStream(q, state, fx.k, fx.nProbe)
        }).collect().map(_.toSeq).toSet
      screen(refreshed) == screen(rebuilt)
    }
}
