package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/**
 * Property check for the embedding-side ingest: for ANY small
 * history/delta/threshold shape (a tiny component value set ⇒ exact
 * dups by construction; perturbed history copies ⇒ near-dup prey;
 * bench copies ⇒ contamination prey), the streaming
 * `embeddingIngestScreen` replayed through a MemoryStream must be
 * ROW-IDENTICAL to `Similarity.embeddingIngest`, and the decision log
 * must satisfy its structural contract mechanically on random shapes,
 * not just the hand-built spec fixture:
 *  - exactly one row per delta vector;
 *  - `kept` rows carry no anchor, dropped rows always carry one from
 *    the right population (history for exact/near-dup, bench for
 *    contaminated);
 *  - a delta vector that EQUALS a history vector element-wise is
 *    always `dropped_exact` (priority — never near-dup'd or
 *    contaminated past the exact screen).
 */
object EmbeddingIngestProperties extends Properties("EmbeddingIngest") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark

  private val comp: Gen[Float] =
    Gen.oneOf(-1.0f, -0.5f, 0.5f, 1.0f, 2.0f)

  private val vecGen: Gen[Seq[Float]] = Gen.listOfN(4, comp).map(_.toSeq)

  private val benchVecs: Seq[Seq[Float]] =
    Seq(Seq(1f, 1f, 1f, 1f), Seq(2f, -1f, 0.5f, 1f))

  private case class Fixture(
      hist: List[(Long, Seq[Float])], delta: List[(Long, Seq[Float])])

  private val fixtureGen: Gen[Fixture] = for {
    nh <- Gen.chooseNum(3, 6)
    histVecs <- Gen.listOfN(nh, vecGen)
    nd <- Gen.chooseNum(3, 8)
    deltaVecs <- Gen.listOfN(nd, Gen.frequency(
      2 -> Gen.oneOf(histVecs),                                // exact dup
      2 -> Gen.oneOf(histVecs).map(v =>                        // near-dup
        v.updated(0, v.head + 0.1f)),
      2 -> vecGen,                                             // fresh
      1 -> Gen.const(benchVecs.head)))                         // bench copy
  } yield Fixture(
    histVecs.zipWithIndex.map { case (v, i) => (250L + i, v) },
    deltaVecs.zipWithIndex.map { case (v, i) => (1000L + i, v) })

  property("stream ≡ batch log; structural contract holds") =
    forAll(fixtureGen, Gen.oneOf(0.5, 0.95), Gen.oneOf(0.9, 0.999)) {
      (fx, tau, tauNd) =>
        val s = spark
        import s.implicits._
        implicit val sqlCtx = spark.sqlContext
        val hist = fx.hist.toDF("vec_id", "embedding")
        val bench = benchVecs.zipWithIndex
          .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
        val delta = fx.delta.toDF("vec_id", "embedding")
        val batch = graft.Caching.scoped {
          graft.operators.Similarity.embeddingIngest(
              delta, hist, bench, tau = tau, tauNearDup = tauNd)
            .collect()
            .map(r => r.getLong(0) -> ((r.getString(1),
              Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
        }
        // structural contract
        val histIds = fx.hist.map(_._1).toSet
        val benchIds = benchVecs.indices.map(_.toLong).toSet
        val structural =
          batch.keySet == fx.delta.map(_._1).toSet &&
          batch.values.forall {
            case ("kept", a)                 => a.isEmpty
            case ("dropped_exact", a)        => a.exists(histIds)
            case ("dropped_near_dup", a)     => a.exists(histIds)
            case ("dropped_contaminated", a) => a.exists(benchIds)
            case _                           => false
          } &&
          fx.delta.forall { case (id, v) =>
            !fx.hist.exists(_._2 == v) || batch(id)._1 == "dropped_exact"
          }
        // stream parity
        val input = MemoryStream[(Long, Seq[Float])]
        val name = s"emb_ingest_prop_${System.nanoTime()}"
        val q = graft.streaming.StreamingOps.embeddingIngestScreen(
            input.toDF().toDF("vec_id", "embedding"), hist, bench,
            tau = tau, tauNearDup = tauNd)
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Append())
          .start()
        try {
          input.addData(fx.delta: _*)
          q.processAllAvailable()
          val got = spark.table(name).collect()
            .map(r => r.getLong(0) -> ((r.getString(1),
              Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
          structural && got == batch
        } finally {
          q.stop()
          spark.catalog.dropTempView(name)
        }
    }
}
