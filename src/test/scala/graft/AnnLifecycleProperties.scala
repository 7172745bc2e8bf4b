package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

/**
 * Model-based property check for the versioned ANN index lifecycle:
 * a RANDOM sequence of maintenance operations (delete / append /
 * compact / vacuum) replayed against a plain-Scala reference model —
 * `present` (ids physically in the lists) and `tombSet` (the pending
 * tombstone set) — must keep every observable surface in agreement on
 * arbitrary interleavings, not just the hand-built spec orderings:
 *  - `annIndexStats` totals: Σ n_vecs == |present|, Σ n_tombstoned ==
 *    |present ∩ tombSet| (dedup'd — retried/absent deletes don't
 *    inflate), Σ n_live == |present ∖ tombSet|;
 *  - `searchAnnIndexed` serves ONLY live ids (a tombstoned or
 *    never-appended id must never be a result);
 *  - `annIndexGenerations` always shows exactly one CURRENT committed
 *    generation; vacuum leaves ONLY it on disk;
 *  - the re-insert guard fires EXACTLY when the model says: an append
 *    naming any pending-tombstoned id throws (and appends nothing), an
 *    append of fresh ids never throws.
 * Compactions at random points are answer-invariant by construction
 * (searches read lists ∖ tombstones either way) — the checks after a
 * Compact re-assert the same model state with the set folded.
 */
object AnnLifecycleProperties extends Properties("AnnLifecycle") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark

  // id space 0..39: ids 0..19 are the initial build, 20..39 arrive
  // via appends; deletes may name ids that were never appended
  private sealed trait Op
  private case class Delete(ids: Seq[Long]) extends Op
  private case class Append(ids: Seq[Long]) extends Op
  private case object Compact extends Op
  private case object Vacuum extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> Gen.someOf(0L until 40L).map(ids => Delete(ids.take(4).toSeq)),
    3 -> Gen.someOf(20L until 40L).map(ids => Append(ids.take(3).toSeq)),
    2 -> Gen.const(Compact),
    1 -> Gen.const(Vacuum))

  private def vecOf(id: Long): Seq[Float] =
    Seq(1f + id, 2f - id, (id % 7).toFloat, 0.5f * id)

  property("random delete/append/compact/vacuum agrees with the id-set model") =
    forAll(Gen.listOfN(8, opGen)) { ops =>
      val s = spark
      import s.implicits._
      import graft.operators.Similarity

      val idx = java.nio.file.Files
        .createTempDirectory("ann_lifecycle_prop").toString
      val initial = (0L until 20L).map(i => (i, vecOf(i)))
        .toDF("vec_id", "embedding")
      Similarity.buildAnnIndex(initial, idx, stride = 5)
      var present = (0L until 20L).toSet // ids physically in the lists
      var tombSet = Set.empty[Long]      // pending tombstone set

      def check(): Boolean = {
        val live = present -- tombSet
        val stats = Similarity.annIndexStats(spark, idx).collect()
        val nVecs = stats.map(_.getAs[Long]("n_vecs")).sum
        val nTomb = stats.map(_.getAs[Long]("n_tombstoned")).sum
        val nLive = stats.map(_.getAs[Long]("n_live")).sum
        val served = Similarity.searchAnnIndexed(spark, idx,
            initial.where(col("vec_id") < 2), k = 40, nProbe = 2)
          .select("n_vec_id").collect().map(_.getLong(0)).toSet
        val gens = Similarity.annIndexGenerations(spark, idx).collect()
        val current = gens.filter(_.getAs[Boolean]("current"))
        nVecs == present.size.toLong &&
          nTomb == (present & tombSet).size.toLong &&
          nLive == live.size.toLong &&
          served.subsetOf(live) &&
          current.length == 1 && current.head.getAs[Boolean]("committed")
      }

      var ok = check()
      ops.foreach { op =>
        if (ok) op match {
          case Delete(ids) if ids.nonEmpty =>
            // deleting twice, or an id never appended, is allowed:
            // tombstones are a SET at every read site
            Similarity.deleteFromAnnIndex(spark,
              ids.map(i => (i, vecOf(i))).toDF("vec_id", "embedding"), idx)
            tombSet = tombSet ++ ids
          case Delete(_) => ()
          case Append(ids) if ids.nonEmpty =>
            val clash = ids.filter(tombSet)
            if (clash.nonEmpty) {
              // the model says the re-insert guard MUST fire, and the
              // failed append must change nothing
              val thrown =
                try {
                  Similarity.appendAnnIndex(spark,
                    ids.map(i => (i, vecOf(i))).toDF("vec_id", "embedding"),
                    idx)
                  false
                } catch { case _: IllegalArgumentException => true }
              ok = ok && thrown
            } else {
              // ids already present may not be appended again (the
              // lists would hold the id twice) — the model is a set
              val addable = ids.filterNot(present)
              if (addable.nonEmpty) {
                Similarity.appendAnnIndex(spark,
                  addable.map(i => (i, vecOf(i))).toDF("vec_id", "embedding"),
                  idx)
                present = present ++ addable
              }
            }
          case Append(_) => ()
          case Compact =>
            Similarity.compactAnnIndex(spark, idx)
            present = present -- tombSet
            tombSet = Set.empty
          case Vacuum =>
            Similarity.vacuumAnnIndex(spark, idx)
            val gens = Similarity.annIndexGenerations(spark, idx).collect()
            ok = ok && gens.length == 1 && gens.head.getAs[Boolean]("current")
        }
        ok = ok && check()
      }
      ok
    }
}
