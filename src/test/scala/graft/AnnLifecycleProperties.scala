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
  private case object Maintain extends Op // round 12: the one-call loop
  private case object Retrain extends Op  // round 13: quantizer refresh

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> Gen.someOf(0L until 40L).map(ids => Delete(ids.take(4).toSeq)),
    3 -> Gen.someOf(20L until 40L).map(ids => Append(ids.take(3).toSeq)),
    2 -> Gen.const(Compact),
    1 -> Gen.const(Vacuum),
    2 -> Gen.const(Maintain),
    2 -> Gen.const(Retrain))

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
          case Retrain =>
            // same id-set model as Compact (tombstones fold, live ids
            // unchanged); the quantizer re-derives from live seeds
            // (ids ≡ 0 mod stride), so a live set with NO seed rows
            // must throw the empty-fold guard and change nothing
            val live = present -- tombSet
            val hasSeeds = live.exists(_ % 5 == 0)
            if (live.isEmpty || !hasSeeds) {
              val thrown =
                try { Similarity.retrainAnnIndex(spark, idx, 5); false }
                catch { case _: IllegalArgumentException => true }
              ok = ok && thrown
            } else {
              Similarity.retrainAnnIndex(spark, idx, stride = 5)
              present = live
              tombSet = Set.empty
            }
          case Vacuum =>
            Similarity.vacuumAnnIndex(spark, idx)
            val gens = Similarity.annIndexGenerations(spark, idx).collect()
            ok = ok && gens.length == 1 && gens.head.getAs[Boolean]("current")
          case Maintain =>
            // the round-12 one-call loop against the same model: debt
            // measured over present ids, fold iff it crosses the bound,
            // report fields must match the model exactly — and the
            // fold-to-empty corner throws the empty-fold guard through
            // maintainAnnIndex with the state unchanged
            val debtNum = (present & tombSet).size
            val over = present.nonEmpty &&
              debtNum.toDouble / present.size > 0.25
            val live = present -- tombSet
            if (over && live.isEmpty) {
              val thrown =
                try { Similarity.maintainAnnIndex(spark, idx, 0.25); false }
                catch { case _: IllegalArgumentException => true }
              ok = ok && thrown
            } else {
              val r = Similarity.maintainAnnIndex(spark, idx, 0.25).head()
              ok = ok &&
                r.getAs[Long]("n_vecs") == present.size.toLong &&
                r.getAs[Long]("n_tombstoned") == debtNum.toLong &&
                r.getAs[Boolean]("compacted") == over &&
                r.getAs[Boolean]("serve_state_stale") == over &&
                (r.getAs[Long]("generation_after") -
                  r.getAs[Long]("generation_before")) ==
                  (if (over) 1L else 0L)
              if (over) {
                present = live
                tombSet = Set.empty
              }
            }
        }
        ok = ok && check()
      }
      ok
    }

  /**
   * End-of-walk SERVE composition over the randomly lifecycled index —
   * the round-12 serving operators exercised on an index with real
   * generation/tombstone/append history, not a fresh build:
   *  1. a serve artifact built NOW is current and serves exactly what
   *     the batch probe serves (live ids only);
   *  2. an APPEND strands it (freshness guard throws), and
   *     `refreshAnnServeState` patches it back to current with
   *     batch-identical serving over the grown index;
   *  3. a DELETE moves the coordinates past appends — the refreshed
   *     artifact goes stale and a re-refresh refuses loudly;
   *  4. `maintainAnnIndex` at a crossed bound folds, reports the
   *     serve_state_stale flag, and the guard confirms it.
   */
  property("serve/refresh/maintain compose over a randomly lifecycled index") =
    forAll(Gen.listOfN(5, opGen)) { ops =>
      val s = spark
      import s.implicits._
      import graft.operators.Similarity
      import graft.streaming.StreamingOps
      implicit val sqlCtx = spark.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

      val idx = java.nio.file.Files
        .createTempDirectory("ann_serve_walk_prop").toString
      val initial = (0L until 20L).map(i => (i, vecOf(i)))
        .toDF("vec_id", "embedding")
      Similarity.buildAnnIndex(initial, idx, stride = 5)
      var present = (0L until 20L).toSet
      var tombSet = Set.empty[Long]
      // replay the walk without checks (the first property owns them),
      // tolerating the guard throws the model predicts
      ops.foreach {
        case Delete(ids) if ids.nonEmpty =>
          Similarity.deleteFromAnnIndex(spark,
            ids.map(i => (i, vecOf(i))).toDF("vec_id", "embedding"), idx)
          tombSet = tombSet ++ ids
        case Append(ids) if ids.nonEmpty && ids.forall(!tombSet(_)) =>
          val addable = ids.filterNot(present)
          if (addable.nonEmpty) {
            Similarity.appendAnnIndex(spark,
              addable.map(i => (i, vecOf(i))).toDF("vec_id", "embedding"), idx)
            present = present ++ addable
          }
        case Compact if (present -- tombSet).nonEmpty =>
          Similarity.compactAnnIndex(spark, idx)
          present = present -- tombSet
          tombSet = Set.empty
        case Retrain if (present -- tombSet).exists(_ % 5 == 0) =>
          Similarity.retrainAnnIndex(spark, idx, stride = 5)
          present = present -- tombSet
          tombSet = Set.empty
        case Vacuum =>
          Similarity.vacuumAnnIndex(spark, idx)
        case _ => ()
      }

      def served(state: org.apache.spark.sql.DataFrame): Set[Long] = {
        val input = MemoryStream[(Long, Seq[Float])]
        val name = s"serve_walk_${System.nanoTime()}"
        val sq = StreamingOps.annSearchStream(
            input.toDF().toDF("vec_id", "embedding"), state, k = 60,
            nProbe = 2)
          .writeStream.format("memory").queryName(name)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .start()
        try {
          input.addData((0L until 2L).map(i => (i, vecOf(i))): _*)
          sq.processAllAvailable()
          spark.table(name).collect()
            .map(_.getAs[Long]("n_vec_id")).toSet
        } finally sq.stop()
      }
      def batchServed(): Set[Long] =
        Similarity.searchAnnIndexed(spark, idx,
            initial.where(col("vec_id") < 2), k = 60, nProbe = 2)
          .select("n_vec_id").collect().map(_.getLong(0)).toSet

      // (1) current artifact serves the batch answer over live ids
      val st0 = StreamingOps.annServeState(spark, idx)
      StreamingOps.requireServeStateCurrent(spark, idx, st0)
      var ok = served(st0) == batchServed() &&
        served(st0).subsetOf(present -- tombSet)
      // (2) append strands it; refresh patches it back, batch-identical
      val delta = Seq((100L, vecOf(100L)), (101L, vecOf(101L)))
        .toDF("vec_id", "embedding")
      Similarity.appendAnnIndex(spark, delta, idx)
      present = present ++ Set(100L, 101L)
      val stale =
        try { StreamingOps.requireServeStateCurrent(spark, idx, st0); false }
        catch { case _: IllegalArgumentException => true }
      val refreshed = StreamingOps.refreshAnnServeState(spark, idx, st0)
      StreamingOps.requireServeStateCurrent(spark, idx, refreshed)
      ok = ok && stale && served(refreshed) == batchServed()
      // (3) a delete moves the coordinates past appends — refresh refuses
      val victim = (present -- tombSet).max
      Similarity.deleteFromAnnIndex(spark,
        Seq((victim, vecOf(victim))).toDF("vec_id", "embedding"), idx)
      tombSet = tombSet + victim
      val refusal =
        try { StreamingOps.refreshAnnServeState(spark, idx, refreshed); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("moved past appends") }
      ok = ok && refusal
      // (4) maintain at a crossed bound folds and flags serve staleness
      val r = Similarity.maintainAnnIndex(spark, idx, maxDebtFrac = 0.0).head()
      val refreshedStale =
        try {
          StreamingOps.requireServeStateCurrent(spark, idx, refreshed); false
        } catch { case _: IllegalArgumentException => true }
      ok && r.getAs[Boolean]("compacted") &&
        r.getAs[Boolean]("serve_state_stale") && refreshedStale
    }
}
