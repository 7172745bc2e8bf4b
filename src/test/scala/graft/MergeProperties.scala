package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Chunking, Merge}

/**
 * Property checks for the incremental keyed-state tier:
 *
 *  - `upsertLatest`'s delta-bounded semi/anti split must equal the flat
 *    latest-per-key window over (history ∪ delta) for ANY event
 *    multiset and ANY cut point — the split is plan surgery, never
 *    semantics (the skewJoin property, re-applied);
 *  - `rendezvousShard`'s resize identity: growing n → n+1 moves
 *    EXACTLY the keys the new shard wins, for ANY key set and ANY n.
 */
object MergeProperties extends Properties("Merge") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  // few users/types/timestamps => plenty of key collisions and ties
  private val eventsGen: Gen[List[(Long, Long, Long, String, Double)]] = for {
    n <- Gen.chooseNum(0, 60)
    es <- Gen.listOfN(n, for {
      id <- Gen.chooseNum(1L, 1000L)
      ts <- Gen.chooseNum(0L, 5L)
      u <- Gen.chooseNum(1L, 4L)
      t <- Gen.oneOf("a", "b")
    } yield (id, ts, u, t, id.toDouble))
  } yield es.distinctBy(_._1) // event_id is the unique tie-break

  property("split upsert equals the flat latest-per-key window") =
    forAll(eventsGen, Gen.chooseNum(0L, 6L)) { (events, cut) =>
      val s = spark
      import s.implicits._
      val all = events.map { case (id, ts, u, t, v) =>
        (id, new Timestamp(ts * 3600000L), u, t, v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val keys = Seq("user_id", "event_type")
      val ord = Seq("ts", "event_id")
      val cutTs = lit(new Timestamp(cut * 3600000L))
      val hist = Merge.upsertLatest(
        all.where(lit(false)), all.where(col("ts") < cutTs), keys, ord)
      val got = Merge.upsertLatest(
        hist, all.where(col("ts") >= cutTs), keys, ord)
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("ts").desc, col("event_id").desc)
      val flat = all.withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1).drop("_rn")
      got.collect().map(_.toString).sorted.toList ==
        flat.collect().map(_.toString).sorted.toList
    }

  private val keysGen: Gen[List[Long]] = for {
    n <- Gen.chooseNum(0, 80)
    ks <- Gen.listOfN(n, Gen.chooseNum(1L, 100000L))
  } yield ks.distinct

  property("rendezvous resize moves exactly the new shard's wins") =
    forAll(keysGen, Gen.chooseNum(1, 12)) { (ks, n) =>
      val s = spark
      import s.implicits._
      val df = ks.toDF("k")
      val a = Chunking.rendezvousShard(df, "k", n).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = Chunking.rendezvousShard(df, "k", n + 1).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val moved = a.keySet.filter(k => a(k) != b(k))
      moved == b.filter(_._2 == n.toLong).keySet
    }

  // few items over a tiny universe => real overlap structure
  private val itemsGen: Gen[List[(String, String)]] = for {
    n <- Gen.chooseNum(0, 50)
    xs <- Gen.listOfN(n, for {
      src <- Gen.oneOf("s1", "s2", "s3")
      fp <- Gen.chooseNum(1, 12).map(i => s"f$i")
    } yield (src, fp))
  } yield xs

  property("KMV overlap is EXACT whenever k covers every feed") =
    forAll(itemsGen) { items =>
      val s = spark
      import s.implicits._
      import graft.operators.Pipeline
      val df = items.toDF("source", "fp")
      val est = Pipeline.sourceOverlapKmv(df, k = 16).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
      val exact = Pipeline.sourceOverlap(df).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
      // k=16 ≥ the 12-fp universe ⇒ sketches are the full sets and the
      // merged-k estimate IS the exact jaccard, for any input multiset
      est == exact
    }
}
