package graft

import scala.collection.mutable

import org.apache.spark.sql.functions.{col => C}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Dedup

/**
 * Property checks for exact substring dedup against a LOCAL reference
 * implementation of the same spec (keep the globally-first occurrence
 * of every duplicated span, remove the token positions every other
 * occurrence covers): random single-letter-word corpora force heavy
 * span collisions, so the keep-first ordering, overlap merging, and
 * rebuild all get exercised — not just the no-duplicates path.
 */
object SubstringDedupProperties extends Properties("SubstringDedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  private val word: Gen[String] = Gen.chooseNum('a', 'c').map(_.toString)
  private val docGen: Gen[(String, String)] = for {
    id <- Gen.chooseNum(0, 30)
    n <- Gen.chooseNum(0, 25)
    ws <- Gen.listOfN(n, word)
  } yield (f"d$id%02d", ws.mkString(" "))

  private val corpusGen: Gen[Map[String, String]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, docGen)).map(_.toMap)

  /** The spec, computed locally and naively. */
  private def reference(docs: Map[String, String], l: Int): Map[String, (String, Long, Long)] = {
    val toks = docs.view.mapValues(_.split("\\s+").filter(_.nonEmpty)).toMap
    val occ = mutable.ArrayBuffer.empty[(String, Int, String)] // (doc, pos, span)
    for ((d, ts) <- toks; p <- 0 to ts.length - l)
      occ += ((d, p, ts.slice(p, p + l).mkString(" ")))
    val removed = occ.groupBy(_._3).values.flatMap { os =>
      os.sortBy(o => (o._1, o._2)).drop(1) // keep the global first
    }
    val dropPos = mutable.Set.empty[(String, Int)]
    for ((d, p, _) <- removed; i <- p until p + l) dropPos += ((d, i))
    toks.map { case (d, ts) =>
      val kept = ts.zipWithIndex.collect { case (t, i) if !dropPos((d, i)) => t }
      d -> ((kept.mkString(" "), kept.length.toLong, (ts.length - kept.length).toLong))
    }
  }

  property("matches the local reference spec on collision-heavy corpora") =
    forAll(corpusGen) { docs =>
      val df = {
        val s = spark; import s.implicits._
        docs.toSeq.toDF("doc", "line")
      }
      val got = Dedup.substringDedup(df, spanTokens = 3)
        .collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
      got == reference(docs, 3)
    }

  property("conserves tokens: kept + removed = original count, every doc present") =
    forAll(corpusGen) { docs =>
      val df = {
        val s = spark; import s.implicits._
        docs.toSeq.toDF("doc", "line")
      }
      val got = Dedup.substringDedup(df, spanTokens = 4).collect()
        .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      got.keySet == docs.keySet && docs.forall { case (d, line) =>
        val n = line.split("\\s+").count(_.nonEmpty)
        val (kept, removed) = got(d)
        kept + removed == n && kept >= 0 && removed >= 0
      }
    }
}
