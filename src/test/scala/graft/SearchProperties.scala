package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.functions.TextAnalysis
import graft.operators.Search

/**
 * Property checks for the search/fingerprint tier: the winnowing
 * detection guarantee holds under arbitrary surroundings, and BM25
 * equals an independent local reference model on random corpora.
 */
object SearchProperties extends Properties("Search") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  private def df(rows: Seq[(String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc", "line")
  }

  // filler tokens disjoint from the planted run's r1..r6
  private val filler: Gen[List[String]] =
    Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum('a', 'e').map(c => s"f$c")))

  property("winnow detection: a shared k+w-1 run survives any surroundings") =
    forAll(filler, filler, filler, filler) { (p1, s1, p2, s2) =>
      val run = Seq("r1", "r2", "r3", "r4", "r5", "r6") // k+w-1 = 6
      val d1 = (p1 ++ run ++ s1).mkString(" ")
      val d2 = (p2 ++ run ++ s2).mkString(" ")
      val fps = TextAnalysis
        .winnowFingerprints(df(Seq(("a", d1), ("b", d2))), k = 3, w = 4)
        .collect().map(r => r.getString(0) -> r.getString(1))
      val fa = fps.collect { case ("a", f) => f }.toSet
      val fb = fps.collect { case ("b", f) => f }.toSet
      fa.intersect(fb).nonEmpty
    }

  private val corpusGen: Gen[Seq[(String, String)]] =
    Gen.chooseNum(1, 8).flatMap { n =>
      Gen.listOfN(n,
        Gen.chooseNum(0, 12).flatMap(m =>
          Gen.listOfN(m, Gen.chooseNum('a', 'e').map(_.toString))))
    }.map(_.zipWithIndex.map { case (ts, i) => (s"d$i", ts.mkString(" ")) })

  property("bm25Scores equals an independent local model") =
    forAll(corpusGen) { rows =>
      // local reference model, same tokenizer regex as the engine
      val toks = rows
        .map { case (d, l) => d -> l.split("\\s*\\b\\s*").toSeq.filter(_.nonEmpty) }
        .filter(_._2.nonEmpty)
      toks.nonEmpty ==> {
        val counts = toks.flatMap { case (d, ts) =>
          ts.groupBy(identity).map { case (t, g) => (t, d, g.size.toLong) }
        }
        val dl = toks.map { case (d, ts) => d -> ts.size.toLong }.toMap
        val n = dl.size
        val avgdl = dl.values.sum.toDouble / n
        val dfT = counts.groupBy(_._1).map { case (t, g) => t -> g.size.toLong }
        val expect = counts.map { case (t, d, c) =>
          val idf = math.log(1 + (n.toDouble - dfT(t) + 0.5) / (dfT(t) + 0.5))
          (t, d) -> idf * (c * 2.2) / (c + 1.2 * (0.25 + 0.75 * dl(d) / avgdl))
        }.toMap
        val got = Search.bm25Scores(df(rows)).collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
        got.keySet == expect.keySet &&
          expect.forall { case (k, v) => math.abs(got(k) - v) < 1e-9 }
      }
    }
}
