package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Rank, Search, TfIdf}

/**
 * Property-based invariants over generated corpora (SURVEY.md §5.4).
 * Generator alphabet is word-char-only: the tokenizer-linearity property
 * requires no punctuation at line junctions (boundary tokens merge across
 * a whitespace join — SURVEY.md quirk Q1).
 */
object TfIdfProperties extends Properties("TfIdf") {

  // Spark per sample is ~100ms — keep the sample count modest.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  private val word: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "hello", "world")

  private val line: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private val corpusGen: Gen[List[(String, String)]] =
    Gen.chooseNum(1, 5).flatMap { n =>
      Gen.listOfN(n, line).map(_.zipWithIndex.map { case (l, i) => (s"d$i", l) })
    }

  private def df(rows: List[(String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc", "line")
  }

  property("tf >= 1 for every (term, doc)") = forAll(corpusGen) { rows =>
    TfIdf.termFrequency(TfIdf.docWordCount(TfIdf.tokenize(df(rows))))
      .collect().forall(_.getAs[Double]("tf") >= 1.0)
  }

  property("tfidf > 0 always (idf >= log10 2 even at df = N)") =
    forAll(corpusGen) { rows =>
      TfIdf.tfidf(df(rows)).collect().forall(_.getAs[Double]("tfidf") > 0.0)
    }

  property("search on a single term == that term's tfidf rows") =
    forAll(corpusGen, word) { (rows, q) =>
      val scores = TfIdf.tfidf(df(rows))
      val expect = scores.where(col("term") === q)
        .select(col("doc"), col("tfidf"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = Search.searchTokens(scores, Seq(q))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      got == expect
    }

  property("rank is search sorted desc with doc tie-break") =
    forAll(corpusGen) { rows =>
      val hits = Search.search(df(rows), "hello world")
      val ranked = Rank.rank(hits)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toList
      val expected = hits.collect().map(r => (r.getString(0), r.getDouble(1)))
        .toList.sortBy { case (d, s) => (-s, d) }
      ranked == expected
    }

  property("tokenize(whitespace-joined lines) == concat of tokenize(lines)") =
    forAll(Gen.listOfN(3, line)) { lines =>
      // tokenize each line in isolation, concatenate client-side in order
      // (a doc-sorted collect is not order-stable within a doc)
      val separate = lines.flatMap { l =>
        TfIdf.tokenize(df(List(("d", l)))).collect().map(_.getString(1)).toList
      }
      val joined = TfIdf.tokenize(df(List(("d", lines.mkString(" ")))))
        .collect().map(_.getString(1)).toList
      joined == separate
    }
}
