package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col => C}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Chunking

/**
 * Property checks for the sequence-prep tier: chunking is a lossless
 * partition of each document's token sequence, and packing conserves
 * tokens while respecting the prefix-sum bin rule.
 */
object ChunkingProperties extends Properties("Chunking") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  private val word: Gen[String] = Gen.chooseNum('a', 'e').map(_.toString)
  private val docGen: Gen[(Long, String)] = for {
    id <- Gen.chooseNum(0L, 50L)
    n <- Gen.chooseNum(0, 40)
    ws <- Gen.listOfN(n, word)
  } yield (id, ws.mkString(" "))

  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, docGen))
      .map(_.groupBy(_._1).map { case (k, vs) => vs.head }.toList)

  private def df(rows: List[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc", "line")
  }

  private def tokCount(line: String): Long =
    line.split("\\s+").count(_.nonEmpty).toLong

  property("chunks partition the tokens: sizes bounded, counts conserved, text lossless") =
    forAll(corpusGen, Gen.chooseNum(1, 7)) { (rows, maxTok) =>
      val chunks = Chunking.chunkDocs(df(rows), maxTok)
        .orderBy(C("doc"), C("chunk_id")).collect()
        .map(r => (r.getAs[Long]("doc"), r.getAs[Long]("chunk_id"),
          r.getAs[String]("chunk_text"), r.getAs[Long]("n_tokens")))
      val byDoc = chunks.groupBy(_._1)
      rows.forall { case (id, line) =>
        val want = tokCount(line)
        val got = byDoc.getOrElse(id, Array.empty)
        val sizesOk = got.forall(c => c._4 >= 1 && c._4 <= maxTok)
        val onlyTailShort = got.sortBy(_._2).dropRight(1).forall(_._4 == maxTok)
        val conserved = got.map(_._4).sum == want
        val lossless = got.sortBy(_._2).map(_._3).mkString(" ") ==
          line.split("\\s+").filter(_.nonEmpty).mkString(" ")
        val emptyOk = want > 0 || got.isEmpty
        sizesOk && onlyTailShort && conserved && lossless && emptyOk
      }
    }

  property("packing: conserves rows/tokens and matches the prefix-sum bin rule") =
    forAll(corpusGen, Gen.chooseNum(1, 30), Gen.chooseNum(1, 4)) {
      (rows, target, buckets) =>
        val got = Chunking.packSequences(df(rows), target, buckets)
          .orderBy(C("doc")).collect()
          .map(r => (r.getAs[Long]("doc"), r.getAs[Long]("n_tokens"),
            r.getAs[Long]("bucket"), r.getAs[Long]("pack_id")))
        val rowsOk = got.length == rows.length
        val bucketOk = got.forall { case (d, _, b, _) =>
          b == java.lang.Math.floorMod(d, buckets.toLong)
        }
        // replicate the exclusive-prefix-sum rule per bucket
        val packOk = got.groupBy(_._3).forall { case (_, bs) =>
          var cum = 0L
          bs.sortBy(_._1).forall { case (_, n, _, p) =>
            val ok = p == cum / target
            cum += n
            ok
          }
        }
        rowsOk && bucketOk && packOk
    }
}
