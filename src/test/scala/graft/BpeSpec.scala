package graft

import org.apache.spark.sql.functions.{col => C}
import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  // Classic BPE fixture: low×3, lower×1, lowest×1.
  // pair counts: (l,o)=5, (o,w)=5, (w,e)=2, (e,r)=1, (e,s)=1, (s,t)=1
  // tie (l,o) vs (o,w) breaks lexicographically → (l,o); then (lo,w)=5;
  // then (low,e)=2.
  private val fixture = corpus(
    "d1" -> "low lower lowest",
    "d2" -> "low low")

  test("learnMerges learns the classic merge sequence deterministically") {
    Bpe.learnMerges(fixture, numMerges = 3) shouldBe
      Seq("l" -> "o", "lo" -> "w", "low" -> "e")
  }

  test("learnMerges stops early when no pairs remain") {
    // single 2-char word: one merge possible, then symbols are atomic
    Bpe.learnMerges(corpus("d" -> "ab"), numMerges = 5) shouldBe
      Seq("a" -> "b")
  }

  test("applyMerges greedily rewrites words left-to-right, non-overlapping") {
    val merges = Bpe.learnMerges(fixture, numMerges = 3)
    val got = Bpe.applyMerges(fixture, merges)
      .where(C("doc") === "d1").orderBy(C("pos")).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[scala.collection.Seq[String]]("bpe_symbols"))
    got.toSeq shouldBe Seq(
      "low" -> Seq("low"),
      "lower" -> Seq("lowe", "r"),
      "lowest" -> Seq("lowe", "s", "t"))
  }

  test("overlapping pairs merge non-overlapping: aaa under (a,a) → [aa, a]") {
    val got = Bpe.applyMerges(corpus("d" -> "aaa"), Seq("a" -> "a"))
      .collect().head.getAs[scala.collection.Seq[String]]("bpe_symbols")
    got shouldBe Seq("aa", "a")
  }

  test("empty corpus learns nothing") {
    Bpe.learnMerges(corpus(), numMerges = 3) shouldBe Seq.empty
  }

  test("applyMergesViaDict matches the direct encoder row for row") {
    val merges = Bpe.learnMerges(fixture, numMerges = 3)
    rowsOf(Bpe.applyMergesViaDict(fixture, merges)
        .selectExpr("doc", "pos", "word", "array_join(bpe_symbols, '|') AS s")) shouldBe
      rowsOf(Bpe.applyMerges(fixture, merges)
        .selectExpr("doc", "pos", "word", "array_join(bpe_symbols, '|') AS s"))
  }
}
