package graft

import org.apache.spark.sql.functions.{col => C}
import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  // Classic BPE fixture: low×3, lower×1, lowest×1.
  // pair counts: (l,o)=5, (o,w)=5, (w,e)=2, (e,r)=1, (e,s)=1, (s,t)=1
  // tie (l,o) vs (o,w) breaks lexicographically → (l,o); then (lo,w)=5;
  // then (low,e)=2; then nothing repeats (all remaining pairs count 1).
  private val fixture = corpus(
    "d1" -> "low lower lowest",
    "d2" -> "low low")

  // A corpus where top pairs interact heavily (shared e/r/s symbols) —
  // exercises the safe-batch stop/truncate logic, not just disjoint luck.
  private val richer = corpus(
    "d1" -> "the quick brown fox jumps over the lazy dog",
    "d2" -> "the rain in spain stays mainly in the plain",
    "d3" -> "she sells sea shells by the sea shore",
    "d4" -> "peter piper picked a peck of pickled peppers",
    "d5" -> "the sea the shore the rain the plain")

  test("learnMerges learns the classic merge sequence deterministically") {
    Bpe.learnMerges(fixture, numMerges = 3) shouldBe
      Seq("l" -> "o", "lo" -> "w", "low" -> "e")
  }

  test("learnMerges stops once no pair repeats (minPairCount=2 default)") {
    // classic fixture: after (l,o), (lo,w), (low,e) every pair counts 1
    Bpe.learnMerges(fixture, numMerges = 10) shouldBe
      Seq("l" -> "o", "lo" -> "w", "low" -> "e")
    // single 2-char word: the only pair never repeats → noise, not a merge
    Bpe.learnMerges(corpus("d" -> "ab"), numMerges = 5) shouldBe Seq.empty
    // minPairCount=1 restores the learn-everything behavior
    Bpe.learnMerges(corpus("d" -> "ab"), numMerges = 5, minPairCount = 1) shouldBe
      Seq("a" -> "b")
  }

  test("batched and sequential distributed learners produce identical tables") {
    val sequential = Bpe.learnMerges(richer, numMerges = 12, batchSize = 1)
    sequential should have size 12
    Bpe.learnMerges(richer, numMerges = 12, batchSize = 8) shouldBe sequential
  }

  test("learnMergesLocal matches the distributed learner exactly") {
    Bpe.learnMergesLocal(fixture, numMerges = 10) shouldBe
      Bpe.learnMerges(fixture, numMerges = 10)
    Bpe.learnMergesLocal(richer, numMerges = 12) shouldBe
      Bpe.learnMerges(richer, numMerges = 12, batchSize = 1)
  }

  test("learnMergesLocal guards oversized vocabularies loudly") {
    val e = intercept[IllegalArgumentException] {
      Bpe.learnMergesLocal(richer, numMerges = 3, maxVocab = 5)
    }
    e.getMessage should include("maxVocab")
  }

  test("learnMerges releases every checkpoint block it materializes") {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    Bpe.learnMerges(richer, numMerges = 6, batchSize = 2)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    leaked shouldBe empty
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
    Bpe.learnMergesLocal(corpus(), numMerges = 3) shouldBe Seq.empty
  }

  test("applyMergesViaDict matches the direct encoder row for row, both join modes") {
    val merges = Bpe.learnMerges(fixture, numMerges = 3)
    val direct = rowsOf(Bpe.applyMerges(fixture, merges)
      .selectExpr("doc", "pos", "word", "array_join(bpe_symbols, '|') AS s"))
    rowsOf(Bpe.applyMergesViaDict(fixture, merges)
      .selectExpr("doc", "pos", "word", "array_join(bpe_symbols, '|') AS s")) shouldBe direct
    rowsOf(Bpe.applyMergesViaDict(fixture, merges, broadcastDict = false)
      .selectExpr("doc", "pos", "word", "array_join(bpe_symbols, '|') AS s")) shouldBe direct
  }
}
