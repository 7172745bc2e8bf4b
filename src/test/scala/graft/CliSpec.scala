package graft

import java.nio.file.Files

import graft.cli.Drivers

/** End-to-end golden runs of the CLI drivers over the committed
  * minicorpus (FIXTURES.md §2). Output is the reference text-sink parity
  * format: composite keys + Double.toString values. */
class CliSpec extends SparkSpec {

  private val corpusDir = getClass.getResource("/minicorpus").getPath

  private def readLines(out: String): Seq[String] =
    spark.read.text(out).collect().map(_.getString(0)).toSeq

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").resolve("out").toString

  test("DocWordCountMain: word#####file \\t count, minicorpus golden") {
    val out = tmp("dwc")
    Drivers.DocWordCountMain.main(Array(corpusDir, out))
    readLines(out).sorted shouldBe Seq(
      "Hello#####d1.txt\t1", "hello#####d1.txt\t1", "of#####d2.txt\t1",
      "spark#####d2.txt\t1", "world#####d1.txt\t1", "world#####d2.txt\t1")
  }

  test("TermFrequencyMain: tf of count-1 terms is exactly 1.0") {
    val out = tmp("tf")
    Drivers.TermFrequencyMain.main(Array(corpusDir, out))
    val lines = readLines(out)
    lines should have size 6
    all(lines.map(_.split("\t")(1))) shouldBe "1.0"
  }

  test("TFIDFMain: word@file \\t Double.toString(tfidf), floor-idf quirk") {
    val out = tmp("tfidf")
    Drivers.TFIDFMain.main(Array(corpusDir, out))
    val got = readLines(out).map { l =>
      val Array(k, v) = l.split("\t"); k -> v
    }.toMap
    val l2 = math.log10(2).toString // df=2: idf = log10(1 + 2/2)
    val l3 = math.log10(3).toString // df=1: idf = log10(1 + 2/1)
    got shouldBe Map(
      "Hello@d1.txt" -> l3, "hello@d1.txt" -> l3, "world@d1.txt" -> l2,
      "world@d2.txt" -> l2, "of@d2.txt" -> l3, "spark@d2.txt" -> l3)
  }

  test("RankMain: descending file \\t score for query 'world hello'") {
    val out = tmp("rank")
    Drivers.RankMain.main(Array(corpusDir, out, "2", "world", "hello"))
    readLines(out) shouldBe Seq(
      s"d1.txt\t${(math.log10(3) + math.log10(2)).toString}",
      s"d2.txt\t${math.log10(2).toString}")
  }

  test("SearchMain honors explicit numDocs (quirk Q4: may disagree with corpus)") {
    val out = tmp("search")
    // numDocs=5: df(world)=2 -> idf=log10(1 + floor(5/2))=log10(3) (quirk Q3)
    Drivers.SearchMain.main(Array(corpusDir, out, "5", "world"))
    readLines(out).sorted shouldBe Seq(
      s"d1.txt\t${math.log10(3).toString}",
      s"d2.txt\t${math.log10(3).toString}")
  }

  test("RankMain parity: duplicate query terms double-count (quirk Q7)") {
    val out = tmp("rankdup")
    // Search.java:230's commented-out break: 'hello hello world' adds
    // d1's hello score twice (FIXTURES.md quirk case 0.9542425)
    Drivers.RankMain.main(Array(corpusDir, out, "2", "hello", "hello", "world"))
    val got = readLines(out).map { l =>
      val Array(k, v) = l.split("\t"); k -> v.toDouble
    }
    got.map(_._1) shouldBe Seq("d1.txt", "d2.txt")
    got.head._2 shouldBe (2 * math.log10(3) + math.log10(2)) +- 1e-12
    got(1)._2 shouldBe math.log10(2) +- 1e-12
  }

  test("SearchMain: non-numeric args(2) is a query term, not numDocs") {
    val out = tmp("searchnonum")
    Drivers.SearchMain.main(Array(corpusDir, out, "world", "hello"))
    val got = readLines(out).map { l =>
      val Array(k, v) = l.split("\t"); k -> v.toDouble
    }.toMap
    got("d1.txt") shouldBe (math.log10(3) + math.log10(2)) +- 1e-12
    got("d2.txt") shouldBe math.log10(2) +- 1e-12
  }

  test("DocWordCountMain quirk corpus: punctuation tokens, tab/@ in terms") {
    // quirkcorpus (committed): p1 'e.g. test', p2 'a ,\t. b@c =@ end'.
    // Reference tokenizer (\s*\b\s*, quirk Q1) keeps punctuation runs as
    // tokens — ',\t.' carries an embedded tab and '=@' an '@', so the
    // §2.3 delimiter-survival behavior is exercised end-to-end.
    val quirkDir = getClass.getResource("/quirkcorpus").getPath
    val out = tmp("quirk")
    Drivers.DocWordCountMain.main(Array(quirkDir, out))
    readLines(out).toSet shouldBe Set(
      ".#####p1.txt\t2", "e#####p1.txt\t1", "g#####p1.txt\t1",
      "test#####p1.txt\t1",
      "a#####p2.txt\t1", ",\t.#####p2.txt\t1", "b#####p2.txt\t1",
      "@#####p2.txt\t1", "c#####p2.txt\t1", "=@#####p2.txt\t1",
      "end#####p2.txt\t1")
  }

  test("TFIDFMain quirk corpus: delimiter-bearing keys survive the sink") {
    val quirkDir = getClass.getResource("/quirkcorpus").getPath
    val out = tmp("quirktfidf")
    Drivers.TFIDFMain.main(Array(quirkDir, out))
    val keys = readLines(out).map(_.split("\t(?=[^\t]*$)")(0)).toSet
    keys should contain(",\t.@p2.txt") // tab inside the term, '@' key format
    keys should contain("=@@p2.txt")   // '@' inside the term + '@' separator
    // every term is unique to its doc → df=1, idf=log10(1+2/1); '.' has
    // count 2 in p1 → tf=1+log10(2), all others tf=1
    val values = readLines(out).map(_.split("\t").last).toSet
    values shouldBe Set(
      math.log10(3).toString,
      ((1 + math.log10(2)) * math.log10(3)).toString)
  }

  test("DocWordCountMain accepts a parquet documents path") {
    val out = tmp("dwcparquet")
    Drivers.DocWordCountMain.main(
      Array("/root/testdata/sf0.001/documents.parquet", out))
    val lines = readLines(out)
    lines.size should be > 1000
    // composite key format holds on the parquet path too
    all(lines) should include("#####")
  }

  test("TFIDFRankMain: all (term,doc) scores descending") {
    val out = tmp("tfidfrank")
    Drivers.TFIDFRankMain.main(Array(corpusDir, out))
    val scores = readLines(out).map(_.split("\t")(1).toDouble)
    scores shouldBe scores.sorted.reverse
    scores should have size 6
  }
}
