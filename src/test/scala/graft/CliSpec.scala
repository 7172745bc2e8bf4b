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

  test("TFIDFRankMain: all (term,doc) scores descending") {
    val out = tmp("tfidfrank")
    Drivers.TFIDFRankMain.main(Array(corpusDir, out))
    val scores = readLines(out).map(_.split("\t")(1).toDouble)
    scores shouldBe scores.sorted.reverse
    scores should have size 6
  }
}
