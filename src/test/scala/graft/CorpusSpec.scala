package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}

import graft.sources.Corpus

/** O1 text-directory source: doc identity = file basename
  * (DocWordCount.java:54), and the O12 tab-text parity sink. */
class CorpusSpec extends SparkSpec {

  private def minicorpusDir: String =
    getClass.getResource("/minicorpus").getPath

  test("textDir attaches file basename as doc id") {
    val df = Corpus.textDir(spark, minicorpusDir)
    val got = rowsOf(df)
    got shouldBe Seq(
      Seq("d1.txt", "Hello world hello"),
      Seq("d2.txt", "world of spark")
    ).sortBy(_.mkString(" "))
  }

  test("documentsParquet normalizes to (doc, line)") {
    val df = Corpus.documentsParquet(spark, "/root/testdata/sf0.001/documents.parquet")
    df.columns.toSeq shouldBe Seq("doc", "line")
    df.count() shouldBe 500L
  }

  test("multi-line files: one row per line, same doc id, counts aggregate") {
    // reference semantics: the mapper tokenizes each LINE separately but
    // keys by file basename (DocWordCount.java:54), so counts for a term
    // spanning lines of one file aggregate
    val dir = Files.createTempDirectory("graft-multiline")
    Files.writeString(dir.resolve("m.txt"), "alpha beta\nbeta gamma\n")
    val df = Corpus.textDir(spark, dir.toString)
    df.count() shouldBe 2L // one row per line
    val counts = graft.operators.TfIdf
      .docWordCount(graft.operators.TfIdf.tokenize(df))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    counts("beta") shouldBe 2L // aggregated across both lines
    counts("alpha") shouldBe 1L
    counts("gamma") shouldBe 1L
  }

  test("documentsJsonl reads one object per line with explicit schema") {
    val dir = Files.createTempDirectory("graft-jsonl")
    Files.writeString(dir.resolve("docs.jsonl"),
      """{"doc_id":"j1","text":"hello world"}
        |{"doc_id":"j2","text":"spark stream"}
        |""".stripMargin)
    val df = Corpus.documentsJsonl(spark, dir.toString)
    df.columns.toSeq shouldBe Seq("doc", "line")
    rowsOf(df) shouldBe Seq(
      Seq("j1", "hello world"), Seq("j2", "spark stream"))
  }

  test("documentsCsv reads header-ed csv with explicit schema") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(dir.resolve("docs.csv"),
      "doc_id,text\nc1,hello world\nc2,spark stream\n")
    val df = Corpus.documentsCsv(spark, dir.toString)
    rowsOf(df) shouldBe Seq(
      Seq("c1", "hello world"), Seq("c2", "spark stream"))
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    val s = spark
    import s.implicits._
    val left = (1L to 100L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "rv")
    Corpus.writeBucketedTable(left, "graft_bkt_l", Seq("k"), numBuckets = 4)
    Corpus.writeBucketedTable(right, "graft_bkt_r", Seq("k"), numBuckets = 4)
    // force the shuffle-join path (tiny test tables would auto-broadcast,
    // which bypasses bucketed reading entirely) to show bucketing removes
    // the exchanges a sort-merge join would otherwise need
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_l").join(spark.table("graft_bkt_r"), "k")
      joined.count() shouldBe 100L
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) { plan should not include "Exchange" }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("writeTabText emits key<TAB>value lines") {
    val out = Files.createTempDirectory("graft-sink").toString + "/out"
    Corpus.writeTabText(corpus("d1" -> "x"), "doc", "line", out)
    val back = spark.read.text(out).collect().map(_.getString(0)).toSeq
    back shouldBe Seq("d1\tx")
  }

  test("ORC sink/source round-trips documents") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft-orc").toString + "/docs"
    Corpus.writeOrc(
      Seq((1L, "hello world"), (2L, "spark stream")).toDF("doc_id", "text"), out)
    rowsOf(Corpus.documentsOrc(spark, out)) shouldBe
      Seq(Seq("1", "hello world"), Seq("2", "spark stream"))
  }

  test("partitioned parquet prunes unselected partitions at planning time") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft-part").toString + "/docs"
    val df = Seq(
      (1L, "the cat", "en"), (2L, "der hund", "de"), (3L, "a dog", "en"))
      .toDF("doc_id", "text", "lang")
    Corpus.writePartitionedParquet(df, Seq("lang"), out)
    // one directory per lang value on disk
    new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("lang="))
      .toSet shouldBe Set("lang=en", "lang=de")
    val read = spark.read.parquet(out).where(F.col("lang") === "en")
    read.count() shouldBe 2L
    val plan = read.queryExecution.executedPlan.toString
    withClue(plan) {
      plan should include regex "PartitionFilters.*lang.*en"
      // the pruned scan reads one of the two partitions
      plan should not include "lang=de"
    }
  }
}
