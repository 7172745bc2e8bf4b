package graft.cli

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Rank, Search, TfIdf}
import graft.sources.Corpus

/**
 * Six thin CLI drivers mirroring the reference entry points (SURVEY.md §2
 * O13: DocWordCount / TermFrequency / TFIDF / Search / Rank / TFIDFRank).
 *
 * Arg-surface divergence from the reference, by design: the reference
 * threads intermediate HDFS paths through every driver because each MR job
 * materializes text (TFIDF.java:45→65); here each driver is ONE lazy plan
 * with a single sink, so the intermediate-path args don't exist. numDocs
 * stays caller-suppliable (reference quirk Q4, TFIDF.java:58) and defaults
 * to the corpus document count.
 *
 * Output parity (SURVEY.md §2 O12, quirk Q6): `key \t value` text lines
 * with the reference's composite keys (`word#####file`, `word@file` —
 * DocWordCount.java:62, TFIDF.java:166) and `Double.toString` score
 * formatting.
 *
 * Input: a directory of text files (doc id = file basename,
 * DocWordCount.java:54) or a `documents` parquet file/dir (path containing
 * ".parquet").
 */
object Drivers {

  private[cli] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
  }

  private[cli] def corpus(spark: SparkSession, in: String): DataFrame =
    if (in.contains(".parquet")) Corpus.documentsParquet(spark, in)
    else Corpus.textDir(spark, in)

  /** Reference text-sink double formatting: Java `Double.toString` (quirk
    * Q6) — Spark's cast-to-string diverges on some exponent forms. */
  private val fmtDouble = udf((d: Double) => d.toString)

  private def writeKV(df: DataFrame, key: Column, value: Column, out: String): Unit =
    Corpus.writeTabText(
      df.select(key.as("k"), value.cast("string").as("v")), "k", "v", out)

  /** args(i) is numDocs only when it parses as a number (quirk Q4);
    * otherwise it is the first query term — `Search <in> <out> world
    * hello` must not throw NumberFormatException. */
  private def numDocsArg(args: Array[String], i: Int): Option[Long] =
    if (args.length > i) scala.util.Try(args(i).toLong).toOption else None

  /** Query = remaining args joined (starting after numDocs when one was
    * given), else stdin (Search.java:37-46). */
  private def queryArg(args: Array[String]): String = {
    val from = if (numDocsArg(args, 2).isDefined) 3 else 2
    if (args.length > from) args.drop(from).mkString(" ")
    else scala.io.StdIn.readLine("query> ")
  }

  /** `DocWordCount <in> <out>` → `word#####file \t count`. */
  object DocWordCountMain {
    def main(args: Array[String]): Unit = {
      val Array(in, out) = args.take(2)
      val spark = session()
      writeKV(
        TfIdf.docWordCount(TfIdf.tokenize(corpus(spark, in))),
        concat(col("term"), lit("#####"), col("doc")), col("count"), out)
    }
  }

  /** `TermFrequency <in> <out>` → `word#####file \t tf`. */
  object TermFrequencyMain {
    def main(args: Array[String]): Unit = {
      val Array(in, out) = args.take(2)
      val spark = session()
      writeKV(
        TfIdf.termFrequency(TfIdf.docWordCount(TfIdf.tokenize(corpus(spark, in)))),
        concat(col("term"), lit("#####"), col("doc")), fmtDouble(col("tf")), out)
    }
  }

  /** `TFIDF <in> <out> [numDocs]` → `word@file \t tfidf`. */
  object TFIDFMain {
    def main(args: Array[String]): Unit = {
      val Array(in, out) = args.take(2)
      val spark = session()
      writeKV(
        TfIdf.tfidf(corpus(spark, in), numDocsArg(args, 2)),
        concat(col("term"), lit("@"), col("doc")), fmtDouble(col("tfidf")), out)
    }
  }

  /** `Search <in> <out> [numDocs] [query terms...]` → `file \t score`
    * (unsorted — reference Search job3's comparator is broken, quirk Q8;
    * the intended sorted output is RankMain). CLI default is reference
    * parity: duplicated query terms double-count (quirk Q7,
    * Search.java:230 — `break` commented out). */
  object SearchMain {
    def main(args: Array[String]): Unit = {
      val Array(in, out) = args.take(2)
      val spark = session()
      val hits = Search.search(
        corpus(spark, in), queryArg(args), numDocsArg(args, 2),
        parityDuplicates = true)
      writeKV(hits, col("doc"), fmtDouble(col("score")), out)
    }
  }

  /** `Rank <in> <out> [numDocs] [query terms...]` → `file \t score`,
    * descending (deterministic tie-break on doc — quirk Q5). Reference
    * parity on duplicate query terms, like SearchMain. */
  object RankMain {
    def main(args: Array[String]): Unit = {
      val Array(in, out) = args.take(2)
      val spark = session()
      val ranked = Rank.rank(Search.search(
        corpus(spark, in), queryArg(args), numDocsArg(args, 2),
        parityDuplicates = true))
      writeKV(ranked, col("doc"), fmtDouble(col("score")), out)
    }
  }

  /** `TFIDFRank <in> <out> [numDocs]` → `word@file \t tfidf`, descending. */
  object TFIDFRankMain {
    def main(args: Array[String]): Unit = {
      val Array(in, out) = args.take(2)
      val spark = session()
      writeKV(
        Rank.rankAll(TfIdf.tfidf(corpus(spark, in), numDocsArg(args, 2))),
        concat(col("term"), lit("@"), col("doc")), fmtDouble(col("tfidf")), out)
    }
  }
}
