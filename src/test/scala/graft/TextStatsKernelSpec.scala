package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{col, lit}

import graft.functions.TextAnalysis

/** Parity guard: the native one-pass TextStats kernel must agree with
  * the built-in route (`F.filter(F.split(line, "\\s+"))` + isin counts) on
  * every field, including whitespace-variant and unicode inputs. */
class TextStatsKernelSpec extends SparkSpec {

  private val lines = Seq(
    "the quick brown fox",
    "  leading and trailing  ",
    "tabs\tand\nnewlinesand\fother\rseps",
    "la la la de de el",          // multi-language marker overlaps
    "",                           // empty
    "   ",                        // separators only
    "ünïcødé tökens ünïcødé",     // non-ascii, with a repeat
    "a a a a a"                   // repeated single-char stopword
  )

  test("kernel fields match the built-in split/isin route on every line") {
    val s = spark
    import s.implicits._
    val df = lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("doc", "line")
      .withColumn("_st", TextAnalysis.textStatsCol(col("line")))
    val toks = F.filter(F.split(col("line"), "\\s+"), t => F.length(t) > 0)
    val stop = TextAnalysis.LangMarkers.flatMap(_._2).distinct
    val reference = df.select(
      col("doc"),
      F.size(toks).cast("long").as("r_n_tokens"),
      F.size(F.array_distinct(toks)).cast("long").as("r_n_distinct"),
      F.aggregate(toks, lit(0L), (acc, x) => acc + F.length(x)).as("r_sum_len"),
      F.size(F.filter(toks, x => x.isin(stop.map(lit): _*))).cast("long").as("r_stop"))
    val joined = df.select(col("doc"), col("_st.n_tokens"), col("_st.n_distinct"),
        col("_st.sum_tok_len"), col("_st.stop_hits"))
      .join(reference, "doc").collect()
    joined.foreach { r =>
      withClue(s"line ${r.getAs[Long]("doc")}: ") {
        r.getAs[Long]("n_tokens") shouldBe r.getAs[Long]("r_n_tokens")
        r.getAs[Long]("n_distinct") shouldBe r.getAs[Long]("r_n_distinct")
        r.getAs[Long]("sum_tok_len") shouldBe r.getAs[Long]("r_sum_len")
        r.getAs[Long]("stop_hits") shouldBe r.getAs[Long]("r_stop")
      }
    }
  }

  test("per-language hits match isin filters; SQL registration works") {
    val s = spark
    import s.implicits._
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("doc", "line").createOrReplaceTempView("tsk_lines")
    val toks = F.filter(F.split(col("line"), "\\s+"), t => F.length(t) > 0)
    TextAnalysis.LangMarkers.foreach { case (lang, words) =>
      val viaKernel = spark.sql(
        s"SELECT doc, graft_text_stats(line).hits_$lang AS h FROM tsk_lines")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaBuiltin = spark.table("tsk_lines")
        .select(col("doc"),
          F.size(F.filter(toks, x => x.isin(words.map(lit): _*))).cast("long").as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"lang $lang: ") { viaKernel shouldBe viaBuiltin }
    }
  }
}
