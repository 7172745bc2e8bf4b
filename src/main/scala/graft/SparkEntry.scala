package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Rank, Search, TfIdf}

/**
 * Driver contract (see SURVEY.md §7 + builder prompt): one `queries` entry
 * per implemented operator, with DuckDB-equivalent `oracleSql` for the
 * hash-compare correctness gate.
 *
 * Conventions for oracle stability (SURVEY.md §2.2):
 *  - every query ends in a TOTAL order (unique tie-break columns);
 *  - every derived double is ROUND(x, 6);
 *  - rank orders use the ROUNDED score so cross-engine fp noise in
 *    float-sum order can't flip row order;
 *  - column names and types match the oracle exactly (counts/row_number
 *    cast to BIGINT like DuckDB's).
 *
 * Tokenizer note: the Spark side runs the reference tokenizer regex
 * `\s*\b\s*` (DocWordCount.java:49, Java regex semantics). DuckDB's RE2
 * treats zero-width `\b` differently (it would split every character), so
 * the oracle splits on `\s+` — verified identical on this corpus, whose
 * text is strictly `[a-z ]` (checked across all SFs).
 */
object SparkEntry {

  /** documents.parquet normalized to the engine's (doc, line) corpus shape;
    * doc keeps its bigint type (operators are doc-type agnostic). */
  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("doc"), col("text").as("line"))

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fixed search query for q6/q7 (terms present in the synthetic corpus). */
  val SearchQuery = "spark stream window"

  /** Tokenized corpus with oracle column names. */
  private def tokens(spark: SparkSession, dir: String): DataFrame =
    TfIdf.tokenize(docs(spark, dir)).select(col("doc").as("doc_id"), col("term"))

  /** Flagship query on sf0.001 — full search+rank pipeline; rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = docs(spark, "/root/testdata/sf0.001")
    Rank.rank(Search.search(d, SearchQuery))
  }

  // ---------------------------------------------------------------------
  // Shared SQL fragments for the oracle (DuckDB dialect).
  // ---------------------------------------------------------------------
  private val TokCte =
    """tok AS (
      |  SELECT doc_id, term FROM (
      |    SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
      |    FROM documents) WHERE term <> ''
      |)""".stripMargin

  private val TfIdfCtes =
    s"""WITH $TokCte,
       |cnt AS (SELECT term, doc_id, count(*) AS cnt FROM tok GROUP BY 1, 2),
       |n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
       |dft AS (SELECT term, count(*) AS df FROM cnt GROUP BY 1),
       |scores AS (
       |  SELECT c.term, c.doc_id,
       |         round((1 + log10(cnt)) * log10(1 + floor(nd / df)), 6) AS tfidf
       |  FROM cnt c JOIN dft USING (term) CROSS JOIN n
       |)""".stripMargin

  // ---------------------------------------------------------------------
  // Spark-side TF-IDF with oracle column names / rounding.
  // ---------------------------------------------------------------------
  private def tfidfScores(spark: SparkSession, dir: String): DataFrame =
    TfIdf
      .tfidf(docs(spark, dir))
      .select(
        col("term"),
        col("doc").as("doc_id"),
        round(col("tfidf"), 6).as("tfidf")
      )

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1+O2 — scan + tokenize (reference regex; quirk Q1).
    "q1_tokenize" -> ((s, dir) =>
      tokens(s, dir).orderBy(col("doc_id"), col("term"))),

    // O3 — hash aggregation keyed (term, doc).
    "q2_doc_word_count" -> ((s, dir) =>
      tokens(s, dir)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("doc_id"), col("term"))),

    // O4 — tf = 1 + log10(count) (quirk Q2).
    "q3_term_frequency" -> ((s, dir) =>
      tokens(s, dir)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("tf", round(lit(1.0) + log10(col("cnt")), 6))
        .orderBy(col("doc_id"), col("term"))),

    // O6 — document frequency per term.
    "q4_doc_frequency" -> ((s, dir) =>
      tokens(s, dir)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("term"))),

    // O7 — tf·idf with floor-division idf (quirk Q3) and default
    // numDocs = corpus size (quirk Q4).
    "q5_tfidf" -> ((s, dir) =>
      tfidfScores(s, dir).orderBy(col("term"), col("doc_id"))),

    // O8+O9 — query-term broadcast semi-join + per-doc sum.
    "q6_search" -> ((s, dir) =>
      Search
        .searchTokens(
          tfidfScores(s, dir).withColumnRenamed("doc_id", "doc"),
          TfIdf.tokenizeQuery(SearchQuery).distinct)
        .select(col("doc").as("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"))),

    // O10 — global sort desc of search hits (deterministic tie-break).
    "q7_rank" -> ((s, dir) =>
      Search
        .searchTokens(
          tfidfScores(s, dir).withColumnRenamed("doc_id", "doc"),
          TfIdf.tokenizeQuery(SearchQuery).distinct)
        .select(col("doc").as("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))),

    // O11 — global sort desc of ALL (term, doc) scores.
    "q7b_tfidf_rank" -> ((s, dir) =>
      tfidfScores(s, dir)
        .orderBy(col("tfidf").desc, col("term"), col("doc_id"))),

    // Relational sanity: join + agg (revenue per nation).
    "q8_join_agg_revenue" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer")
      val n = tbl(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6)
          .as("revenue"))
        .orderBy(col("n_name"))
    }),

    // Window: top-3 orders per customer by total price.
    "q9_window_top_orders" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Sort/limit: top-20 line items — TakeOrderedAndProject, no full sort.
    "q10_top_k" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20))
  )

  def oracleSql: Map[String, String] = Map(
    "q1_tokenize" ->
      s"""WITH $TokCte
         |SELECT doc_id, term FROM tok ORDER BY doc_id, term""".stripMargin,

    "q2_doc_word_count" ->
      s"""WITH $TokCte
         |SELECT doc_id, term, count(*) AS cnt FROM tok
         |GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,

    "q3_term_frequency" ->
      s"""WITH $TokCte
         |SELECT doc_id, term, count(*) AS cnt,
         |       round(1 + log10(count(*)), 6) AS tf
         |FROM tok GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,

    "q4_doc_frequency" ->
      s"""WITH $TokCte
         |SELECT term, count(DISTINCT doc_id) AS df FROM tok
         |GROUP BY term ORDER BY term""".stripMargin,

    "q5_tfidf" ->
      s"""$TfIdfCtes
         |SELECT term, doc_id, tfidf FROM scores
         |ORDER BY term, doc_id""".stripMargin,

    "q6_search" ->
      s"""$TfIdfCtes
         |SELECT doc_id, round(sum(tfidf), 6) AS score FROM scores
         |WHERE term IN ('spark', 'stream', 'window')
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q7_rank" ->
      s"""$TfIdfCtes
         |SELECT doc_id, round(sum(tfidf), 6) AS score FROM scores
         |WHERE term IN ('spark', 'stream', 'window')
         |GROUP BY doc_id ORDER BY score DESC, doc_id""".stripMargin,

    "q7b_tfidf_rank" ->
      s"""$TfIdfCtes
         |SELECT term, doc_id, tfidf FROM scores
         |ORDER BY tfidf DESC, term, doc_id""".stripMargin,

    "q8_join_agg_revenue" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 6) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q9_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q10_top_k" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin
  )
}
