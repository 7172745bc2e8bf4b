package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.multimodal.Multimodal
import graft.operators.{Clustering, Dedup, Events, HotKeys, Layout, Rank, Search, Similarity, TfIdf}
import graft.entry.EntryShared._

/** Per-domain slice of the driver-contract query/oracle maps:
  * graph operators over the term co-occurrence graph - PageRank, triangles, degrees, k-core. Entry text and oracle SQL are byte-identical to the
  * pre-split SparkEntry (the round-10 module split). */
private[graft] object QueriesGraph {
  val queries: scala.collection.immutable.ListMap[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(

    // k-core of the co-occurrence graph: fixed-8-round peel (exact for
    // any fixture with peel depth <= 8), radar-tiered like q117.
    "q212_kcore" -> ((s, dir) =>
      graft.operators.Graph.kCore(docs(s, dir), k = 2)
        .orderBy(col("term"))),


    // PageRank over the q39 term co-occurrence graph — integer-exact
    // damped recurrence (micro-unit ranks, floor division only), 10
    // fixed rounds; oracle unrolls the identical recurrence as CTEs.
    "q117_term_pagerank" -> ((s, dir) =>
      graft.operators.Graph
        .termPageRank(docs(s, dir), window = 2, minCount = 2, iters = 10)
        .orderBy(col("rank_micro").desc, col("term"))),


    // TRIANGLE participation per term over the q117 co-occurrence
    // graph, via degree-ordered orientation (Suri–Vassilvitskii) —
    // wedge fan-out capped at O(√E) per node, so the stopword hub
    // can't become the last reducer; integer counts, no rounding
    // contract at all. The oracle counts the same triangles from the
    // lexicographic canonical form — orientation provably can't
    // change which triangles exist.
    "q127_term_triangles" -> ((s, dir) =>
      graft.operators.Graph
        .triangleCounts(docs(s, dir), window = 2, minCount = 2)
        .orderBy(col("term"))),


    // Degree histogram of the co-occurrence graph: the Zipf-tail /
    // hub-mass check that sizes any wedge fan-out — pure integers.
    "q190_degree_distribution" -> ((s, dir) =>
      graft.operators.Graph
        .degreeDistribution(docs(s, dir), window = 2, minCount = 2)
        .orderBy(col("deg"))),


    // Local clustering coefficient: q127's triangles over the wedge
    // count per node — clique terms vs context-bridging hubs.
    "q191_clustering_coeff" -> ((s, dir) =>
      graft.operators.Graph
        .clusteringCoefficients(docs(s, dir), window = 2, minCount = 2)
        .orderBy(col("term")))
  )

  val sql: Map[String, String] = Map(

    // Unrolled 8-round peel over the q117/q39 co-occurrence graph;
    // MATERIALIZED rounds (each references its predecessor 3×, and
    // DuckDB CTEs inline by default — exponential re-open otherwise).
    "q212_kcore" -> kCoreSql(k = 2, window = 2, minCount = 2, rounds = 8),


    // Term PageRank: the unrolled integer recurrence (same params as
    // the engine call: window 2, minCount 2, 10 rounds).
    "q117_term_pagerank" -> termPageRankSql(window = 2, minCount = 2, iters = 10),


    // Triangle counts: the same pc edge relation as q117; triangles
    // enumerated once in lexicographic canonical form (a<b<c chained
    // joins), members unnested to per-term counts.
    "q127_term_triangles" ->
      s"""WITH ${coocGraphCtes(2, 2)},
         |tri AS (
         |  SELECT e1.t1 AS a, e1.t2 AS b, e2.t2 AS c
         |  FROM pc e1 JOIN pc e2 ON e2.t1 = e1.t2
         |  JOIN pc e3 ON e3.t1 = e1.t1 AND e3.t2 = e2.t2),
         |m AS (SELECT unnest([a, b, c]) AS term FROM tri)
         |SELECT term, count(*)::BIGINT AS n_triangles FROM m
         |GROUP BY 1 ORDER BY term""".stripMargin,


    // Degree-histogram mirror: the same pc edge relation, degrees via
    // the two-sided union, one count-per-degree rollup.
    "q190_degree_distribution" ->
      s"""WITH ${coocGraphCtes(2, 2)},
         |deg AS (
         |  SELECT term, count(*)::BIGINT AS deg FROM (
         |    SELECT t1 AS term FROM pc UNION ALL SELECT t2 AS term FROM pc)
         |  GROUP BY 1)
         |SELECT deg, count(*)::BIGINT AS n_terms FROM deg
         |GROUP BY 1 ORDER BY deg""".stripMargin,


    // Clustering-coefficient mirror: q127's triangle relation per
    // term, left-joined to degrees, one round-6 wedge division.
    "q191_clustering_coeff" ->
      s"""WITH ${coocGraphCtes(2, 2)},
         |deg AS (
         |  SELECT term, count(*)::BIGINT AS deg FROM (
         |    SELECT t1 AS term FROM pc UNION ALL SELECT t2 AS term FROM pc)
         |  GROUP BY 1),
         |tri AS (
         |  SELECT e1.t1 AS a, e1.t2 AS b, e2.t2 AS c
         |  FROM pc e1 JOIN pc e2 ON e2.t1 = e1.t2
         |  JOIN pc e3 ON e3.t1 = e1.t1 AND e3.t2 = e2.t2),
         |tc AS (SELECT term, count(*)::BIGINT AS n_triangles
         |       FROM (SELECT unnest([a, b, c]) AS term FROM tri) GROUP BY 1)
         |SELECT d.term, d.deg,
         |       coalesce(tc.n_triangles, 0)::BIGINT AS n_triangles,
         |       CASE WHEN d.deg >= 2 THEN
         |         round(2.0 * coalesce(tc.n_triangles, 0) /
         |               (d.deg * (d.deg - 1)), 6)
         |       END AS coeff
         |FROM deg d LEFT JOIN tc USING (term)
         |ORDER BY term""".stripMargin
  )
}
