package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Isolated q117 profile (round-7 adjudication): split the term-PageRank
// wall-clock into its two phases — the one-time edge build (pair scan +
// symmetrize + degree join) vs the 10-round rank loop — so optimization
// effort lands on the phase that actually costs. Each phase is timed by
// materializing exactly its own output (edge build: the persisted
// (src, dst, deg) frame; loop: the final rank frame reading the warm
// edge cache), median of 3 after one warm-up, fresh caches per run.
object GraphProfileMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("doc"), col("text").as("line"))

    import graft.functions.TextAnalysis
    def buildEdges() = {
      val pc = TextAnalysis.cooccurrencePairs(docs, 2)
        .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= 2 && col("t1") =!= col("t2"))
        .select(col("t1"), col("t2"))
      val edges = pc.select(col("t1").as("src"), col("t2").as("dst"))
        .union(pc.select(col("t2").as("src"), col("t1").as("dst")))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      edges.join(deg, Seq("src")).repartition(col("src"))
    }

    def med3(label: String)(body: => Unit): Unit = {
      body // warm-up
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label: ${ts(1)}%.2f s (min ${ts.head}%.2f, max ${ts.last}%.2f)")
    }

    med3("EDGE_BUILD") {
      Caching.scoped {
        Caching.persist(buildEdges()).write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }

    // loop-only: edges warm OUTSIDE the timed region
    val warmEdges = buildEdges().persist()
    println(s"EDGES: ${warmEdges.count()} rows")
    med3("RANK_LOOP_10") {
      Caching.scoped {
        val deg0 = warmEdges.select(col("src"), col("deg")).distinct()
        var ranks = Caching.persist(
          deg0.select(col("src").as("term"), lit(1000000L).as("r")))
        for (_ <- 1 to 10) {
          val next = warmEdges
            .join(ranks, warmEdges("src") === ranks("term"))
            .select(col("dst"), expr("r div deg").as("c"))
            .groupBy(col("dst"))
            .agg(sum(col("c")).as("s"))
            .select(col("dst").as("term"),
              expr("150000L + (85 * s) div 100").as("r"))
          ranks = Caching.persist(next)
        }
        ranks.write.format("noop").mode("overwrite").save()
      }
    }

    med3("FULL_Q117") {
      Caching.scoped {
        graft.operators.Graph.termPageRank(docs)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
