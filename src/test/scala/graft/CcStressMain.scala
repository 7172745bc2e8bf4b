package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off closure stress for the round-5 connected-components tier
// (BASELINE.md scale-stress table): the adversarial shape the
// large/small-star algorithm exists for — ONE path component of 100k
// nodes (diameter 99,999) plus 100k 2-node components as background.
// Min-label propagation needs diameter+1 rounds (~100k two-shuffle
// iterations — hours); large/small-star must close it in tens of
// rounds. Measures rounds (via a maxIter binary probe) and wall time,
// and verifies every path node landed on label 0.
object CcStressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val n = 100000L
    // path 0-1-2-…-(n-1), plus pairs (n+2i)-(n+2i+1) for i < n/2
    val path = spark.range(n - 1).toDF("u")
      .select(col("u"), (col("u") + 1).as("v"))
    val pairs = spark.range(n / 2).toDF("i")
      .select((lit(n) + col("i") * 2).as("u"), (lit(n) + col("i") * 2 + 1).as("v"))
    val edges = path.unionByName(pairs)
    val nodes = spark.range(2 * n).toDF("doc")

    val t0 = System.nanoTime()
    val labels = Dedup.connectedComponents(edges, nodes, maxIter = 40)
    labels.persist()
    val total = labels.count()
    val tClose = (System.nanoTime() - t0) / 1e9
    val pathOk = labels.where(col("doc") < n && col("lbl") =!= 0L).count()
    val pairOk = labels
      .where(col("doc") >= n && col("lbl") =!= col("doc") - (col("doc") % 2))
      .count()
    println(f"CC_STAR_100K_PATH: $tClose%.1f s, nodes=$total, " +
      s"path_mislabeled=$pathOk, pair_mislabeled=$pairOk " +
      s"(min-label would need ${n} rounds)")

    // How many rounds did it actually need? Probe the runaway bound.
    def converges(iters: Int): Boolean =
      try { Dedup.connectedComponents(edges, nodes, maxIter = iters).count(); true }
      catch { case _: IllegalStateException => false }
    var lo = 1; var hi = 40
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (converges(mid)) hi = mid else lo = mid + 1
    }
    println(s"CC_STAR_ROUNDS: converged at $lo large+small-star rounds " +
      s"for a diameter-${n - 1} path")
    spark.stop()
  }
}
