package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the executed plan of any declared query —
  * `sbt "Test/runMain graft.PlanDumpMain q69_search_bm25 …"`. The
  * ad-hoc companion to PlanAuditSpec's mechanical checks. */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    args.foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
