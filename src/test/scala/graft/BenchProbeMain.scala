package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/**
 * Measurement probe for the optimization rounds (guide §1): for each named
 * query, runs the Bench protocol (1 warm-up + 3 timed noop-sink runs) and
 * reports, per timed run, the wall seconds plus the job count, stage count
 * and summed executor task time — separating driver-side cost (planning,
 * collects between jobs) from executor compute. Also writes the
 * `explain("formatted")` output to plans/<tag>/<query>_<suffix>.txt when
 * the first two args are `--plans <tag>/<suffix>`.
 *
 * Usage:
 *   sbt "Test/runMain graft.BenchProbeMain q147b_weighted_estimate_quality ..."
 *   sbt "Test/runMain graft.BenchProbeMain --plans r13/before q147b_... ..."
 */
object BenchProbeMain {
  def main(args: Array[String]): Unit = {
    val (planTag, names) =
      if (args.length >= 2 && args(0) == "--plans") (Some(args(1)), args.drop(2))
      else (None, args)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_AQE_CACHE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger()
    val stages = new AtomicInteger()
    val taskNanos = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskNanos.addAndGet(s.stageInfo.taskMetrics.executorRunTime * 1000000L)
      }
    })

    def once(name: String): (Double, Int, Int, Double) = {
      jobs.set(0); stages.set(0); taskNanos.set(0)
      val t0 = System.nanoTime()
      Caching.scoped {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // listener events are posted asynchronously; give the bus a beat
      Thread.sleep(150)
      (wall, jobs.get(), stages.get(), taskNanos.get() / 1e9)
    }

    names.foreach { name =>
      planTag.foreach { tag =>
        val Array(dir, sfx) = tag.split("/", 2)
        val out = new java.io.File(s"plans/$dir")
        out.mkdirs()
        val txt = Caching.scoped {
          SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        }
        spark.catalog.clearCache()
        val w = new java.io.PrintWriter(s"plans/$dir/${name}_$sfx.txt")
        try w.write(txt) finally w.close()
      }
      val warm = once(name)
      val timed = Seq.fill(3)(once(name))
      val med = timed.sortBy(_._1).apply(1)
      println(f"PROBE $name%-40s warm=${warm._1}%6.2f s | " +
        f"median=${med._1}%6.2f s jobs=${med._2}%3d stages=${med._3}%4d " +
        f"taskSec=${med._4}%7.2f | runs=${timed.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
