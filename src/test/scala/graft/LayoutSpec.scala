package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  /** Bit-twiddling reference Morton encoder the Column expression must
    * reproduce. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zInterleave matches the reference encoder across the 8-bit grid") {
    val s = spark
    import s.implicits._
    // strided sample + all four corners of the 256x256 grid
    val pairs = (for {
      x <- 0L until 256L by 17
      y <- 0L until 256L by 13
    } yield (x, y)) ++ Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zInterleave(col("x"), col("y"), 8).as("z"))
      .collect()
    got.length shouldBe pairs.length
    got.foreach { r =>
      r.getLong(2) shouldBe mortonRef(r.getLong(0), r.getLong(1), 8)
    }
    // corner sanity: the full grid maps onto the full 16-bit zval range
    mortonRef(255L, 255L, 8) shouldBe 65535L
  }

  test("minMaxBucket stays in range and a degenerate dimension buckets to 0") {
    val s = spark
    import s.implicits._
    val df = Seq(5L, 17L, 999L, 1000L).toDF("v")
      .crossJoin(Seq((5L, 1000L)).toDF("mn", "mx"))
      .select(Layout.minMaxBucket(col("v"), col("mn"), col("mx"), 8).as("b"))
    val bs = df.collect().map(_.getLong(0))
    all(bs) should (be >= 0L and be < 256L)
    bs.head shouldBe 0L // v = mn
    val degenerate = Seq(7L).toDF("v")
      .select(Layout.minMaxBucket(col("v"), lit(7L), lit(7L), 8).as("b"))
      .collect().head.getLong(0)
    degenerate shouldBe 0L
  }

  test("z-order layout scans fewer cells AND rows than linear for the box query") {
    val out = SparkEntry.queries("q83b_zorder_skipping")(
      spark, "/root/testdata/sf0.001").collect()
    val m = out.map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    withClue(s"stats: $m\n") {
      // both layouts populated and the box non-trivial on each
      m("zorder")._2 should be > 0L
      m("linear")._2 should be > 0L
      // the skipping contract: clustering on (x, y) must beat the
      // insert-ordered layout on both pruning axes
      m("zorder")._2 should be < m("linear")._2
      m("zorder")._3 should be < m("linear")._3
    }
  }

  test("zorderWrite lays out one directory per cell, round-trips rows") {
    // events.parquet carries TIMESTAMP(NANOS) (see SparkEntry.events):
    // read ts as physical int64 nanos and truncate to seconds
    val nanosSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType)))
    val e = spark.read.schema(nanosSchema)
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id").as("x"),
        expr("ts div 1000000000").as("y"))
    val path = java.nio.file.Files
      .createTempDirectory("graft-zorder").toString
    Layout.zorderWrite(e, path, "x", "y")
    val back = spark.read.parquet(path)
    back.count() shouldBe e.count()
    val cells = Layout.withZCells(e, "x", "y")
      .select("cell").distinct().count()
    val dirs = new java.io.File(path).listFiles()
      .count(f => f.getName.startsWith("cell="))
    dirs.toLong shouldBe cells
    // a cell-range predicate prunes the partitioned scan statically
    val plan = back.where(col("cell") < 8)
      .queryExecution.executedPlan.toString
    withClue(s"plan:\n$plan\n") {
      assert(plan.contains("PartitionFilters: [") &&
        !plan.contains("PartitionFilters: []"),
        "cell predicate did not reach the partition filters")
    }
  }

  test("compactionPlan: next-fit-decreasing bins per partition, ties by id") {
    val s = spark
    import s.implicits._
    val files = Seq(
      // partition A, sizes 5,4,3,2,1, target 6:
      // cum_before 0,5,9,12,14 -> bins 0,0,1,2,2
      ("A", 1L, 5L), ("A", 2L, 4L), ("A", 3L, 3L), ("A", 4L, 2L), ("A", 5L, 1L),
      // partition B: equal sizes tie-break by file id; bins restart
      ("B", 7L, 3L), ("B", 6L, 3L), ("B", 8L, 3L))
      .toDF("part", "file_id", "bytes")
    val got = Layout.compactionPlan(files, Seq("part"), "file_id", "bytes",
        targetBytes = 6L)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(3))).toMap
    got shouldBe Map(
      ("A", 1L) -> 0L, ("A", 2L) -> 0L, ("A", 3L) -> 1L,
      ("A", 4L) -> 2L, ("A", 5L) -> 2L,
      // B: cum_before 0,3,6 over ids 6,7,8 -> bins 0,0,1
      ("B", 6L) -> 0L, ("B", 7L) -> 0L, ("B", 8L) -> 1L)
  }
}
