package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Fixture-contract guard: the driver regenerates /root/testdata between
 * rounds, and a silent schema or UNIT change there corrupts oracle
 * comparisons without any code being wrong (round 4 lost 12 queries to
 * events.ts silently switching TIMESTAMP(NANOS) → TIMESTAMP(MICROS)).
 * This spec pins, for every SF dir present, the columns each table must
 * carry and the decoded sanity ranges the loaders rely on — so the next
 * regeneration fails HERE, loudly, instead of in 12 oracle rows.
 */
class FixtureSpec extends SparkSpec {

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => Files.exists(Paths.get(d)))

  private def tbl(dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  test("at least one SF fixture dir is present") {
    sfDirs should not be empty
  }

  test("documents: required columns with stable types") {
    sfDirs.foreach { dir =>
      val sch = tbl(dir, "documents").schema
      withClue(s"$dir documents schema: $sch\n") {
        sch("doc_id").dataType shouldBe LongType
        sch("text").dataType shouldBe StringType
        sch("lang").dataType shouldBe StringType
        sch("source").dataType shouldBe StringType
      }
    }
  }

  test("embeddings: float array of consistent dimension, distinct vec ids") {
    sfDirs.foreach { dir =>
      val e = tbl(dir, "embeddings")
      withClue(s"$dir embeddings schema: ${e.schema}\n") {
        e.schema("vec_id").dataType shouldBe LongType
        e.schema("embedding").dataType match {
          case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => succeed
          case other => fail(s"embedding must be array<float|double>, got $other")
        }
      }
      val dims = e.select(
          org.apache.spark.sql.functions.size(col("embedding")).as("d")).distinct()
        .collect().map(_.getInt(0))
      withClue(s"$dir embedding dims: ${dims.mkString(",")}\n") {
        dims.length shouldBe 1
        dims.head should be > 0
      }
    }
  }

  test("events: ts decodes to a sane timestamp range whatever the physical unit") {
    // THE round-4 regression, pinned: whichever TIMESTAMP unit the
    // fixture carries, the loader contract is that decoded timestamps
    // land in the fixture's actual epoch (2024-ish) — a unit mismatch
    // shifts them 1000× (to 1970 or to year 56k) and must fail here.
    sfDirs.foreach { dir =>
      val e = SparkEntry.eventsForTest(spark, dir)
      withClue(s"$dir events schema: ${e.schema}\n") {
        e.schema("ts").dataType shouldBe TimestampType
        e.schema("event_id").dataType shouldBe LongType
        e.schema("user_id").dataType shouldBe LongType
        e.schema("event_type").dataType shouldBe StringType
        e.schema("value").dataType shouldBe DoubleType
      }
      val r = e.agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
        .head()
      withClue(s"$dir events ts year range [${r.getInt(0)}, ${r.getInt(1)}]\n") {
        r.getInt(0) should be >= 2000
        r.getInt(1) should be <= 2100
      }
    }
  }
}
