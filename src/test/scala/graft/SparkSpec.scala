package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all suites (one JVM-wide session). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // catalog tables (bucketed-sink tests) land in a temp dir, not ./
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark

  /** Every test body runs under a [[Caching.scoped]] block — the same
    * contract Bench/Verify run queries under: multi-persist operators
    * assert an open scope ([[Caching.requireScope]]), and each test
    * releases its operator-internal persists on exit instead of
    * accumulating them across the suite. Tests pinning the NO-scope
    * behavior itself opt out via [[Caching.unscoped]]. */
  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome =
    Caching.scoped { super.withFixture(test) }

  /** Corpus DF from (doc, line) pairs. */
  def corpus(rows: (String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc", "line")
  }

  /** Collect to a sorted list of (stringified) rows for multiset compare
    * (reference order is nondeterministic — SURVEY.md quirk Q5). */
  def rowsOf(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => String.valueOf(r.get(i)))).sortBy(_.mkString("\u0000"))
}
