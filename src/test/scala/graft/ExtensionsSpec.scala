package graft

import org.apache.spark.sql.graft.GraftExtensions

class ExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    r shouldBe 32.0 +- 1e-12
  }

  test("graft_word_shingles generates distinct n-grams in SQL") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT s.shingle
        |FROM (SELECT array('a','b','c','b','c') AS toks)
        |LATERAL VIEW graft_word_shingles(toks, 2) s AS shingle""".stripMargin)
      .collect().map(_.getString(0)).sorted
    got shouldBe Array("a b", "b c", "c b")
  }

  test("graft_dot truncates to the shorter array (scale guard, not error)") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d, 5.0d)) AS d")
      .head().getDouble(0)
    r shouldBe 11.0 +- 1e-12
  }

  test("graft_min_sum computes the weighted intersection, truncating like graft_dot") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_min_sum(array(3L, 1L, 5L), array(2L, 2L, 0L, 9L)) AS s")
      .head().getLong(0)
    r shouldBe 3L // min(3,2) + min(1,2) + min(5,0)
  }

  test("graft_gram_moments aggregates exact co-moments from SQL") {
    GraftExtensions.register(spark)
    // vectors (1,2) and (3,4) micro-quantized upstream by the caller;
    // pair (0,1): n=2, sx=4, sy=6, sxy=1·2+3·4=14, com=2·14−24=4
    val got = spark.sql(
      """SELECT r.i, r.j, r.n_vecs, r._com
        |FROM (SELECT graft_gram_moments(xq) AS g
        |      FROM VALUES (array(1L, 2L)), (array(3L, 4L)) t(xq))
        |LATERAL VIEW explode(g) e AS r
        |ORDER BY r.i, r.j""".stripMargin).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDecimal(3).longValueExact()))
    got shouldBe Array(
      (0L, 0L, 2L, 2L * 10L - 4L * 4L),   // sxx=1+9=10
      (0L, 1L, 2L, 2L * 14L - 4L * 6L),
      (1L, 1L, 2L, 2L * 20L - 6L * 6L))   // syy=4+16=20
  }
}
