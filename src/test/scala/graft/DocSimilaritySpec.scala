package graft

import graft.operators.DocSimilarity

class DocSimilaritySpec extends SparkSpec {

  // 5 docs; "zebra" is rare (2/5 docs), "the" is in every doc and must be
  // pruned at maxDfFraction = 0.5
  private def fixture = corpus(
    "a" -> "the zebra runs",
    "b" -> "the zebra sleeps",
    "c" -> "the cat sleeps",
    "d" -> "the dog barks",
    "e" -> "the bird sings")

  test("relatedDocs pairs only docs sharing sub-threshold-df terms") {
    val pairs = DocSimilarity.relatedDocs(fixture, maxDfFraction = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // "the" (df=5) pruned; rare terms: zebra(2), runs(1), sleeps(2), cat(1)...
    pairs.keySet shouldBe Set(("a", "b"), ("b", "c")) // zebra, sleeps
    pairs.values.foreach { c => c should be > 0.0; c should be <= 1.0 }
  }

  test("relatedDocs cosine is 1 for identical pruned vectors") {
    val twins = corpus(
      "x" -> "unique words here",
      "y" -> "unique words here",
      "z" -> "completely different text")
    val pairs = DocSimilarity.relatedDocs(twins, maxDfFraction = 1.0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    pairs(("x", "y")) shouldBe 1.0 +- 1e-6
    pairs.keySet should not contain (("x", "z"))
  }

  test("relatedDocs threshold filters") {
    DocSimilarity.relatedDocs(fixture, maxDfFraction = 0.5, threshold = 1.1)
      .count() shouldBe 0L
  }
}
