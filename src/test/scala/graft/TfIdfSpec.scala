package graft

import org.apache.spark.sql.functions._

import graft.operators.{Rank, Search, TfIdf}

/** Core pipeline semantics against the FIXTURES.md worked example and the
  * quirk ledger (SURVEY.md §2.4). */
class TfIdfSpec extends SparkSpec {

  private val eps = 1e-9

  // FIXTURES.md §2 micro-corpus.
  private def mini = corpus("d1.txt" -> "Hello world hello", "d2.txt" -> "world of spark")

  test("Q1 quirk: tokenizer keeps punctuation runs and case, drops empties") {
    val toks = TfIdf.tokenize(corpus("d" -> "e.g. test"))
      .select("term").collect().map(_.getString(0)).toSeq
    toks shouldBe Seq("e", ".", "g", ".", "test")
  }

  test("tokenizer is case-sensitive (Hello != hello)") {
    val toks = TfIdf.tokenize(mini).where(col("doc") === "d1.txt")
      .select("term").collect().map(_.getString(0)).toSeq.sorted
    toks shouldBe Seq("Hello", "hello", "world")
  }

  test("terms containing delimiter chars survive (SURVEY.md §2.3)") {
    // '@' is a token of its own under \b-splitting; it must round-trip.
    val toks = TfIdf.tokenize(corpus("d" -> "user@host x"))
      .select("term").collect().map(_.getString(0)).toSeq
    toks shouldBe Seq("user", "@", "host", "x")
  }

  test("docWordCount matches FIXTURES expected counts") {
    val got = rowsOf(TfIdf.docWordCount(TfIdf.tokenize(mini)))
    got shouldBe Seq(
      Seq("Hello", "d1.txt", "1"),
      Seq("hello", "d1.txt", "1"),
      Seq("of", "d2.txt", "1"),
      Seq("spark", "d2.txt", "1"),
      Seq("world", "d1.txt", "1"),
      Seq("world", "d2.txt", "1")
    ).sortBy(_.mkString(" "))
  }

  test("Q2 quirk: tf = 1 + log10(count)") {
    val tf = TfIdf.termFrequency(TfIdf.docWordCount(TfIdf.tokenize(
      corpus("d" -> "a a a b"))))
      .select("term", "tf").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    tf("a") shouldBe (1.0 + math.log10(3.0)) +- eps
    tf("b") shouldBe 1.0 +- eps
  }

  test("tfidf matches FIXTURES worked example (window df + floor idf)") {
    val got = TfIdf.tfidf(mini)
      .select("term", "doc", "tfidf")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val log2 = math.log10(2.0) // df=2 → idf = log10(1 + 2/2)
    val log3 = math.log10(3.0) // df=1 → idf = log10(1 + 2/1)
    got(("Hello", "d1.txt")) shouldBe log3 +- eps
    got(("hello", "d1.txt")) shouldBe log3 +- eps
    got(("world", "d1.txt")) shouldBe log2 +- eps
    got(("world", "d2.txt")) shouldBe log2 +- eps
    got(("of", "d2.txt")) shouldBe log3 +- eps
    got(("spark", "d2.txt")) shouldBe log3 +- eps
  }

  test("salted df strategy equals the broadcast and window strategies") {
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.select("term", "doc", "df", "tfidf")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          BigDecimal(r.getDouble(3)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
        .toSet
    val ref = scores(TfIdf.tfidf(mini))
    scores(TfIdf.tfidf(mini, dfSalt = Some(4))) shouldBe ref
    scores(TfIdf.tfidf(mini, dfViaBroadcast = false)) shouldBe ref
  }

  test("Q3 quirk: idf uses floor division (N=5, df=2 -> log10(3))") {
    // 5 docs; 'x' appears in exactly 2.
    val five = corpus(
      "a" -> "x q", "b" -> "x r", "c" -> "s", "d" -> "t", "e" -> "u")
    val idf = TfIdf.tfidf(five, numDocs = Some(5))
      .where(col("term") === "x").select("tfidf").head().getDouble(0)
    idf shouldBe math.log10(3.0) +- eps // NOT log10(1 + 2.5)
  }

  test("Q4 quirk: numDocs is caller-suppliable and may disagree with corpus") {
    val one = corpus("a" -> "x")
    val idf = TfIdf.tfidf(one, numDocs = Some(10))
      .select("tfidf").head().getDouble(0)
    idf shouldBe math.log10(11.0) +- eps
  }

  test("search matches FIXTURES: query 'world hello'") {
    val got = Search.search(mini, "world hello")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got("d1.txt") shouldBe (math.log10(3.0) + math.log10(2.0)) +- eps // 0.7781513
    got("d2.txt") shouldBe math.log10(2.0) +- eps                     // 0.3010300
  }

  test("Q7 quirk: duplicate query terms double-count in parity mode only") {
    val dup = Search.search(mini, "hello hello", parityDuplicates = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    dup("d1.txt") shouldBe (2 * math.log10(3.0)) +- eps // 0.9542425
    val dedup = Search.search(mini, "hello hello")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    dedup("d1.txt") shouldBe math.log10(3.0) +- eps
  }

  test("rank returns hits sorted desc with deterministic tie-break") {
    val ranked = Rank.rank(Search.search(mini, "world hello"))
      .collect().map(_.getString(0)).toSeq
    ranked shouldBe Seq("d1.txt", "d2.txt")
  }

  test("rankAll orders every (term, doc) score desc") {
    val all = Rank.rankAll(TfIdf.tfidf(mini)).collect()
    val scores = all.map(_.getDouble(2)).toSeq
    scores shouldBe scores.sorted.reverse
    all.length shouldBe 6
  }

  test("rank with k uses limit (top-k)") {
    Rank.rank(Search.search(mini, "world hello"), k = Some(1))
      .collect().map(_.getString(0)).toSeq shouldBe Seq("d1.txt")
  }

  test("search on absent terms returns no rows") {
    Search.search(mini, "zzz").count() shouldBe 0L
  }

  test("searchAll keeps only docs containing every query term") {
    // mini: d1 has hello+world, d2 has hello only (see fixture)
    val all = Search.searchAll(mini, "hello world")
      .collect().map(_.getString(0)).toSet
    val any = Search.search(mini, "hello world")
      .collect().map(_.getString(0)).toSet
    all.subsetOf(any) shouldBe true
    all.foreach { d => any should contain(d) }
    Search.searchAll(mini, "hello zzz").count() shouldBe 0L
  }

  test("searchPhrase matches consecutive in-order terms with counts") {
    val c = corpus(
      "p1" -> "big table hash join and table hash again",
      "p2" -> "hash table is reversed here",
      "p3" -> "table only")
    val got = Search.searchPhrase(c, "table hash")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("p1" -> 2L) // reversed/partial matches excluded
    Search.searchPhrase(c, "table").collect()
      .map(_.getString(0)).toSet shouldBe Set("p1", "p2", "p3")
  }

  test("searchNear matches only within the window, counting positions") {
    val c = corpus(
      "near" -> "a x b",
      "far" -> ("a " + "x " * 8 + "b").trim, // 8 fillers: span 10 > window
      "multi" -> "a b a b")
    Search.searchNear(c, "a b", window = 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("near" -> 1L, "multi" -> 1L) // multi: one 8-window fits all 4 tokens
    Search.searchNear(c, "a b", window = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("multi" -> 3L) // [a,b] [b,a] [a,b] all contain both, unordered
    an[IllegalArgumentException] should be thrownBy
      Search.searchNear(c, "a b c", window = 2)
  }

  test("bm25Scores matches the hand formula (tf saturation + length norm)") {
    // d1: dl=4, d2: dl=3 -> N=2, avgdl=3.5; df(a)=2, all others 1.
    val c = corpus("d1" -> "a b c a", "d2" -> "a x y")
    def bm25(tf: Long, df: Long, dl: Long): Double = {
      val idf = math.log(1 + (2.0 - df + 0.5) / (df + 0.5))
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.5))
    }
    val got = Search.bm25Scores(c).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    got.size shouldBe 6
    got(("a", "d1")) shouldBe bm25(2, 2, 4) +- eps
    got(("a", "d2")) shouldBe bm25(1, 2, 3) +- eps
    got(("b", "d1")) shouldBe bm25(1, 1, 4) +- eps
    got(("x", "d2")) shouldBe bm25(1, 1, 3) +- eps
    // Saturation: doubling tf less than doubles the score.
    got(("a", "d1")) should be < 2 * got(("a", "d2"))
  }

  test("searchBm25 sums matched-term scores per doc") {
    val c = corpus("d1" -> "a b c a", "d2" -> "a x y")
    val perTerm = Search.bm25Scores(c).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val got = Search.searchBm25(c, "a b").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    got("d1") shouldBe (perTerm(("a", "d1")) + perTerm(("b", "d1"))) +- eps
    got("d2") shouldBe perTerm(("a", "d2")) +- eps
  }

  test("rrfFuse sums integer-quantized reciprocal ranks across arms") {
    val s = spark
    import s.implicits._
    // arm 1 ranks: d1=1, d2=2, d3=3; arm 2 ranks: d2=1, d4=2
    val arm1 = Seq(("d1", 9.0), ("d2", 5.0), ("d3", 1.0)).toDF("doc", "score")
    val arm2 = Seq(("d2", 0.9), ("d4", 0.8)).toDF("doc", "score")
    val got = Search.rrfFuse(Seq(arm1, arm2), topN = 100, kRrf = 60)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def c(rank: Int): Long = 1000000000L / (60L + rank)
    got("d1") shouldBe ((c(1), 1L))
    got("d2") shouldBe ((c(2) + c(1), 2L)) // both arms retrieve d2
    got("d3") shouldBe ((c(3), 1L))
    got("d4") shouldBe ((c(2), 1L))
  }

  test("rrfFuse topN truncates each arm before ranking") {
    val s = spark
    import s.implicits._
    val arm = Seq(("d1", 3.0), ("d2", 2.0), ("d3", 1.0)).toDF("doc", "score")
    val got = Search.rrfFuse(Seq(arm), topN = 2, kRrf = 60)
      .collect().map(r => r.getString(0)).toSet
    got shouldBe Set("d1", "d2") // d3 falls outside the arm's top-2
  }

  test("rrfFuse rank ties break on doc id identically to the oracle rule") {
    val s = spark
    import s.implicits._
    val arm = Seq(("dB", 1.0), ("dA", 1.0)).toDF("doc", "score")
    val got = Search.rrfFuse(Seq(arm), topN = 100, kRrf = 60)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got("dA") shouldBe 1000000000L / 61L // rank 1: tie broken by doc asc
    got("dB") shouldBe 1000000000L / 62L
  }

  test("index round trip: searchIndexed equals search on the same query") {
    val idx = java.nio.file.Files.createTempDirectory("graft-index")
      .resolve("idx").toString
    Search.buildIndex(mini, idx, fileCount = 2)
    val direct = Search.search(mini, "world hello").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val indexed = Search.searchIndexed(spark, idx, "world hello").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    indexed.keySet shouldBe direct.keySet
    indexed.foreach { case (d, s) => s shouldBe direct(d) +- eps }
  }

  test("keywords returns each doc's top-k tfidf terms, parity with tfidf()") {
    import org.apache.spark.sql.functions.{col => C, round => rnd}
    val c = corpus(
      "d1" -> "apple apple banana cherry cherry cherry date",
      "d2" -> "banana banana elder fig grape apple",
      "d3" -> "grape grape grape kiwi lime")
    val got = TfIdf.keywords(c, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(3)) -> r.getString(1)).toMap
    // expected: per-doc top-2 of the tfidf frame under (round(tfidf,6) desc, term)
    val expected = TfIdf.tfidf(c)
      .select(C("doc"), C("term"), rnd(C("tfidf"), 6).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1)
      .toSeq
      .flatMap { case (doc, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(2).zipWithIndex
          .map { case (r, i) => (doc, i + 1L) -> r._2 }
      }
      .toMap
    got shouldBe expected
    got.keys.map(_._2).foreach(r => r should be <= 2L)
  }

  test("searchBm25Expanded recruits vocabulary-mismatch docs via PMI at exact half weight") {
    val cor = corpus(
      "1" -> "alpha beta alpha beta alpha beta", // builds the alpha↔beta association
      "2" -> "alpha beta alpha beta",
      "3" -> "beta delta epsilon beta zeta", // says beta, never alpha
      "4" -> "unrelated words only here")
    // plain BM25 can't see doc 3
    Search.searchBm25(cor, "alpha").collect()
      .map(_.getString(0)).toSet should not contain "3"
    val exp = Search.searchBm25Expanded(cor, "alpha", m = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exp.keySet shouldBe Set("1", "2", "3") // doc 4 still untouched
    // doc 3's entire score is beta's bm25 at weight 0.5, integer-exactly
    val s3 = Search.bm25Scores(cor)
      .where(col("term") === "beta" && col("doc") === "3")
      .select(round(col("score"), 6)).head.getDouble(0)
    exp("3") shouldBe math.round(s3 * 1e6) * 500000L
    an[IllegalArgumentException] should be thrownBy
      Search.searchBm25Expanded(cor, "alpha", m = 0)
  }

  test("searchFuzzy: deletion/insertion/substitution hit, transposition doesn't") {
    val c = corpus(
      "d1" -> "spark stream window table",
      "d2" -> "spark spark join",
      "d3" -> "ab only here")
    // 'sparkk' (del), 'streem' (subst), 'windo' (ins) each map to one
    // vocab term, so fuzzy equals the exact search on corrected terms
    val fuzzy = Search.searchFuzzy(c, "sparkk streem windo")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2)))).toMap
    val exact = Search.searchTokens(
        graft.operators.TfIdf.tfidf(c), Seq("spark", "stream", "window"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    fuzzy.view.mapValues(_._1).toMap shouldBe exact
    fuzzy("d1")._2 shouldBe 3L // all three query terms matched d1
    fuzzy("d2")._2 shouldBe 1L
    // 'ba' is edit distance 2 from 'ab' (transposition): the shared
    // deletion neighborhood {a, b} must NOT produce a match
    Search.searchFuzzy(c, "ba").count() shouldBe 0L
    // exact-term queries still match themselves (term ∈ its own dels)
    Search.searchFuzzy(c, "spark").collect()
      .map(_.getString(0)).toSet shouldBe Set("d1", "d2")
    an[IllegalArgumentException] should be thrownBy
      Search.searchFuzzyTokens(graft.operators.TfIdf.tfidf(c), Seq.empty)
  }

  test("searchSnippets: earliest hit across terms, window clamps at edges") {
    val c = corpus(
      "s1" -> "a b c spark d e f g",      // hit at 4, full ±3 window
      "s2" -> "window x y",               // hit at 1: left-clamped
      "s3" -> "u v stream",               // hit at 3, right-clamped
      "s4" -> "stream later spark here",  // stream (1) beats spark (3)
      "s5" -> "nothing relevant")
    val got = Search.searchSnippets(c, "spark stream window", window = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    got.keySet shouldBe Set("s1", "s2", "s3", "s4")
    got("s1") shouldBe ((4L, "a b c spark d e f"))
    got("s2") shouldBe ((1L, "window x y"))
    got("s3") shouldBe ((3L, "u v stream"))
    got("s4") shouldBe ((1L, "stream later spark here"))
    // single-token query exercises the no-least path
    Search.searchSnippets(c, "spark", window = 1)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap shouldBe
      Map("s1" -> "c spark d", "s4" -> "later spark here")
    an[IllegalArgumentException] should be thrownBy
      Search.searchSnippets(c, "spark", window = -1)
  }
}
