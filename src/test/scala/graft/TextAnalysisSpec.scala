package graft

import graft.functions.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("langId picks the language with most marker hits") {
    val got = TextAnalysis.langId(corpus(
      "e" -> "the cat and the dog in a house",
      "g" -> "der hund und die katze ist ein tier",
      "u" -> "xyzzy plugh quux"))
      .collect().map(r => r.getString(0) -> r.getAs[String]("lang_pred")).toMap
    got("e") shouldBe "en"
    got("g") shouldBe "de"
    got("u") shouldBe "und"
  }

  test("langId tie-break is alphabetical (de before en)") {
    val got = TextAnalysis.langId(corpus("t" -> "the der"))
      .collect().map(r => r.getString(0) -> r.getAs[String]("lang_pred")).toMap
    got("t") shouldBe "de"
  }

  test("qualityScore metrics on a known doc") {
    val row = TextAnalysis.qualityScore(corpus("d" -> "the the cat")).head()
    row.getAs[Long]("n_tokens") shouldBe 3L
    row.getAs[Long]("n_distinct") shouldBe 2L
    row.getAs[Double]("mean_tok_len") shouldBe (9.0 / 3) +- 1e-9
    row.getAs[Double]("stopword_ratio") shouldBe (2.0 / 3) +- 1e-6
    val expected = math.min(3 / 50.0, 1.0) * 0.4 + (2.0 / 3) * 0.4 +
      math.min(0.666667 * 4, 1.0) * 0.2
    row.getAs[Double]("quality_score") shouldBe expected +- 1e-5
  }

  test("qualityScore handles empty text without div-by-zero") {
    val row = TextAnalysis.qualityScore(corpus("d" -> "")).head()
    row.getAs[Long]("n_tokens") shouldBe 0L
    row.getAs[Double]("quality_score") shouldBe 0.0 +- 1e-9
  }

  test("tokenStats: whitespace vs BPE-ish subword counts") {
    val row = TextAnalysis.tokenStats(corpus("d" -> "hello worlds a1234")).head()
    row.getAs[Long]("ws_tokens") shouldBe 3L
    // hello→hell,o worlds→worl,ds a1234→a123,4
    row.getAs[Long]("bpe_ish_tokens") shouldBe 6L
    row.getAs[Long]("n_chars") shouldBe 18L
  }

  test("cooccurrencePmi matches a hand-computed fixture") {
    // "a b a b": window-2 pairs (pos i<j, j-i<=2): ab, aa, ab, bb, ab
    // → ab×3, aa×1, bb×1; N=4, c(a)=c(b)=2, P=5
    val got = TextAnalysis.cooccurrencePmi(corpus("d" -> "a b a b"),
      window = 2, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("pmi"))).toMap
    got(("a", "b"))._1 shouldBe 3L
    got(("a", "b"))._2 shouldBe math.log10((3.0 / 5) / (0.5 * 0.5)) +- 1e-6
    got(("a", "a"))._1 shouldBe 1L
    got(("b", "b"))._1 shouldBe 1L
  }

  test("cooccurrencePmi pair generation is map-only (no positional self-join)") {
    // the round-2 plan equi-joined positions on doc alone — O(L²) per
    // document; the linearized plan generates pairs inside an array
    // transform, so the only joins left are the broadcast count lookups
    val plan = TextAnalysis.cooccurrencePmi(corpus("d" -> "a b c d e"),
      window = 2, minCount = 1).queryExecution.executedPlan.toString
    plan should not include "SortMergeJoin"
    plan should not include "ShuffledHashJoin"
  }

  test("cooccurrencePmi window-1 pairs are exactly adjacent tokens") {
    val got = TextAnalysis.cooccurrencePmi(corpus("d" -> "x y z"),
      window = 1, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("cnt"))
      .toMap
    got.keySet shouldBe Set(("x", "y"), ("y", "z"))
  }

  test("corpusStats: exact counts; approx within HLL tolerance") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("cast(doc_id as string) as doc", "text as line")
    val exact = TextAnalysis.corpusStats(docs).head()
    exact.getAs[Long]("n_docs") shouldBe 500L
    exact.getAs[Long]("total_tokens") should be > exact.getAs[Long]("n_terms")
    val approx = TextAnalysis.corpusStats(docs, exact = false).head()
    approx.getAs[Long]("n_terms").toDouble shouldBe
      exact.getAs[Long]("n_terms").toDouble +- 0.05 * exact.getAs[Long]("n_terms")
    approx.getAs[Long]("total_tokens") shouldBe exact.getAs[Long]("total_tokens")
  }

  test("repetitionScore: unique grams → 0, repeated grams → ratio, short docs → 0") {
    val got = TextAnalysis.repetitionScore(corpus(
      "uniq" -> "a b c d e",       // 3 grams, all distinct
      "loop" -> "x y z x y z x y", // 6 grams, 3 distinct → ratio 0.5
      "tiny" -> "a b"))            // < n tokens → no grams, ratio 0
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_distinct_grams"), r.getAs[Double]("rep_ratio"))).toMap
    got("uniq") shouldBe ((3L, 3L, 0.0))
    got("loop") shouldBe ((6L, 3L, 0.5))
    got("tiny") shouldBe ((0L, 0L, 0.0))
  }

  test("bigramLmScore: add-one smoothed mean log10 prob; short docs emit no row") {
    // corpus: d1 = "a a b", d2 = "b a", t = "z"
    // unigrams a:3 b:2 z:1, V = 3
    // P(a|a) = P(b|a) = (1+1)/(3+3) = 1/3; P(a|b) = (1+1)/(2+3) = 0.4
    val got = TextAnalysis.bigramLmScore(corpus(
      "d1" -> "a a b", "d2" -> "b a", "t" -> "z"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp"))).toMap
    got.keySet shouldBe Set("d1", "d2") // "z" has no bigram
    got("d1")._1 shouldBe 2L
    got("d1")._2 shouldBe math.log10(1.0 / 3) +- 1e-6
    got("d2")._1 shouldBe 1L
    got("d2")._2 shouldBe math.log10(0.4) +- 1e-6
  }

  test("fingerprint canonicalizes whitespace; fp64 folds md5") {
    val rows = TextAnalysis.fingerprint(corpus(
      "a" -> "hello  world", "b" -> " hello world ")).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    rows("a") shouldBe rows("b") // same canonical form
    rows("a")._2 should be >= 0L
  }

  test("winnowFingerprints: a shared k+w-1 token run guarantees a shared fp") {
    val run = "alpha beta gamma delta epsilon zeta" // 6 tokens = k+w-1
    val fps = TextAnalysis.winnowFingerprints(corpus(
        "a" -> s"one two $run xxx yyy",
        "b" -> s"$run completely different tail"), k = 3, w = 4)
      .collect().map(r => r.getString(0) -> r.getString(1))
    val shared = fps.filter(_._1 == "a").map(_._2).toSet
      .intersect(fps.filter(_._1 == "b").map(_._2).toSet)
    shared should not be empty // the winnowing detection guarantee
  }

  test("winnowFingerprints selects far fewer minima than grams (density)") {
    val toks = (1 to 200).map(i => s"t$i").mkString(" ") // 198 grams
    val n = TextAnalysis
      .winnowFingerprints(corpus("d" -> toks), k = 3, w = 4).count()
    n should be < 120L // expected density ~2/(w+1) = 0.4 of grams
    n should be > 20L
  }

  test("winnowPairs pairs shared runs; hot boilerplate fps are guarded out") {
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val boiler = "common footer text here always the same"
    val c = corpus(
      "a" -> s"$run unique tail words",
      "b" -> s"prefix words $run",
      "c" -> "totally unrelated content entirely",
      "x1" -> boiler, "x2" -> boiler, "x3" -> boiler,
      "x4" -> boiler, "x5" -> boiler) // 5 docs > maxDocsPerFp=4: hot
    val pairs = TextAnalysis
      .winnowPairs(c, k = 3, w = 4, minShared = 1, maxDocsPerFp = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    pairs.keySet shouldBe Set(("a", "b")) // boilerplate pairs suppressed
    val hot = TextAnalysis
      .winnowHotFingerprints(c, k = 3, w = 4, maxDocsPerFp = 4)
      .collect().map(_.getLong(1))
    hot should not be empty
    all(hot) shouldBe 5L // each hot fp lives in exactly the 5 x-docs
  }

  test("winnowFingerprints: docs under k tokens emit nothing; k tokens emit one") {
    val got = TextAnalysis
      .winnowFingerprints(corpus("s" -> "a b", "e" -> "a b c"), k = 3, w = 4)
      .collect().map(_.getString(0)).toSeq
    got shouldBe Seq("e")
  }

  test("redact masks email, IP, and digit runs with sequential counts") {
    val row = TextAnalysis.redact(
      corpus("d" -> "mail bob@example.com ip 10.0.0.1 port 8080 x 7"),
      org.apache.spark.sql.functions.col("line")).head()
    row.getAs[String]("redacted") shouldBe
      "mail <EMAIL> ip <IP> port <NUM> x 7"
    row.getAs[Long]("n_email") shouldBe 1L
    row.getAs[Long]("n_ip") shouldBe 1L
    // 8080 only — the IP's octets were masked before the digit-run rule
    row.getAs[Long]("n_num") shouldBe 1L
  }

  test("redact rule order protects IPs from the digit-run rule") {
    val row = TextAnalysis.redact(
      corpus("d" -> "192.168.001.255"),
      org.apache.spark.sql.functions.col("line")).head()
    row.getAs[String]("redacted") shouldBe "<IP>"
    row.getAs[Long]("n_ip") shouldBe 1L
    row.getAs[Long]("n_num") shouldBe 0L
  }

  test("normalizeTextCol lowercases, strips punctuation, collapses whitespace") {
    import org.apache.spark.sql.functions.{col => C, lit}
    val got = corpus("d" -> "ignored")
      .select(TextAnalysis.normalizeTextCol(
        lit("  Hello,   WORLD!!  It's 42%  ")).as("n"))
      .head().getString(0)
    got shouldBe "hello world it s 42"
    // normalization makes case/punct variants exact-dup equal
    val a = corpus("d" -> "x").select(
      TextAnalysis.normalizeTextCol(lit("Hello, World!")).as("n")).head().getString(0)
    val b = corpus("d" -> "x").select(
      TextAnalysis.normalizeTextCol(lit("hello world")).as("n")).head().getString(0)
    a shouldBe b
  }

  test("gopherQualityRules: metrics and the combined verdict on known docs") {
    // "good": 50 in-bounds words incl. >=2 Gopher stopwords, no repetition
    val good = (1 to 46).map(i => s"word$i").mkString(" ") + " the and of with"
    // top 2-gram dominates; stopwords appended so ONLY that rule fails
    val loops = Seq.fill(30)("spam ham").mkString(" ") + " the of and with"
    val short = "the of tiny"
    val rules = TextAnalysis.gopherQualityRules(corpus(
      "g" -> good, "l" -> loops, "s" -> short))
      .collect().map(r => r.getString(0) -> r).toMap
    val g = rules("g")
    g.getAs[Long]("n_words") shouldBe 50L
    g.getAs[Double]("frac_alpha_words") shouldBe 1.0
    g.getAs[Long]("n_stop_hits") shouldBe 4L // the, and, of, with
    g.getAs[Boolean]("keep") shouldBe true
    // the loop doc fails ONLY the top-2-gram character-share rule
    val l = rules("l")
    l.getAs[Long]("n_words") shouldBe 64L
    l.getAs[Double]("top2_frac") should be > 0.2
    l.getAs[Boolean]("keep") shouldBe false
    // the short doc fails the word-count floor
    val s = rules("s")
    s.getAs[Long]("n_words") shouldBe 3L
    s.getAs[Boolean]("keep") shouldBe false
  }

  test("gopherQualityRules top-2-gram tie breaks to the larger gram") {
    // "a b" and "b a" both occur twice; max(struct) keeps "b a"
    val row = TextAnalysis.gopherQualityRules(corpus("t" -> "a b a b a"))
      .head()
    // top gram char share: 2 occurrences * 3 chars / 9 chars
    row.getAs[Double]("top2_frac") shouldBe (6.0 / 9) +- 1e-6
  }

  test("gopherKeepCol (row-local) equals gopherQualityRules.keep on the fixture") {
    import org.apache.spark.sql.functions.col
    // the distributed tier and the streaming-shaped row-local column
    // must agree doc for doc — including the top-2-gram tie-break
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id as doc", "text as line")
    val dist = TextAnalysis.gopherQualityRules(docs)
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Boolean]("keep")).toMap
    val local = docs
      .select(col("doc"), TextAnalysis.gopherKeepCol(col("line")).as("keep"))
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Boolean]("keep")).toMap
    local shouldBe dist
    dist.values.toSet.size should be >= 1 // sanity: verdicts exist
  }

  test("termDrift matches a local reference of the smoothed JS formula") {
    val a = corpus("a1" -> "x x y", "a2" -> "x z")
    val b = corpus("b1" -> "y y y w")
    val got = TextAnalysis.termDrift(a, b, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList

    // local reference: counts a = {x:3, y:1, z:1}, b = {y:3, w:1};
    // union vocab V = 4, n_a = 5, n_b = 4
    val ca = Map("x" -> 3L, "y" -> 1L, "z" -> 1L, "w" -> 0L)
    val cb = Map("x" -> 0L, "y" -> 3L, "z" -> 0L, "w" -> 1L)
    def js(t: String): Double = {
      val p = (ca(t) + 1.0) / (5 + 4)
      val q = (cb(t) + 1.0) / (4 + 4)
      val m = (p + q) / 2
      val raw = 0.5 * p * (math.log(p / m) / math.log(2)) +
        0.5 * q * (math.log(q / m) / math.log(2))
      BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = Seq("w", "x", "y", "z")
      .map(t => (t, ca(t), cb(t), js(t)))
      .sortBy { case (t, _, _, v) => (-v, t) }
    got shouldBe expected
    // every contribution is non-negative (JS property)
    got.foreach { case (_, _, _, v) => v should be >= 0.0 }
  }

  test("termDrift of a corpus against itself is (near) zero everywhere") {
    val c = corpus("a" -> "x y z z", "b" -> "w x")
    TextAnalysis.termDrift(c, c, k = 10).collect().foreach { r =>
      r.getDouble(3) shouldBe 0.0 +- 1e-9
    }
  }

  test("charEntropy: single-char flood scores 0, uniform text scores ln(distinct)") {
    val got = TextAnalysis.charEntropy(corpus(
      "flood" -> "aaaaaaaa",
      "uni4" -> "abc ", // 4 distinct chars, once each → ln 4
      "pair" -> "ab"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    got("flood") shouldBe ((8L, 1L, 0.0))
    got("uni4") shouldBe ((4L, 4L, math.rint(math.log(4.0) * 1e6) / 1e6))
    got("pair") shouldBe ((2L, 2L, math.rint(math.log(2.0) * 1e6) / 1e6))
  }

  test("charEntropy counts only alphabet chars and drops all-foreign rows") {
    val got = TextAnalysis.charEntropy(corpus(
      "mixed" -> "a1b2", // digits invisible → "ab"
      "foreign" -> "12345"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3))).toMap
    got("mixed") shouldBe ((2L, math.rint(math.log(2.0) * 1e6) / 1e6))
    got.contains("foreign") shouldBe false
  }

  test("charEntropy: skewed text matches the hand formula, plan is shuffle-free") {
    // "aab" → ln 3 − (2·ln2)/3
    val df = TextAnalysis.charEntropy(corpus("d" -> "aab"))
    df.head().getDouble(3) shouldBe
      (math.rint((math.log(3.0) - 2 * math.log(2.0) / 3) * 1e6) / 1e6)
    df.queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("charEntropy runs the CharCounts kernel once per row, not per char") {
    // The 27 per-char columns are getItem projections over ONE CharCounts
    // call; whole-stage codegen's subexpression elimination must collapse
    // the repeated subtree to a single kernel invocation per operator
    // (filter + project), or the one-pass kernel silently becomes a
    // 27-pass one. Deterministic-expression status is what makes CSE
    // applicable — this pins it.
    // NOT corpus(): a LocalRelation input lets ConvertToLocalRelation
    // evaluate the whole projection at optimization time and no codegen
    // exists to inspect — range() keeps a real scan in the plan
    // both columns must depend on the range id: a constant `line` would
    // let ConstantFolding evaluate the kernel at planning time instead
    import org.apache.spark.sql.functions.{col, concat, lit}
    val docs = spark.range(2).select(
      concat(lit("d"), col("id")).as("doc"),
      concat(lit("abc ab"), col("id")).as("line"))
    val df = TextAnalysis.charEntropy(docs)
    val gen = org.apache.spark.sql.execution.debug
      .codegenString(df.queryExecution.executedPlan)
    val calls = "CharCountsKernel\\.compute".r.findAllIn(gen).length
    withClue(s"kernel call sites in generated code: $calls\n") {
      calls should be >= 1
      calls should be <= 4 // one per codegen'd operator, never per char
    }
  }

  test("charEntropy rejects an empty or duplicated alphabet") {
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.charEntropy(corpus("d" -> "x"), alphabet = Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.charEntropy(corpus("d" -> "x"), alphabet = Seq('a', 'a'))
  }

  test("langIdConfusion: cells, within-true-lang shares, und column") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("1", "the cat and the dog in a house", "en"), // en -> en
      ("2", "the fox and the hen of a farm", "en"),  // en -> en
      ("3", "xyzzy plugh quux", "en"),               // en -> und
      ("4", "der hund und die katze ist ein tier", "de")) // de -> de
      .toDF("doc", "line", "lang")
    val got = TextAnalysis.langIdConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    got shouldBe Map(
      ("en", "en") -> ((2L, 0.666667)),
      ("en", "und") -> ((1L, 0.333333)),
      ("de", "de") -> ((1L, 1.0)))
  }

  test("ngramOverlapF1: multiset bigram overlap, hand-computed") {
    val s = spark
    import s.implicits._
    // a: bigrams {xy, yx, xy} → counts {xy:2, yx:1}, tot 3
    // b: bigrams {xy, yz}     → counts {xy:1, yz:1}, tot 2
    // overlap = min(2,1)=1; prec = 1/3, rec = 1/2, f1 = 2/5
    val cor = corpus("a" -> "x y x y", "b" -> "x y z", "c" -> "q q")
    val pairs = Seq(("a", "b"), ("a", "c")).toDF("d1", "d2")
    val got = TextAnalysis.ngramOverlapF1(pairs, cor, n = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    got shouldBe Map(("a", "b") -> ((1L, 0.333333, 0.5, 0.4)))
    // (a, c) shares no gram and drops; 1-token c has no bigram at all
    got.keySet should not contain (("a", "c"))
    // identical docs: overlap = tot, all three metrics 1.0
    val self = TextAnalysis.ngramOverlapF1(
        Seq(("a", "a2")).toDF("d1", "d2"),
        corpus("a" -> "x y x y", "a2" -> "x y x y"), n = 2)
      .collect().head
    (self.getDouble(3), self.getDouble(4), self.getDouble(5)) shouldBe
      ((1.0, 1.0, 1.0))
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.ngramOverlapF1(pairs, cor, n = 0)
  }
}
