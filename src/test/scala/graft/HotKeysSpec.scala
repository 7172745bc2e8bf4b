package graft

import org.apache.spark.sql.functions._

import graft.operators.HotKeys

class HotKeysSpec extends SparkSpec {

  /** (user_id, n occurrences) pairs flattened into an event-like frame. */
  private def keyed(counts: (Long, Int)*) = {
    val s = spark
    import s.implicits._
    counts.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("user_id")
  }

  test("hotKeys finds exactly the keys at or above ceil(theta*N)") {
    // N = 100; theta = 0.2 -> threshold 20
    val df = keyed(1L -> 40, 2L -> 20, 3L -> 19, 4L -> 21)
    val got = HotKeys.hotKeys(df, "user_id", theta = 0.2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got shouldBe Array((1L, 40L, 0.4), (2L, 20L, 0.2), (4L, 21L, 0.21))
  }

  test("sketched twin equals the exact answer even with a coarse eps") {
    val df = keyed((1L to 50L).map(k => k -> (if (k <= 5) 30 else 3)): _*)
    val exact = rowsOf(HotKeys.hotKeys(df, "user_id", theta = 0.05))
    // eps = theta (10x coarser than the derived default): heavy
    // over-count, the confirm agg must still drop every false positive
    val coarse = rowsOf(
      HotKeys.hotKeysSketched(df, "user_id", theta = 0.05, eps = 0.05))
    val derived = rowsOf(HotKeys.hotKeysSketched(df, "user_id", theta = 0.05))
    coarse shouldBe exact
    derived shouldBe exact
    exact.size shouldBe 5
  }

  test("screen stats report a selective candidate set at the default eps") {
    // 5 hot keys x 100 rows + 500 singleton keys: the sketch should
    // send (about) only the hot rows to the confirm
    val df = keyed(((1L to 5L).map(_ -> 100) ++ (10L to 509L).map(_ -> 1)): _*)
    val row = HotKeys.hotKeyScreenStats(df, "user_id", theta = 0.05).head()
    val cand = row.getAs[Long]("n_candidate_rows")
    val out = row.getAs[Long]("n_screened_out")
    cand + out shouldBe 1000L
    cand should be >= 500L // every true-hot row MUST pass the screen
    cand should be <= 600L // and the cold tail stays out of the shuffle
  }

  test("cms estimate is never below the true count (over-count-only)") {
    val df = keyed(7L -> 13, 8L -> 2, 9L -> 1)
    // theta small enough that every key passes the screen: estimates
    // surface as confirm counts, which are exact; the screen never
    // suppressed a key => no under-count anywhere
    val got = HotKeys.hotKeysSketched(df, "user_id", theta = 0.01)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(7L -> 13L, 8L -> 2L, 9L -> 1L)
  }

  test("chooseDfStrategy flips window -> broadcast -> salted with skew and vocab") {
    import graft.operators.TfIdf
    // uniform fixture: 40 docs x 5 distinct terms each, no term repeated
    // anywhere -> every term carries 1/200 of the tokens, nothing is hot
    // at theta=0.05 -> the cheap window plan wins
    val uniform = corpus((0 until 40).map { i =>
      s"d$i" -> (0 until 5).map(j => s"tok${i}_$j").mkString(" ")
    }: _*)
    TfIdf.chooseDfStrategy(uniform, theta = 0.05) shouldBe "window"

    // stopword-heavy fixture: the same docs but every line led by "the"
    // -> one term carries 1/6 of all tokens, far above theta -> the
    // window's term partition would take the whole stopword; broadcast
    val stopHeavy = corpus((0 until 40).map { i =>
      s"d$i" -> ("the " + (0 until 5).map(j => s"tok${i}_$j").mkString(" "))
    }: _*)
    TfIdf.chooseDfStrategy(stopHeavy, theta = 0.05) shouldBe "broadcast"

    // same skew but a vocabulary over the broadcast budget -> salted
    TfIdf.chooseDfStrategy(stopHeavy, theta = 0.05,
      maxBroadcastVocab = 10L) shouldBe "salted"

    // tfidfAuto rides the choice and still computes q5's exact answer
    val auto = rowsOf(TfIdf.tfidfAuto(stopHeavy, theta = 0.05)
      .select(col("term"), col("doc"), round(col("tfidf"), 6).as("tfidf")))
    val window = rowsOf(TfIdf.tfidf(stopHeavy, dfViaBroadcast = false)
      .select(col("term"), col("doc"), round(col("tfidf"), 6).as("tfidf")))
    auto shouldBe window
  }

  test("empty input yields no hot keys on both tiers") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[Long].toDF("user_id")
    HotKeys.hotKeys(empty, "user_id", theta = 0.1).count() shouldBe 0L
    HotKeys.hotKeysSketched(empty, "user_id", theta = 0.1).count() shouldBe 0L
  }

  test("string keys probe through the same xxhash64 family") {
    val df = corpus("a" -> "x", "b" -> "x", "c" -> "y")
      .select(col("line").as("k"))
    val exact = rowsOf(HotKeys.hotKeys(df, "k", theta = 0.5))
    rowsOf(HotKeys.hotKeysSketched(df, "k", theta = 0.5)) shouldBe exact
    exact.map(_.head) shouldBe Seq("x")
  }

  test("invalid theta fails loudly") {
    val df = keyed(1L -> 1)
    an[IllegalArgumentException] should be thrownBy
      HotKeys.hotKeys(df, "user_id", theta = 0.0)
    an[IllegalArgumentException] should be thrownBy
      HotKeys.hotKeysSketched(df, "user_id", theta = 1.0)
  }

  /** Skewed fact frame: one whale key with most rows, a cold tail, and
    * DUPLICATE fact rows on both hot and cold keys (multiset semantics
    * must survive the salted split). */
  private def skewedFixture = {
    val s = spark
    import s.implicits._
    val facts = (Seq.fill(60)((1L, "w")) ++ // hot, incl. identical rows
      Seq((1L, "x"), (1L, "y")) ++
      (2L to 20L).flatMap(k => Seq((k, s"a$k"), (k, s"a$k"), (k, s"b$k"))))
      .toDF("k", "payload")
    val dim = (1L to 20L).map(k => (k, s"dim$k")).toDF("k", "attr")
    (facts, dim)
  }

  test("skewJoin equals the plain join on a skewed multiset") {
    val (facts, dim) = skewedFixture
    val plain = rowsOf(facts.join(dim, Seq("k")))
    rowsOf(HotKeys.skewJoin(facts, dim, "k", theta = 0.2)) shouldBe plain
    // theta high enough that NO key is hot: the fallback path
    rowsOf(HotKeys.skewJoin(facts, dim, "k", theta = 0.9)) shouldBe plain
    // theta low enough that EVERY key is hot: the all-salted path
    rowsOf(HotKeys.skewJoin(facts, dim, "k", theta = 0.001)) shouldBe plain
  }

  test("skewJoin drops unmatched keys exactly like an inner join") {
    val s = spark
    import s.implicits._
    val facts = (Seq.fill(30)((1L, "h")) ++ Seq((2L, "c"), (99L, "orphan")))
      .toDF("k", "payload")
    val dim = Seq((1L, "d1"), (2L, "d2"), (50L, "unref")).toDF("k", "attr")
    rowsOf(HotKeys.skewJoin(facts, dim, "k", theta = 0.1)) shouldBe
      rowsOf(facts.join(dim, Seq("k")))
  }

  test("bloomJoin equals the plain join, including orphans on both sides") {
    val s = spark
    import s.implicits._
    val facts = (Seq.fill(20)((1L, "h")) ++
      Seq((2L, "c"), (99L, "orphan"), (7L, "x"))).toDF("k", "payload")
    val dim = Seq((1L, "d1"), (2L, "d2"), (50L, "unref")).toDF("dk", "attr")
    rowsOf(HotKeys.bloomJoin(facts, "k", dim, "dk")) shouldBe
      rowsOf(facts.join(dim, facts("k") === dim("dk")))
    // a coarse fpp lets false positives through the screen — the join
    // must still remove every one of them
    rowsOf(HotKeys.bloomJoin(facts, "k", dim, "dk", fpp = 0.5)) shouldBe
      rowsOf(facts.join(dim, facts("k") === dim("dk")))
  }

  test("bloomJoin screens the fact side before the join in the plan") {
    val s = spark
    import s.implicits._
    // spark.range, not a local Seq: ConvertToLocalRelation would fold
    // the screen into a LocalTableScan and hide it from the plan
    val facts = spark.range(1L, 101L)
      .select(col("id").as("k"), lit("p").as("payload"))
    val dim = Seq((1L, "d1")).toDF("dk", "attr")
    val joined = HotKeys.bloomJoin(facts, "k", dim, "dk")
    val plan = joined.queryExecution.executedPlan.toString
    withClue(s"plan:\n$plan\n") {
      assert(plan.contains("graft_bloom_might_contain"),
        "no bloom screen found on the fact scan")
    }
    // disjoint dim: the screen admits nothing real and the join is empty
    val none = Seq((999L, "d")).toDF("dk", "attr")
    HotKeys.bloomJoin(facts, "k", none, "dk").count() shouldBe 0L
  }

  test("skewJoin's hot branch shuffles on (key, salt) once nothing broadcasts") {
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(threshold)
    spark.conf.set(threshold, "-1")
    try {
      val (facts, dim) = skewedFixture
      val plan = HotKeys.skewJoin(facts, dim, "k", theta = 0.2)
        .queryExecution.executedPlan.toString
      withClue(s"plan:\n$plan\n") {
        // the salted exchange IS the skew spread (the q5c contract)
        assert("hashpartitioning\\(k#\\d+L?, _salt#\\d+L?".r.findFirstIn(plan).isDefined,
          "no (k, _salt) exchange found")
      }
    } finally spark.conf.set(threshold, old)
  }
}
