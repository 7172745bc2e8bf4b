package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed multinomial NAIVE BAYES over hashed token features —
 * train and infer in ONE declarative plan. The quality-classifier
 * pattern of large-scale corpus curation (a fastText-style bag-of-words
 * model scoring every document; e.g. the CCNet/GPT-3 quality filters)
 * reduced to its Spark-native essence: the "model" is a small aggregate
 * the optimizer broadcasts, inference is a join + sum, and nothing ever
 * leaves the cluster.
 *
 * Determinism across engines (the library-wide integer trick): every
 * log-probability is quantized ONCE to integer micro-nats —
 * floor(ln(exact-long-ratio)·1e6) — so a document's class score is a
 * SUM OF LONGS (order-free, no float accumulation) and argmax ties
 * break on the smallest label. A prediction can never flip between
 * Spark and the DuckDB oracle by summation order.
 *
 * Model: add-one (Laplace) smoothing over the `numBuckets` hashed
 * feature space — p(b|c) = (cnt_bc + 1)/(N_c + B), prior
 * p(c) = docs_c / docs_total. The conditional table is DENSE over
 * (observed bucket × class) — B·C rows, built by a broadcast cross of
 * the distinct-bucket frame with the C-row class frame — because a
 * bucket unseen in class c still contributes its smoothed penalty.
 *
 * Scale shape (the whole point): the corpus is touched twice by
 * construction — once to FIT (one (bucket, class) partial-agg exchange
 * collapsing to ≤ B·C rows) and once to SCORE. Scoring pre-aggregates
 * to (doc, bucket) counts (one exchange of ≤ distinct-buckets-per-doc
 * rows — bounded by B, NOT by doc length), joins the broadcast model
 * (fanout C per row, model-side — never a shuffle of C× token rows),
 * and argmaxes via one more doc-keyed partial agg. B·C stays
 * broadcast-sized by contract: 1024·5 ≈ 5k rows here; size `numBuckets`
 * so B·C ≪ executor memory at your class count.
 */
object Classify {

  /**
   * Fit on `docs` rows where `labelCol` is the class, score EVERY row.
   *
   * @param docs (doc, line) + a label column + any carry columns
   * @param labelCol name of the class-label column
   * @param numBuckets hashed vocabulary size (model is ≤ B·C rows)
   * @return (doc, <label>, predicted, score_micro): the argmax class
   *         and its quantized log-posterior, one row per input doc
   *         that produced at least one token
   */
  def naiveBayes(
      docs: DataFrame,
      labelCol: String,
      numBuckets: Int = 1024): DataFrame =
    candidateScores(docs, labelCol, numBuckets)
      // argmax with ties to the SMALLEST candidate label: min over
      // (-score, cand) structs — score desc, then label asc —
      // deterministic for any orderable label type
      .groupBy(col("doc"), col("label"))
      .agg(min(struct((-col("score_micro")).as("neg"), col("cand"),
        col("score_micro"))).as("best"))
      .select(col("doc"), col("label").as(labelCol),
        col("best.cand").as("predicted"),
        col("best.score_micro").as("score_micro"))

  /** The per-(doc, candidate-class) quantized log-posterior frame the
    * argmax ([[naiveBayes]]) and the margin calibration
    * ([[marginCalibration]]) both reduce — (doc, label, cand,
    * score_micro), C rows per scored doc. */
  private[graft] def candidateScores(
      docs: DataFrame,
      labelCol: String,
      numBuckets: Int): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    Seq("bucket", "cnt", "qcond", "qprior", "predicted", "score_micro")
      .foreach(c => require(!docs.columns.contains(c),
        s"'$c' is reserved by naiveBayes — rename that input column"))
    val b = lit(numBuckets.toLong)
    val tok = docs.select(col("doc"), col(labelCol).as("label"),
        explode(filter(split(col("line"), "\\s+"), t => length(t) > 0))
          .as("token"))
      .withColumn("bucket",
        conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long") %
          numBuckets.toLong)

    // ── fit ─────────────────────────────────────────────────────────
    // class priors from DOC counts; token totals per class for the
    // smoothing denominator. C rows.
    val classes = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("docs_c"))
      .withColumn("docs_total", sum(col("docs_c")).over(Window.partitionBy()))
      .withColumn("qprior",
        floor(log(col("docs_c").cast("double") /
          col("docs_total").cast("double")) * lit(1e6)).cast("long"))
    // persisted: THREE consumers below (distinct buckets, class token
    // totals, the left join) — without the cache each would replan the
    // full token aggregate, i.e. three fit passes over the corpus
    // instead of one. ≤ B·C rows; fills once inside the final action.
    val pairCounts = graft.Caching.persist(
      tok.groupBy(col("bucket"), col("label"))
        .agg(count(lit(1)).as("cnt")))
    val classTokens = pairCounts.groupBy(col("label"))
      .agg(sum(col("cnt")).as("n_c"))
    // dense (bucket × class) conditional table: distinct buckets cross
    // the C-row class frame, absent counts smooth to +1/(N_c + B)
    val model = pairCounts.select(col("bucket")).distinct()
      .crossJoin(broadcast(classTokens))
      .join(pairCounts, Seq("bucket", "label"), "left")
      .withColumn("qcond",
        floor(log((coalesce(col("cnt"), lit(0L)) + 1L).cast("double") /
          (col("n_c") + b).cast("double")) * lit(1e6)).cast("long"))
      .select(col("bucket"), col("label"), col("qcond"))

    // ── score ───────────────────────────────────────────────────────
    val docBuckets = tok.groupBy(col("doc"), col("label"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    docBuckets
      .join(broadcast(model.withColumnRenamed("label", "cand")), Seq("bucket"))
      .groupBy(col("doc"), col("label"), col("cand"))
      .agg(sum(col("cnt") * col("qcond")).as("lik_micro"))
      .join(broadcast(classes.select(col("label").as("cand"), col("qprior"))),
        Seq("cand"))
      .withColumn("score_micro", col("lik_micro") + col("qprior"))
  }

  /**
   * MARGIN CALIBRATION table — "when the model wins by X nats, how
   * often is it right?": per margin bucket (top score − runner-up, in
   * exact micro-nat longs, binned at `binMicroNats` and capped at
   * `maxBin`), the doc count and empirical accuracy. The reliability
   * curve every score-thresholded routing decision (keep/drop/review
   * at ingest) should be read against — a model can be 90 % accurate
   * overall and near-coin-flip in its low-margin band, and this table
   * is where that shows. Margins are integer by construction (the
   * micro-nat score convention), so the binning cannot drift between
   * engines; only the final accuracy ratio is a round-6 double.
   *
   * Scale shape: the [[candidateScores]] chain (two corpus passes, the
   * declared NB shape) + one doc-keyed top-2 window over the C-per-doc
   * score frame + a bins-bounded aggregate. Single-class corpora have
   * no runner-up and produce an empty table rather than a lie.
   *
   * @return (margin_bin, n, n_correct, accuracy) ordered by bin
   */
  def marginCalibration(
      docs: DataFrame,
      labelCol: String,
      numBuckets: Int = 1024,
      binMicroNats: Long = 5000000L,
      maxBin: Int = 9): DataFrame = {
    require(binMicroNats > 0, s"binMicroNats must be positive, got $binMicroNats")
    require(maxBin >= 0, s"maxBin must be >= 0, got $maxBin")
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("score_micro").desc, col("cand"))
    candidateScores(docs, labelCol, numBuckets)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= 2)
      .groupBy(col("doc"), col("label"))
      .agg(
        max(when(col("_rn") === 1, col("cand"))).as("_pred"),
        max(when(col("_rn") === 1, col("score_micro"))).as("_s1"),
        max(when(col("_rn") === 2, col("score_micro"))).as("_s2"))
      .where(col("_s2").isNotNull)
      .withColumn("margin_bin",
        least(floor((col("_s1") - col("_s2")) / lit(binMicroNats.toDouble)),
          lit(maxBin.toDouble)).cast("long"))
      .withColumn("_ok",
        when(col("_pred") === col("label"), 1L).otherwise(0L))
      .groupBy(col("margin_bin"))
      .agg(count(lit(1)).as("n"), sum(col("_ok")).as("n_correct"))
      .withColumn("accuracy",
        round(col("n_correct").cast("double") / col("n").cast("double"), 6))
  }

  /**
   * A COLLECTED Naive Bayes model — the broadcast-model hand-off every
   * stream-inference pipeline performs. ≤ B·C rows by contract (size
   * `numBuckets` accordingly). All per-class sequences share the order
   * of `labels`, which is sorted ascending so that "first index of the
   * max" IS the smallest-label tie-break.
   *
   * Every quantized value in here was computed by SPARK expressions
   * identical to [[naiveBayes]]'s and only then collected — never
   * re-derived with driver-side math — so [[scoreRowLocal]] and the
   * distributed path agree bit for bit by construction.
   */
  final case class NbModel(
      labels: Seq[String],
      priorsMicro: Seq[Long],
      condMicro: Map[Long, Seq[Long]],
      unseenMicro: Seq[Long],
      numBuckets: Int)

  /**
   * Fit the [[NbModel]] distributedly and collect it. The collect is
   * the deliberate model hand-off (B·C rows), not a data egress.
   */
  def fit(
      docs: DataFrame,
      labelCol: String,
      numBuckets: Int = 1024): NbModel = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val b = lit(numBuckets.toLong)
    val tok = docs.select(col(labelCol).as("label"),
        explode(filter(split(col("line"), "\\s+"), t => length(t) > 0))
          .as("token"))
      .withColumn("bucket",
        conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long") %
          numBuckets.toLong)
    val classes = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("docs_c"))
      .withColumn("docs_total", sum(col("docs_c")).over(Window.partitionBy()))
      .withColumn("qprior",
        floor(log(col("docs_c").cast("double") /
          col("docs_total").cast("double")) * lit(1e6)).cast("long"))
    val pairCounts = graft.Caching.persist(
      tok.groupBy(col("bucket"), col("label")).agg(count(lit(1)).as("cnt")))
    val classTokens = pairCounts.groupBy(col("label"))
      .agg(sum(col("cnt")).as("n_c"))
      // the smoothed zero-count conditional, by the SAME expression
      // shape as the dense table below (cnt = 0)
      .withColumn("unseen",
        floor(log(lit(1L).cast("double") / (col("n_c") + b).cast("double")) *
          lit(1e6)).cast("long"))
    val cond = pairCounts.select(col("bucket")).distinct()
      .crossJoin(broadcast(classTokens.select(col("label"), col("n_c"))))
      .join(pairCounts, Seq("bucket", "label"), "left")
      .withColumn("qcond",
        floor(log((coalesce(col("cnt"), lit(0L)) + 1L).cast("double") /
          (col("n_c") + b).cast("double")) * lit(1e6)).cast("long"))
      .select(col("bucket"), col("label"), col("qcond"))

    val classRows = classes.join(classTokens, Seq("label")).collect()
      .map(r => (r.getAs[String]("label"), r.getAs[Long]("qprior"),
        r.getAs[Long]("unseen")))
      .sortBy(_._1)
    val labels = classRows.map(_._1).toSeq
    val idx = labels.zipWithIndex.toMap
    val condMap = cond.collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[String]("label"),
        r.getAs[Long]("qcond")))
      .groupBy(_._1)
      .map { case (bucket, rows) =>
        val arr = new Array[Long](labels.size)
        rows.foreach { case (_, l, q) => arr(idx(l)) = q }
        bucket -> arr.toSeq
      }
    graft.Caching.release(pairCounts)
    NbModel(labels, classRows.map(_._2).toSeq, condMap,
      classRows.map(_._3).toSeq, numBuckets)
  }

  /**
   * ROW-LOCAL scoring against a collected [[NbModel]] — a pure,
   * STATELESS column expression (the model rides along as literals),
   * which is exactly what stream inference needs: no state store, no
   * shuffle, no per-batch joins; works identically on batch frames and
   * readStream frames. Buckets unseen at fit time pay the smoothed
   * zero-count penalty. Unlike [[naiveBayes]] (which drops token-less
   * docs with the explode), every input row emits a prediction —
   * a token-less doc scores prior-only.
   *
   * @return input columns minus nothing, plus (predicted, score_micro)
   */
  def scoreRowLocal(docs: DataFrame, model: NbModel): DataFrame = {
    Seq("predicted", "score_micro").foreach(c =>
      require(!docs.columns.contains(c),
        s"'$c' is reserved by scoreRowLocal — rename that input column"))
    val c = model.labels.size
    require(c > 0, "model has no classes")
    val condLit = typedLit(model.condMicro)
    val unseenLit = typedLit(model.unseenMicro)
    val priorsLit = typedLit(model.priorsMicro)
    val labelsLit = typedLit(model.labels)
    val zeros = typedLit(Seq.fill(c)(0L))
    val toks = filter(split(col("line"), "\\s+"), t => length(t) > 0)
    val perTok = (t: Column) => coalesce(
      element_at(condLit,
        conv(substring(md5(t), 1, 8), 16, 10).cast("long") %
          model.numBuckets.toLong),
      unseenLit)
    val scores = zip_with(
      aggregate(toks, zeros, (acc, t) => zip_with(acc, perTok(t), _ + _)),
      priorsLit, _ + _)
    docs
      .withColumn("score_micro", array_max(scores))
      .withColumn("predicted",
        element_at(labelsLit,
          array_position(scores, col("score_micro")).cast("int")))
  }
}
