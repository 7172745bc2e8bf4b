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
      numBuckets: Int = 1024): DataFrame = {
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
      // argmax with ties to the SMALLEST candidate label: min over
      // (-score, cand) structs — score desc, then label asc —
      // deterministic for any orderable label type
      .groupBy(col("doc"), col("label"))
      .agg(min(struct((-col("score_micro")).as("neg"), col("cand"),
        col("score_micro"))).as("best"))
      .select(col("doc"), col("label").as(labelCol),
        col("best.cand").as("predicted"),
        col("best.score_micro").as("score_micro"))
  }
}
