package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.{Dedup, Similarity}

/**
 * Route-equality laws for the r13 optimization rewrites — each law pins
 * an optimized physical route to the reference route it replaced, on
 * random corpora, so "same answer by construction" is re-proven rather
 * than trusted:
 *
 *  - hashedCosinePairs / hashedCosineAgainst: the DENSE verify route
 *    (per-doc dense long vectors + one codegen'd LongDot per candidate)
 *    must equal the SPARSE route (shared-bucket join + aggregation)
 *    pair-for-pair, cosine-for-cosine — integer weights make absent
 *    buckets contribute exactly 0, so equality is exact, not approximate;
 *  - SignBits (the packed native sign-bit expression) must equal the
 *    historical per-bit when(dot(emb, typedLit(signRow)) > 0, 1<<h)
 *    chain bit-for-bit, for both the base family (offset 0) and the
 *    multi-table family (offset t·bits).
 */
object HashedRouteProperties extends Properties("HashedRoutes") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")
  private val line = Gen.chooseNum(1, 24).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))
  private val corpusGen = Gen.chooseNum(5, 40).flatMap(n => Gen.listOfN(n, line))

  private def docsOf(lines: List[String]) = {
    val s = spark
    import s.implicits._
    lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("doc", "line")
  }

  property("dense hashedCosinePairs route == sparse route") =
    Prop.forAll(corpusGen, Gen.oneOf(8, 16, 64), Gen.oneOf(0.1, 0.5, 0.9)) {
      (lines, dims, thr) =>
        Caching.scoped {
          val d = docsOf(lines)
          val dense = Dedup.hashedCosinePairs(d, dims, thr)
            .orderBy(col("doc_a"), col("doc_b")).collect().toSeq
          val sparse = Dedup.hashedCosinePairs(d, dims, thr, maxDenseDims = 0)
            .orderBy(col("doc_a"), col("doc_b")).collect().toSeq
          dense == sparse
        }
    }

  property("dense hashedCosineAgainst route == sparse route") =
    Prop.forAll(corpusGen, Gen.oneOf(8, 32), Gen.oneOf(0.1, 0.7)) {
      (lines, dims, thr) =>
        Caching.scoped {
          val d = docsOf(lines)
          val half = lines.size / 2
          val delta = d.where(col("doc") >= half)
          val hist = d.where(col("doc") < half)
          val dense = Dedup.hashedCosineAgainst(delta, hist, dims, thr)
            .orderBy(col("doc"), col("hist_doc")).collect().toSeq
          val sparse = Dedup
            .hashedCosineAgainst(delta, hist, dims, thr, maxDenseDims = 0)
            .orderBy(col("doc"), col("hist_doc")).collect().toSeq
          dense == sparse
        }
    }

  private val vecGen = Gen.chooseNum(2, 80).flatMap(n =>
    Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 250.0)))

  property("SignBits == the literal per-bit dot chain (base + table family)") =
    Prop.forAll(Gen.nonEmptyListOf(vecGen), Gen.oneOf(4, 8, 48),
      Gen.oneOf(0, 1, 3)) { (vecs, bits, t) =>
      val s = spark
      import s.implicits._
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "emb")
      // the reference chain, reconstructed from the same deterministic
      // md5 hyperplane rule the packed expression bakes in
      def signRow(h: Int): Seq[Double] = {
        val md = java.security.MessageDigest.getInstance("MD5")
        (0 until 1024).map { j =>
          val hex = md.digest(s"$h:$j".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          if (hex.charAt(j % 16) >= '8') 1.0 else -1.0
        }
      }
      val chain = (0 until bits).map { i =>
        when(org.apache.spark.sql.graft.VectorFunctions.dotProduct(
          col("emb"), typedLit(signRow(t * bits + i))) > 0,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      val got = df.select(col("vec_id"),
          Similarity.lshTableBucketCol(col("emb"), t, bits).as("packed"),
          chain.as("ref"))
        .collect()
      got.forall(r => r.getLong(1) == r.getLong(2))
    }
}
