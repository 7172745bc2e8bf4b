package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/**
 * Property check for the GramMoments kernel buffer: for ANY random
 * micro-quantized vectors — including components near √Long.MaxValue
 * that force per-row BigInt fallback, and magnitudes that exhaust the
 * Long-lane headroom mid-stream forcing flushes — the accumulated
 * (n, Σx, Σy, Σxy, com) per dimension pair must equal a direct BigInt
 * reference computed pairwise with no Long stage at all. Merges of
 * arbitrary splits must equal the unsplit run (the additive-state
 * contract behind incremental PCA).
 */
object GramProperties extends Properties("GramMoments") {

  import org.apache.spark.sql.graft.{GramBuffer, GramKernel}

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  // components spanning the Long-lane sweet spot, the flush-forcing
  // midrange, and the BigInt-fallback boundary. Magnitudes stay inside
  // the DECLARED output domain: the result columns are DECIMAL(38,0),
  // so Σxy must stay under 10³⁸ — at micro-quantized unit scale that
  // bound needs ~10²⁴ vectors (unreachable); the one adversarial case
  // past it fails LOUDLY and is pinned separately below.
  private val component: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(-2000000L, 2000000L),          // micro-quantized realistic
    Gen.chooseNum(-4000000000L, 4000000000L),    // forces frequent flushes
    Gen.oneOf(3037000499L, -3037000499L, 3037000500L, -3037000500L))

  private val vectorsGen: Gen[List[Array[Long]]] = for {
    d <- Gen.chooseNum(1, 6)
    n <- Gen.chooseNum(0, 30)
    vs <- Gen.listOfN(n, Gen.listOfN(d, component).map(_.toArray))
  } yield vs

  private def reference(vs: Seq[Array[Long]]): Map[(Int, Int), (Long, BigInt, BigInt, BigInt, BigInt)] = {
    if (vs.isEmpty) return Map.empty
    val d = vs.head.length
    (for { i <- 0 until d; j <- i until d } yield {
      val sx = vs.iterator.map(v => BigInt(v(i))).sum
      val sy = vs.iterator.map(v => BigInt(v(j))).sum
      val sxy = vs.iterator.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      (i, j) -> ((vs.size.toLong, sx, sy, sxy,
        BigInt(vs.size) * sxy - sx * sy))
    }).toMap
  }

  private def runKernel(groups: Seq[Seq[Array[Long]]]): Map[(Int, Int), (Long, BigInt, BigInt, BigInt, BigInt)] = {
    val bufs = groups.map { g =>
      val b = new GramBuffer
      g.foreach(v => GramKernel.update(b, v))
      // exercise the wire format too: every partial round-trips
      GramKernel.deserialize(GramKernel.serialize(b))
    }
    val merged = bufs.foldLeft(new GramBuffer)(GramKernel.merge)
    val rows = GramKernel.result(merged)
    (0 until rows.numElements()).map { k =>
      val r = rows.getStruct(k, 7)
      (r.getLong(0).toInt, r.getLong(1).toInt) ->
        ((r.getLong(2),
          BigInt(r.getDecimal(3, 38, 0).toJavaBigDecimal.toBigInteger),
          BigInt(r.getDecimal(4, 38, 0).toJavaBigDecimal.toBigInteger),
          BigInt(r.getDecimal(5, 38, 0).toJavaBigDecimal.toBigInteger),
          BigInt(r.getDecimal(6, 38, 0).toJavaBigDecimal.toBigInteger)))
    }.toMap
  }

  property("single-buffer accumulation equals the pure-BigInt reference") =
    forAll(vectorsGen) { vs =>
      runKernel(Seq(vs)) == reference(vs)
    }

  property("any partition split merges to the unsplit answer") =
    forAll(vectorsGen, Gen.chooseNum(1, 5)) { (vs, parts) =>
      val groups = vs.zipWithIndex.groupBy(_._2 % parts).values
        .map(_.map(_._1)).toSeq
      runKernel(groups) == reference(vs)
    }

  property("sums past the DECIMAL(38,0) output domain fail loudly, never wrap") = {
    // two vectors of Long.MaxValue components: Σxy ≈ 1.7e38 > 10³⁸.
    // The BigInt lanes hold it exactly; the declared result type
    // cannot — the conversion must throw, not truncate.
    val v = Array(Long.MaxValue, Long.MaxValue)
    val b = new GramBuffer
    GramKernel.update(b, v)
    GramKernel.update(b, v)
    try { GramKernel.result(b); false }
    catch { case _: ArithmeticException | _: org.apache.spark.SparkException => true }
  }
}
