package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Dedup

/**
 * Property check for the large/small-star closure: for ANY random edge
 * multiset (self-loops, duplicates, both orientations, isolated nodes)
 * the distributed `connectedComponents` labels must equal a local
 * union-find's component minima — the two converged tiers' shared
 * contract, checked against an independent third implementation.
 */
object CcProperties extends Properties("ConnectedComponents") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 40)
    es <- Gen.listOfN(n, for {
      u <- Gen.chooseNum(0L, 19L)
      v <- Gen.chooseNum(0L, 19L) // self-loops allowed on purpose
    } yield (u, v))
  } yield es

  private def unionFind(nodes: Range, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(
      nodes.map(i => i.toLong -> i.toLong): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    // component minimum: roots only ever decrease in the merge above
    nodes.map(i => i.toLong -> find(i.toLong)).toMap
  }

  property("labels equal a local union-find's component minima") =
    forAll(edgesGen) { edges =>
      val s = spark
      import s.implicits._
      val nodes = 0 until 20
      val got = Dedup.connectedComponents(
          edges.toDF("u", "v"), nodes.map(_.toLong).toDF("doc"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(nodes, edges)
      got == want
    }
}
