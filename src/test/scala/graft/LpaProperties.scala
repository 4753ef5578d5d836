package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck law for synchronous label propagation (SURVEY §2 link
  * family, `q_link_communities`): [[graft.operators.LinkOps.labelPropagationOn]]
  * must equal a driver-side brute-force reference — same vote counting,
  * same (count DESC, label ASC) argmax, same synchronous update — on
  * arbitrary small graphs, for any round budget; and the r14 zero-change
  * early stop must be invisible (result ≡ the full budget) while actually
  * cutting rounds on converged graphs. The generator mixes random sparse
  * graphs with planted two-clique-plus-bridge shapes so both the
  * fast-converging and the contested-boundary regimes occur.
  */
object LpaProperties extends Properties("graft.operators.LabelPropagation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  /** Undirected distinct edges (a < b) over node ids 0..n-1. */
  private val graphGen: Gen[List[(Long, Long)]] = Gen.oneOf(
    for { // sparse random
      n <- Gen.choose(4, 18)
      seed <- Gen.long
    } yield {
      val rnd = new scala.util.Random(seed)
      (for {
        a <- 0 until n; b <- (a + 1) until n
        if rnd.nextDouble() < 2.5 / n
      } yield (a.toLong, b.toLong)).toList
    },
    for { // two cliques + one bridge (the LPA-vs-CC separating shape)
      k1 <- Gen.choose(3, 6)
      k2 <- Gen.choose(3, 6)
    } yield {
      val c1 = for (a <- 0 until k1; b <- (a + 1) until k1) yield (a.toLong, b.toLong)
      val c2 = for (a <- 0 until k2; b <- (a + 1) until k2)
        yield ((k1 + a).toLong, (k1 + b).toLong)
      (c1 ++ c2 :+ ((k1 - 1).toLong, k1.toLong)).toList
    })

  /** Driver-brute synchronous LPA: every node adopts the most frequent
    * neighbor label, ties to the smallest; isolated nodes don't appear
    * (the engine labels only nodes with ≥1 edge).
    */
  private def brute(edges: List[(Long, Long)], iters: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    var r = 0
    var changed = true
    while (r < iters && changed) {
      val next = adj.map { case (v, nbs) =>
        val votes = nbs.groupBy(labels).view.mapValues(_.size).toSeq
        v -> votes.minBy { case (l, c) => (-c, l) }._1
      }
      changed = next != labels
      labels = next
      r += 1
    }
    labels
  }

  private val itersGen = Gen.oneOf(1, 2, 5, 9)

  property("engine ≡ driver-brute synchronous LPA at any round budget") =
    forAll(graphGen, itersGen) { (edges, iters) =>
      import spark.implicits._
      val got =
        if (edges.isEmpty) Map.empty[Long, Long]
        else graft.operators.LinkOps
          .labelPropagationOn(edges.toDF("a", "b"), iters)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == brute(edges, iters)
    }

  property("zero-change stop: early-stopped ≡ full budget, rounds actually drop") =
    forAll(Gen.choose(3, 6), Gen.choose(3, 6)) { (k1, k2) =>
      import spark.implicits._
      val c1 = for (a <- 0 until k1; b <- (a + 1) until k1) yield (a.toLong, b.toLong)
      val c2 = for (a <- 0 until k2; b <- (a + 1) until k2)
        yield ((k1 + a).toLong, (k1 + b).toLong)
      val edges = (c1 ++ c2 :+ ((k1 - 1).toLong, k1.toLong)).toDF("a", "b")
      val budget = 25
      val (df, rounds) = graft.operators.LinkOps.labelPropagationRounds(edges, budget)
      val full = graft.operators.LinkOps.labelPropagationOn(edges, budget)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val stopped = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      rounds < budget && stopped == full
    }
}
