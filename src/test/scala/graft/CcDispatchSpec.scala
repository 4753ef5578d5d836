package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck law for the connected-components size dispatch (r19
  * optimization round): [[graft.operators.DedupOps.connectedComponentsOn]]
  * resolves bounded edge sets with a driver union-find (the
  * broadcast-join size discipline) and larger ones with the alternating
  * star rounds — the two paths must emit the IDENTICAL (node, component)
  * row set on arbitrary graphs, component = the minimum id reachable
  * from the node, no self rows. `localMaxEdges = 0` forces the
  * distributed path on the same input, so the law exercises both
  * implementations per case.
  */
object CcDispatchSpec extends Properties("graft.operators.CcDispatch") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val graphGen: Gen[List[(Long, Long)]] = Gen.oneOf(
    for { // sparse random
      n <- Gen.choose(2, 24)
      seed <- Gen.long
    } yield {
      val rnd = new scala.util.Random(seed)
      (for {
        a <- 0L until n.toLong
        b <- 0L until n.toLong
        if a != b && rnd.nextDouble() < 0.15
      } yield (a, b)).toList
    },
    for { // chain + isolated pair: forces multi-round star convergence
      n <- Gen.choose(3, 30)
    } yield (0L until n.toLong).sliding(2).map(s => (s(1), s(0))).toList ++
      List((1000L, 1001L))
  )

  property("local dispatch == distributed star rounds") =
    forAll(graphGen) { edges =>
      import spark.implicits._
      val df = edges.toDF("a", "b")
      val local = graft.operators.DedupOps.connectedComponentsOn(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dist = graft.operators.DedupOps
        .connectedComponentsOn(df, localMaxEdges = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference: brute-force reachability min per node
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val adj = (edges ++ edges.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      def compMin(start: Long): Long = {
        var seen = Set(start)
        var frontier = Set(start)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
          seen ++= frontier
        }
        seen.min
      }
      val ref = nodes.map(n => (n, compMin(n))).filter(p => p._1 != p._2).toSet
      local == dist && local == ref
    }
}
