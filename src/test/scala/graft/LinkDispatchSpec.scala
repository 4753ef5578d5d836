package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Pins the link-family size dispatch (r19 optimization round): the
  * bounded-edge driver-side iterations of LPA and BFS must emit the
  * IDENTICAL rows as the distributed rounds (`localMaxEdges = 0` forces
  * the distributed path on the same input) — integer arithmetic both
  * sides, so equality is exact, including the LPA zero-change early
  * stop's round count.
  */
object LinkDispatchProperties extends Properties("graft.operators.LinkDispatch") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(4, 22)
    seed <- Gen.long
  } yield {
    val rnd = new scala.util.Random(seed)
    (for {
      a <- 0L until n.toLong
      b <- 0L until n.toLong
      if a < b && rnd.nextDouble() < 0.2
    } yield (a, b)).toList
  }

  property("LPA local dispatch == distributed rounds (labels + round count)") =
    forAll(graphGen.suchThat(_.nonEmpty)) { edges =>
      import spark.implicits._
      val und = edges.toDF("a", "b")
      val (lDf, lR) = graft.operators.LinkOps.labelPropagationRounds(und, 5)
      val (dDf, dR) = graft.operators.LinkOps.labelPropagationRounds(und, 5,
        localMaxEdges = 0L)
      val l = lDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val d = dDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      l == d && lR == dR
    }

  property("BFS local dispatch == distributed rounds") =
    forAll(graphGen.suchThat(_.nonEmpty)) { edges =>
      import spark.implicits._
      // directed edges both ways + seeds = every 3rd node
      val e = (edges ++ edges.map(p => (p._2, p._1))).toDF("src", "dst")
      val seeds = edges.flatMap(p => Seq(p._1, p._2)).distinct
        .filter(_ % 3 == 0).toDF("doc_id")
      val l = graft.operators.LinkOps.bfsDepthOn(seeds, e, maxDepth = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val d = graft.operators.LinkOps
        .bfsDepthOn(seeds, e, maxDepth = 3, localMaxEdges = 0L)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      l == d
    }
}

/** HITS runs on the fixture entry (its edge builder is inline), local
  * vs forced-distributed — nano-unit integers, so rows must be equal.
  */
class LinkDispatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("HITS local dispatch == distributed half-steps on the fixture") {
    val l = graft.operators.LinkOps.hits(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val d = graft.operators.LinkOps.hits(spark, TestSpark.Sf, localMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(l == d)
  }
}
