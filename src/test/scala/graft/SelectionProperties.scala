package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions.col

/** ScalaCheck laws for the round-13 selection / link-pair operators.
  *
  *  - [[graft.operators.LinkOps.couplingOn]] must equal the brute-force
  *    shared-target pair count over arbitrary small directed graphs,
  *    under an arbitrary in-degree prune — the prune is part of the
  *    DEFINITION, so the reference applies it too. Small id space forces
  *    heavy target sharing (the pair-heavy regime) and prunes that
  *    actually fire.
  *  - [[graft.operators.MlOps.kcenterOn]] must reproduce the driver-side
  *    farthest-first greedy bit-for-bit (ids AND round-6 radii) on
  *    arbitrary vector sets, including duplicate positions (the early-
  *    stop path) and distance ties (the min-id tie-break).
  *
  * Each case is a full Spark job; the suites run fewer, larger cases.
  */
object SelectionProperties extends Properties("graft.operators.Selection") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  // ---- bibliographic coupling ----

  private val edges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 24)
    es <- Gen.listOfN(n, for {
      s <- Gen.choose(0L, 7L)
      d <- Gen.choose(8L, 13L)
    } yield (s, d))
  } yield es.distinct

  property("couplingOn == brute shared-target pairs under the in-degree prune") =
    forAll(edges, Gen.choose(1, 4)) { (es, maxIn) =>
      import spark.implicits._
      val kept = es.groupBy(_._2).filter(_._2.size <= maxIn)
        .values.flatten.toList
      val bySrc = kept.groupBy(_._1).map { case (s, l) => s -> l.map(_._2).toSet }
      val srcs = bySrc.keys.toSeq.sorted
      val brute = (for {
        i <- srcs.indices; j <- (i + 1) until srcs.length
        shared = (bySrc(srcs(i)) & bySrc(srcs(j))).size if shared > 0
      } yield ((srcs(i), srcs(j)), shared.toLong)).toMap
      val got = graft.operators.LinkOps
        .couplingOn(es.toDF("src", "dst"), maxIn, topK = 1000)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      got == brute
    }

  // ---- k-center greedy ----

  private val vectors: Gen[List[(Long, List[Double])]] = for {
    n <- Gen.choose(1, 14)
    // components from a tiny grid: duplicate positions and exact
    // distance ties occur constantly
    vs <- Gen.listOfN(n, Gen.listOfN(3, Gen.oneOf(0.0, 1.0, 2.0)))
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  private def cosD(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
    val d = math.sqrt(aa) * math.sqrt(bb)
    1.0 - (if (d == 0.0) 0.0 else dot / d)
  }

  // distances micro-rounded AT COMPUTATION — the r16 engine semantics
  // (state, argmax, and radius all at 6-dp; what the DuckDB chained-CTE
  // oracle replays)
  private def cosD6(a: Seq[Double], b: Seq[Double]): Double =
    math.floor(cosD(a, b) * 1e6 + 0.5) / 1e6

  private def refGreedy(vs: Seq[(Long, Seq[Double])], k: Int): Seq[(Int, Long, Double)] = {
    val sorted = vs.sortBy(_._1)
    var picked = List((1, sorted.head._1, 0.0))
    val dmin = scala.collection.mutable.Map(
      vs.map { case (id, v) => id -> cosD6(v, sorted.head._2) }: _*)
    val byId = vs.toMap
    var r = 2
    var stop = false
    while (r <= k && !stop) {
      val (id, d) = dmin.toSeq.sortBy { case (i, dd) => (-dd, i) }.head
      if (math.floor(d * 1e6 + 0.5) <= 0.0) stop = true
      else {
        picked ::= ((r, id, d))
        val cv = byId(id)
        vs.foreach { case (i, v) => dmin(i) = math.min(dmin(i), cosD6(v, cv)) }
        r += 1
      }
    }
    picked.reverse.map { case (rk, id, d) => (rk, id, d) }
  }

  // ---- JL projection: fused kernel ≡ HOF spec ----

  private val realVectors: Gen[List[(Long, List[Double])]] = for {
    n <- Gen.choose(1, 6)
    d <- Gen.choose(1, 24)
    vs <- Gen.listOfN(n, Gen.listOfN(d,
      Gen.chooseNum(-10.0, 10.0).suchThat(x => !x.isNaN)))
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  property("JlProject fused kernel == nested-HOF spec, bit for bit") =
    forAll(realVectors, Gen.choose(1, 20)) { (vs, outDim) =>
      import spark.implicits._
      val df = vs.toDF("vec_id", "embedding")
      val fused = df.select(col("vec_id"),
          graft.operators.KnnOps.projectArray(col("embedding"), outDim).as("p"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
      val hof = df.select(col("vec_id"),
          graft.operators.KnnOps.projectArrayHof(col("embedding"), outDim).as("p"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
      fused == hof
    }

  property("kcenterOn == driver greedy (ids and round-6 radii), ties and dups included") =
    forAll(vectors, Gen.choose(1, 6)) { (vs, k) =>
      import spark.implicits._
      val got = graft.operators.MlOps
        .kcenterOn(vs.toDF("vec_id", "embedding"), k)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      got == refGreedy(vs.map { case (i, v) => (i, v: Seq[Double]) }, k)
    }
}
