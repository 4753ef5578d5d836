package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.GraphAnnOps

/** ScalaCheck properties of the NSW build/search core (no Spark jobs —
  * the pure per-partition functions): an exhaustive beam reproduces the
  * brute-force ranking on ANY corpus, results are always sorted and
  * deduplicated, and pruning respects the degree bound.
  */
object GraphAnnProperties extends Properties("graft.operators.GraphAnnOps") {

  private case class Corpus(ids: Array[Long], vecs: Array[Double], dim: Int)

  private val corpusGen: Gen[Corpus] = for {
    n <- Gen.choose(1, 40)
    dim <- Gen.choose(1, 8)
    comps <- Gen.listOfN(n * dim, Gen.choose(-100.0, 100.0))
  } yield Corpus(Array.tabulate(n)(_.toLong), comps.toArray, dim)

  private val qGen: Gen[List[Double]] = Gen.choose(1, 8).flatMap(d =>
    Gen.listOfN(d, Gen.choose(-100.0, 100.0)))

  private def cos(vecs: Array[Double], dim: Int, node: Int, q: Array[Double]): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
    while (i < dim) {
      val x = vecs(node * dim + i); val y = q(i)
      ab += x * y; aa += x * x; bb += y * y; i += 1
    }
    val d = math.sqrt(aa) * math.sqrt(bb)
    if (d == 0.0) 0.0 else ab / d
  }

  property("unpruned graph (m >= n) + exhaustive beam equals brute force") =
    forAll(corpusGen) { c =>
      // pruning makes adjacency asymmetric (A may drop B while B keeps A),
      // so only the unpruned graph guarantees directed connectivity — the
      // regime the fixture recall test exercises
      val g = GraphAnnOps.buildLocal(0, c.ids, c.vecs, c.dim,
        m = c.ids.length, efConstruction = c.ids.length)
      val q = c.vecs.slice(0, c.dim) // query with the first vector
      val got = GraphAnnOps.searchLocal(g, q, ef = c.ids.length)
      val want = c.ids.indices
        .map(i => (c.ids(i), cos(c.vecs, c.dim, i, q)))
        .sortBy { case (id, s) => (-s, id) }
      got.toSeq == want
    }

  property("returned scores are the true cosines (pruned graphs included)") =
    forAll(corpusGen, Gen.choose(1, 10)) { (c, ef) =>
      val g = GraphAnnOps.buildLocal(0, c.ids, c.vecs, c.dim, m = 3, efConstruction = 6)
      val q = c.vecs.slice((g.n - 1) * c.dim, g.n * c.dim) // last vector as query
      GraphAnnOps.searchLocal(g, q, ef).forall { case (id, s) =>
        s == cos(c.vecs, c.dim, id.toInt, q) // ids are node indices here
      }
    }

  property("results are sorted best-first, deduplicated, and <= ef") =
    forAll(corpusGen, qGen, Gen.choose(1, 10)) { (c, qL, ef) =>
      val q0 = qL.toArray
      val q = if (q0.length == c.dim) q0 else Array.fill(c.dim)(1.0)
      val g = GraphAnnOps.buildLocal(0, c.ids, c.vecs, c.dim, m = 2, efConstruction = 4)
      val got = GraphAnnOps.searchLocal(g, q, ef)
      val sorted = got.sliding(2).forall {
        case Array((i1, s1), (i2, s2)) => s1 > s2 || (s1 == s2 && i1 < i2)
        case _ => true
      }
      got.length <= math.max(ef, 1) &&
        got.map(_._1).distinct.length == got.length && sorted
    }

  property("build respects the degree bound m + 1 and isolates no node") =
    forAll(corpusGen, Gen.choose(1, 6)) { (c, m) =>
      val g = GraphAnnOps.buildLocal(0, c.ids, c.vecs, c.dim, m, efConstruction = 8)
      val degrees = (0 until g.n).map(i => g.adjOff(i + 1) - g.adjOff(i))
      // a node's list prunes to m; it may still gain one edge as the newest
      // node's back-link before that node's own prune runs — bound m + 1
      degrees.forall(_ <= m + 1) && (g.n == 1 || degrees.forall(_ >= 1))
    }

  property("build is deterministic") = forAll(corpusGen) { c =>
    val g1 = GraphAnnOps.buildLocal(0, c.ids, c.vecs, c.dim, 4, 10)
    val g2 = GraphAnnOps.buildLocal(0, c.ids, c.vecs, c.dim, 4, 10)
    g1.adjOff.sameElements(g2.adjOff) && g1.adj.sameElements(g2.adj)
  }

  property("incremental insert: unpruned graph + exhaustive beam still equals brute force") =
    forAll(corpusGen, Gen.choose(0.0, 1.0)) { (c, splitFrac) =>
      // build on a prefix, insertLocal the rest: the incrementally-grown
      // graph must answer exhaustive queries exactly like a full build does
      val n = c.ids.length
      val k = math.max(1, math.min(n, (n * splitFrac).toInt))
      val g0 = GraphAnnOps.buildLocal(0, c.ids.take(k), c.vecs.take(k * c.dim),
        c.dim, m = n, efConstruction = n)
      val g = GraphAnnOps.insertLocal(g0, c.ids.drop(k), c.vecs.drop(k * c.dim),
        m = n, efConstruction = n)
      val q = c.vecs.slice(0, c.dim)
      val got = GraphAnnOps.searchLocal(g, q, ef = n)
      val want = c.ids.indices
        .map(i => (c.ids(i), cos(c.vecs, c.dim, i, q)))
        .sortBy { case (id, s) => (-s, id) }
      got.toSeq == want
    }

  property("incremental insert respects the degree bound m + 1 and isolates no node") =
    forAll(corpusGen, Gen.choose(1, 6)) { (c, m) =>
      val n = c.ids.length
      val k = math.max(1, n / 2)
      val g0 = GraphAnnOps.buildLocal(0, c.ids.take(k), c.vecs.take(k * c.dim),
        c.dim, m, efConstruction = 8)
      val g = GraphAnnOps.insertLocal(g0, c.ids.drop(k), c.vecs.drop(k * c.dim),
        m, efConstruction = 8)
      val degrees = (0 until g.n).map(i => g.adjOff(i + 1) - g.adjOff(i))
      g.n == n && g.ids.sameElements(c.ids) &&
        degrees.forall(_ <= m + 1) && (g.n == 1 || degrees.forall(_ >= 1))
    }

  property("inserting zero nodes is the identity") = forAll(corpusGen) { c =>
    val g0 = GraphAnnOps.buildLocal(0, c.ids, c.vecs, c.dim, 4, 10)
    val g = GraphAnnOps.insertLocal(g0, Array.empty[Long], Array.empty[Double], 4, 10)
    g.adjOff.sameElements(g0.adjOff) && g.adj.sameElements(g0.adj) &&
      g.ids.sameElements(g0.ids)
  }

  property("pool-boundary score ties admit the lower node (hand-built CSR)") = {
    // 3 identical vectors: every score ties. Path 0 → 2 → 1 visits the
    // HIGHER node first; at ef = 2 the pool is full when node 1 arrives
    // tied with the floor (1.0, node 2) — the admission rule must let the
    // lower node in (matching eviction's (score desc, node asc) order), so
    // the search returns ids {10, 11}, exactly what the exact scan's
    // tie-break contract would return — not first-visited {10, 12}.
    val g = graft.operators.NswGraph(part = 0, n = 3, dim = 1,
      ids = Array(10L, 11L, 12L), vecs = Array(1.0, 1.0, 1.0),
      adjOff = Array(0, 1, 1, 2), adj = Array(2, 1))
    val got = GraphAnnOps.searchLocal(g, Array(1.0), ef = 2).map(_._1).toSeq
    org.scalacheck.Prop(got == Seq(10L, 11L)) :| s"got $got"
  }
}
