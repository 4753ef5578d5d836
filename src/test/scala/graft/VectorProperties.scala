package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.plans.{CosineSimilarity, DotProduct, L2DistanceSq}

/** ScalaCheck algebraic properties of the native vector expressions
  * (SURVEY §5.3) — run by sbt's ScalaCheck framework directly. These hold
  * for ALL inputs, not just fixtures: bounds, symmetry, self-similarity,
  * and the zero/identity edge laws.
  */
object VectorProperties extends Properties("graft.plans.VectorExpressions") {

  private val arrT = ArrayType(DoubleType, containsNull = false)
  private def evalExpr(f: (Literal, Literal) => Any, a: Seq[Double], b: Seq[Double]): Any =
    f(Literal.create(a, arrT), Literal.create(b, arrT))

  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    evalExpr((x, y) => CosineSimilarity(x, y).eval(null), a, b).asInstanceOf[Double]
  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    evalExpr((x, y) => DotProduct(x, y).eval(null), a, b).asInstanceOf[Double]
  private def l2sq(a: Seq[Double], b: Seq[Double]): Double =
    evalExpr((x, y) => L2DistanceSq(x, y).eval(null), a, b).asInstanceOf[Double]

  private val dim = Gen.choose(1, 128)
  private val component = Gen.choose(-1e6, 1e6)
  private val vecPair: Gen[(List[Double], List[Double])] = for {
    n <- dim
    a <- Gen.listOfN(n, component)
    b <- Gen.listOfN(n, component)
  } yield (a, b)

  property("cosine is bounded in [-1, 1]") = forAll(vecPair) { case (a, b) =>
    val c = cos(a, b)
    c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9
  }

  property("cosine(v, v) = 1 for nonzero v") = forAll(dim.flatMap(Gen.listOfN(_, component))) { v =>
    v.forall(_ == 0.0) || math.abs(cos(v, v) - 1.0) < 1e-9
  }

  property("cosine and dot are symmetric") = forAll(vecPair) { case (a, b) =>
    cos(a, b) == cos(b, a) && dot(a, b) == dot(b, a)
  }

  property("l2 distance is non-negative and zero on identity") = forAll(vecPair) { case (a, b) =>
    l2sq(a, b) >= 0.0 && l2sq(a, a) == 0.0
  }

  property("dot expands l2: |a-b|^2 = a·a + b·b - 2a·b (within ulps)") =
    forAll(vecPair) { case (a, b) =>
      val lhs = l2sq(a, b)
      val rhs = dot(a, a) + dot(b, b) - 2.0 * dot(a, b)
      math.abs(lhs - rhs) <= 1e-6 * math.max(1.0, math.abs(lhs))
    }

  property("dimension mismatch is null for all three") = forAll(vecPair) { case (a, b) =>
    val shorter = a.dropRight(1)
    a.isEmpty || (
      evalExpr((x, y) => CosineSimilarity(x, y).eval(null), shorter, b) == null &&
      evalExpr((x, y) => DotProduct(x, y).eval(null), shorter, b) == null &&
      evalExpr((x, y) => L2DistanceSq(x, y).eval(null), shorter, b) == null)
  }

  // ---- SortedIntersectSize vs the Scala Set model ----

  private val strArrT = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)
  private val tokenGen = Gen.choose(0, 40).map(i => f"w$i%02d")
  private val tokenSets: Gen[(List[String], List[String])] = for {
    a <- Gen.listOf(tokenGen)
    b <- Gen.listOf(tokenGen)
  } yield (a.distinct.sorted, b.distinct.sorted)

  property("sorted_intersect_size equals Set.intersect.size") =
    forAll(tokenSets) { case (a, b) =>
      import org.apache.spark.unsafe.types.UTF8String
      val lit = (s: List[String]) =>
        Literal.create(s.map(UTF8String.fromString), strArrT)
      graft.plans.SortedIntersectSize(lit(a), lit(b)).eval(null) ==
        a.toSet.intersect(b.toSet).size
    }

  property("sorted_probe_count equals the merge (and the Set model)") =
    forAll(tokenSets) { case (a, b) =>
      import org.apache.spark.unsafe.types.UTF8String
      val lit = (s: List[String]) =>
        Literal.create(s.map(UTF8String.fromString), strArrT)
      val expect = a.toSet.intersect(b.toSet).size
      graft.plans.SortedProbeCount(lit(a), lit(b)).eval(null) == expect &&
        graft.plans.SortedProbeCount(lit(b), lit(a)).eval(null) == expect
    }

  // ---- PQ codes / ADC vs the arithmetic model, incl. the signed-byte
  // boundary (k > 127: code 200 stores as byte -56, must read back via
  // & 0xFF — a sign bug here scores garbage silently) ----

  private val pqCase: Gen[(Int, Int, Int, Long)] = for {
    m <- Gen.choose(1, 4)
    k <- Gen.oneOf(4, 16, 130, 256) // beyond Byte.MaxValue on purpose
    subDim <- Gen.choose(1, 4)
    seed <- Gen.choose(0L, 1000000L)
  } yield (m, k, subDim, seed)

  property("pq codes are the L2-argmin and ADC equals the reconstructed dot") =
    forAll(pqCase) { case (m, k, subDim, seed) =>
      val rnd = new scala.util.Random(seed)
      val dim = m * subDim
      val cb = Array.fill(m * k * subDim)(rnd.nextGaussian())
      val v = Seq.fill(dim)(rnd.nextGaussian())
      val q = Array.fill(dim)(rnd.nextGaussian())
      val codes = graft.plans.PqCodes(Literal.create(v, arrT), cb.toSeq, m, k)
        .eval(null).asInstanceOf[Array[Byte]]
      val expCodes = (0 until m).map { s =>
        (0 until k).minBy { c =>
          (0 until subDim).map { i =>
            val d = v(s * subDim + i) - cb((s * k + c) * subDim + i); d * d
          }.sum
        }
      }
      val codesOk = codes.map(_ & 0xFF).toSeq == expCodes
      val lut = Array.tabulate(m * k) { j =>
        val (s, c) = (j / k, j % k)
        (0 until subDim).map(i => q(s * subDim + i) * cb((s * k + c) * subDim + i)).sum
      }
      val adc = graft.plans.PqAdcDot(
          Literal.create(codes, org.apache.spark.sql.types.BinaryType),
          lut.toSeq, m, k)
        .eval(null).asInstanceOf[Double]
      val reconDot = (0 until dim).map { d =>
        q(d) * cb((d / subDim * k + expCodes(d / subDim)) * subDim + (d % subDim))
      }.sum
      codesOk && math.abs(adc - reconDot) < 1e-9
    }
}

/** ScalaCheck robustness of the pure-JVM MP4 box walk: arbitrary byte
  * garbage — including ftyp-prefixed garbage — must never throw, and
  * anything without the ftyp magic is rejected outright. The parser feeds
  * a mapPartitions task, where one crafted payload throwing would fail
  * the whole partition.
  */
object Mp4ParseProperties extends Properties("graft.operators.MultimodalOps.parseMp4") {
  import org.scalacheck.Gen
  import graft.operators.MultimodalOps.parseMp4

  private val bytes: Gen[Array[Byte]] =
    Gen.choose(0, 256).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  property("never throws on arbitrary bytes") = forAll(bytes) { b =>
    parseMp4(b); true
  }

  property("never throws on ftyp-prefixed garbage") = forAll(bytes) { b =>
    val hdr = java.nio.ByteBuffer.allocate(8)
      .putInt(b.length + 8).put("ftyp".getBytes("US-ASCII")).array()
    parseMp4(hdr ++ b); true
  }

  property("non-ftyp payloads are rejected") = forAll(bytes) { b =>
    val isFtyp = b.length >= 12 && new String(b, 4, 4, "ISO-8859-1") == "ftyp"
    isFtyp || parseMp4(b).isEmpty
  }
}
