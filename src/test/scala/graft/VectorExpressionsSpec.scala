package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{CosineSimilarity, DotProduct, L2DistanceSq}
import graft.functions.VectorFunctions._

/** Codegen vs interpreted parity + edge cases for the native vector
  * expressions (SURVEY §5.2-3): the DataFrame path exercises whole-stage
  * codegen (`doGenCode`), direct `.eval()` exercises the interpreted
  * `nullSafeEval` — both must agree bitwise on every input class.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val arrT = ArrayType(DoubleType, containsNull = false)

  private def interpreted(f: (Literal, Literal) => Any, a: Seq[Double], b: Seq[Double]): Any =
    f(Literal.create(a, arrT), Literal.create(b, arrT))

  private def viaCodegen(fn: String, a: Seq[Double], b: Seq[Double]): Any = {
    val df = Seq((a, b)).toDF("a", "b")
    val c = fn match {
      case "dot" => dotFast(col("a"), col("b"))
      case "cos" => cosineFast(col("a"), col("b"))
      case "l2"  => l2DistanceSqFast(col("a"), col("b"))
    }
    df.select(c).collect()(0) match {
      case Row(null) => null
      case Row(v: Double) => v
    }
  }

  private val cases: Seq[(Seq[Double], Seq[Double])] = {
    val rnd = new scala.util.Random(7L)
    val randomPairs = (1 to 25).map { _ =>
      val n = 1 + rnd.nextInt(96)
      (Seq.fill(n)(rnd.nextGaussian()), Seq.fill(n)(rnd.nextGaussian()))
    }
    randomPairs ++ Seq(
      (Seq(0.0, 0.0, 0.0), Seq(1.0, 2.0, 3.0)), // zero norm
      (Seq.empty[Double], Seq.empty[Double]),    // empty
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),      // length mismatch
    )
  }

  test("codegen and interpreted paths agree bitwise on all input classes") {
    cases.foreach { case (a, b) =>
      assert(viaCodegen("dot", a, b) ===
        interpreted((x, y) => DotProduct(x, y).eval(null), a, b))
      assert(viaCodegen("cos", a, b) ===
        interpreted((x, y) => CosineSimilarity(x, y).eval(null), a, b))
      assert(viaCodegen("l2", a, b) ===
        interpreted((x, y) => L2DistanceSq(x, y).eval(null), a, b))
    }
  }

  test("length mismatch yields null, not a truncated score") {
    assert(viaCodegen("dot", Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)) === null)
    assert(viaCodegen("cos", Seq(1.0), Seq(1.0, 1.0)) === null)
    assert(viaCodegen("l2", Seq(1.0, 2.0, 3.0), Seq(1.0)) === null)
  }

  test("zero-norm and empty inputs give cosine 0.0 (total-order safe, no NaN)") {
    assert(viaCodegen("cos", Seq(0.0, 0.0), Seq(1.0, 2.0)) === 0.0)
    assert(viaCodegen("cos", Seq.empty[Double], Seq.empty[Double]) === 0.0)
  }

  test("cosine is bounded in [-1, 1] and cosine(v, v) == 1 (property sweep)") {
    val rnd = new scala.util.Random(99L)
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val a = Seq.fill(n)(rnd.nextGaussian() * (1 + rnd.nextInt(1000)))
      val b = Seq.fill(n)(rnd.nextGaussian() * (1 + rnd.nextInt(1000)))
      val c = interpreted((x, y) => CosineSimilarity(x, y).eval(null), a, b)
        .asInstanceOf[Double]
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      val self = interpreted((x, y) => CosineSimilarity(x, y).eval(null), a, a)
        .asInstanceOf[Double]
      assert(math.abs(self - 1.0) < 1e-9)
    }
  }

  test("hyperplane band keys: codegen and interpreted paths agree; keys bounded") {
    import graft.plans.HyperplaneBandKeys
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol}
    val rnd = new scala.util.Random(41L)
    val bands = 6; val rows = 3; val dim = 16
    val planes = Seq.fill(bands * rows * dim)(rnd.nextGaussian())
    val vecs = (1 to 20).map(_ => Seq.fill(dim)(rnd.nextGaussian()))
    val viaCodegenKeys = vecs.map { v =>
      Seq(v).toDF("v")
        .select(toCol(HyperplaneBandKeys(
          Literal.create(v, arrT), planes, bands, rows)).as("k"))
        .collect()(0).getSeq[Long](0)
    }
    val viaEval = vecs.map { v =>
      HyperplaneBandKeys(Literal.create(v, arrT), planes, bands, rows)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    }
    assert(viaCodegenKeys === viaEval)
    viaEval.foreach { keys =>
      assert(keys.length === bands)
      keys.foreach(k => assert(k >= 0L && k < (1L << rows)))
    }
    // a dim mismatch is a config bug: loud failure, not a silent signature
    val bad = intercept[Exception] {
      HyperplaneBandKeys(Literal.create(Seq(1.0, 2.0), arrT), planes, bands, rows).eval(null)
    }
    assert(bad.getMessage.contains("dim"))
  }

  test("nearest-centroid assignment matches brute-force argmax cosine") {
    import graft.plans.NearestCentroid
    val rnd = new scala.util.Random(17L)
    val k = 5; val dim = 12
    val cents = Seq.fill(k * dim)(rnd.nextGaussian())
    def cosRef(v: Seq[Double], c: Int): Double = {
      val cv = cents.slice(c * dim, (c + 1) * dim)
      val ab = v.zip(cv).map { case (x, y) => x * y }.sum
      val d = math.sqrt(cv.map(x => x * x).sum) // row norm constant: omitted, argmax unchanged
      if (d == 0.0) 0.0 else ab / d
    }
    (1 to 50).foreach { _ =>
      val v = Seq.fill(dim)(rnd.nextGaussian())
      val got = NearestCentroid(Literal.create(v, arrT), cents, k)
        .eval(null).asInstanceOf[Int]
      val want = (0 until k).maxBy(c => (cosRef(v, c), -c))
      assert(got === want)
    }
    // codegen path agrees with the interpreted one
    val v0 = Seq.fill(dim)(rnd.nextGaussian())
    val viaDf = Seq(v0).toDF("v")
      .select(org.apache.spark.sql.graftbridge.ColumnBridge.column(
        NearestCentroid(Literal.create(v0, arrT), cents, k)).as("c"))
      .collect()(0).getInt(0)
    assert(viaDf === NearestCentroid(Literal.create(v0, arrT), cents, k).eval(null))
  }

  test("near-centroid multi-assignment: eps=0 equals NearestCentroid; boundary vectors get both cells") {
    import graft.plans.{NearCentroidCells, NearestCentroid}
    val rnd = new scala.util.Random(23L)
    val k = 5; val dim = 12
    val cents = Seq.fill(k * dim)(rnd.nextGaussian())
    def cells(v: Seq[Double], eps: Double): Seq[Int] =
      NearCentroidCells(Literal.create(v, arrT), cents, k, eps).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
    def cosRef(v: Seq[Double], c: Int): Double = {
      val cv = cents.slice(c * dim, (c + 1) * dim)
      val ab = v.zip(cv).map { case (x, y) => x * y }.sum
      val d = math.sqrt(cv.map(x => x * x).sum)
      if (d == 0.0) 0.0 else ab / d
    }
    (1 to 50).foreach { _ =>
      val v = Seq.fill(dim)(rnd.nextGaussian())
      val nearest = NearestCentroid(Literal.create(v, arrT), cents, k)
        .eval(null).asInstanceOf[Int]
      // eps = 0 degenerates to exactly the single-assignment cell
      assert(cells(v, 0.0) === Seq(nearest))
      // a huge eps always yields [best, second] matching brute force
      val scored = (0 until k).map(c => (cosRef(v, c), -c)).sorted.reverse
      val want = Seq(-scored(0)._2, -scored(1)._2)
      assert(cells(v, 1e9) === want)
      // margin rule: both cells iff best - second < eps
      val margin = scored(0)._1 - scored(1)._1
      assert(cells(v, margin * 0.999).length === 1)
      assert(cells(v, margin * 1.001).length === 2)
    }
    // codegen path agrees with the interpreted one
    val v0 = Seq.fill(dim)(rnd.nextGaussian())
    val viaDf = Seq(v0).toDF("v")
      .select(org.apache.spark.sql.graftbridge.ColumnBridge.column(
        NearCentroidCells(Literal.create(v0, arrT), cents, k, 0.02)).as("c"))
      .collect()(0).getSeq[Int](0)
    assert(viaDf === cells(v0, 0.02))
  }

  test("HOF formulation and codegen expression agree after rounding") {
    val rnd = new scala.util.Random(3L)
    val a = Seq.fill(64)(rnd.nextGaussian())
    val b = Seq.fill(64)(rnd.nextGaussian())
    val df = Seq((a, b)).toDF("a", "b")
    val Row(fast: Double, hof: Double) = df.select(
      round(cosineFast(col("a"), col("b")), 9),
      round(cosine(col("a"), col("b")), 9)).collect()(0)
    assert(fast === hof)
  }
}
