package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.DedupOps

/** ScalaCheck recall law for the asymmetric containment prefix filter
  * ([[DedupOps.containmentPairsOn]]): the prefix-filtered candidate plan
  * must return EXACTLY the brute-force directed pairs at containment ≥ τ
  * over word 3-gram shingles — for arbitrary corpora and thresholds, not
  * just the planted fixtures. The pigeonhole exactness argument lives in
  * the operator's scaladoc; this pins it. The generator produces a
  * small-vocabulary corpus (heavy shingle sharing — the hard case for a
  * candidate filter) with planted prefix-crops and concatenations so
  * true containment pairs exist at every threshold.
  */
object ContainmentProperties extends Properties("graft.operators.ContainmentPairs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val word: Gen[String] = Gen.oneOf("u", "v", "w", "x", "y", "z")

  private val corpusGen: Gen[(List[String], Double)] = for {
    nBase <- Gen.choose(2, 6)
    base <- Gen.listOfN(nBase, Gen.choose(3, 12).flatMap(Gen.listOfN(_, word)))
    nDerived <- Gen.choose(1, 4)
    derived <- Gen.listOfN(nDerived, for {
      i <- Gen.choose(0, nBase - 1)
      crop <- Gen.oneOf(true, false)
      extra <- Gen.choose(1, 6).flatMap(Gen.listOfN(_, word))
    } yield if (crop) base(i).take(math.max(3, base(i).length - 2))
      else base(i) ++ extra)
    tau <- Gen.oneOf(0.4, 0.6, 0.8, 1.0)
  } yield ((base ++ derived).map(_.mkString(" ")), tau)

  private def shingles(text: String): Set[String] =
    text.split(" ").sliding(3).filter(_.length == 3)
      .map(_.mkString("\u001E")).toSet // the engine's RS joiner

  property("prefix-filtered plan ≡ brute-force directed containment") =
    forAll(corpusGen) { case (texts, tau) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = DedupOps.containmentPairsOn(docs, tau).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sh = texts.zipWithIndex
        .map { case (t, i) => i.toLong -> shingles(t) }
        .filter(_._2.nonEmpty)
      val want = (for {
        (a, sa) <- sh; (b, sb) <- sh
        if a != b && sa.count(sb.contains).toDouble / sa.size >= tau
      } yield (a, b)).toSet
      if (got != want) {
        println(s"MISMATCH tau=$tau texts=$texts got=$got want=$want")
        false
      } else true
    }
}
