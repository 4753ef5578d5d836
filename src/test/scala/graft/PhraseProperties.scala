package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.RetrievalOps

/** Phrase / proximity adjacency vs an independent chain-enumeration
  * reference on RANDOMIZED corpora: the engine's n−1 join fold must
  * count exactly the ordered chains (each term within `1 + slop`
  * positions of the previous) and report the earliest chain start —
  * for any corpus, any phrase length, any slop, including repeated
  * terms and overlapping matches. This is the cross-check that
  * witnesses the fold's anchoring (previous term, NOT the start
  * position) and the exact-phrase degeneration at slop 0.
  */
object PhraseProperties extends Properties("graft.operators.Phrase") {

  // a Spark round-trip per sample: keep the sample count modest, the
  // generator dense (tiny vocabulary → many repeats and overlaps)
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d")

  private val gen: Gen[(List[List[String]], List[String], Int)] = for {
    nDocs <- Gen.choose(1, 6)
    docs <- Gen.listOfN(nDocs,
      Gen.choose(2, 24).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab))))
    phraseLen <- Gen.choose(2, 3)
    phrase <- Gen.listOfN(phraseLen, Gen.oneOf(vocab))
    slop <- Gen.choose(0, 2)
  } yield (docs, phrase, slop)

  /** Count ordered chains and the earliest start by brute enumeration. */
  private def refChains(tokens: List[String], terms: List[String],
      slop: Int): Option[(Long, Long)] = {
    def continuations(cur: Int, rest: List[String]): Long = rest match {
      case Nil => 1L
      case t :: more =>
        (cur + 1 to math.min(cur + 1 + slop, tokens.length - 1))
          .filter(tokens(_) == t)
          .map(continuations(_, more)).sum
    }
    val starts = tokens.indices.filter(tokens(_) == terms.head)
      .map(s => (s, continuations(s, terms.tail)))
      .filter(_._2 > 0)
    if (starts.isEmpty) None
    else Some((starts.map(_._2).sum, starts.map(_._1).min.toLong))
  }

  property("proximitySearchOn == chain enumeration (slop 0 == phraseSearchOn)") =
    forAll(gen) { case (docs, phrase, slop) =>
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = RetrievalOps.proximitySearchOn(df, phrase.mkString(" "), slop)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val want = docs.zipWithIndex.flatMap { case (ts, i) =>
        refChains(ts, phrase, slop).map(i.toLong -> _)
      }.toMap
      val phraseAgrees = slop != 0 || {
        val exact = RetrievalOps.phraseSearchOn(df, phrase.mkString(" "))
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        exact == want
      }
      got == want && phraseAgrees
    }
}
