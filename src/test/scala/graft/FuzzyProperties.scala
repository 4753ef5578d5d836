package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.RetrievalOps

/** ScalaCheck completeness law for the SymSpell deletion-neighborhood
  * join ([[graft.operators.RetrievalOps.fuzzyVocabMatchOn]]): against an
  * arbitrary small-alphabet vocabulary and query set, the join must
  * return EXACTLY the brute-force `levenshtein ≤ 1` matches with exact
  * occurrence counts. The small alphabet forces heavy variant collisions
  * (the distance-2 coincidences the post-join verify must discard) and
  * adjacent-length words (every edit class: insert, delete, substitute,
  * equal). Each case is a full Spark job, so the suite runs fewer,
  * larger cases.
  */
object FuzzyProperties extends Properties("graft.operators.FuzzyVocabMatch") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val word: Gen[String] = for {
    n <- Gen.choose(1, 6)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val corpusAndQueries: Gen[(List[List[String]], List[String])] = for {
    nDocs <- Gen.choose(1, 6)
    docs <- Gen.listOfN(nDocs, Gen.nonEmptyListOf(word))
    nQ <- Gen.choose(1, 5)
    qs <- Gen.listOfN(nQ, word)
  } yield (docs, qs.distinct)

  /** Plain Levenshtein (no transposition), the same measure as the
    * engines' built-in `levenshtein`.
    */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("neighborhood join ≡ brute-force levenshtein ≤ 1") =
    forAll(corpusAndQueries) { case (docWords, queries) =>
      import spark.implicits._
      val docs = docWords.map(_.mkString(" ")).toDF("text")
      val got = RetrievalOps.fuzzyVocabMatchOn(spark, docs, queries)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val counts = docWords.flatten.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val want = (for {
        q <- queries
        (t, n) <- counts
        if lev(q, t) <= 1
      } yield (q, t, n)).toSet
      got == want
    }
}
