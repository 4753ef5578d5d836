package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.TextAnalysisOps

/** ScalaCheck laws of the BPE trainer/encoder (pure driver functions, no
  * Spark jobs): encoding is LOSSLESS (symbols concatenate back to the
  * word + end marker), merges only ever concatenate adjacent symbols,
  * training is deterministic, and greedy lowest-rank-first application
  * agrees with applying merges in training order on every input —
  * including words never seen in training.
  */
object BpeProperties extends Properties("graft.operators.Bpe") {

  private val wordGen: Gen[String] = for {
    n <- Gen.choose(1, 10)
    cs <- Gen.listOfN(n, Gen.oneOf('a' to 'f'))
  } yield cs.mkString

  private val corpusGen: Gen[Seq[(String, Long)]] = for {
    n <- Gen.choose(1, 12)
    ws <- Gen.listOfN(n, wordGen)
    cs <- Gen.listOfN(n, Gen.choose(1L, 9L))
  } yield ws.zip(cs)

  private def rankOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.map { case (p, i) => p -> i }.toMap

  private def refEncode(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ "</w>"
    merges.foreach { case (l, r) =>
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
          out += l + r; j += 2
        } else { out += syms(j); j += 1 }
      }
      syms = out.result()
    }
    syms
  }

  property("encoding is lossless: symbols concatenate to word + </w>") =
    forAll(corpusGen, wordGen) { (corpus, word) =>
      val merges = TextAnalysisOps.bpeTrainLocal(corpus, 30)
      TextAnalysisOps.bpeEncodeWord(word, rankOf(merges)).mkString == word + "</w>"
    }

  property("greedy lowest-rank-first equals apply-in-training-order on any word") =
    forAll(corpusGen, wordGen) { (corpus, word) =>
      val merges = TextAnalysisOps.bpeTrainLocal(corpus, 30)
      TextAnalysisOps.bpeEncodeWord(word, rankOf(merges)) == refEncode(word, merges)
    }

  property("training is deterministic and merges are built from prior symbols") =
    forAll(corpusGen) { corpus =>
      val m1 = TextAnalysisOps.bpeTrainLocal(corpus, 30)
      val m2 = TextAnalysisOps.bpeTrainLocal(corpus, 30)
      // every merge's parts are single characters, </w>, or the product of
      // an EARLIER merge — ranks are a valid construction order
      val valid = m1.zipWithIndex.forall { case ((l, r), i) =>
        val earlier = m1.take(i).map { case (a, b) => a + b }.toSet
        def ok(s: String) = s.length == 1 || s == "</w>" || earlier.contains(s)
        ok(l) && ok(r)
      }
      m1 == m2 && valid
    }

  property("more merges never increase a training word's token count") =
    forAll(corpusGen) { corpus =>
      corpus.map(_._1).forall { w =>
        val few = TextAnalysisOps.bpeEncodeWord(w,
          rankOf(TextAnalysisOps.bpeTrainLocal(corpus, 5)))
        val many = TextAnalysisOps.bpeEncodeWord(w,
          rankOf(TextAnalysisOps.bpeTrainLocal(corpus, 40)))
        many.length <= few.length
      }
    }
}
