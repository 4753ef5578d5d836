package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for [[graft.operators.TextOps.canonicalizeUrl]]:
  * idempotence (a canonical form is its own canonical form — the property
  * that makes the streaming URL store stable under re-canonicalization)
  * and noise-invariance (the five modeled noise classes never change the
  * canonical identity). Each case evaluates through a real Spark plan so
  * the codegen path is what's tested.
  */
object UrlProperties extends Properties("graft.operators.CanonicalizeUrl") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = TestSpark.spark

  private def canon(us: Seq[String]): Seq[String] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    us.toDF("u").select(graft.operators.TextOps.canonicalizeUrl(col("u")))
      .collect().map(_.getString(0)).toSeq
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(8))
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "Https")
    hostWords <- Gen.listOfN(2, word)
    host = hostWords.mkString(".") + ".com"
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOfN(2, word)
    nParams <- Gen.choose(0, 4)
    keys <- Gen.listOfN(nParams, Gen.oneOf("a", "B", "utm_source", "ref", "gclid", "x1"))
    vals <- Gen.listOfN(nParams, word)
    frag <- Gen.oneOf("", "#top", "#Sec-2")
  } yield {
    val q = keys.zip(vals).map { case (k, v) => s"$k=$v" }.mkString("&")
    s"$scheme://$host$port/${segs.mkString("/")}" +
      (if (q.nonEmpty) s"?$q" else "") + frag
  }

  property("canonicalization is idempotent") = forAll(Gen.listOfN(8, urlGen)) { us =>
    val once = canon(us)
    canon(once) == once
  }

  property("noise classes never change the canonical identity") =
    forAll(urlGen) { u =>
      val noFrag = u.replaceAll("#.*$", "")
      val qSep = if (noFrag.contains("?")) "&" else "?"
      val variants = Seq(
        u.replaceAll("#.*$", "") + "#other-fragment",
        noFrag + qSep + "utm_campaign=z",
        { // uppercase the authority only
          val m = "^([^/?#]*//[^/?#]*)".r.findFirstIn(noFrag).getOrElse("")
          m.toUpperCase + noFrag.substring(m.length)
        })
      val all = canon(u +: variants)
      all.tail.forall(_ == all.head)
    }
}
