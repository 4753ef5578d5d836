package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck recall law for the pigeonhole-blocked hamming join
  * (SURVEY §2.D dedup family): [[graft.operators.DedupOps.hammingNearPairs]]
  * must return EXACTLY the brute-force all-pairs at hamming ≤ maxHamming —
  * for arbitrary fingerprint sets, not just the planted-copy fixtures. The
  * generator plants identical-fingerprint clusters and near-copies (small
  * random bit flips of shared bases) so both expansion paths — same-fp
  * hamming-0 members and cross-fp blocked candidates — carry real pairs.
  * Each case is a full Spark job, so the suite runs fewer, larger cases.
  */
object HammingProperties extends Properties("graft.operators.HammingNearPairs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  private def flipBits(fp: Long, positions: Seq[Int]): Long =
    positions.foldLeft(fp)((f, p) => f ^ (1L << p))

  /** (id, fp) sets: a few random base fingerprints, each spawning exact
    * copies and ≤6-bit-flip near-copies, plus isolated random fps.
    */
  private val fpSet: Gen[List[(Long, Long)]] = for {
    nBases <- Gen.choose(1, 4)
    bases <- Gen.listOfN(nBases, Gen.long)
    members <- Gen.listOfN(nBases, Gen.choose(1, 8))
    flips <- Gen.listOfN(40, Gen.listOfN(6, Gen.choose(0, 63)))
    nFlips <- Gen.listOfN(40, Gen.choose(0, 6))
    nLoners <- Gen.choose(0, 6)
    loners <- Gen.listOfN(nLoners, Gen.long)
  } yield {
    val clustered = bases.zip(members).zipWithIndex.flatMap {
      case ((base, m), bi) =>
        (0 until m).map { j =>
          val k = bi * 8 + j
          flipBits(base, flips(k % 40).take(nFlips(k % 40)))
        }
    }
    (clustered ++ loners).zipWithIndex.map { case (fp, i) => (i.toLong, fp) }
  }

  private val maxHammingGen = Gen.oneOf(1, 3, 6, 8)

  property("blocked join ≡ brute-force all-pairs at hamming ≤ h") =
    forAll(fpSet, maxHammingGen) { (rows, maxHamming) =>
      import spark.implicits._
      val got = graft.operators.DedupOps
        .hammingNearPairs(rows.toDF("id", "fp"), maxHamming)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val expect = (for {
        (aId, aFp) <- rows
        (bId, bFp) <- rows
        if aId != bId && java.lang.Long.bitCount(aFp ^ bFp) <= maxHamming
      } yield (aId, bId, aFp, bFp)).toSet
      got == expect
    }

  property("occupancy cap never drops same-fp (hamming-0) pairs") =
    forAll(Gen.choose(3, 12), Gen.long) { (c, base) =>
      import spark.implicits._
      // two distinct fps 1 bit apart: every shared (chunk, cval) bucket
      // holds BOTH distinct fps, so cap=1 fires and kills the cross-fp
      // candidate — but the exact duplicates of each fp must all survive
      // (they bypass the blocked join entirely)
      val rows = (0 until c).map(i => (i.toLong, base)) ++
        (0 until c).map(i => ((100 + i).toLong, base ^ 1L))
      val got = graft.operators.DedupOps
        .hammingNearPairs(rows.toDF("id", "fp"), 3, maxBucket = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sameA = (for {
        a <- 0 until c; b <- 0 until c; if a != b
      } yield (a.toLong, b.toLong)).toSet
      val sameB = (for {
        a <- 0 until c; b <- 0 until c; if a != b
      } yield ((100 + a).toLong, (100 + b).toLong)).toSet
      // capped run must still contain every same-fp pair, and nothing
      // outside the uncapped truth (cross pairs here are hamming-1, legal)
      val truth = (for {
        (aId, aFp) <- rows; (bId, bFp) <- rows
        if aId != bId && java.lang.Long.bitCount(aFp ^ bFp) <= 3
      } yield (aId, bId)).toSet
      (sameA ++ sameB).subsetOf(got) && got.subsetOf(truth)
    }
}
