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

  property("relative occupancy cap: fires on a degenerate near-identical cluster, never drops same-fp pairs") =
    forAll(Gen.choose(3, 8), Gen.long) { (c, base0) =>
      import spark.implicits._
      val base = base0 | 1024L // keep the low 10 bits from cancelling a flip
      // c exact copies of base + 1000 near-identical DISTINCT variants
      // (low-bit flips → only chunk 0 differs, so chunks 1-3 each hold one
      // 1001-member bucket) + 50 scattered fps. The variant buckets exceed
      // both the absolute floor (100) and 16× the chunk average (~20), so
      // the cap FIRES and the cross-fp variant pairs drop — but every
      // hamming-0 pair of the exact copies must survive (same-fp pairs
      // bypass the blocked join), and nothing outside the truth appears.
      val variants = (1 to 1000).map(i => ((10000 + i).toLong, base ^ i.toLong))
      val scattered = (0 until 50).map { i =>
        ((50000 + i).toLong, base ^ (1L << (16 + (i % 40))) ^ (1L << (30 + (i % 30))))
      }
      val rows = (0 until c).map(i => (i.toLong, base)) ++ variants ++ scattered
      val got = graft.operators.DedupOps
        .hammingNearPairs(rows.toDF("id", "fp"), 3, maxBucket = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val same = (for {
        a <- 0 until c; b <- 0 until c; if a != b
      } yield (a.toLong, b.toLong)).toSet
      val truth = (for {
        (aId, aFp) <- rows; (bId, bFp) <- rows
        if aId != bId && java.lang.Long.bitCount(aFp ^ bFp) <= 3
      } yield (aId, bId)).toSet
      same.subsetOf(got) && got.subsetOf(truth) && (truth -- got).nonEmpty
    }

  property("relative cap never fires on healthy uniform volume above the absolute floor") =
    forAll(Gen.choose(1L, Long.MaxValue)) { seed =>
      import spark.implicits._
      // 600 uniform random fps at maxHamming=8 (128-value chunks): every
      // bucket holds ~5 fps — far above an absolute cap of 2 but well
      // inside 16× the chunk average, so NOTHING drops and recall stays
      // exact. (The pre-fix absolute rule dropped every bucket here and
      // silently returned only exact duplicates.)
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 600).map(i => (i.toLong, rnd.nextLong()))
      val got = graft.operators.DedupOps
        .hammingNearPairs(rows.toDF("id", "fp"), 8, maxBucket = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = (for {
        (aId, aFp) <- rows; (bId, bFp) <- rows
        if aId != bId && java.lang.Long.bitCount(aFp ^ bFp) <= 8
      } yield (aId, bId)).toSet
      got == truth
    }
}
