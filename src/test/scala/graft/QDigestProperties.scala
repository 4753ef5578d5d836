package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.plans.QDigest

/** Laws of the q-digest quantile sketch (Shrivastava et al. 2004,
  * [[graft.plans.QDigestQuantiles]]): below-capacity exactness under any
  * merge split, the rank-error bound under forced compression, mass
  * conservation, domain clamping, and the serialization roundtrip the
  * Spark aggregate relies on.
  */
object QDigestProperties extends Properties("graft.plans.QDigest") {

  private val Levels = 10
  private val MaxV = (1L << Levels) - 1

  private def build(values: Seq[Long], capacity: Int): QDigest.Buf = {
    val buf = QDigest.empty()
    values.foreach(v => QDigest.add(buf, Levels, capacity, v))
    buf
  }

  /** Exact lower quantile: smallest v with rank(v) ≥ ⌈p·n⌉ — the oracle's
    * window rule.
    */
  private def exactQuantile(sorted: IndexedSeq[Long], p: Double): Long = {
    val target = math.ceil(p * sorted.length).toLong.max(1L)
    sorted((target - 1).toInt)
  }

  private val probs = Seq(0.1, 0.25, 0.5, 0.9, 0.99, 1.0)
  private val values = Gen.listOfN(120, Gen.choose(0L, MaxV))

  property("exactBelowCapacityAnySplit") =
    forAll(values, Gen.choose(1, 119)) { (vs, cut) =>
      val capacity = 256 // > distinct values: no compression can fire
      val whole = build(vs, capacity)
      val split = QDigest.mergeInto(
        build(vs.take(cut), capacity), build(vs.drop(cut), capacity),
        Levels, capacity)
      val sorted = vs.sorted.toIndexedSeq
      val got = QDigest.quantiles(whole, Levels, probs)
      val want = probs.map(exactQuantile(sorted, _))
      whole.toSeq.sorted == split.toSeq.sorted &&
        !QDigest.hasInternal(whole, Levels) &&
        got == want
    }

  property("rankBoundUnderCompression") =
    forAll(Gen.listOfN(400, Gen.choose(0L, MaxV)),
      Gen.choose(8, 32)) { (vs, capacity) =>
      val buf = build(vs, capacity)
      val n = vs.length
      val eps = Levels.toLong * n / capacity // rank slack: levels·n/capacity
      val sorted = vs.sorted.toIndexedSeq
      QDigest.quantiles(buf, Levels, probs).zip(probs).forall { case (ans, p) =>
        val target = math.ceil(p * n).toLong.max(1L)
        val rankLe = sorted.count(_ <= ans).toLong // true rank of the answer
        val rankLt = sorted.count(_ < ans).toLong
        rankLe >= target - eps && rankLt <= target + eps
      }
    }

  property("compressionConservesMassInsideTheTree") =
    forAll(Gen.listOfN(300, Gen.choose(0L, MaxV))) { vs =>
      val buf = build(vs, 16)
      val total = buf.getOrElse(0L, 0L)
      val nodeMass = buf.iterator.filter(_._1 != 0L).map(_._2).sum
      total == vs.length.toLong && nodeMass == total &&
        buf.keysIterator.filter(_ != 0L)
          .forall(id => id >= 1L && id < (2L << Levels))
    }

  property("outOfDomainValuesClampToTheFences") = {
    val buf = QDigest.empty()
    QDigest.add(buf, Levels, 64, -5L)
    QDigest.add(buf, Levels, 64, MaxV + 100L)
    QDigest.quantiles(buf, Levels, Seq(0.5, 1.0)) == Seq(0L, MaxV)
  }

  property("serializeRoundtrip") =
    forAll(Gen.listOfN(100, Gen.choose(0L, MaxV))) { vs =>
      val agg = graft.plans.QDigestQuantiles(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, org.apache.spark.sql.types.LongType, nullable = false),
        Levels, 32, Seq(0.5))
      val buf = build(vs, 32)
      agg.deserialize(agg.serialize(buf)).toSeq.sorted == buf.toSeq.sorted
    }
}
