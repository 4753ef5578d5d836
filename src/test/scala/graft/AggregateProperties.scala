package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.plans.{TopKScoreId, VecSumCount}

/** ScalaCheck laws for the typed imperative aggregates: the update/merge
  * contract must equal the global model for EVERY partitioning of the
  * input — this is exactly what Spark's partial aggregation assumes and
  * what a silent merge bug would break only at cluster scale.
  */
object AggregateProperties extends Properties("graft.plans.Aggregates") {

  private def row(score: Double, id: Long): InternalRow =
    new GenericInternalRow(Array[Any](score, id))

  private val rowsAndSplit: Gen[(List[(Double, Long)], Int, Int)] = for {
    n <- Gen.choose(0, 60)
    scores <- Gen.listOfN(n, Gen.choose(-100.0, 100.0).map(s => math.rint(s * 64) / 64))
    ids <- Gen.listOfN(n, Gen.choose(0L, 30L)) // collisions on purpose
    k <- Gen.choose(1, 8)
    parts <- Gen.choose(1, 6)
  } yield (scores.zip(ids), k, parts)

  property("topk_score_id = global sort-take under any partitioning") =
    forAll(rowsAndSplit) { case (rows, k, parts) =>
      val agg = TopKScoreId(
        BoundReference(0, DoubleType, nullable = false),
        BoundReference(1, LongType, nullable = false), k)
      val partitions = rows.zipWithIndex.groupMap(_._2 % parts)(_._1)
      val buffers = (0 until parts).map { p =>
        partitions.getOrElse(p, Nil).foldLeft(agg.createAggregationBuffer()) {
          (b, r) => agg.update(b, row(r._1, r._2))
        }
      }
      val merged = buffers.reduceLeft(agg.merge)
      val got = agg.eval(merged).asInstanceOf[ArrayData].toArray[InternalRow](
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id", LongType),
          org.apache.spark.sql.types.StructField("score", DoubleType))))
        .map(r => (r.getDouble(1), r.getLong(0))).toSeq
      val want = rows.sortBy { case (s, i) => (-s, i) }.take(k)
      got == want
    }

  private val vecsAndSplit: Gen[(List[List[Double]], Int)] = for {
    dim <- Gen.choose(1, 16)
    n <- Gen.choose(0, 40)
    vecs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-8.0, 8.0).map(x => math.rint(x * 16) / 16)))
    parts <- Gen.choose(1, 5)
  } yield (vecs, parts)

  property("vec_sum_count sums and count are partitioning-invariant") =
    forAll(vecsAndSplit) { case (vecs, parts) =>
      val agg = VecSumCount(BoundReference(0, ArrayType(DoubleType), nullable = true))
      def vrow(v: List[Double]): InternalRow =
        new GenericInternalRow(Array[Any](new GenericArrayData(v.toArray)))
      val partitions = vecs.zipWithIndex.groupMap(_._2 % parts)(_._1)
      val buffers = (0 until parts).map { p =>
        partitions.getOrElse(p, Nil).foldLeft(agg.createAggregationBuffer()) {
          (b, v) => agg.update(b, vrow(v))
        }
      }
      val merged = buffers.reduceLeft(agg.merge)
      val out = agg.eval(merged)
      if (vecs.isEmpty) out == null
      else {
        val struct = out.asInstanceOf[InternalRow]
        val sums = struct.getArray(0).toDoubleArray().toSeq
        val n = struct.getLong(1)
        // dyadic-rational components: float addition is exact, so the sums
        // match the model identically regardless of partitioning
        val want = vecs.transpose.map(_.sum)
        n == vecs.length && sums == want
      }
    }

  private val termsAndSplit: Gen[(List[String], Int, Int)] = for {
    n <- Gen.choose(0, 300)
    // skewed draw over a small alphabet so heavy hitters exist
    terms <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.const("hot"), 5 -> Gen.const("warm"),
      3 -> Gen.oneOf("a", "b", "c"),
      1 -> Gen.choose(0, 40).map(i => s"t$i")))
    m <- Gen.choose(2, 12)
    parts <- Gen.choose(1, 6)
  } yield (terms, m, parts)

  private val ssOut = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("term",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("count", LongType),
    org.apache.spark.sql.types.StructField("err", LongType)))

  property("space_saving: overestimates bounded by err; saturated heavy hitters survive; exact when vocab fits") =
    forAll(termsAndSplit) { case (terms, m, parts) =>
      val agg = graft.plans.SpaceSavingTopK(
        BoundReference(0, org.apache.spark.sql.types.StringType, nullable = false), m)
      def trow(t: String): InternalRow = new GenericInternalRow(
        Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(t)))
      val partitions = terms.zipWithIndex.groupMap(_._2 % parts)(_._1)
      val buffers = (0 until parts).map { p =>
        partitions.getOrElse(p, Nil).foldLeft(agg.createAggregationBuffer()) {
          (b, t) => agg.update(b, trow(t))
        }
      }
      val merged = buffers.reduceLeft(agg.merge)
      val got = agg.eval(merged).asInstanceOf[ArrayData]
        .toArray[InternalRow](ssOut)
        .map(r => (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2)))
      val truth = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // (1) SpaceSaving bounds: true ∈ [count − err, count]
      val bounds = got.forall { case (t, c, e) =>
        val tr = truth.getOrElse(t, 0L); tr <= c && c - e <= tr
      }
      // (2) per-partition guarantee, preserved by the floor-merge: any
      // term with true count > parts·(n_p/m) per partition survives; the
      // conservative global form — true > n/m·parts... use the safe bound:
      // a term with true count > Σ_p n_p/m (= n/m) survives when parts = 1
      val heavySurvive = if (parts == 1) {
        truth.filter(_._2 > terms.length.toLong / m)
          .keys.forall(t => got.exists(_._1 == t))
      } else true
      // (3) exactness when every buffer held every key it saw and the
      // merged vocabulary fits: no eviction, no truncation → exact counts
      val exact = if (truth.size <= m &&
          partitions.values.forall(p => p.distinct.size <= m)) {
        got.forall { case (t, c, e) => e == 0L && truth(t) == c } &&
          got.length == truth.size
      } else true
      bounds && heavySurvive && exact
    }
}
