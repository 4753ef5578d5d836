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
}
