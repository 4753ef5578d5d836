package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the trainQualityLr size dispatch (r19 optimization round): the
  * bounded-sample driver-side GD loop must reproduce the distributed
  * broadcast-weights rounds BIT-FOR-BIT — same weights, same intercept,
  * same early-stop round (implied by the weights) — because the local
  * path replicates the exact accumulation order of the one-partition
  * distributed fold. `localMaxRows = 0` forces the distributed path on
  * the same input.
  */
class LrDispatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("local GD dispatch == distributed broadcast-weights rounds, bit-for-bit") {
    import graft.operators.{MlOps, TextAnalysisOps}
    import graft.sources.Tables
    val dir = TestSpark.Sf
    val docs = Tables.documents(spark, dir)
    val labeled = TextAnalysisOps.qualityScore(spark, dir)
      .select(col("doc_id"), (col("quality") >= 0.5).cast("double").as("label"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .filter(col("doc_id") % 2 === 0)
    val (wL, bL) = MlOps.trainQualityLr(labeled, dim = 64, iters = 8)
    val (wD, bD) = MlOps.trainQualityLr(labeled, dim = 64, iters = 8,
      localMaxRows = 0L)
    assert(bL == bD, s"intercepts diverged: $bL vs $bD")
    assert(wL.toSeq == wD.toSeq,
      s"weights diverged at ${wL.toSeq.zip(wD.toSeq).indexWhere(p => p._1 != p._2)}")
  }
}
