package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.plans.{CosineSimilarity, DotProduct, L2DistanceSq, SortedIntersectSize, TopKScoreId, VecSumCount}

/** SQL surface for the native expressions: install with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) and the vector/set primitives
  * become plain SQL functions —
  * {{{
  *   SELECT vec_cosine(a.embedding, b.embedding) FROM ...
  * }}}
  * This mirrors how the reference exposes its query surface as a declared
  * API (the SDK call signatures, ref `TencentVDB.py:45-49`): the DataFrame
  * builders in [[SparkEntry.queries]] and the SQL names here are the same
  * expressions, so `spark.sql` users get identical plans and codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two array<double> vectors (0.0 on zero norm, null on dim mismatch)"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double> vectors (null on dim mismatch)"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("vec_l2sq"),
      info("vec_l2sq", "vec_l2sq(a, b) - squared L2 distance of two array<double> vectors (null on dim mismatch)"),
      (children: Seq[Expression]) => L2DistanceSq(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_size"),
      info("sorted_intersect_size", "sorted_intersect_size(a, b) - |A ∩ B| of two sorted distinct array<string> sets"),
      (children: Seq[Expression]) => SortedIntersectSize(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("topk_score_id"),
      info("topk_score_id", "topk_score_id(score, id, k) - aggregate: k best (score DESC, id ASC) pairs as array<struct<vec_id, score>>"),
      (children: Seq[Expression]) => {
        if (children.size != 3) throw new IllegalArgumentException(
          s"topk_score_id expects 3 arguments (score, id, k), got ${children.size}")
        val k = children(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"topk_score_id: k must be an integer literal, got $other")
        }
        TopKScoreId(children(0), children(1), k)
      }))
    ext.injectFunction((FunctionIdentifier("vec_sum_count"),
      info("vec_sum_count", "vec_sum_count(v) - aggregate: element-wise sums + row count of array<double> vectors as struct<sums, n> (centroid = sums[i]/n)"),
      (children: Seq[Expression]) => VecSumCount(children(0))))
  }
}
