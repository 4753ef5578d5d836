package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Shared inner loop of [[JlProject]] — one compiled method used by BOTH
  * the interpreted and generated paths.
  *
  * Must reproduce the higher-order-function formulation it replaces
  * bit-for-bit (`transform(sequence(0, outDim-1), k -> round(aggregate(
  * sequence(0, dim-1), 0.0, (acc, j) -> acc + v[j]·sign(k, j)) / √outDim,
  * 6))`):
  *  - sign(k, j) is the parity of ((k·65537 + j + 1) · 2654435761 mod
  *    2147483647) — all positive, so `%` equals Spark's pmod and the
  *    products stay far under Long overflow at any realistic (k, j);
  *  - the fold runs j ascending — IEEE sums are order-identical to the
  *    HOF version;
  *  - rounding matches Spark's Round on DoubleType exactly:
  *    java.math.BigDecimal.valueOf (the DECIMAL-string constructor —
  *    `new BigDecimal(double)` would round the binary expansion and
  *    diverge), setScale(6, HALF_UP).
  */
object JlProjectKernel {
  def project(vec: ArrayData, outDim: Int): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Double](outDim)
    val scale = math.sqrt(outDim.toDouble)
    var k = 0
    while (k < outDim) {
      var s = 0.0
      var j = 0
      while (j < n) {
        val cell = ((k.toLong * 65537L + j + 1L) * 2654435761L) % 2147483647L
        s += vec.getDouble(j) * (if ((cell & 1L) == 0L) 1.0 else -1.0)
        j += 1
      }
      out(k) = java.math.BigDecimal.valueOf(s / scale)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Johnson–Lindenstrauss Rademacher projection as ONE fused expression:
  * outDim·dim multiply-adds per row in JIT-compiled code, the matrix
  * recomputed from integers cell by cell (never materialized, never
  * broadcast).
  *
  * Replaces the nested-HOF formulation in `KnnOps.projectArray` whose
  * `aggregate` lambda evaluates interpreted — at ingest (the
  * createProjectedCollection write path, the hot pass of building the
  * coarse ANN space over a 100 TB corpus) the lambda interpreter overhead
  * dominates the arithmetic. Plan shape is unchanged (zero-exchange
  * map-side projection); output is bit-identical (same sign cells, same
  * ascending-j fold, same BigDecimal.valueOf rounding — ScalaCheck-pinned
  * against the retained HOF form).
  */
case class JlProject(child: Expression, outDim: Int) extends UnaryExpression {
  require(outDim > 0, s"projection dim must be positive, got $outDim")

  override def prettyName: String = "jl_project"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    JlProjectKernel.project(v.asInstanceOf[ArrayData], outDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.JlProjectKernel.project($a, $outDim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
