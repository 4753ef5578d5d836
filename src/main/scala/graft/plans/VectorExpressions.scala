package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The reference's metric is server-side HNSW/COSINE (ref `TencentVDB.py:46`);
  * our v1 replaces the index with an exact scan, which makes the per-row
  * cosine THE inner loop of every knn/similarity operator. Spark's
  * `zip_with`/`aggregate` higher-order functions are CodegenFallback
  * (interpreted, boxing a Lambda per element) — measured 23 µs/pair on the
  * sf0.1 similarity join. These expressions generate a tight primitive
  * `double` loop over `ArrayData` inside whole-stage codegen instead
  * (~50× less per-row overhead), which is what a 100 TB scan needs.
  *
  * Null elements inside the arrays are not expected (embedding fixtures and
  * ingest both produce non-null elements); element null-checks are skipped
  * deliberately to keep the loop branch-free.
  *
  * A DIMENSION MISMATCH between the two arrays returns NULL (never a
  * silently-truncated score): ragged or corrupt embeddings surface as null
  * scores that any downstream filter/agg makes visible, instead of
  * plausible-but-wrong similarity values.
  */
abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // Nullable regardless of child nullability: mismatched dims yield null.
  override def nullable: Boolean = true

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
}

/** Σ aᵢ·bᵢ over two double arrays (null on length mismatch). */
case class DotProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = a·b / (‖a‖‖b‖), one fused pass over both arrays.
  * Matches the double-arithmetic accumulation order of the HOF formulation
  * (separate Σab, Σaa, Σbb accumulators), so rounded scores are identical.
  * Returns 0.0 when either norm is 0 (instead of NaN) — total-order safe.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      ab += xv * yv; aa += xv * xv; bb += yv * yv
      i += 1
    }
    val d = math.sqrt(aa) * math.sqrt(bb)
    if (d == 0.0) 0.0 else ab / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xv = $a.getDouble($i);
         |    final double $yv = $b.getDouble($i);
         |    $ab += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
         |  }
         |  final double $d = java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb);
         |  ${ev.value} = ($d == 0.0) ? 0.0 : $ab / $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All random-hyperplane LSH band keys of a vector in ONE fused loop:
  * key(band) = Σⱼ [dot(v, plane(band·r+j)) > 0] · 2ʲ over `rowsPerBand`
  * planes per band — the signature step of the cosine similarity join
  * ([[graft.operators.KnnOps.simJoinLsh]]).
  *
  * WHY an expression: the same signature as a per-band expression forest
  * (`bands × rowsPerBand` DotProduct nodes over 64-element literal arrays)
  * produces a plan so large Spark truncates its string form, and the
  * generated method overflows out of whole-stage codegen. Here the plane
  * matrix is ONE flat reference object and the `bands·r·dim` multiply-adds
  * are one tight primitive loop — per-row cost is a dense matrix-vector
  * product, exactly what a 100 TB signature scan needs.
  *
  * `planes` is row-major `(bands·rowsPerBand) × dim`; a dim mismatch with
  * the data raises (a wrong plane matrix is a config bug, not a data
  * quality event). Output: array<long> of `bands` keys.
  */
case class HyperplaneBandKeys(
    child: Expression,
    planes: Seq[Double],
    bands: Int,
    rowsPerBand: Int) extends UnaryExpression {

  require(bands > 0 && rowsPerBand > 0 && rowsPerBand <= 63,
    s"invalid banding: $bands bands × $rowsPerBand rows")
  require(planes.nonEmpty && planes.length % (bands * rowsPerBand) == 0,
    s"plane matrix size ${planes.length} is not (bands·rowsPerBand)×dim")

  override def prettyName: String = "vec_band_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  // One flat primitive copy shared by interpreted + codegen paths.
  @transient private lazy val planesArr: Array[Double] = planes.toArray

  private def dim: Int = planes.length / (bands * rowsPerBand)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n == dim, s"$prettyName: vector dim $n != plane dim $dim")
    val p = planesArr
    val keys = new Array[Long](bands)
    var off = 0
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < rowsPerBand) {
        var s = 0.0
        var i = 0
        while (i < n) { s += x.getDouble(i) * p(off + i); i += 1 }
        if (s > 0) key |= (1L << j)
        off += n
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planesArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val key = ctx.freshName("key")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $dim) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector dim " + $n + " != plane dim $dim");
         |}
         |final long[] $keys = new long[$bands];
         |int $off = 0;
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $j = 0; $j < $rowsPerBand; $j++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $a.getDouble($i) * $pRef[$off + $i];
         |    }
         |    if ($s > 0) $key |= (1L << $j);
         |    $off += $n;
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Index of the nearest centroid by cosine similarity — the IVF cell
  * assignment step ([[graft.operators.KnnOps]] k-means coarse quantizer;
  * the reference's latent IVFFLAT surface, ref `TencentVDB.py:7`).
  * `centroids` is row-major k × dim; ties and zero-norm vectors resolve to
  * the LOWEST cell index (deterministic assignment). One fused loop over
  * the centroid matrix per row — same shape as [[HyperplaneBandKeys]]: a
  * reference-object matrix, no literal expression forest.
  */
case class NearestCentroid(
    child: Expression,
    centroids: Seq[Double],
    k: Int) extends UnaryExpression {

  require(k > 0 && centroids.nonEmpty && centroids.length % k == 0,
    s"centroid matrix size ${centroids.length} is not k×dim (k=$k)")

  override def prettyName: String = "vec_nearest_centroid"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  @transient private lazy val centArr: Array[Double] = centroids.toArray
  // Centroid norms are constant across rows — precompute once.
  @transient private lazy val centNorm: Array[Double] = {
    val dim = centroids.length / k
    Array.tabulate(k) { c =>
      var s = 0.0; var i = 0
      while (i < dim) { val v = centArr(c * dim + i); s += v * v; i += 1 }
      math.sqrt(s)
    }
  }

  private def dim: Int = centroids.length / k

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n == dim, s"$prettyName: vector dim $n != centroid dim $dim")
    var best = 0; var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var ab = 0.0; var i = 0
      while (i < n) { ab += x.getDouble(i) * centArr(c * n + i); i += 1 }
      val d = centNorm(c)
      val score = if (d == 0.0) 0.0 else ab / d // vector norm constant per row — omit
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centArr, "double[]")
    val nRef = ctx.addReferenceObj("centNorms", centNorm, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val ab = ctx.freshName("ab")
      val d = ctx.freshName("d")
      val score = ctx.freshName("score")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $dim) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector dim " + $n + " != centroid dim $dim");
         |}
         |int $best = 0;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $k; $c++) {
         |  double $ab = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $ab += $a.getDouble($i) * $cRef[$c * $n + $i];
         |  }
         |  final double $d = $nRef[$c];
         |  final double $score = ($d == 0.0) ? 0.0 : $ab / $d;
         |  if ($score > $bestScore) { $bestScore = $score; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Multi-assignment variant of [[NearestCentroid]] for SemDeDup boundary
  * probing: the nearest cell ALWAYS, plus the second-nearest cell when the
  * cosine margin (best − second) is below `epsilon` — a vector sitting on
  * a cell boundary is blocked into both cells, so a near-dup pair split by
  * the k-means partition can still meet in the shared second assignment.
  * `epsilon <= 0` degenerates to a 1-element array (exactly
  * [[NearestCentroid]]'s cell — same deterministic lowest-index tie rule).
  * Returns array<int> of 1 or 2 DISTINCT cell ids; interpreted vs codegen
  * paths are bit-identical (same comparison order).
  */
case class NearCentroidCells(
    child: Expression,
    centroids: Seq[Double],
    k: Int,
    epsilon: Double) extends UnaryExpression {

  require(k > 0 && centroids.nonEmpty && centroids.length % k == 0,
    s"centroid matrix size ${centroids.length} is not k×dim (k=$k)")

  override def prettyName: String = "vec_near_centroid_cells"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  @transient private lazy val centArr: Array[Double] = centroids.toArray
  @transient private lazy val centNorm: Array[Double] = {
    val d = centroids.length / k
    Array.tabulate(k) { c =>
      var s = 0.0; var i = 0
      while (i < d) { val v = centArr(c * d + i); s += v * v; i += 1 }
      math.sqrt(s)
    }
  }

  private def dim: Int = centroids.length / k

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n == dim, s"$prettyName: vector dim $n != centroid dim $dim")
    var best = 0; var bestScore = Double.NegativeInfinity
    var second = -1; var secondScore = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var ab = 0.0; var i = 0
      while (i < n) { ab += x.getDouble(i) * centArr(c * n + i); i += 1 }
      val d = centNorm(c)
      val score = if (d == 0.0) 0.0 else ab / d
      if (score > bestScore) {
        second = best; secondScore = bestScore
        best = c; bestScore = score
      } else if (score > secondScore) { second = c; secondScore = score }
      c += 1
    }
    val both = k > 1 && second >= 0 && bestScore - secondScore < epsilon
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (both) Array(best, second) else Array(best))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centArr, "double[]")
    val nRef = ctx.addReferenceObj("centNorms", centNorm, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val second = ctx.freshName("second")
      val secondScore = ctx.freshName("secondScore")
      val ab = ctx.freshName("ab")
      val d = ctx.freshName("d")
      val score = ctx.freshName("score")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $dim) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector dim " + $n + " != centroid dim $dim");
         |}
         |int $best = 0;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |int $second = -1;
         |double $secondScore = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $k; $c++) {
         |  double $ab = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $ab += $a.getDouble($i) * $cRef[$c * $n + $i];
         |  }
         |  final double $d = $nRef[$c];
         |  final double $score = ($d == 0.0) ? 0.0 : $ab / $d;
         |  if ($score > $bestScore) {
         |    $second = $best; $secondScore = $bestScore;
         |    $best = $c; $bestScore = $score;
         |  } else if ($score > $secondScore) {
         |    $second = $c; $secondScore = $score;
         |  }
         |}
         |final int[] $out =
         |  ($k > 1 && $second >= 0 && $bestScore - $secondScore < $epsilon)
         |    ? new int[]{$best, $second} : new int[]{$best};
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Squared L2 distance Σ (aᵢ-bᵢ)², fused single pass. */
case class L2DistanceSq(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "vec_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) { val dd = x.getDouble(i) - y.getDouble(i); s += dd * dd; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val dd = ctx.freshName("dd")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $dd = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $dd * $dd;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Per-vector symmetric int8 quantizer: array<double> → dim signed bytes
  * (BinaryType). scale = 127/max(|xᵢ|, 1e-12), codeᵢ = round(xᵢ·scale) —
  * the ingest-side encoder of the quantized collection
  * ([[graft.sources.CatalogOps.createQuantizedCollection]]). ¼ the
  * footprint of float32 (⅛ of the double fixtures); cosine against the
  * codes needs NO scale (it cancels), so the probe reads bytes only.
  */
case class Int8Codes(child: Expression) extends UnaryExpression {

  override def prettyName: String = "int8_codes"
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    Int8Codes.encode(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.Int8Codes.encode($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine between an int8 CODE vector and a full-precision query COLUMN —
  * the batch twin of [[Int8QueryCosine]]: where the single-query probe bakes
  * its vector in as a reference object, a BATCH of queries arrives as a
  * broadcast column ([[graft.operators.KnnOps.topKForQueriesQuantized]]),
  * so both sides are expressions. Same fused byte loop, same cancellation
  * of the per-vector scale; null on dimension mismatch like every binary
  * vector expression here.
  */
case class Int8ColCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "int8_col_cosine"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (org.apache.spark.sql.types.BinaryType, ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, array<double>), got ${l.simpleString} and ${r.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val q = b.asInstanceOf[ArrayData]
    val n = codes.length
    if (n != q.numElements()) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val c = codes(i).toDouble; val y = q.getDouble(i)
      ab += c * y; aa += c * c; bb += y * y; i += 1
    }
    val d = math.sqrt(aa) * math.sqrt(bb)
    if (d == 0.0) 0.0 else ab / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val c = ctx.freshName("c")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.length;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $c = (double) $a[$i];
         |    final double $y = $b.getDouble($i);
         |    $ab += $c * $y; $aa += $c * $c; $bb += $y * $y;
         |  }
         |  final double $d = java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb);
         |  ${ev.value} = ($d == 0.0) ? 0.0 : $ab / $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Int8Codes {
  /** Shared by the interpreted and generated paths (one JIT-compiled body,
    * the [[FeatureHash]] pattern).
    */
  def encode(x: ArrayData): Array[Byte] = {
    val n = x.numElements()
    var mx = 0.0; var i = 0
    while (i < n) { val a = math.abs(x.getDouble(i)); if (a > mx) mx = a; i += 1 }
    val scale = 127.0 / math.max(mx, 1e-12)
    val out = new Array[Byte](n)
    i = 0
    while (i < n) { out(i) = Math.round(x.getDouble(i) * scale).toByte; i += 1 }
    out
  }
}

/** Cosine between an int8 CODE vector and a full-precision query constant,
  * in ONE byte loop (dot + code norm fused; the query norm is precomputed
  * once). The scoring expression of the quantized scan
  * ([[graft.operators.KnnOps.topKQuantized]]): the query rides along as a
  * reference object (the broadcast-model pattern, like [[NearestCentroid]])
  * and the per-row cost is dim fused multiply-adds over raw bytes inside
  * whole-stage codegen. The per-vector scale cancels out of cosine, so the
  * scan reads ONLY the code bytes — the ¼-footprint claim made real.
  */
case class Int8QueryCosine(child: Expression, query: Seq[Double])
    extends UnaryExpression {
  require(query.nonEmpty, "query vector must be non-empty")
  // NaN/Infinity have no Java literal form, so a non-finite component (or a
  // norm that overflows) would render as an unparseable token in the
  // generated source; the norm is also shipped as a reference object below
  require(query.forall(java.lang.Double.isFinite),
    "query vector components must be finite")

  override def prettyName: String = "int8_query_cosine"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary codes, got ${other.simpleString}")
  }

  @transient private lazy val qArr: Array[Double] = query.toArray
  @transient private lazy val qNorm: Double = {
    var s = 0.0; var i = 0
    while (i < qArr.length) { s += qArr(i) * qArr(i); i += 1 }
    math.sqrt(s)
  }

  private def dim: Int = query.length

  override def nullSafeEval(v: Any): Any = {
    val codes = v.asInstanceOf[Array[Byte]]
    require(codes.length == dim,
      s"$prettyName: code length ${codes.length} != query dim $dim")
    var ab = 0.0; var bb = 0.0; var i = 0
    while (i < dim) {
      val c = codes(i).toDouble
      ab += c * qArr(i); bb += c * c; i += 1
    }
    val d = math.sqrt(bb) * qNorm
    if (d == 0.0) 0.0 else ab / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("query", qArr, "double[]")
    // reference object, not an interpolated literal: a double renders
    // through toString, which for non-finite values is not valid Java
    val qNormRef = ctx.addReferenceObj("qNorm", java.lang.Double.valueOf(qNorm),
      "java.lang.Double")
    nullSafeCodeGen(ctx, ev, a => {
      val ab = ctx.freshName("ab")
      val bb = ctx.freshName("bb")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |if ($a.length != $dim) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: code length " + $a.length + " != query dim $dim");
         |}
         |double $ab = 0.0;
         |double $bb = 0.0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  final double $c = (double) $a[$i];
         |  $ab += $c * $qRef[$i];
         |  $bb += $c * $c;
         |}
         |final double $d = Math.sqrt($bb) * $qNormRef.doubleValue();
         |${ev.value} = ($d == 0.0) ? 0.0 : $ab / $d;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
