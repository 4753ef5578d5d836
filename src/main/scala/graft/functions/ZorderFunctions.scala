package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering primitives — multi-column data layout for
  * scan pruning. A table sorted by one column prunes predicates on that
  * column only; sorting by the INTERLEAVED bits of two columns' bucket
  * ranks gives every row group a tight min/max box in BOTH columns, so a
  * 2-D predicate prunes multiplicatively (measured in `LayoutScale`:
  * 1%×1% box → ~0.02% of row groups vs 1% for single-sort, ~100% for
  * unsorted). The reference's catalog has no layout control at all (its
  * cloud VDB owns storage, `TencentVDB.py`); at 100 TB the layout IS the
  * index: nothing here adds a structure to maintain — it only chooses the
  * sort key of data that had to be written anyway.
  *
  * All row-side arithmetic is codegen'd builtins: bucket quantization is
  * closed-form floor arithmetic (equi-width) or a size/filter HOF over a
  * ≤255-element boundary literal (equi-depth), and bit interleaving is
  * two lookups in a 256-entry spread table rather than a 16-step
  * shift/or chain.
  */
object ZorderFunctions {

  /** Bits of bucket resolution per dimension (256 buckets). Two spread
    * dimensions fill 16 bits of z — row-group-level clustering needs no
    * more (a 128 MiB group holds ~10⁶ rows; 65536 z-cells already
    * over-resolve it).
    */
  val BucketBits = 8
  val Buckets: Int = 1 << BucketBits // 256

  /** spreadN(b, s): bit i of b moves to bit s·i — the stride-s Morton
    * mask (s = dimension count). */
  private[graft] def spreadN(b: Int, stride: Int): Long = {
    var v = 0L
    var i = 0
    while (i < BucketBits) { v |= ((b >> i) & 1).toLong << (stride * i); i += 1 }
    v
  }

  /** spread(b): the 2-D case — bit i moves to bit 2i. */
  private[graft] def spread(b: Int): Long = spreadN(b, 2)

  private def lutN(stride: Int): Seq[Long] = (0 until Buckets).map(spreadN(_, stride))

  /** Interleave 2–4 bucket ids (each in [0, 256)) into the z-value —
    * dimension k's bits land on positions ≡ (n−1−k) mod n, so every
    * dimension contributes equally to locality. Lookup-table form: one
    * `element_at` on a 256-long literal per dimension, all codegen'd.
    */
  def zInterleaveN(bucketCols: Seq[Column]): Column = {
    val n = bucketCols.length
    require(n >= 2 && n <= 4, s"z-order supports 2-4 dimensions, got $n")
    bucketCols.zipWithIndex.map { case (c, k) =>
      element_at(typedlit(lutN(n)), c.cast("int") + 1) * lit(1L << (n - 1 - k))
    }.reduce(_ + _)
  }

  /** The 2-D interleave: a's bits on odd positions, b's on even. */
  def zInterleave(bucketA: Column, bucketB: Column): Column =
    zInterleaveN(Seq(bucketA, bucketB))

  /** Equi-width bucket of `v` over [lo, hi] — closed-form floor
    * arithmetic, identical IEEE evaluation in any engine (the oracle
    * computes the same expression), clamped so v = hi lands in the top
    * bucket and a degenerate lo = hi column collapses to bucket 0.
    */
  def widthBucket(v: Column, lo: Column, hi: Column): Column =
    when(hi <= lo, lit(0L)).otherwise(
      least(greatest(floor((v.cast("double") - lo) * lit(Buckets.toDouble) / (hi - lo)),
        lit(0.0)), lit(Buckets - 1.0)).cast("long"))

  /** Equi-depth bucket of `v` against precomputed ascending split points
    * (at most Buckets-1 of them): the bucket is the number of splits ≤ v.
    * A filter/size HOF over a literal array — no join, no UDF.
    */
  def depthBucket(v: Column, bounds: Seq[Double]): Column = {
    require(bounds.length < Buckets, s"too many split points: ${bounds.length}")
    if (bounds.isEmpty) lit(0L)
    else size(filter(typedlit(bounds), b => v.cast("double") >= b)).cast("long")
  }

  /** Approximate equi-depth split points from ONE distributed pass: a
    * fine equi-width histogram (`resolution` bins over the observed
    * min/max — only the histogram reaches the driver), walked
    * cumulatively to the per-bucket target count. Split values are bin
    * upper edges, deduplicated (heavy duplicate values collapse bins, so
    * fewer than nBuckets-1 splits can come back — buckets stay correct,
    * just coarser there). Clustering needs balance, not exactness: a bin
    * mis-assignment moves rows one z-cell over. The EXACT machinery
    * (`RelOps.quantileExactOn`) exists when split points must be true
    * order statistics.
    */
  def equiDepthBounds(df: DataFrame, valueCol: String, nBuckets: Int,
                      resolution: Int = 65536): Seq[Double] = {
    require(nBuckets >= 2 && nBuckets <= Buckets, s"nBuckets out of range: $nBuckets")
    val v = col(valueCol).cast("double")
    val head = df.where(v.isNotNull)
      .agg(count(lit(1)), min(v), max(v)).collect()(0)
    val n = head.getLong(0)
    if (n == 0L) return Seq.empty
    val lo = head.getDouble(1)
    val hi = head.getDouble(2)
    if (lo == hi) return Seq.empty
    val w = (hi - lo) / resolution
    val hist = df.where(v.isNotNull)
      .groupBy(least(floor((v - lit(lo)) / lit(w)), lit(resolution - 1L))
        .cast("long").as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val splits = Seq.newBuilder[Double]
    var cum = 0L
    var nextTarget = 1
    (0L until resolution.toLong).foreach { b =>
      cum += hist.getOrElse(b, 0L)
      while (nextTarget < nBuckets && cum >= n.toDouble * nextTarget / nBuckets) {
        splits += lo + (b + 1) * w
        nextTarget += 1
      }
    }
    splits.result().distinct
  }
}
