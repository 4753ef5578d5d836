package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared geometry + algorithms of the q-digest quantile sketch
  * (Shrivastava et al. 2004, "Medians and Beyond"): a complete binary
  * tree over the integer domain [0, 2^levels), counts kept at a bounded
  * set of nodes. Node ids are heap-numbered (root 1 covers everything,
  * children 2i/2i+1, leaf for value v = 2^levels + v); id 0 in the
  * buffer map holds the total count n.
  *
  * Compression (the size bound) merges sibling pairs into their parent
  * bottom-up whenever children + parent together hold ≤ ⌊n/capacity⌋
  * mass — the paper's digest property, giving O(capacity · levels)
  * nodes and rank error ≤ levels·n/capacity. Below capacity no merge
  * ever fires (every count ≥ 1 > ⌊n/capacity⌋ = 0 requires n > capacity
  * first), so the sketch is EXACT — the SpaceSaving oracle discipline:
  * fixture-sized groups face the DuckDB oracle, 100 TB groups get the
  * published ε-approximation.
  */
private[graft] object QDigest {
  type Buf = mutable.LongMap[Long]

  def empty(): Buf = mutable.LongMap.empty[Long]

  def leafId(levels: Int, v: Long): Long = {
    val max = (1L << levels) - 1
    val clamped = if (v < 0L) 0L else if (v > max) max else v
    (1L << levels) + clamped
  }

  def levelOf(id: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(id)

  /** Inclusive value range [rmin, rmax] a node covers. */
  def rangeOf(levels: Int, id: Long): (Long, Long) = {
    val l = levelOf(id)
    val width = 1L << (levels - l)
    val rmin = (id - (1L << l)) * width
    (rmin, rmin + width - 1)
  }

  def add(buf: Buf, levels: Int, capacity: Int, v: Long): Unit = {
    val leaf = leafId(levels, v)
    buf.update(leaf, buf.getOrElse(leaf, 0L) + 1L)
    buf.update(0L, buf.getOrElse(0L, 0L) + 1L)
    // AMORTIZED compression: trigger at 2× capacity, not at capacity — a
    // buffer hovering just above the cap would otherwise re-compress on
    // nearly every update (measured: 926 s for a 20M-row aggregate vs
    // ~9 s with the slack; QuantileScale). Each compress must then absorb
    // ≥ capacity new leaves before the next fires, so the per-update cost
    // is O(levels) amortized; the error analysis only needs the digest
    // property at EVAL, and the bound held with an order of magnitude to
    // spare (|rank err| ≤ 0.21× the levels·n/capacity contract at 20M).
    if (buf.size - 1 > 2 * capacity) compress(buf, levels, capacity)
  }

  /** One bottom-up pass of the paper's COMPRESS: per level (leaves up),
    * fold each sibling pair into its parent when children + parent hold
    * ≤ ⌊n/capacity⌋ together. Merges within a level are independent, so
    * the result does not depend on iteration order — deterministic for a
    * given buffer.
    */
  def compress(buf: Buf, levels: Int, capacity: Int): Unit = {
    val n = buf.getOrElse(0L, 0L)
    val t = n / capacity
    if (t == 0L) return
    var l = levels
    while (l >= 1) {
      val lo = 1L << l
      val hi = lo << 1
      // parents with at least one child present at this level
      val parents = buf.keysIterator
        .filter(k => k >= lo && k < hi).map(_ >> 1).toArray.distinct
      java.util.Arrays.sort(parents)
      parents.foreach { p =>
        val cl = buf.getOrElse(p << 1, 0L)
        val cr = buf.getOrElse((p << 1) + 1L, 0L)
        val cp = buf.getOrElse(p, 0L)
        if (cl + cr + cp <= t) {
          buf.remove(p << 1)
          buf.remove((p << 1) + 1L)
          if (cl + cr + cp > 0L) buf.update(p, cl + cr + cp)
        }
      }
      l -= 1
    }
  }

  /** Additive merge (counts are mergeable summaries), then compress.
    * DETERMINISM CAVEAT (the SpaceSaving one): below saturation no
    * compression ever fires and the merge is exact and order-independent;
    * above it, intermediate compression makes node placement depend on
    * the partial-merge order — answers stay inside the rank-error bound
    * but are not bit-reproducible. Oracled uses stay below saturation by
    * construction and raise on violation.
    */
  def mergeInto(into: Buf, from: Buf, levels: Int, capacity: Int): Buf = {
    from.foreach { case (k, c) => into.update(k, into.getOrElse(k, 0L) + c) }
    if (into.size - 1 > capacity) compress(into, levels, capacity)
    into
  }

  /** Lower-quantile estimates: for each p, the rmax of the first node
    * (scanning by rmax ASC, then smaller ranges first) whose cumulative
    * count reaches rank ⌈p·n⌉. With only leaves present this is exactly
    * "smallest v with rank(v) ≥ ⌈p·n⌉" — the oracle's window form.
    */
  def quantiles(buf: Buf, levels: Int, probs: Seq[Double]): Seq[Long] = {
    val n = buf.getOrElse(0L, 0L)
    if (n == 0L) return probs.map(_ => 0L)
    val nodes = buf.iterator.filter(_._1 != 0L).map { case (id, c) =>
      val (rmin, rmax) = rangeOf(levels, id)
      (rmax, rmin, c)
    }.toArray
    // rmax ASC; ties: larger rmin first (smaller interval before ancestor)
    java.util.Arrays.sort(nodes, Ordering.Tuple3(
      Ordering.Long, Ordering.Long.reverse, Ordering.Long))
    probs.map { p =>
      val target = math.ceil(p * n).toLong.max(1L)
      var cum = 0L
      var i = 0
      var ans = nodes.last._1
      var found = false
      while (i < nodes.length && !found) {
        cum += nodes(i)._3
        if (cum >= target) { ans = nodes(i)._1; found = true }
        i += 1
      }
      ans
    }
  }

  /** True iff any mass sits on a non-leaf node — compression has fired
    * somewhere in this digest's history, so exactness is off.
    */
  def hasInternal(buf: Buf, levels: Int): Boolean =
    buf.keysIterator.exists(k => k != 0L && k < (1L << levels))
}

/** q-digest quantile sketch aggregate — per group, approximate quantiles
  * of a non-negative long column in ONE partial-agg'd pass whose shuffle
  * carries ≤ capacity-node sketches, never value rows: the 100 TB shape
  * for per-group distribution statistics (the exact-quantile path pays a
  * per-group sort or the histogram-refinement passes of
  * [[graft.operators.RelOps]]'s quantile family).
  *
  * Output: struct<qs: array<long> (aligned with `probs`, each the
  * lower-quantile estimate), internal: boolean (true iff compression has
  * fired — exactness gone), n: long>. The contract query raises on
  * `internal` so fixture saturation surfaces as a diagnostic, not a
  * silent oracle mismatch (the heavy-hitters guard discipline).
  */
case class QDigestQuantiles(
    value: Expression,
    levels: Int,
    capacity: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(levels > 0 && levels < 62, s"levels must be in [1, 61], got $levels")
  require(capacity > 0, s"capacity must be positive, got $capacity")
  require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
    s"probs must be in (0, 1], got $probs")

  override def checkInputDataTypes(): TypeCheckResult = value.dataType match {
    case LongType | IntegerType | ShortType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral argument, got ${other.simpleString}")
  }

  override def prettyName: String = "qdigest_quantiles"

  override def createAggregationBuffer(): mutable.LongMap[Long] = QDigest.empty()

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = value.eval(input)
    if (v != null) {
      val long = v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
      }
      QDigest.add(buf, levels, capacity, long)
    }
    buf
  }

  override def merge(b1: mutable.LongMap[Long], b2: mutable.LongMap[Long]): mutable.LongMap[Long] =
    QDigest.mergeInto(b1, b2, levels, capacity)

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val qs = QDigest.quantiles(buf, levels, probs)
    InternalRow(
      new GenericArrayData(qs),
      QDigest.hasInternal(buf, levels),
      buf.getOrElse(0L, 0L))
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeLong(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = QDigest.empty()
    var i = 0
    while (i < n) { buf.update(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestQuantiles =
    copy(inputAggBufferOffset = newOffset)

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("qs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("internal", BooleanType, nullable = false),
    StructField("n", LongType, nullable = false)))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0))
}

/** The digest-emitting twin of [[QDigestQuantiles]] — same buffer, same
  * compression, but eval returns the NODES (node id, rmin, rmax, count)
  * so a maintained store can persist the sketch and fold batches into it
  * (the term-sketch store discipline).
  */
case class QDigestNodes(
    value: Expression,
    levels: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(levels > 0 && levels < 62, s"levels must be in [1, 61], got $levels")
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult = value.dataType match {
    case LongType | IntegerType | ShortType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral argument, got ${other.simpleString}")
  }

  override def prettyName: String = "qdigest_nodes"

  override def createAggregationBuffer(): mutable.LongMap[Long] = QDigest.empty()

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = value.eval(input)
    if (v != null) {
      val long = v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
      }
      QDigest.add(buf, levels, capacity, long)
    }
    buf
  }

  override def merge(b1: mutable.LongMap[Long], b2: mutable.LongMap[Long]): mutable.LongMap[Long] =
    QDigest.mergeInto(b1, b2, levels, capacity)

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val nodes = buf.iterator.filter(_._1 != 0L).toArray.sortBy(_._1)
    new GenericArrayData(nodes.map { case (id, c) =>
      val (rmin, rmax) = QDigest.rangeOf(levels, id)
      InternalRow(id, rmin, rmax, c)
    })
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeLong(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = QDigest.empty()
    var i = 0
    while (i < n) { buf.update(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestNodes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestNodes =
    copy(inputAggBufferOffset = newOffset)

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("node", LongType, nullable = false),
    StructField("rmin", LongType, nullable = false),
    StructField("rmax", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0))
}
