package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable (element-wise sums, row count) accumulator for [[VecSumCount]].
  * `sums` stays null until the first non-null vector fixes the dimension.
  */
final class VecSumBuffer(var sums: Array[Double], var n: Long)

/** Element-wise vector sum + count aggregate — the centroid building block
  * (coarse-quantizer construction for the IVF index analog; the reference's
  * index build is server-side, `TencentVDB.py:46,79`).
  *
  * WHY: the `posexplode → groupBy(label, pos) → avg` formulation multiplies
  * the pre-shuffle row count by the vector dimension (×64 on fixtures,
  * ×1024 at the reference's dim) before aggregating. This aggregate is
  * partial-capable: each map task folds its rows into ONE dim-length double
  * array per group, so the shuffle carries one row per (task, group) —
  * dim× less volume, the plan a 100 TB centroid build needs.
  *
  * Output: struct<sums: array<double>, n: bigint>; the mean is `sums[i]/n`
  * downstream (single IEEE division — same value DuckDB's `avg` computes).
  * A dimension mismatch inside a group fails loudly (corrupt/ragged
  * embeddings must not silently skew a centroid).
  */
case class VecSumCount(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] {

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def prettyName: String = "vec_sum_count"

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer(null, 0L)

  private def addInto(buf: VecSumBuffer, arr: Array[Double]): Unit = {
    if (buf.sums == null) {
      buf.sums = arr.clone()
    } else {
      require(buf.sums.length == arr.length,
        s"$prettyName: dimension mismatch (${buf.sums.length} vs ${arr.length})")
      var i = 0
      while (i < arr.length) { buf.sums(i) += arr(i); i += 1 }
    }
    buf.n += 1L
  }

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = vec.eval(input)
    if (v != null) addInto(buf, v.asInstanceOf[ArrayData].toDoubleArray())
    buf
  }

  override def merge(b1: VecSumBuffer, b2: VecSumBuffer): VecSumBuffer = {
    if (b2.sums != null) {
      if (b1.sums == null) { b1.sums = b2.sums; b1.n = b2.n }
      else {
        require(b1.sums.length == b2.sums.length,
          s"$prettyName: dimension mismatch (${b1.sums.length} vs ${b2.sums.length})")
        var i = 0
        while (i < b1.sums.length) { b1.sums(i) += b2.sums(i); i += 1 }
        b1.n += b2.n
      }
    }
    b1
  }

  override def eval(buf: VecSumBuffer): Any =
    if (buf.sums == null) null
    else InternalRow(new GenericArrayData(buf.sums), buf.n)

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buf.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buf.sums.length)
      buf.sums.foreach(out.writeDouble)
    }
    out.writeLong(buf.n)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val len = in.readInt()
    val sums = if (len < 0) null else Array.fill(len)(in.readDouble())
    new VecSumBuffer(sums, in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumCount =
    copy(inputAggBufferOffset = newOffset)

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0))
}
