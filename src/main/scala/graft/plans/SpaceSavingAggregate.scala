package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters aggregate (Metwally et al. 2005, merged per
  * Agarwal et al.'s mergeable-summaries rule): tracks at most `m`
  * (term, count, err) entries per buffer; a full buffer absorbs an unseen
  * term by evicting the minimum-count entry and inheriting its count as
  * the new entry's error bound.
  *
  * WHY: corpus-wide vocabulary statistics (stopword discovery, tokenizer
  * seeding, boilerplate-term detection) normally pay an explode + full
  * term-keyed shuffle — the tf-idf ingest shape. This aggregate answers
  * "what are the heavy terms" in ONE partial-agg'd pass whose shuffle
  * carries m-entry SKETCHES (one per map task), never term rows: the
  * 100 TB shape for a statistic that only needs the head of the
  * distribution.
  *
  * Guarantees (test-pinned): estimates never undercount
  * (`count ≥ true`), `count − err ≤ true`, and any term with true
  * frequency > n/m is present — the SpaceSaving contract, preserved under
  * merge by the absent-key floor rule (a key missing from a FULL summary
  * may have been evicted with up to min-count occurrences, so the merge
  * attributes that floor; a key missing from an UNFILLED summary truly
  * has zero). When the vocabulary fits in `m`, no eviction ever fires and
  * the sketch is EXACT — which is why the fixture contract entry can face
  * the DuckDB oracle.
  *
  * Eviction scans the m entries linearly (m is small by design: hundreds
  * to thousands); a production-tuned variant would keep the min-heap of
  * the paper's Stream-Summary structure — same semantics, same output.
  *
  * Output: array<struct<term, count, err>> sorted (count DESC, term ASC),
  * truncated to m.
  */
case class SpaceSavingTopK(
    term: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(m > 0, s"space-saving requires m > 0, got $m")

  override def checkInputDataTypes(): TypeCheckResult =
    if (term.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${term.dataType.simpleString}")

  override def prettyName: String = "space_saving_topk"

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def minEntry(buf: mutable.HashMap[String, (Long, Long)]): (String, Long) = {
    var bestK: String = null; var bestC = Long.MaxValue
    buf.foreach { case (k, (c, _)) =>
      // deterministic: lowest count, then lexicographically greatest term
      // (evict the "latest" name so re-runs agree regardless of hash order)
      if (c < bestC || (c == bestC && (bestK == null || k > bestK))) {
        bestK = k; bestC = c
      }
    }
    (bestK, bestC)
  }

  override def update(
      buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val t = term.eval(input)
    if (t != null) {
      val key = t.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some((c, e)) => buf.update(key, (c + 1, e))
        case None if buf.size < m => buf.update(key, (1L, 0L))
        case None =>
          val (victim, vc) = minEntry(buf)
          buf.remove(victim)
          buf.update(key, (vc + 1, vc))
      }
    }
    buf
  }

  /** Mergeable-summaries combine (Agarwal et al. 2013): per-summary
    * absent-key floors, then keep the m largest. DETERMINISM CAVEAT:
    * below saturation (combined key set ≤ m) the merge is exact and
    * order-independent; ABOVE saturation the intermediate truncation
    * makes the merged counts depend on the partial-merge order Spark
    * happens to schedule, so run-to-run output can vary within the
    * (still-valid) SpaceSaving error bounds. The engine's oracled uses
    * stay below saturation by construction — [[graft.operators
    * .TextAnalysisOps.heavyHitterTerms]] raises on any evicted entry so
    * saturation surfaces as a diagnostic, not a silent mismatch; callers
    * that run saturated (legitimate at 100 TB vocabularies) get the
    * published approximation contract, not bit-reproducibility.
    */
  override def merge(
      b1: mutable.HashMap[String, (Long, Long)],
      b2: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    // absent-key floor per summary: a FULL summary may have evicted the
    // key with up to its min count; an unfilled one truly held zero
    val floor1 = if (b1.size >= m) b1.valuesIterator.map(_._1).minOption.getOrElse(0L) else 0L
    val floor2 = if (b2.size >= m) b2.valuesIterator.map(_._1).minOption.getOrElse(0L) else 0L
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    (b1.keysIterator ++ b2.keysIterator).foreach { k =>
      if (!merged.contains(k)) {
        val (c1, e1) = b1.getOrElse(k, (floor1, floor1))
        val (c2, e2) = b2.getOrElse(k, (floor2, floor2))
        merged.update(k, (c1 + c2, e1 + e2))
      }
    }
    if (merged.size <= m) merged
    else {
      // keep the m largest (count DESC, term ASC) — the summary contract
      val kept = merged.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(m)
      mutable.HashMap(kept: _*)
    }
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val best = buf.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
    new GenericArrayData(best.map { case (k, (c, e)) =>
      InternalRow(UTF8String.fromString(k), c, e)
    })
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, (c, e)) =>
      out.writeUTF(k); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.update(in.readUTF(), (in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)

  override def children: Seq[Expression] = Seq(term)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(term = newChildren(0))
}
