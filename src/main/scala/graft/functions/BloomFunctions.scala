package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-filter semi-join reduction — the explicit, deterministic form of
  * Spark's own AQE runtime bloom filter (`InjectRuntimeFilter`, SPARK-32268),
  * for pipelines that want the reduction GUARANTEED rather than left to
  * stats-gated optimizer heuristics (the ref's query path always joins
  * retrieved ids back to the full corpus, `main_server.py:41-50` — at
  * 100 TB that probe side is the cost).
  *
  * Shape: the selective build side aggregates into an m-bit filter held as
  * `m/64` longs — word index → `bit_or` of per-key masks, a commutative
  * integer reduction, so the filter is BIT-DETERMINISTIC regardless of
  * partitioning or merge order (unlike sketches that truncate on merge).
  * Only the word array reaches the driver: 2 bytes per build key at the
  * default 16 bits/key — model-sized, same budget class as a PQ codebook.
  * The probe side then drops non-members BEFORE its exchange: what
  * shuffles into the join is the matching fraction plus < 0.1% false
  * positives (k=6, 16 bits/key ⇒ fpp ≈ 9·10⁻⁴), and the join itself
  * removes those — the reduced join is EXACTLY the unreduced join (no
  * false negatives: every inserted key probes the bits it set).
  *
  * All probe-side arithmetic is codegen'd builtins (xxhash64, shifts,
  * masks); the word array rides a broadcast 1-row frame, NOT a literal —
  * a corpus-sized literal in the plan re-compiles janino per run (the
  * measured 8.5 s trap documented in PERF_NOTES for the LR weights).
  */
object BloomFunctions {

  /** Hash probes per key. 16 bits/key with k=6 gives fpp ≈ 9e-4. */
  val NumHashes = 6

  /** Filter size in bits for an expected key count: next power of two ≥
    * 16·n (so positions reduce by mask, no modulo), floor 1024 bits.
    */
  def sizeFor(n: Long): Long = {
    var m = 1024L
    while (m < 16L * n) m <<= 1
    m
  }

  private def shiftl(base: Column, bits: Column): Column =
    ColumnBridge.column(ShiftLeft(ColumnBridge.expression(base),
      ColumnBridge.expression(bits)))

  private def shiftr(base: Column, bits: Column): Column =
    ColumnBridge.column(ShiftRight(ColumnBridge.expression(base),
      ColumnBridge.expression(bits)))

  /** Bit position of probe `i` for `key` in an m-bit filter (m a power of
    * two). xxhash64 over (key, i) — k co-independent hash streams from
    * the one codegen'd hash family.
    */
  private def pos(key: Column, i: Int, m: Long): Column =
    xxhash64(key, lit(i.toLong)).bitwiseAND(lit(m - 1L))

  /** Distributed word-rows form of the filter build: one (w, word) row
    * per 64-bit word that received a bit — the per-word `bit_or` partial
    * aggregation IS the whole computation, so the result is
    * bit-deterministic under any partitioning, and a STORE of these rows
    * is replay/merge-safe by pure idempotence (OR of the same masks
    * changes nothing; see `CatalogOps.createBloomStore`).
    */
  def bloomWordRows(build: DataFrame, keyCol: String, m: Long): DataFrame = {
    require((m & (m - 1)) == 0 && m >= 64, s"m must be a power of two >= 64, got $m")
    val key = col(keyCol)
    build
      .select(explode(array((0 until NumHashes).map(i => pos(key, i, m)): _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        shiftl(lit(1L), (col("pos") % 64).cast("int")).as("mask"))
      .groupBy(col("w")).agg(expr("bit_or(mask)").as("word"))
  }

  /** Distributed filter build over `build(keyCol)`: explode the k bit
    * positions per key, reduce per 64-bit word with `bit_or`, collect the
    * m/64-long word array (zero-filled where no bits landed).
    */
  def buildBloomWords(build: DataFrame, keyCol: String, m: Long): Array[Long] = {
    val words = bloomWordRows(build, keyCol, m).collect()
    val arr = new Array[Long]((m / 64).toInt)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership predicate for `key` against the word-array column
    * `wordsCol` (as built by [[buildBloomWords]] with the same m): AND of
    * the k bit probes. False negatives impossible; false positives fall
    * to the downstream join.
    */
  def mightContain(key: Column, wordsCol: Column, m: Long): Column =
    (0 until NumHashes).map { i =>
      val p = pos(key, i, m)
      val word = element_at(wordsCol, (p / 64).cast("int") + 1)
      shiftr(word, (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)

  /** Reduce `probe` to rows whose `keyCol` might be in `build`'s
    * `buildKeyCol` set: build the filter distributed, ship the word array
    * on a broadcast 1-row frame, drop non-members map-side. The returned
    * frame has exactly `probe`'s columns; membership is a superset of the
    * true semi-join by < fpp, so `reduced ⋈ build ≡ probe ⋈ build`.
    */
  def bloomReduce(spark: SparkSession, probe: DataFrame, keyCol: String,
                  build: DataFrame, buildKeyCol: String): DataFrame = {
    val n = build.count() // driver scalar, one job over the selective side
    val m = sizeFor(n)
    val words = buildBloomWords(build, buildKeyCol, m)
    val bloomDf = spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row(words)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__bloom_words",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)))))
    probe.crossJoin(broadcast(bloomDf))
      .where(mightContain(col(keyCol), col("__bloom_words"), m))
      .drop("__bloom_words")
  }
}
