package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver fixtures (TESTDATA.md / FIXTURES.md).
  *
  * Mirrors the reference's two data surfaces: the crawl-corpus document
  * collection (ref `Crawling.py:47` records upserted at `TencentVDB.py:76-78`)
  * and the vector field (ref `TencentVDB.py:46,49`). Relational + events
  * tables are the driver's capability-parity fixtures.
  *
  * Scale note: plain `spark.read.parquet` keeps Catalyst in charge —
  * partition pruning, predicate pushdown and column pruning all reach the
  * scan. Loaders do NOT cache or repartition; each query decides its own
  * distribution.
  *
  * Schema inference on a bare `spark.read.parquet` launches one footer-read
  * job per call — a per-query-construction cost that at 100 TB (many footers)
  * and high query rates is pure driver-side waste. The fixture tables are
  * immutable, so the first inferred `StructType` per path is cached JVM-wide
  * and every later load passes it explicitly: constructing a query plan then
  * launches zero jobs (pinned by PlanSpec).
  */
object Tables {
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val cached = schemaCache.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(path, df.schema)
      df
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** `ts` normalization: the fixture generations differ in how they write
    * the timestamp column, so dispatch on the type the scan actually
    * produces rather than assuming one physical encoding.
    *
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark infers
    *    TIMESTAMP_NTZ; cast to TimestampType (sessions run UTC, so the
    *    instant is unchanged and downstream window/session ops — and the
    *    DuckDB oracle, which reads the same file as TIMESTAMP — agree).
    *  - TIMESTAMP(NANOS) → Spark has no nanos TimestampType; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (all graft entry
    *    points set it) the scan yields LongType nanos, converted here
    *    (sub-µs components are zero in that fixture generation).
    *
    * The dispatch is on the cached inferred schema, so it costs nothing
    * per query construction.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported type $other; expected timestamp, " +
          "timestamp_ntz, or long (nanos via spark.sql.legacy.parquet.nanosAsLong)")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")

  /** Embeddings with the vector cast float→double up front: FIXTURES.md
    * determinism rule — both Spark and the DuckDB oracle must do vector
    * arithmetic in double so the rounded scores hash-match.
    */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("embedding"))
}
