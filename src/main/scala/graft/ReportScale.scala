package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: the maintained aggregate report
  * ([[graft.sources.CatalogOps.createAggReport]]) vs re-aggregation —
  * `runMain graft.ReportScale [rows]`. The claim under test: once the
  * report exists, keeping it current costs ∝ batch (+ touched buckets'
  * stored rows), not ∝ corpus — so the re-scan is paid ONCE, not per
  * refresh. Two batch shapes: a KEY-LOCAL batch (one new day — the
  * steady-state ingest shape, touches few buckets) and a KEY-SPANNING
  * batch (all keys — worst case, still only store-sized work).
  */
object ReportScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir", "/tmp/graft-reportscale-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.CatalogOps
    spark.sql("DROP DATABASE IF EXISTS reportscale CASCADE")
    CatalogOps.createDatabase(spark, "reportscale")

    def synth(rows: Long, dayLo: Int, dayHi: Int) =
      spark.range(rows).select(
        col("id"),
        to_timestamp(date_add(lit("2024-01-01").cast("date"),
          (pmod(xxhash64(col("id")), lit(dayHi - dayLo)) + dayLo).cast("int"))).as("day"),
        concat(lit("t"), pmod(xxhash64(col("id"), lit(7)), lit(5))).as("event_type"),
        (pmod(xxhash64(col("id"), lit(13)), lit(100000)).cast("double") / 100.0).as("value"))

    // MATERIALIZE the corpus: a generated range scans for free, which
    // would flatter the re-aggregation arm — the real comparison reads
    // parquet like any warehouse refresh would
    val dir = "/tmp/graft-reportscale-corpus"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    synth(n, 0, 60).write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    var t0 = System.nanoTime()
    CatalogOps.createAggReport(spark, "reportscale", "ev", corpus,
      Seq("day", "event_type"), "value")
    println(f"create (corpus scan)   ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")

    t0 = System.nanoTime()
    corpus.groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)), sum(round(col("value") * 1e6).cast("long")))
      .collect()
    println(f"re-aggregate (no IVM)  ${(System.nanoTime() - t0) / 1e9}%7.2f s  (what every refresh would pay)")

    val localBatch = synth(20000L, 60, 61).localCheckpoint() // one NEW day
    t0 = System.nanoTime()
    CatalogOps.upsertAggReport(spark, "reportscale", "ev", localBatch, 0L)
    println(f"fold key-local batch   ${(System.nanoTime() - t0) / 1e9}%7.2f s  (20k rows, 5 keys, few buckets)")

    val spanBatch = synth(20000L, 0, 60).localCheckpoint() // every key
    t0 = System.nanoTime()
    CatalogOps.upsertAggReport(spark, "reportscale", "ev", spanBatch, 1L)
    println(f"fold key-spanning      ${(System.nanoTime() - t0) / 1e9}%7.2f s  (20k rows, all 300 keys/buckets)")

    // correctness cross-check: served == direct over corpus+batches
    val all = corpus.unionByName(localBatch).unionByName(spanBatch)
    val direct = all.groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 1e6).cast("long")).cast("double") / 1e6).as("sum_value"))
      .orderBy(col("day"), col("event_type")).collect().toSeq
    val served = CatalogOps.serveAggReport(spark, "reportscale", "ev")
      .orderBy(col("day"), col("event_type")).collect().toSeq
    println(s"served==direct: ${served == direct} (${served.size} report rows)")
    spark.sql("DROP DATABASE IF EXISTS reportscale CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
