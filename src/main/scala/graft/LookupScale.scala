package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: point-lookup cost on an id-indexed (bloom-filtered)
  * collection vs plain layouts — `runMain graft.LookupScale [n] [reps]`.
  *
  * Synthesizes an n-row collection with a scattered 64-bit id (affine
  * scramble — adversarial for min/max statistics: every row group spans
  * ~the full id range, so statistics prune nothing) and a 64-byte
  * payload, written three ways with 8 MiB row groups:
  *
  *  - `bloom_nodict`  — id bloom filters sized per row group, id
  *    dictionary off (the production shape: 128 MiB groups overflow the
  *    1 MiB dictionary page cap, so dictionary skipping is unavailable)
  *  - `plain_nodict`  — same, no bloom: the reader must decode the id
  *    column of EVERY row group to answer any probe
  *  - `plain_dict`    — dictionary left on (the small-group case where
  *    the dictionary page alone proves id absence)
  *
  * Probes use ≤ 10 ids so Spark pushes them as OR-of-Eq (the
  * `parquet.pushdown.inFilterThreshold` form the bloom evaluator
  * accepts). Reports median wall time and bytes read for present-id and
  * absent-id probes.
  *
  * MEASURED FINDINGS (PERF_NOTES "id point lookups", round 12): on
  * local[32] with a warm page cache the probe is scheduler-overhead-bound
  * (~0.12 s at 16M rows) and wall time is indistinguishable across all
  * three layouts — the bloom's value proposition is COLD/REMOTE storage,
  * where a skipped row group is a skipped object-store fetch; a local
  * warm-cache bench cannot show it and this harness does not pretend to.
  * What it DID catch: (1) blooms sized to TABLE cardinality hit the
  * 1 MiB per-group cap and a probe reads more bloom bytes than data —
  * size `expected.ndv` per ROW GROUP; (2) near-sorted ingest (the default
  * when ids correlate with arrival) lets the parquet page-level column
  * index prune by itself — blooms only matter once the layout is truly
  * scattered, which this harness forces via a random within-partition
  * sort.
  */
object LookupScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 4000000L
    val reps = if (args.length > 1) args(1).toInt else 9
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.CatalogOps

    val db = "lookupscale"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    // scattered unique ids (odd multiplier -> bijection mod 2^64), fat row
    val rows = spark.range(n).select(
      (col("id") * 2654435761L).as("id"),  // injective, overflow-free at this n
      md5(col("id").cast("string")).as("payload"),
      (col("id") % 1000).as("meta"))
    val groupBytes = 8L * 1024 * 1024
    val ndvPerGroup = 120000L // ~8 MiB / ~70 B per row

    // randomize ROW ORDER within partitions: shuffle fetch otherwise
    // preserves sorted runs from spark.range, and the parquet COLUMN
    // INDEX (page-level min/max) then prunes pages all by itself — the
    // first measured lesson of this harness: near-sorted ingest needs no
    // bloom at all. Sorting by the md5 payload makes every page span the
    // full id range, the true adversarial layout.
    val scattered = rows.repartition(4, col("id"))
      .sortWithinPartitions(col("payload"))
    scattered.write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#id", "true")
      .option("parquet.bloom.filter.expected.ndv#id", ndvPerGroup.toString)
      .option("parquet.enable.dictionary#id", "false")
      .option("parquet.block.size", groupBytes.toString)
      .saveAsTable(s"`$db`.`bloom_nodict`")
    scattered.write.mode("overwrite")
      .option("parquet.enable.dictionary#id", "false")
      .option("parquet.block.size", groupBytes.toString)
      .saveAsTable(s"`$db`.`plain_nodict`")
    scattered.write.mode("overwrite")
      .option("parquet.block.size", groupBytes.toString)
      .saveAsTable(s"`$db`.`plain_dict`")

    // row-group census (the skipping opportunity)
    import scala.jdk.CollectionConverters._
    val whPath = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    def rowGroups(table: String): Int = {
      val dir = new java.io.File(s"$whPath/$db.db/$table")
      dir.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath),
            spark.sessionState.newHadoopConf()))
        try r.getRowGroups.size() finally r.close()
      }.sum
    }
    println(s"[lookupscale] rows=$n  row groups: " +
      s"bloom_nodict=${rowGroups("bloom_nodict")} " +
      s"plain_nodict=${rowGroups("plain_nodict")} plain_dict=${rowGroups("plain_dict")}")

    val probeIds = Seq(7L, 103L, 20005L, 300007L, 41L, 520009L, 63L, 700001L)
      .map(i => i * 2654435761L)
    // ids outside the written set: statistics cannot prune (scattered
    // layout), so bytes-read differences are pure bloom/dictionary skipping
    val absentIds = Seq.tabulate(8)(i => 17L * (i + 1) * 2654435761L + 1L) // never ≡ 0 mod the scramble

    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
      })
    def measure(table: String, ids: Seq[Long], expectHits: Boolean): (Double, Long) = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val c = CatalogOps.lookupByIds(spark, db, table, ids, "id").count()
        require(!expectHits || c >= 1, "probe must hit at least one live id")
        (System.nanoTime() - t0) / 1e9
      }
      bytesRead.set(0L)
      CatalogOps.lookupByIds(spark, db, table, ids, "id").count()
      Thread.sleep(300) // listener bus drain (dev tool; no private API)
      (times.sorted.apply(times.length / 2), bytesRead.get())
    }
    val tables = Seq("bloom_nodict", "plain_nodict", "plain_dict")
    tables.foreach(t => measure(t, probeIds, expectHits = true)) // warm
    for (t <- tables) {
      val (tp, bp) = measure(t, probeIds, expectHits = true)
      val (ta, ba) = measure(t, absentIds, expectHits = false)
      println(f"[lookupscale] $t%-13s present: $tp%.3f s/${bp / 1024}%d KiB   " +
        f"absent: $ta%.3f s/${ba / 1024}%d KiB   reps=$reps")
    }
    if (!(args.length > 2 && args(2) == "keep")) CatalogOps.dropDatabase(spark, db)
    spark.stop()
  }
}
