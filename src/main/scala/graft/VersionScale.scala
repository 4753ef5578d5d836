package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: versioned-collection read cost vs history depth, the
  * compaction payback, and the bucketed log's exchange-free read —
  * `runMain graft.VersionScale [baseRows] [batchRows] [batches]`.
  *
  * The claim under test: [[graft.sources.CatalogOps.readVersioned]]'s
  * cost is ∝ rows written up to the snapshot (live + history), so read
  * latency grows with every upsert until compaction folds the log; and
  * the bucketed layout removes the resolution shuffle entirely.
  */
object VersionScale {
  def main(args: Array[String]): Unit = {
    val baseRows = if (args.length > 0) args(0).toLong else 2000000L
    val batchRows = if (args.length > 1) args(1).toLong else 100000L
    val batches = if (args.length > 2) args(2).toInt else 24
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.CatalogOps

    val db = "versionscale"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)

    def base = spark.range(baseRows).select(col("id").as("doc_id"),
      md5(col("id").cast("string")).as("payload"))
    def batch(i: Int) = spark.range(i * batchRows, (i + 1) * batchRows)
      .select((col("id") % baseRows).as("doc_id"),
        md5((col("id") + 7).cast("string")).as("payload"))

    def timedRead(db0: String, name: String): Double = {
      val t0 = System.nanoTime()
      CatalogOps.readVersioned(spark, db0, name).count()
      (System.nanoTime() - t0) / 1e9
    }

    for ((label, buckets) <- Seq("plain" -> 0, "bucketed" -> 32)) {
      val name = s"c_$label"
      CatalogOps.createVersionedCollection(spark, db, name, base, buckets = buckets)
      println(f"$label%-9s depth=0   read=${timedRead(db, name)}%5.2f s")
      (1 to batches).foreach { i =>
        CatalogOps.upsertVersioned(spark, db, name, batch(i))
        if (i % (batches / 4) == 0)
          println(f"$label%-9s depth=$i%-3d read=${timedRead(db, name)}%5.2f s")
      }
      val t0 = System.nanoTime()
      CatalogOps.compactVersioned(spark, db, name, floorV = batches.toLong)
      val tc = (System.nanoTime() - t0) / 1e9
      println(f"$label%-9s compact=${tc}%5.2f s  post-compact read=${timedRead(db, name)}%5.2f s")
    }
    spark.stop()
  }
}
