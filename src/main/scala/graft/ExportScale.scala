package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the streaming verified export's SERVE cost vs
  * micro-batch depth, and the compaction payoff
  * (`runMain graft.ExportScale [n] [batches]` — r18). A live ingest
  * accretes one `(shard, batch_id)` partition set per micro-batch;
  * the serve scans the written table (file count grows with depth)
  * and folds the log. This measures serve wall-clock and file counts
  * at full depth, then after [[graft.sources.CatalogOps
  * .compactExportShards]] — the cadence datum for how often a real
  * pipeline should fold (the winmaint convention).
  */
object ExportScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val nBatches = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.sources.CatalogOps
    val db = "graft_exportscale"
    val name = "docs"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 10000).map(i => s"w$i")
    val docs = (0L until n.toLong).map { id =>
      (id, (0 until 12).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }.toDF("doc_id", "text").cache()
    docs.count()
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[exportscale] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }
    def fileCount(): Long = {
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED `$db`.`$name`")
        .filter(col("col_name") === "Location").head().getString(1)
      val root = new java.io.File(new java.net.URI(loc))
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(root)
    }
    val repTasks = if (args.length > 2) args(2).toInt else 0
    timed(s"ingest n=$n as $nBatches batches (repartitionTasks=$repTasks)") {
      (0 until nBatches).foreach { b =>
        val batch = docs.filter(col("doc_id") % nBatches === b)
        CatalogOps.appendBatchLog(spark, db, s"${name}__manifestlog",
          CatalogOps.exportIncrementalBatch(spark, db, name, batch,
            b.toLong, repartitionTasks = repTasks),
          b.toLong)
      }
    }
    println(s"[exportscale]   files at depth $nBatches: ${fileCount()}")
    val before = timed(s"serve at depth $nBatches") {
      CatalogOps.exportVerifiedStreamServe(spark, db, name)
        .collect().map(_.toSeq).toSeq
    }
    timed("compactExportShards") {
      CatalogOps.compactExportShards(spark, db, name)
    }
    println(s"[exportscale]   files after compaction: ${fileCount()}")
    val after = timed("serve after compaction") {
      CatalogOps.exportVerifiedStreamServe(spark, db, name)
        .collect().map(_.toSeq).toSeq
    }
    require(after == before, "compaction changed the served manifest")
    println("[exportscale] served manifest identical pre/post compaction")
    // the LOG side (r19): fold the per-batch partial rows to one row
    // per shard under the watermark — row count collapses from
    // batches×16 to 16, the serve's log fold reads one partition
    def logRows(): Long =
      spark.table(s"`$db`.`${name}__manifestlog`").count()
    println(s"[exportscale]   log rows at depth $nBatches: ${logRows()}")
    timed("compactBatchLog") {
      CatalogOps.compactBatchLog(spark, db, s"${name}__manifestlog")
    }
    println(s"[exportscale]   log rows after fold: ${logRows()}")
    val afterLog = timed("serve after log fold") {
      CatalogOps.exportVerifiedStreamServe(spark, db, name)
        .collect().map(_.toSeq).toSeq
    }
    require(afterLog == before, "log fold changed the served manifest")
    println("[exportscale] served manifest identical pre/post log fold")
    CatalogOps.dropDatabase(spark, db)
    spark.stop()
  }
}
