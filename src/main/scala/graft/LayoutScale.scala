package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: multi-column pruning by layout — unsorted vs single-sort
  * vs z-order, measured from parquet footers (what a zone-map reader MUST
  * read) and from an actual Spark filtered scan (bytes read). Run:
  * `runMain graft.LayoutScale [rows] [rowGroupKiB]`.
  *
  * The synthetic table is the adversarial case for incidental locality:
  * two independent uniform columns — any pruning measured here comes
  * from the layout alone, not from arrival-order correlation.
  */
object LayoutScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val groupKiB = if (args.length > 1) args(1).toLong else 1024L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.{CatalogOps, LayoutStats}

    val db = "layoutscale"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    val keySpace = 1000000L
    val data = spark.range(n).select(
      (abs(xxhash64(col("id"))) % keySpace).cast("double").as("x"),
      (abs(xxhash64(col("id"), lit(1))) % keySpace).cast("double").as("y"),
      md5(col("id").cast("string")).as("payload"))
    val rg = groupKiB * 1024

    data.write.mode("overwrite")
      .option("parquet.block.size", rg.toString).saveAsTable(s"`$db`.`unsorted`")
    data.repartitionByRange(8, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite")
      .option("parquet.block.size", rg.toString).saveAsTable(s"`$db`.`sortx`")
    CatalogOps.createZorderedCollection(spark, db, "zorder", data, "x", "y",
      shards = 8, rowGroupBytes = rg)

    // 1% slabs on each axis; the box is their 0.01% intersection
    val (xLo, xHi) = (200000.0, 210000.0)
    val (yLo, yHi) = (400000.0, 410000.0)
    val preds = Seq(
      "x-only" -> Seq((0, xLo, xHi)),
      "y-only" -> Seq((1, yLo, yHi)),
      "box" -> Seq((0, xLo, xHi), (1, yLo, yHi)))

    for (layout <- Seq("unsorted", "sortx", "zorder")) {
      val boxes = LayoutStats.rowGroupBoxes(spark, s"$db.$layout", Seq("x", "y"))
      for ((tag, p) <- preds) {
        val (g, r, gt, rt) = LayoutStats.pruneCount(boxes, p)
        // actual scan confirmation: bytes read under the pushed filter
        val cond = p.map { case (i, lo, hi) =>
          val c = if (i == 0) col("x") else col("y")
          c >= lo && c <= hi
        }.reduce(_ && _)
        val t0 = System.nanoTime()
        val rows = spark.table(s"`$db`.`$layout`").where(cond).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"$layout%-9s $tag%-7s groups=$g%4d/$gt%4d  rowsInGroups=$r%,11d/$rt%,d" +
          f"  matched=$rows%,9d  scan=$sec%5.2f s")
      }
    }
    spark.stop()
  }
}
