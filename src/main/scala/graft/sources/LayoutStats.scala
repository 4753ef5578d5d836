package graft.sources

import org.apache.spark.sql.SparkSession

/** Driver-side layout analysis from parquet FOOTERS — what a zone-map
  * (row-group min/max) pruning reader would skip, computed without
  * scanning a data page. The footer is ground truth for layout quality:
  * a clustered write shows tight per-group boxes here before any query
  * runs. Numeric (double/long/int/float) columns only — that is what the
  * z-order layout clusters.
  */
object LayoutStats {

  /** Per-row-group [min, max] box per requested column, plus the group's
    * row count. One footer read per file of the table/path; nothing
    * distributed (footers are driver-scale metadata, same budget as
    * [[graft.operators.KnnOps.parquetRowCount]]).
    */
  def rowGroupBoxes(spark: SparkSession, tableOrPath: String,
                    cols: Seq[String]): Seq[(Array[(Double, Double)], Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.Path
    import scala.jdk.CollectionConverters._
    val files: Seq[String] =
      if (tableOrPath.contains("/")) {
        val conf = spark.sessionState.newHadoopConf()
        val root = new Path(tableOrPath)
        val fs = root.getFileSystem(conf)
        fs.listStatus(root).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toString)
      } else spark.table(tableOrPath).inputFiles.toSeq
    val conf = spark.sessionState.newHadoopConf()
    files.sorted.flatMap { f =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f), conf))
      try {
        r.getFooter.getBlocks.asScala.toSeq.map { block =>
          val byName = block.getColumns.asScala
            .map(c => c.getPath.toDotString -> c).toMap
          val box = cols.map { c =>
            val st = byName(c).getStatistics
            require(st != null && !st.isEmpty, s"no statistics for $c in $f")
            def d(x: Comparable[_]): Double = x match {
              case v: java.lang.Double  => v.doubleValue()
              case v: java.lang.Float   => v.doubleValue()
              case v: java.lang.Long    => v.doubleValue()
              case v: java.lang.Integer => v.doubleValue()
              case other => throw new IllegalArgumentException(
                s"non-numeric statistics for $c: ${other.getClass}")
            }
            (d(st.genericGetMin()), d(st.genericGetMax()))
          }.toArray
          (box, block.getRowCount)
        }
      } finally r.close()
    }
  }

  /** Row groups whose box OVERLAPS every queried range — exactly the set
    * a min/max-pruning scan must read. Returns (groupsRead, rowsRead,
    * groupsTotal, rowsTotal).
    */
  def pruneCount(boxes: Seq[(Array[(Double, Double)], Long)],
                 ranges: Seq[(Int, Double, Double)]): (Int, Long, Int, Long) = {
    val hit = boxes.filter { case (box, _) =>
      ranges.forall { case (i, lo, hi) => box(i)._2 >= lo && box(i)._1 <= hi }
    }
    (hit.length, hit.map(_._2).sum, boxes.length, boxes.map(_._2).sum)
  }
}
