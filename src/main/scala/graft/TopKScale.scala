package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev harness: grouped top-k — bounded-heap aggregate vs rank window —
  * `runMain graft.TopKScale [rows] [groups] [k]`. The window form must
  * shuffle EVERY row to its group's partition and sort it there before
  * discarding all but k; the heap form's partial aggregation caps the
  * exchange at k rows per (group × map task). The gap is the k/groupSize
  * ratio — this harness measures it at training-data shapes (millions of
  * rows, 10⁵ groups, small k).
  */
object TopKScale {
  private final class Bytes extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val groups = if (args.length > 1) args(1).toLong else 100000L
    val k = if (args.length > 2) args(2).toInt else 5
    val reps = 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val data = spark.range(n).select(
      (abs(xxhash64(col("id"))) % groups).as("g"),
      (abs(xxhash64(col("id"), lit(1))) % 1000000L).as("s"),
      col("id"))

    def timed(label: String)(mk: => DataFrame): Unit = {
      val l = new Bytes
      spark.sparkContext.addSparkListener(l)
      var best = Double.MaxValue
      var rows = -1L
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        rows = mk.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      spark.sparkContext.removeSparkListener(l)
      println(f"$label%-8s best=$best%6.2f s  rows=$rows%,d  shuffle=${l.bytes.get() / 1e6 / reps}%,.0f MB/rep")
    }

    println(s"n=$n groups=$groups k=$k reps=$reps")
    timed("heap") {
      graft.operators.RelOps.groupTopKOn(data, "g", "s", "id", k)
    }
    timed("window") {
      val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id").asc)
      data.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
    }
    spark.stop()
  }
}
