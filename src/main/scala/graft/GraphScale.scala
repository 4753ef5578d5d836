package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: depth-limited BFS — broadcast-probe frontier iteration
  * vs shuffled-anti frontier vs visited-rejoin —
  * `runMain graft.GraphScale [chains] [depth] [rounds]`.
  *
  * Three forms, same output. The naive unroll (what a recursive CTE or
  * a careless loop does) re-joins the FULL visited set against the
  * edges every round: Σ|visited_r| ≈ R²/2·|frontier| probe rows. The
  * shuffled-anti frontier form bounds the PROBE to the current frontier
  * but still anti-joins the full visited set per round — the R² term
  * survives, it just moved into the dedup exchange (this probe is what
  * exposed it: the first A/B measured only 1.18× between naive and
  * shuffled-anti, because the anti-join dominated both).
  * [[graft.operators.LinkOps.bfsDepthOn]] now broadcasts the candidate
  * ids and streams visited deltas map-side, so visited rows never ride
  * an exchange and total shuffle is linear in R. The gap is linear in
  * ROUND COUNT — invisible on an expander that saturates in 3 hops,
  * decisive on deep-path crawl structure (pagination chains, calendar
  * archives: exactly the graphs a depth-limited crawler walks round by
  * round).
  *
  * The planted graph makes the shape explicit: `chains` parallel chains
  * of length `depth` hanging off one seed hub — frontier stays `chains`
  * rows per round while visited grows by `chains` per round. Shuffle
  * bytes are reported next to wall time because at local[32] scheduler
  * latency floors both forms (~R fixed job cost); the bytes ratio is the
  * cluster-relevant number.
  */
object GraphScale {
  private final class Bytes extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  /** The naive unroll: every round probes the FULL visited set. */
  private def bfsNaive(seeds: DataFrame, edges: DataFrame,
      maxDepth: Int): DataFrame = {
    val e = edges.localCheckpoint(false)
    var visited = seeds.select(col("doc_id"), lit(0).as("depth"))
      .localCheckpoint(false)
    for (r <- 1 to maxDepth) {
      val next = visited.join(e, visited("doc_id") === e("src"))
        .select(col("dst").as("doc_id")).distinct()
        .join(visited.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit(r).as("depth"))
        .localCheckpoint(false)
      visited = visited.unionByName(next).localCheckpoint(false)
    }
    visited
  }

  /** Frontier probe, but dedup via a shuffled anti-join against the full
    * visited set each round — the form bfsDepthOn used before the
    * broadcast-probe dedup: its probe join is frontier-bounded, yet the
    * anti-join still EXCHANGES Σ|visited_r| rows over the walk.
    */
  private def bfsShuffledAnti(seeds: DataFrame, edges: DataFrame,
      maxDepth: Int): DataFrame = {
    val e = edges.localCheckpoint(false)
    var visited = seeds.select(col("doc_id"), lit(0).as("depth"))
      .localCheckpoint(false)
    var frontier = visited.select(col("doc_id"))
    for (r <- 1 to maxDepth) {
      val next = frontier.join(e, frontier("doc_id") === e("src"))
        .select(col("dst").as("doc_id")).distinct()
        .join(visited.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit(r).as("depth"))
        .localCheckpoint(false)
      visited = visited.unionByName(next).localCheckpoint(false)
      frontier = next.select(col("doc_id"))
    }
    visited
  }

  def main(args: Array[String]): Unit = {
    val chains = if (args.length > 0) args(0).toLong else 100000L
    val depth = if (args.length > 1) args(1).toInt else 48
    val rounds = if (args.length > 2) args(2).toInt else 48
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // node id = 1 + chain*depth + pos; hub node 0 starts every chain
    val hub = spark.range(chains).select(lit(0L).as("src"),
      (col("id") * depth + 1L).as("dst"))
    val links = spark.range(chains * depth)
      .filter(col("id") % depth =!= (depth - 1)) // chain tail has no out-edge
      .select((col("id") + 1L).as("src"), (col("id") + 2L).as("dst"))
    val edges = hub.unionByName(links)
    val seeds = spark.range(1).select(lit(0L).as("doc_id"))

    def timed(label: String)(mk: => DataFrame): Long = {
      val l = new Bytes
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val n = mk.count()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(l)
      println(f"$label%-10s rounds=$rounds reached=$n%,d  ${secs}%.1f s  " +
        f"shuffle=${l.bytes.get() / 1048576.0}%.1f MiB")
      n
    }

    val a = timed("bcastprobe") {
      graft.operators.LinkOps.bfsDepthOn(seeds, edges, rounds)
    }
    val b = timed("shufanti") { bfsShuffledAnti(seeds, edges, rounds) }
    val c = timed("naive") { bfsNaive(seeds, edges, rounds) }
    require(a == b && b == c, s"forms disagree: $a vs $b vs $c")
    spark.stop()
  }
}
