package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: exact quantiles — iterative histogram refinement
  * (`RelOps.quantileExactOn`) vs Spark's exact `percentile` aggregate
  * (which buffers the whole column's value-counts in ONE aggregation
  * buffer) — `runMain graft.QuantileScale [rows]`. Distinct-heavy doubles
  * are the adversarial case for the buffering form: every value is its
  * own map entry, so the buffer is the column. The refinement never
  * holds more than one `buckets`-row histogram anywhere.
  */
object QuantileScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // distinct-heavy uniform doubles with a 10% duplicate spike
    val data = spark.range(n).select(
      when(col("id") % 10 === 0, lit(123456.789))
        .otherwise((abs(xxhash64(col("id"))) % 1000000000L).cast("double") / 1000.0)
        .as("v"))
    val ps = Seq(0.5, 0.99)

    var t0 = System.nanoTime()
    val refined = graft.operators.RelOps.quantileExactOn(data, "v", ps)
    val tRefine = (System.nanoTime() - t0) / 1e9
    println(f"refinement  $tRefine%6.1f s  ${refined.map(_._2).mkString(", ")}")

    // rank-normalization: the CDF grid vs the percent_rank window (which
    // globally sorts into ONE partition — the plan that cannot scale).
    // These run BEFORE the percentile attempt: that one can OOM-kill the
    // JVM, which is its result, not the end of the measurement session.
    t0 = System.nanoTime()
    graft.operators.RelOps.calibrateOn(data, "v")
      .agg(sum(col("pct"))).collect()
    println(f"cdf-grid    ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    t0 = System.nanoTime()
    val pr =
      try {
        import org.apache.spark.sql.expressions.Window
        data.withColumn("pct",
            percent_rank().over(Window.orderBy(col("v").asc)))
          .agg(sum(col("pct"))).collect()
        f"${(System.nanoTime() - t0) / 1e9}%6.1f s"
      } catch {
        case e: Throwable =>
          f"FAILED after ${(System.nanoTime() - t0) / 1e9}%6.1f s: " +
            e.getClass.getSimpleName
      }
    println(s"pct-window  $pr")

    t0 = System.nanoTime()
    val buffered =
      try {
        val r = data.agg(expr("percentile(v, array(0.5, 0.99))")).collect()(0)
          .getSeq[Double](0)
        f"${(System.nanoTime() - t0) / 1e9}%6.1f s  ${r.mkString(", ")}"
      } catch {
        case e: Throwable =>
          f"FAILED after ${(System.nanoTime() - t0) / 1e9}%6.1f s: " +
            e.getClass.getSimpleName
      }
    println(s"percentile  $buffered")

    // q-digest sketch on an INTEGER domain (the per-group path): one
    // partial-agg'd pass, sketch-sized exchange, fixed error contract —
    // measured against its own exact answers at forced compression
    val ints = spark.range(n).select(
      (abs(xxhash64(col("id"))) % 1048576L).as("v")) // 2^20 domain
    val probs = Seq(0.5, 0.99)
    t0 = System.nanoTime()
    val qd = {
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
      ints.agg(toCol(graft.plans.QDigestQuantiles(
          toExpr(col("v")), 20, 1024, probs).toAggregateExpression()).as("qd"))
        .select(col("qd.qs"), col("qd.internal")).collect()(0)
    }
    val tQd = (System.nanoTime() - t0) / 1e9
    val qdAns = qd.getSeq[Long](0)
    println(f"qdigest     $tQd%6.1f s  ${qdAns.mkString(", ")}  compressed=${qd.getBoolean(1)}")
    // observed rank error vs the contract levels·n/capacity
    t0 = System.nanoTime()
    val exactInts = graft.operators.RelOps.quantileExactOn(
      ints.select(col("v").cast("double").as("v")), "v", probs).map(_._2)
    println(f"int-exact   ${(System.nanoTime() - t0) / 1e9}%6.1f s  ${exactInts.mkString(", ")}")
    probs.zip(qdAns).foreach { case (p, ans) =>
      val target = math.ceil(p * n).toLong
      val rank = ints.filter(col("v") <= ans).count()
      println(f"p=$p rank(ans)=$rank target=$target |err|=${math.abs(rank - target)} bound=${20L * n / 1024}")
    }
    spark.stop()
  }
}
