package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: bloom-reduced vs plain shuffle join in the regime the
  * reduction targets — `runMain graft.JoinScale [probeRows] [buildKeys] [reps]`.
  *
  * Regime: build side too big to broadcast, probe side much bigger still,
  * build selective (most probe rows match nothing). At 100 TB that is the
  * id-backjoin shape (retrieved/filtered id set ⋈ full corpus): the plain
  * plan shuffles the ENTIRE probe side to the join's exchange; the bloom
  * plan drops non-members map-side first, so the exchange carries only the
  * matching fraction plus false positives.
  *
  * local[32] emulation: auto-broadcast is disabled for the joins under
  * test (the 100 TB build side is cluster-broadcastable never, GBs wide),
  * and match rate is a parameter of the synthesized keys. Wall time AND
  * shuffle-write bytes are reported — on a single box the shuffle is
  * loopback so the byte ratio is the transferable number, the wall ratio
  * the local sanity check.
  */
object JoinScale {

  /** Sums shuffle write bytes across completed stages, and tracks the
    * straggler signal: the longest single task vs the mean, over tasks
    * that READ shuffle data (reducers — where a hot key lands).
    */
  private final class ShuffleBytesListener extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val sumTaskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      te.taskMetrics match {
        case null => ()
        case m if m.shuffleReadMetrics.recordsRead > 0 =>
          val ms = m.executorRunTime
          maxTaskMs.getAndAccumulate(ms, math.max(_, _))
          sumTaskMs.addAndGet(ms)
          nTasks.incrementAndGet()
        case _ => ()
      }
  }

  def main(args: Array[String]): Unit = {
    val skewMode = args.headOption.contains("skew")
    val modal = args.headOption.exists(a => a == "skew" || a == "interval")
    val num = if (modal) args.drop(1) else args
    val probeRows = if (num.length > 0) num(0).toLong else 20000000L
    val buildKeys = if (num.length > 1) num(1).toLong else 2000000L
    val reps = if (num.length > 2) num(2).toInt else 3
    val spread = if (num.length > 3) num(3).toLong else 10L // keySpace/buildKeys ⇒ 1/spread match rate
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.BloomFunctions

    // Probe: keys uniform over 10× the build key range -> ~10% match rate.
    // Payload column makes each shuffled probe row cost real bytes.
    val keySpace = buildKeys * spread
    val probe = spark.range(probeRows).select(
      (abs(xxhash64(col("id"))) % keySpace).as("k"),
      md5(col("id").cast("string")).as("payload"))
    // Build: distinct scattered keys in [0, buildKeys) plus a value column.
    val build = spark.range(buildKeys).select(
      col("id").as("bk"), (col("id") * 37L % 1000L).as("bv"))

    // The aggregate CONSUMES the payload: under a bare count() Catalyst
    // prunes every non-key column out of the join's exchange and the plain
    // plan shuffles 8-byte keys — measured here first, 123 MB plain vs
    // 126 MB bloom, a wash. The 100 TB backjoin exists to FETCH columns,
    // so the honest probe carries them through the shuffle.
    def joined(p: DataFrame): DataFrame =
      p.join(build, col("k") === col("bk"))
        .agg(count(lit(1)).as("n"), sum(length(col("payload")) + col("bv")).as("chk"))

    def timed(label: String)(mk: => DataFrame): Unit = {
      val listener = new ShuffleBytesListener
      spark.sparkContext.addSparkListener(listener)
      var best = Double.MaxValue
      var rows = -1L
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        rows = mk.collect()(0).getLong(0)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      spark.sparkContext.removeSparkListener(listener)
      val mb = listener.bytes.get() / 1e6 / reps
      val maxMs = listener.maxTaskMs.get()
      val meanMs = if (listener.nTasks.get() > 0)
        listener.sumTaskMs.get() / listener.nTasks.get() else 0L
      val straggle = if (meanMs > 0) maxMs.toDouble / meanMs else 0.0
      println(f"$label%-14s best=$best%7.2f s  rows=$rows%,d  shuffle=$mb%,.0f MB/rep" +
        f"  maxTask=$maxMs%,d ms  straggle=$straggle%.1fx")
    }

    if (args.headOption.contains("interval")) {
      // `runMain graft.JoinScale interval [leftRows] [rightRows]` —
      // keyless ±60 s pairing over a month of uniform timestamps:
      // bucketed decomposition vs Spark's cartesian fallback.
      val ln = if (num.length > 0) num(0).toLong else 100000L
      val rn = if (num.length > 1) num(1).toLong else 100000L
      val monthSec = 30L * 24 * 3600
      def times(n: Long, salt: Int) = spark.range(n).select(
        col("id"),
        timestamp_seconds(lit(1700000000L) +
          pmod(xxhash64(col("id"), lit(salt)), lit(monthSec))).as("ts"))
      val lT = times(ln, 1)
      val rT = times(rn, 2)
      def t(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"$label%-10s ${(System.nanoTime() - t0) / 1e9}%7.2f s  pairs=$n%,d")
      }
      println(s"INTERVAL left=$ln right=$rn tol=60s span=30d")
      t("bucketed") {
        graft.operators.RelOps.intervalJoinOn(
          lT.withColumnRenamed("id", "lid"), "ts",
          rT.withColumnRenamed("id", "rid")
            .withColumnRenamed("ts", "rts"), "rts", 60L)
      }
      t("cartesian") {
        lT.withColumnRenamed("id", "lid").crossJoin(
          rT.withColumnRenamed("id", "rid").withColumnRenamed("ts", "rts"))
          .where(abs(col("ts").cast("long") - col("rts").cast("long")) <= 60L)
      }
      spark.stop()
      return
    }

    if (skewMode) {
      // Planted-skew mode: `runMain graft.JoinScale skew [probeRows] [buildKeys]`
      // 30% of probe rows carry ONE key; the rest spread uniformly. Plain
      // shuffle join ⇒ one reducer owns 30% of the table. Compared: AQE's
      // adaptive skew split (sort-merge only), blanket salting (join
      // [[RelOps.joinSalted]] shape: build replicated S× wholesale), and
      // the targeted hot-key salt ([[RelOps.joinHotSalted]]).
      val pr = probeRows
      val bk = buildKeys
      val skProbe = spark.range(pr).select(
        col("id").as("rid"),
        when(col("id") % 10 < 3, lit(7L))
          .otherwise(abs(xxhash64(col("id"))) % bk).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val skBuild = spark.range(bk).select(
        col("id").as("bk"), (col("id") * 37L % 1000L).as("bv"))
      def agg(df: org.apache.spark.sql.DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n"), sum(length(col("payload")) + col("bv")).as("chk"))
      println(s"SKEW probe=$pr build=$bk hotShare=30% reps=$reps")
      timed("plain-aqe") { agg(skProbe.join(skBuild, col("k") === col("bk"))) }
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      timed("plain-noaqe") { agg(skProbe.join(skBuild, col("k") === col("bk"))) }
      timed("salt-blanket") {
        val s = 16
        val p = skProbe.withColumn("salt", pmod(xxhash64(col("rid")), lit(s.toLong)))
        val b = skBuild.withColumn("salt", explode(sequence(lit(0L), lit(s.toLong - 1))))
        agg(p.join(b, p("k") === b("bk") && p("salt") === b("salt")))
      }
      timed("salt-hotkeys") {
        agg(graft.operators.RelOps.joinHotSalted(
          skProbe, "k", "rid", skBuild, "bk",
          hotThreshold = pr / 1000, saltFactor = 16))
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.stop()
      return
    }

    println(s"probe=$probeRows build=$buildKeys keySpace=$keySpace reps=$reps")
    timed("plain") { joined(probe) }
    timed("bloom") {
      joined(BloomFunctions.bloomReduce(spark, probe, "k", build.select(col("bk")), "bk"))
    }
    // The floor: an exact pre-computed semi-join reduction (what the bloom
    // approximates without the extra shuffle it would cost).
    timed("exact-semi") {
      joined(probe.join(build.select(col("bk")), col("k") === col("bk"), "left_semi"))
    }
    spark.stop()
  }
}
