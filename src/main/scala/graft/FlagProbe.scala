package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: WARM timing of the funnel flag battery in isolation
  * (`runMain graft.FlagProbe [sfDir] [reps]`) — FunnelProbe times cold
  * plans where codegen compile dominates; this warms each piece first.
  */
object FlagProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextAnalysisOps
    import graft.sources.Tables
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[flagprobe] $name%-24s best=${ts.min}%6.3f s all=" +
        ts.map(t => f"$t%.3f").mkString(","))
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val hashes = docs.select(col("doc_id"), md5(col("text")).as("__h"))
    def ded = hashes
      .join(hashes.groupBy(col("__h")).agg(min(col("doc_id")).as("__kid")),
        Seq("__h"))
      .select(col("doc_id"),
        (col("doc_id") === col("__kid")).cast("long").as("f_dedup"))
    def evalNg = TextAnalysisOps.ngramSet(docs.filter(col("source") === "src19"))
    time("ded-only")(noop(ded))
    time("evalNg-only")(noop(evalNg))
    time("flags-full")(
      TextAnalysisOps.funnelFlagsOn(docs, evalNg, ded).count())

    // bisect the fused chain (mirrors funnelFlagsOn's structure)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val evalArr = broadcast(
      evalNg.agg(array_sort(collect_set(col("g"))).as("__eval_g")))
    val spread = docs.repartition(col("doc_id"))
    val lang = graft.operators.LangIdOps.withDerivedLangOn(spread)
      .withColumn("f_lang", (col("predicted") === "en").cast("long"))
    time("fused-lang")(noop(lang))
    val gop = TextAnalysisOps.probeGopher(lang)
    time("fused-lang+gop")(noop(gop))
    val rep = TextAnalysisOps.probeRep(gop)
    time("fused-+rep")(noop(rep))
    val dec = rep.join(evalArr)
      .withColumn("__shared",
        toCol(graft.plans.SortedProbeCount(
          toExpr(array_sort(TextAnalysisOps.probeNgrams(col("text")))),
          toExpr(col("__eval_g")))).cast("long"))
      .withColumn("f_decon",
        (col("source") =!= "src19" && (col("__shared") > 0)
          .cast("long") === 0L).cast("long"))
      .drop("__eval_g", "__shared")
    time("fused-+dec")(noop(dec))
    val pre = dec
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        col("f_lang"), col("f_gopher"), col("f_rep"), col("f_decon"))
    time("fused-pre-join")(noop(pre))
    time("fused-joined")(noop(pre.join(ded, Seq("doc_id"))))
    spark.stop()
  }
}
