package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage timing of the curation-funnel flag frames to
  * isolate plan-level cost (`runMain graft.FunnelProbe [sfDir]`).
  */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{LangIdOps, TextAnalysisOps}
    import graft.sources.Tables
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val docs = Tables.documents(spark, sfDir)
    time("lang")(LangIdOps.documentsWithDerivedLang(spark, sfDir)
      .filter(col("predicted") === "en").count())
    time("gopher")(TextAnalysisOps.gopherRules(spark, sfDir, 20L, 100000L, 1L)
      .filter(col("keep") === 1).count())
    time("repetition-plain")(TextAnalysisOps.gopherRepetition(spark, sfDir)
      .count())
    time("repetition-proj")(TextAnalysisOps.gopherRepetition(spark, sfDir)
      .select(col("doc_id"), col("keep")).count())
    time("repetition-filter")(TextAnalysisOps.gopherRepetition(spark, sfDir)
      .filter(col("keep") === 1).count())
    time("dedup")(docs.select(md5(col("text")).as("h")).distinct().count())
    time("decontaminate")(TextAnalysisOps.decontaminate(spark, sfDir).count())
    time("funnel-full")(TextAnalysisOps.curationFunnel(spark, sfDir).count())
    spark.stop()
  }
}
