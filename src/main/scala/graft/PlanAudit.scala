package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SimpleMode

/** Dev harness: one-line physical-plan audit per SparkEntry query —
  * `runMain graft.PlanAudit [sfDir]`. Flags the scale smells the build
  * rules care about: exchange count, join strategies, nested-loop joins,
  * generates below aggregates, scans without pushed filters. Reviewed by
  * hand each round; the hard guarantees live in PlanSpec.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"query"}%-22s ex  bhj smj bnlj gen  notes")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.explainString(SimpleMode)
        def c(s: String) = p.linesIterator.count(_.contains(s))
        val notes = Seq(
          if (c("PushedFilters: []") > 0 && p.contains("Filter (")) "unpushed-filter" else "",
          if (c("CartesianProduct") > 0) "CARTESIAN" else "",
          if (c("Exchange rangepartitioning") > 1) "multi-range-sort" else "")
          .filter(_.nonEmpty).mkString(",")
        println(f"$name%-22s ${c("Exchange")}%-3d ${c("BroadcastHashJoin")}%-3d " +
          f"${c("SortMergeJoin")}%-3d ${c("BroadcastNestedLoopJoin")}%-4d ${c("Generate")}%-4d $notes")
      } catch {
        case e: Throwable => println(f"$name%-22s FAILED: ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
