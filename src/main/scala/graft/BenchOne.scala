package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time a single SparkEntry query (warm + timed pass) —
  * `runMain graft.BenchOne <query_id> [sfDir] [reps]`. Same session config
  * as [[Bench]]; used to iterate on one plan without the full headline set.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warmup: JIT + codegen compile
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[benchone] $name: $dt%.3f s ($n rows)")
      dt
    }
    println(f"[benchone] $name best=${times.min}%.3f s env=${Bench.envJson()}")
    spark.stop()
  }
}
