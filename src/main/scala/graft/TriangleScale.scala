package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: the degree-ordered triangle count
  * ([[graft.operators.LinkOps.triangleCountOn]]) vs the id-ordered naive
  * orientation on a HUB graph — `runMain graft.TriangleScale [hubDeg]
  * [extraEdges]`. The planted shape is the crawl-graph reality: one
  * page everyone links (a homepage, a license page) plus a sparse
  * background. Id-ordering gives the hub (id 0) out-degree = its full
  * degree, so the wedge join enumerates d²/2 pairs at that one node;
  * degree-ordering points every hub edge INTO the hub (out-degree 0
  * there) and bounds every node's out-degree by O(√m) — the same
  * answer, without the quadratic corner.
  */
object TriangleScale {
  def main(args: Array[String]): Unit = {
    val hubDeg = if (args.length > 0) args(0).toInt else 20000
    val extra = if (args.length > 1) args(1).toInt else 100000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // hub 0 — spokes 1..hubDeg; background ring edges close some triangles
    val hub = spark.range(1, hubDeg + 1L)
      .select(lit(0L).as("a"), col("id").as("b"))
    val ring = spark.range(1, extra.toLong)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val und = hub.unionByName(ring)
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()

    def run(byDegree: Boolean): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = graft.operators.LinkOps.triangleCountOn(und, byDegree)
        .collect()(0)
      ((System.nanoTime() - t0) / 1e9, r.getLong(0))
    }
    val (tDeg, nDeg) = run(byDegree = true)
    println(f"degree-ordered $tDeg%7.2f s  triangles=$nDeg")
    val (tId, nId) = run(byDegree = false)
    println(f"id-ordered     $tId%7.2f s  triangles=$nId")
    require(nDeg == nId, s"orientation changed the answer: $nDeg vs $nId")
    println(f"speedup        ${tId / tDeg}%7.1f x  (hub wedge pairs avoided: ${hubDeg.toLong * (hubDeg - 1) / 2})")
    spark.stop()
  }
}
