package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: fused [[graft.plans.FeatureHashEmbed]] vs the HOF
  * `aggregate`/`transform` formulation it replaced, at the REFERENCE's
  * dimension — `runMain graft.EmbedScale [dim]` (default 1024, the
  * `m3e-large` width the reference embeds at, ref `TencentVDB.py:46`).
  * Fixture docs are ~60 tokens, so HOF does ~60×1024 array writes per row
  * where the fused loop does ~60 increments + one 1024-slot allocation.
  * Asserts the checksums agree before timing.
  */
object EmbedScale {
  def main(args: Array[String]): Unit = {
    val dim = if (args.length > 0) args(0).toInt else 1024
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

    val docs = graft.sources.Tables.documents(spark, sfDir).select(col("text"))
    val fused = toCol(graft.plans.FeatureHashEmbed(toExpr(col("text")), dim))
    val hof = aggregate(
      split(col("text"), " "),
      array_repeat(lit(0.0), dim),
      (acc, t) => {
        val bucket = pmod(xxhash64(t), lit(dim.toLong))
        val sgn = when(shiftright(xxhash64(t), 32).bitwiseAND(lit(1L)) === 1L, lit(1.0))
          .otherwise(lit(-1.0))
        transform(acc, (x, i) => x + when(bucket === i.cast("long"), sgn).otherwise(lit(0.0)))
      })

    // checksum: Σ per-row Σ v·(i+1) — order-sensitive, catches any divergence
    def checksum(raw: org.apache.spark.sql.Column): Double =
      docs.select(sum(aggregate(zip_with(raw, sequence(lit(1), lit(dim)),
        (v, i) => v * i.cast("double")), lit(0.0), (a, x) => a + x)).as("s"))
        .head().getDouble(0)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[embedscale] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warmup both codegen paths
    checksum(fused); checksum(hof)
    val cf = time(s"fused dim=$dim")(checksum(fused))
    val ch = time(s"hof   dim=$dim")(checksum(hof))
    // Equality is asserted PER ROW, not on the two checksums: those come
    // from separate sum() jobs whose partial-merge order is partition-
    // dependent, so exact-double equality would only hold by accident of
    // a single-partition input. The checksums remain as timing payloads.
    val mismatches = docs.select(fused.as("f"), hof.as("h"))
      .filter(not(col("f") === col("h"))).count()
    assert(mismatches == 0L, s"$mismatches rows diverge between fused and HOF")
    println(s"[embedscale] per-row equal; checksums fused=$cf hof=$ch")
    spark.stop()
  }
}
