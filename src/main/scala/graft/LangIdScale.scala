package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: the fused [[graft.plans.TrigramLangScore]] codegen
  * expression vs the HOF `aggregate`/`transform`/`try_element_at`
  * formulation it replaces — `runMain graft.LangIdScale [nDocs]`
  * (default 200k synthetic ~60-token docs drawn from the rendered
  * multilingual vocabulary). The HOF form pays a per-gram map lookup
  * through Catalyst's interpreted higher-order machinery plus a
  * substring allocation per window; the fused form is one byte pass
  * with an open-addressed int probe, all languages at once. Asserts the
  * integer score checksums agree exactly before timing — the two forms
  * implement ONE contract.
  */
object LangIdScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    import graft.operators.LangIdOps

    val words: Seq[String] = LangIdOps.renderDict.flatMap(_._2.map(_._2))
    val nW = words.length
    val docs = spark.range(n).select(
      concat_ws(" ", transform(sequence(lit(1), lit(60)), k =>
        element_at(typedLit(words),
          (pmod(col("id") * k * lit(2654435761L), lit(nW.toLong)) + 1)
            .cast("int")))).as("text"))
      .localCheckpoint() // corpus generation off the clock

    val fused = toCol(graft.plans.TrigramLangScore(
      toExpr(col("text")), LangIdOps.langs, LangIdOps.trigramProfile))

    def hofScore(lang: String): org.apache.spark.sql.Column = {
      val entries = LangIdOps.trigramProfile.filter(_._1 == lang)
      val m = map(entries.flatMap { case (_, g, w) =>
        Seq(lit(g), lit(w)) }: _*)
      aggregate(split(col("text"), " "), lit(0L), (acc, w) =>
        acc + aggregate(
          transform(sequence(lit(1), length(w)), i =>
            coalesce(try_element_at(m,
              concat(lit("^"), w, lit("$")).substr(i, lit(3))), lit(0L))),
          lit(0L), (a, x) => a + x))
    }

    // integer checksum: Σ over docs of Σ_l score_l · (l+1) — exact
    val fusedSum = docs.select(
      aggregate(zip_with(fused, sequence(lit(1L), lit(LangIdOps.langs.length.toLong)),
        (s, i) => s * i), lit(0L), (a, x) => a + x).as("x"))
      .agg(sum(col("x"))).head().getLong(0)
    val hofSum = docs.select(
      LangIdOps.langs.zipWithIndex.map { case (l, i) =>
        (hofScore(l) * lit(i + 1L)).as(s"s$i")
      }: _*)
      .select(LangIdOps.langs.indices.map(i => col(s"s$i")).reduce(_ + _).as("x"))
      .agg(sum(col("x"))).head().getLong(0)
    require(fusedSum == hofSum,
      s"formulations diverge: fused=$fusedSum hof=$hofSum")
    println(s"[langidscale] n=$n checksum=$fusedSum (forms agree)")

    def time(tag: String)(body: => Long): Unit = {
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime()
        val r = body
        println(f"[langidscale] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
      }
    }
    time("fused codegen") {
      docs.select(aggregate(fused, lit(0L), (a, x) => a + x).as("x"))
        .agg(sum(col("x"))).head().getLong(0)
    }
    time("HOF per-lang") {
      docs.select(LangIdOps.langs.map(l => hofScore(l)).reduce(_ + _).as("x"))
        .agg(sum(col("x"))).head().getLong(0)
    }
    spark.stop()
  }
}
