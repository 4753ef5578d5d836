package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysisOps

/** The C4 cleaning battery (Raffel et al. 2020 §2.2): every rule must
  * be EXERCISED both ways by the planted fixture structure, the kept
  * text must contain only retained lines, and the e2e composition must
  * consume exactly the pages that survive every page rule.
  */
class C4Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private lazy val rules = TextAnalysisOps.c4Rules(spark, sf)
    .localCheckpoint()

  private val flags = Seq("r_sentences", "r_badword", "r_lorem", "r_brace")

  test("every page rule takes BOTH values on the planted fixture") {
    val row = rules.select(flags.flatMap(f =>
      Seq(min(col(f)).as(s"min_$f"), max(col(f)).as(s"max_$f"))): _*)
      .head()
    flags.zipWithIndex.foreach { case (f, i) =>
      assert(row.getLong(2 * i) == 0L, s"$f never fails on the fixture")
      assert(row.getLong(2 * i + 1) == 1L, s"$f never passes on the fixture")
    }
  }

  test("keep is the conjunction of all four page rules") {
    val bad = rules.filter(
      col("keep") =!= flags.map(col).reduce(_ * _)).count()
    assert(bad == 0L)
  }

  test("line retention: terminal punctuation, >=5 words, no javascript") {
    import spark.implicits._
    val doc = Seq((1L, Seq(
      "this line has five words.",   // kept
      "short line stops.",           // word floor
      "this line never terminates at all", // no terminal punct
      "enable javascript to view this page.", // javascript rule
      "does a question also count here?",     // kept
      "a quoted ending counts as terminal \"" // kept (end quote)
    ).mkString("\n"))).toDF("doc_id", "text")
    val r = TextAnalysisOps.c4RulesOn(doc).head()
    assert(r.getAs[Long]("n_lines") == 6L)
    assert(r.getAs[Long]("n_kept") == 3L)
    val kept = r.getAs[String]("kept_text").split("\n")
    assert(kept.forall(l => !l.contains("javascript")))
    assert(kept.forall(l => l.split(" ").length >= 5))
    assert(kept.forall(l => Seq('.', '!', '?', '"').contains(l.last)))
  }

  test("n_kept straddles the 3-sentence floor and counts rise with plants") {
    // %6-not-%4 pages keep exactly 3 lines; %12 pages keep 4; odd
    // non-%3 pages keep 1 — the planted arithmetic, re-derived here.
    // %17/%23 poison lines are themselves retention-eligible (the PAGE
    // rule drops them, not the line rule), so exclude those docs here
    val byMod = rules
      .withColumn("m12", col("doc_id") % 12)
      .filter(col("doc_id") % 17 =!= 0 && col("doc_id") % 23 =!= 0)
      .groupBy(col("m12")).agg(min(col("n_kept")).as("mn"), max(col("n_kept")).as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byMod(1L) == ((1L, 1L)))   // odd, not %3: base line only
    assert(byMod(6L) == ((3L, 3L)))   // %2 and %3, not %4
    assert(byMod(0L) == ((4L, 4L)))   // %2, %3 and %4
    assert(byMod(4L) == ((3L, 3L)))   // %2 and %4, not %3
  }

  test("e2e consumes exactly the keep=1 pages and packs deterministically") {
    val e2e = TextAnalysisOps.curateEndToEndC4(spark, sf).localCheckpoint()
    // every emitted doc survived the page battery
    val keptIds = rules.filter(col("keep") === 1L).select(col("doc_id"))
    assert(e2e.join(keptIds, Seq("doc_id"), "left_anti").count() == 0L)
    // the 20-token floor binds: no emitted page carries fewer tokens
    assert(e2e.filter(col("n_tok") < 20L).count() == 0L)
    // 18-token pages (3 kept lines: %6-not-%4, no poison) were gated OUT
    // even though their page keep=1 — the floor is doing work
    val shortKept = rules.filter(col("keep") === 1L &&
      col("doc_id") % 6 === 0 && col("doc_id") % 4 =!= 0)
    assert(shortKept.count() > 0L)
    assert(e2e.join(shortKept.select(col("doc_id")), Seq("doc_id")).count() == 0L)
    // determinism
    val again = TextAnalysisOps.curateEndToEndC4(spark, sf)
    assert(e2e.exceptAll(again).count() == 0L && again.exceptAll(e2e).count() == 0L)
  }
}
