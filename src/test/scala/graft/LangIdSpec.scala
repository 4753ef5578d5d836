package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LangIdOps

/** Language-ID pins: the codegen trigram scorer against an independent
  * string-based reference, the fixture-label accuracy contract, and the
  * zero-exchange plan shape (SURVEY §8 q_lang_id).
  */
class LangIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference: same contract (space split, `^tok$` padding,
    * char windows, Σ matched weights) written the naive way.
    */
  private def refScores(text: String): Seq[Long] = {
    val acc = Array.fill(LangIdOps.langs.length)(0L)
    text.split(" ", -1).foreach { w =>
      val p = "^" + w + "$"
      var i = 0
      while (i + 3 <= p.length) {
        val g = p.substring(i, i + 3)
        LangIdOps.trigramProfile.foreach { case (l, pg, wt) =>
          if (pg == g) acc(LangIdOps.langs.indexOf(l)) += wt
        }
        i += 1
      }
    }
    acc.toSeq
  }

  test("TrigramLangScore equals the string-based reference (codegen path)") {
    val texts = Seq(
      "", "a", "ab", "der wert", "une donnees rapide",
      "tabla consulta grupo", "biaoge chaxun fenzu shuju",
      "window batch hash row", "streuwert schluessel aggregat",
      "a  b", // empty token from a double space: zero grams, like split -1
      "xyzzy plugh nothingmatches",
      // non-ASCII: byte windows (fused) and char windows (reference)
      // differ in position but CANNOT differ in matches — every profile
      // gram is ASCII and UTF-8 continuation bytes are >= 0x80, so any
      // window overlapping a multibyte char misses in both forms
      "héllo wörld straße")
    val got = texts.toDF("text")
      .select(org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.plans.TrigramLangScore(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("text")),
          LangIdOps.langs, LangIdOps.trigramProfile)).as("s"))
      .collect()
      .map(_.getSeq[Long](0))
    texts.zip(got).foreach { case (t, g) =>
      assert(g === refScores(t), s"text: '$t'")
    }
  }

  test("q_lang_id recovers every fixture label at sf0.001 (accuracy pin)") {
    val out = LangIdOps.langIdFixture(spark, TestSpark.Sf)
    val agg = out.agg(sum(col("correct")).as("ok"), count(lit(1)).as("n")).head()
    assert(agg.getLong(0) === agg.getLong(1)) // 100% on the rendered corpus
    assert(agg.getLong(1) === 500L)
  }

  test("q_lang_id is map-side: no hash exchange anywhere in the plan") {
    val p = LangIdOps.langIdFixture(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("rendering is deterministic and ASCII; scorer is deterministic") {
    def sig() = LangIdOps.renderedDocuments(spark, TestSpark.Sf)
      .agg(bit_xor(xxhash64(concat_ws("|", col("doc_id"), col("text")))).as("h"),
        max(length(col("text"))).as("ml")).head()
    val a = sig()
    val b = sig()
    assert(a === b)
    val nonAscii = LangIdOps.renderedDocuments(spark, TestSpark.Sf)
      .filter(col("text").rlike("[^\\x00-\\x7f]")).count()
    assert(nonAscii === 0L)
  }

  test("curateE2eLang output is the CCNet battery over the derived-en subset") {
    val out = LangIdOps.curateE2eLang(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    // every kept doc must be one whose derived label is en
    val en = LangIdOps.withLangScores(
      LangIdOps.renderedDocuments(spark, TestSpark.Sf))
      .filter(col("predicted") === "en")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(out.map(_.getLong(0)).forall(en.contains))
  }

  test("confidence band: both verdicts occur, margins are exact integers, empty text is unknown") {
    import spark.implicits._
    val m = LangIdOps.langIdMargin(spark, TestSpark.Sf).localCheckpoint()
    val verdicts = m.select(col("verdict")).distinct()
      .as[String].collect().toSet
    assert(verdicts.contains("unknown"), "fence never fires on the fixture")
    assert(verdicts.size > 1, "fence rejects everything")
    // below-fence rows are exactly the unknowns; at/above keep the label
    val bad = m.filter(
      (col("margin") < LangIdOps.DefaultMinMargin && col("verdict") =!= "unknown") ||
        (col("margin") >= LangIdOps.DefaultMinMargin &&
          col("verdict") =!= col("predicted"))).count()
    assert(bad == 0L)
    // the degenerate document: all scores 0, margin 0, unknown
    val empty = LangIdOps.withLangVerdict(
      LangIdOps.withLangScores(Seq((1L, "")).toDF("doc_id", "text")),
      LangIdOps.DefaultMinMargin)
      .select(col("margin"), col("verdict")).head()
    assert(empty.getLong(0) == 0L && empty.getString(1) == "unknown")
  }

  test("verdict gate composition: the banded gate = the lang gate minus exactly the low-margin docs") {
    // pin at the GATE (the CCNet battery downstream recomputes its
    // perplexity fences over whatever subset it is fed, so output sets
    // are not simply nested — the gate-level algebra is the contract)
    val scored = LangIdOps.withLangVerdict(
      LangIdOps.withLangScores(LangIdOps.renderedDocuments(spark, TestSpark.Sf)),
      LangIdOps.DefaultMinMargin).localCheckpoint()
    val langGate = scored.filter(col("predicted") === "en")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val bandGate = scored.filter(col("verdict") === "en")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val lowMarginEn = scored
      .filter(col("predicted") === "en" && col("verdict") === "unknown")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(bandGate == langGate -- lowMarginEn)
    assert((bandGate & lowMarginEn).isEmpty)
    // and the banded chain is the CCNet battery over exactly that gate
    val out = LangIdOps.curateE2eLangVerdict(spark, TestSpark.Sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out.subsetOf(bandGate))
  }

  test("script detection: counts, dominance priority, and the purity gate") {
    // hand documents, one per dominant script; counts checked exactly
    val docs = Seq(
      (1L, "abc def"),                         // pure latin
      (2L, "ab \u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440"), // cyrillic-dominant
      (3L, "ab \u03b1\u03b2\u03b3\u03b4"),                 // greek-dominant
      (4L, "ab \u4e2d\u6587\u6587\u672c"),                 // cjk-dominant
      (5L, "ab \u0646\u0635\u0639\u0631"),                 // arabic-dominant
      (6L, ""))                                 // empty: all zero, latin by tie
    val out = LangIdOps.scriptDetectOn(
      spark.createDataFrame(docs).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getLong(5), r.getLong(6), r.getString(7), r.getLong(8))).toMap
    assert(out(1L) === ((7L, 6L, 0L, 0L, 0L, 0L, "latin", 1L)))
    assert(out(2L) === ((13L, 2L, 9L, 0L, 0L, 0L, "cyrillic", 0L)))
    assert(out(3L) === ((7L, 2L, 0L, 4L, 0L, 0L, "greek", 0L)))
    assert(out(4L) === ((7L, 2L, 0L, 0L, 4L, 0L, "cjk", 0L)))
    assert(out(5L) === ((7L, 2L, 0L, 0L, 0L, 4L, "arabic", 0L)))
    assert(out(6L) === ((0L, 0L, 0L, 0L, 0L, 0L, "latin", 1L)))
  }

  test("script detection: the planted fixture exercises the gate and flips dominance on %13") {
    val full = LangIdOps.scriptDetect(spark, TestSpark.Sf).localCheckpoint()
    val agg = full.agg(
      min(col("r_latin")), max(col("r_latin")),
      count(when(col("script") === "cyrillic", 1)),
      count(when(col("script") === "latin", 1))).head()
    assert(agg.getLong(0) == 0L && agg.getLong(1) == 1L)
    assert(agg.getLong(2) > 0L && agg.getLong(3) > 0L)
    // %13 docs: transliterated copy appended twice -> cyrillic dominates
    val m13 = full.filter(col("doc_id") % 13 === 0)
      .agg(min(when(col("n_cyrillic") > col("n_latin"), 1L).otherwise(0L)),
        max(col("r_latin"))).head()
    assert(m13.getLong(0) == 1L, "every %13 doc must be cyrillic-dominant")
    assert(m13.getLong(1) == 0L, "%13 docs must fail the purity gate")
  }
}
