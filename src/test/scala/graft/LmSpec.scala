package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TextAnalysisOps, LangIdOps}
import graft.sources.Tables

/** The bigram-LM scale contract (VERDICT r15's one flagged seam): the
  * in-query LM broadcasts its corpus-derived count tables ONLY when the
  * measured statistic (distinct bigram types) is model-sized; above the
  * ceiling the corpus shuffles on the word keys — same answers, a plan
  * that survives heaps-law vocabulary growth. The bounded maintained LM
  * ([[TextAnalysisOps.lmBigramScoreStored]]) is the CCNet-published
  * alternative: sample-trained, top-V pruned, broadcast-safe by
  * construction.
  */
class LmSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(SimpleMode)

  private def docs: DataFrame =
    Tables.documents(spark, sf).select(col("doc_id"), col("text"))

  test("model-sized regime broadcasts both LM count joins") {
    val p = plan(TextAnalysisOps.lmBigramScore(spark, sf))
    val n = p.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin")
    assert(n >= 2, s"expected both model joins broadcast:\n$p")
  }

  test("above-ceiling regime drops the broadcast hint (corpus shuffles on word keys)") {
    // at the fixture's sizes Catalyst's own size policy would still
    // auto-broadcast the (accurately stats'd) checkpointed count tables —
    // which is correct; disabling it emulates the at-scale regime where
    // the tables exceed every broadcast ceiling, so the pin verifies the
    // HINT is gone and nothing forces a heaps-law table onto the driver
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(k)
    try {
      spark.conf.set(k, "-1")
      val p = plan(TextAnalysisOps.lmBigramScoreOn(docs, broadcastMaxTypes = 0L))
      assert(!p.contains("BroadcastHashJoin"),
        s"forced broadcast survived the dispatch:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally spark.conf.set(k, prev)
  }

  test("both regimes are ONE contract: identical rows either side of the ceiling") {
    val bc = TextAnalysisOps.lmBigramScoreOn(docs).collect().toSeq
    val sh = TextAnalysisOps.lmBigramScoreOn(docs, broadcastMaxTypes = 0L)
      .collect().toSeq
    assert(bc == sh)
  }

  test("curateMultilang's per-language LM rides the same dispatch (plan has broadcasts at fixture scale)") {
    val p = plan(LangIdOps.curateMultilang(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("stored LM: the top-V prune actually bites on the fixture sample") {
    TextAnalysisOps.lmBigramScoreStored(spark, sf) // ensure the store
    val types = spark.table("`graft_lm`.`docs__lmbi`")
      .groupBy(col("w1"), col("w2")).agg(sum(col("c2")).as("c2"))
      .count()
    assert(types > 512L,
      s"fixture sample carries only $types bigram types — the prune is a no-op and the oracle would not face it")
  }

  test("stored LM plan: bounded broadcast + TakeOrderedAndProject prune, no global sort") {
    val df = TextAnalysisOps.lmBigramScoreStored(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("stored LM scores every document and counts ALL bigram positions (OOV included)") {
    val stored = TextAnalysisOps.lmBigramScoreStored(spark, sf)
      .select(col("doc_id"), col("n_bigrams"))
    val live = TextAnalysisOps.lmBigramScore(spark, sf)
      .select(col("doc_id"), col("n_bigrams"))
    // denominators agree: the stored model floors OOV to p = 0 instead of
    // dropping positions, so n_bigrams is model-independent
    assert(stored.exceptAll(live).isEmpty && live.exceptAll(stored).isEmpty)
  }

  test("stored-LM CCNet serve plan: no corpus-derived count table (r17)") {
    // the live chain trains the LM in-query: its plan carries count(1)
    // aggregates keyed by word columns over the corpus bigram stream.
    // The stored serve must not — its only w-keyed aggregates are the
    // store-log SUM folds, and the corpus-side keys are doc_id/lang only.
    def wKeyedCountAggs(p: String): Int = p.linesIterator.count(l =>
      l.contains("Aggregate") && l.contains("w1#") && l.contains("count(1)"))
    // matcher self-check: the live LM-train SHAPE (an un-checkpointed
    // count(1) keyed by the word column) must trip it — the production
    // live chain hides its aggregates behind localCheckpoint, so the
    // reference is built inline
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("w1"))
    val liveShape = toks.join(
      toks.groupBy(col("w1")).agg(count(lit(1)).as("c1")), Seq("w1"))
    assert(wKeyedCountAggs(plan(liveShape)) > 0,
      s"pin self-check against the live LM-train shape:\n${plan(liveShape)}")
    val stored = plan(LangIdOps.curateMultilangStored(spark, sf))
    assert(wKeyedCountAggs(stored) == 0,
      s"stored serve still builds a corpus-derived count table:\n$stored")
    // the model rides the store tables + a bounded broadcast
    assert(stored.contains("mlmbi") && stored.contains("mlmuni"), stored)
    assert(stored.contains("BroadcastHashJoin"), stored)
    // the whole-corpus stored chain's LM side is lmBigramScoreStored's
    // already-pinned plan; pin the composition's scored frame the same way
    val ccnet = plan(TextAnalysisOps.lmBigramScoreStored(spark, sf))
    assert(wKeyedCountAggs(ccnet.linesIterator
      .filterNot(_.contains("lmbi")).filterNot(_.contains("lmuni"))
      .mkString("\n")) == 0, ccnet)
    // the per-language composed serves (r17): same discipline — the
    // final frame's plan reads the checkpointed scored frame, and the
    // kept-side gate battery carries no w-keyed count table either
    Seq(plan(LangIdOps.curateE2eLangStored(spark, sf)),
        plan(LangIdOps.curateE2eVerdictStored(spark, sf))).foreach { p =>
      assert(wKeyedCountAggs(p) == 0, p)
    }
  }

  test("multilang LM store is per-language sample-trained, prune bites per lang") {
    LangIdOps.curateMultilangStored(spark, sf) // ensure the store
    val folded = spark.table("`graft_lmml`.`docs__mlmbi`")
      .groupBy(col("lang"), col("w1"), col("w2")).agg(sum(col("c2")).as("c2"))
      .localCheckpoint(false)
    // each language's folded mass equals ITS derived-lang sample's
    // bigram positions — models never leak across shards
    val perLang = folded.groupBy(col("lang")).agg(sum(col("c2")).as("mass"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = LangIdOps.documentsWithDerivedLang(spark, sf)
      .filter(col("doc_id") % 2 === 0)
      .select(col("predicted").as("lang"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .groupBy(col("lang")).agg(sum(size(col("t")) - 1).as("mass"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == expected)
    // the top-512 prune is live for every language at sf0.01+
    val types = folded.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types.values.forall(_ > 512L),
      s"per-lang types $types — the prune would be a no-op for some shard")
  }

  test("stored curate serves are deterministic and bucket-complete") {
    val a = TextAnalysisOps.curateCcnetStored(spark, sf).collect().toSeq
    val b = TextAnalysisOps.curateCcnetStored(spark, sf).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    assert(a.forall(r => r.getString(3) == "head" || r.getString(3) == "middle"))
    val m = LangIdOps.curateMultilangStored(spark, sf).collect().toSeq
    assert(m.nonEmpty)
    assert(m.map(_.getString(0)).distinct.size > 1,
      "stored multilang should keep docs across several languages")
  }

  test("stored LM is sample-trained: an out-of-sample-only transition scores p = 0") {
    // a doc whose bigrams never appear in the doc_id % 2 = 0 half would
    // floor to 0; synthesize the check directly against the folded model:
    // every model row's (w1, w2) must come from the training sample
    val model = spark.table("`graft_lm`.`docs__lmbi`")
      .groupBy(col("w1"), col("w2")).agg(sum(col("c2")).as("c2"))
    // cheap containment proxy: total folded mass equals the sample's
    // total bigram positions (counts are exact integer partial folds)
    val folded = model.agg(sum(col("c2"))).head().getLong(0)
    val expected = docs.filter(col("doc_id") % 2 === 0)
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .agg(sum(size(col("t")) - 1)).head().getLong(0)
    assert(folded == expected, s"folded=$folded expected=$expected")
  }
}
