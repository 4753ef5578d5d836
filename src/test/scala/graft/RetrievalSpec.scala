package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{KnnOps, RetrievalOps}
import graft.sources.Tables

/** Lexical / hybrid retrieval (RetrievalOps): each operator cross-checked
  * against an independent in-memory reference computation over the same
  * sf0.001 fixture — BM25 re-derived from collected token lists, RRF
  * re-fused from the two pools, MMR re-run through the shared greedy core
  * seeded from an independently-computed candidate pool.
  */
class RetrievalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private val query = SparkEntry.KnnTextQuery
  private val terms = RetrievalOps.queryTerms(query)

  /** Independent BM25 over the collected corpus, same constants + term
    * order + per-term fp-sum order as the operator.
    */
  private lazy val referenceBm25: Map[Long, Double] = {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toDouble).sum / n
    val df = terms.map(t => docs.count(_._2.contains(t)).toDouble)
    docs.flatMap { case (id, toks) =>
      val dl = toks.length.toDouble
      val tfs = terms.map(t => toks.count(_ == t).toDouble)
      if (tfs.sum > 0) {
        var s = 0.0
        var i = 0
        while (i < terms.length) {
          val idf = math.log((n - df(i) + 0.5) / (df(i) + 0.5) + 1.0)
          s += idf * (tfs(i) * 2.2) / (tfs(i) + 1.2 * (0.25 + 0.75 * dl / avgdl))
          i += 1
        }
        Some(id -> math.rint(s * 1e6) / 1e6)
      } else None
    }.toMap
  }

  test("bm25TopK matches an independent in-memory BM25 on every score") {
    val got = RetrievalOps.bm25TopK(spark, sf, query, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty, "query terms must hit the fixture corpus")
    val expTop = referenceBm25.toSeq
      .sortBy { case (id, s) => (-s, id) }.take(20)
    assert(got.toSeq === expTop)
  }

  test("bm25 scores every matching doc and only matching docs") {
    val scored = RetrievalOps.bm25Scored(spark, sf, query)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(scored.keySet === referenceBm25.keySet)
    scored.foreach { case (id, s) => assert(s === referenceBm25(id)) }
  }

  test("hybridRrf fuses exactly the two pools with 1/(60+rank) weights") {
    val rows = RetrievalOps.hybridRrf(spark, sf, query, pool = 20, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length === 10)

    // independent pools
    val lexPool = referenceBm25.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(20).map(_._1).zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val qvec = SparkEntry.knnTextQueryVec()
    val vecScores = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < v.length) { dot += v(i) * qvec(i); na += v(i) * v(i); nb += qvec(i) * qvec(i); i += 1 }
        val c = if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
        (r.getLong(0), math.rint(c * 1e6) / 1e6)
      }
    val vecPool = vecScores.sortBy { case (id, s) => (-s, id) }
      .take(20).map(_._1).zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap

    rows.foreach { case (id, lr, vr, rrf) =>
      assert(lr === lexPool.getOrElse(id, 0L), s"lex_rank of $id")
      assert(vr === vecPool.getOrElse(id, 0L), s"vec_rank of $id")
      val exp = (if (lr > 0) 1.0 / (60.0 + lr) else 0.0) +
        (if (vr > 0) 1.0 / (60.0 + vr) else 0.0)
      assert(rrf === math.rint(exp * 1e6) / 1e6, s"rrf of $id")
    }
    // fused list is the global top-10 of the union, not just a subset
    val union = (lexPool.keySet ++ vecPool.keySet).toSeq.map { id =>
      val s = (if (lexPool.contains(id)) 1.0 / (60.0 + lexPool(id)) else 0.0) +
        (if (vecPool.contains(id)) 1.0 / (60.0 + vecPool(id)) else 0.0)
      (id, math.rint(s * 1e6) / 1e6)
    }
    val expTop = union.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    assert(rows.map(_._1).toSeq === expTop)
  }

  test("tfidfTopTerms: per-doc top-3 by tf*ln(N/df), recomputed independently") {
    val rows = RetrievalOps.tfidfTopTerms(spark, sf, perDoc = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val n = docs.length.toDouble
    val df = docs.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.length.toDouble).toMap
    val exp = docs.flatMap { case (id, toks) =>
      toks.groupBy(identity).toSeq
        .map { case (t, g) =>
          (t, math.rint(g.length * math.log(n / df(t)) * 1e6) / 1e6)
        }
        .sortBy { case (t, s) => (-s, t) }.take(3).zipWithIndex
        .map { case ((t, s), i) => (id, i + 1L, t, s) }
    }.sortBy(r => (r._1, r._2))
    assert(rows.toSeq === exp.toSeq)
  }

  test("mmrRerank: rank 1 is the most relevant; picks equal the greedy reference") {
    val k = 10
    val rows = RetrievalOps.mmrRerank(spark, sf, query, pool = 20, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length === k)
    assert(rows.map(_._1).toSeq === (1L to k).toSeq)
    assert(rows.map(_._2).distinct.length === k, "picks are distinct docs")

    // independent pool: exact cosine top-20 (rel rounded like the operator)
    val qvec = SparkEntry.knnTextQueryVec()
    val pool = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < v.length) { dot += v(i) * qvec(i); na += v(i) * v(i); nb += qvec(i) * qvec(i); i += 1 }
        val c = if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
        (r.getLong(0), v, math.rint(c * 1e6) / 1e6)
      }
      .sortBy { case (id, _, s) => (-s, id) }.take(20)
    val exp = RetrievalOps.mmrSelect(pool, k, lambda = 0.7)
    assert(rows.toSeq === exp.toSeq)
    // rank 1 must be the pure-relevance winner (maxSim term is 0 for the first pick)
    assert(rows.head._2 === pool.head._1)
    // diversity actually engages: the MMR order differs from pure relevance
    // somewhere past rank 1 (lambda=0.7 on a near-random fixture reorders)
    val pureRel = pool.take(k).map(_._1).toSeq
    assert(rows.map(_._2).toSeq != pureRel || k >= pool.length,
      "MMR degenerated to pure relevance — lambda wiring suspect")
  }

  test("stored-stats bm25 equals the live path across create+upsert and compaction") {
    import graft.sources.CatalogOps
    val db = "graft_bm25_spec"
    val name = "docs_t"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, sf)
    // build the store incrementally: 3 uneven batches through the
    // append-only log
    CatalogOps.createBm25Stats(spark, db, name, docs.filter(col("doc_id") < 100))
    CatalogOps.upsertBm25Stats(spark, db, name,
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 150))
    CatalogOps.upsertBm25Stats(spark, db, name, docs.filter(col("doc_id") >= 150))
    val live = RetrievalOps.bm25TopK(spark, sf, query, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val stored = RetrievalOps.bm25TopKStoredOn(spark, docs, db, name, query, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(stored === live, "stored-stats probe must be bit-identical to live")
    // the partial log really is multi-row before compaction…
    assert(spark.table(s"`$db`.`${name}__bm25stats`").count() === 3)
    CatalogOps.compactBm25Stats(spark, db, name)
    // …and folds to one stats row / one row per term, same answers
    assert(spark.table(s"`$db`.`${name}__bm25stats`").count() === 1)
    val dfTab = spark.table(s"`$db`.`${name}__bm25df`")
    assert(dfTab.count() === dfTab.select("term").distinct().count())
    val compacted = RetrievalOps.bm25TopKStoredOn(spark, docs, db, name, query, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(compacted === live)
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("served hybrid equals the exact hybrid at exhaustive probes, valid below") {
    val exact = RetrievalOps.hybridRrf(spark, sf, query, pool = 20, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // exhaustive: beam ≥ corpus, all cells probed → the routed index IS the
    // exact scan, so the whole fusion must match bit-for-bit
    val served = RetrievalOps.hybridRrfServed(spark, sf, query, pool = 20, k = 10,
        efSearch = 1000, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(served.toSeq === exact.toSeq)
    // production settings: approximate vector pool, but the fusion stays
    // valid — k rows, rrf consistent with the two rank columns
    val prod = RetrievalOps.hybridRrfServed(spark, sf, query, pool = 20, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(prod.length === 10)
    prod.foreach { case (_, lr, vr, rrf) =>
      assert(lr >= 0 && vr >= 0 && (lr > 0 || vr > 0))
      val exp = (if (lr > 0) 1.0 / (60.0 + lr) else 0.0) +
        (if (vr > 0) 1.0 / (60.0 + vr) else 0.0)
      assert(rrf === math.rint(exp * 1e6) / 1e6)
    }
    // the lexical side is index-independent: its ranks agree with exact
    val exactLex = exact.filter(_._2 > 0).map(t => t._1 -> t._2).toMap
    prod.filter(_._2 > 0).foreach { case (id, lr, _, _) =>
      exactLex.get(id).foreach(e => assert(e === lr, s"lex rank of $id"))
    }
  }

  test("batched BM25 equals the stored single-query path per query, bit-for-bit") {
    val (db, name) = RetrievalOps.ensureBm25Store(spark, sf)
    val docs = Tables.documents(spark, sf)
    val queriesDf = spark.createDataFrame(Seq(
      (0L, query), (1L, "hash join merge"), (2L, "stream window agg"),
      (3L, "zzzznotinvocab scan")))
      .toDF("query_id", "qtext")
    val got = RetrievalOps.bm25ForQueriesStored(spark, docs, db, name, queriesDf, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    Seq(0L -> query, 1L -> "hash join merge", 2L -> "stream window agg",
      3L -> "zzzznotinvocab scan").foreach { case (qid, qtext) =>
      val single = RetrievalOps.bm25TopKStoredOn(spark, docs, db, name, qtext, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val batched = got.getOrElse(qid, Array.empty)
        .sortBy(_._2).map(t => (t._3, t._4))
      assert(batched.toSeq === single.toSeq, s"query $qid ($qtext)")
      // ranks are 1..n with no gaps
      assert(got.getOrElse(qid, Array.empty).map(_._2).sorted.toSeq ===
        (1L to batched.length).toSeq)
    }
  }

  test("batched BM25 plan: one corpus scan, broadcast terms, one explicit repartition") {
    val (db, name) = RetrievalOps.ensureBm25Store(spark, sf)
    val plan = RetrievalOps.bm25ForQueriesStored(spark, Tables.documents(spark, sf),
        db, name,
        spark.createDataFrame(Seq((0L, query))).toDF("query_id", "qtext"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.split("FileScan").length - 1 === 1,
      s"exactly one corpus scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the (doc,query) repartition + the bounded topk shuffle + the final
    // order — both aggregations must NOT add exchanges of their own
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 4, s"agg stages must reuse the explicit repartition:\n$plan")
  }

  test("removeBm25Stats: negated partials make remove(X) equal a build that never saw X") {
    import graft.sources.CatalogOps
    val db = "graft_bm25_rm"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, sf)
    val keep = docs.filter(col("doc_id") < 250)
    CatalogOps.createBm25Stats(spark, db, "full", docs)
    CatalogOps.removeBm25Stats(spark, db, "full", docs.filter(col("doc_id") >= 250))
    CatalogOps.createBm25Stats(spark, db, "fresh", keep)
    def probe(name: String) =
      RetrievalOps.bm25TopKStoredOn(spark, keep, db, name, query, 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe("full") === probe("fresh"),
      "store after remove must be bit-identical to a build without the removed docs")
    // compaction folds the cancelled terms away entirely
    CatalogOps.compactBm25Stats(spark, db, "full")
    val dfTab = spark.table(s"`$db`.`full__bm25df`")
    assert(dfTab.filter(col("df") <= 0).count() === 0, "cancelled terms must drop")
    assert(probe("full") === probe("fresh"))
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("stored bm25 plan: one corpus scan, zero exchanges; df probe pushes term IN") {
    val (db, name) = RetrievalOps.ensureBm25Store(spark, TestSpark.Sf)
    val probePlan = RetrievalOps
      .bm25TopKStoredOn(spark, Tables.documents(spark, sf), db, name, query, 20)
      .queryExecution.executedPlan.toString
    assert(!probePlan.contains("Exchange"),
      s"serving probe must not shuffle — stats are literals:\n$probePlan")
    assert(probePlan.contains("TakeOrderedAndProject"), probePlan)
    assert("documents\\.parquet".r.findAllIn(probePlan).size >= 1 &&
      probePlan.split("FileScan").length - 1 === 1,
      s"exactly ONE corpus scan (the live path pays two):\n$probePlan")
    val dfPlan = RetrievalOps.dfProbe(spark, db, name, terms)
      .queryExecution.executedPlan.toString
    assert(dfPlan.contains("PushedFilters: [In(term"),
      s"df probe must push term IN into the scan:\n$dfPlan")
  }

  test("filtered indexed BM25: candidates restricted, statistics corpus-wide") {
    val (db, name) = RetrievalOps.ensureLexicalIndex(spark, sf)
    val docs = Tables.documents(spark, sf)
    val got = RetrievalOps.bm25TopKIndexedFiltered(
        spark, db, name, docs, query, col("source") === "src7", 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.nonEmpty, "predicate must keep some matching docs")
    // every hit satisfies the predicate
    val allowed = docs.filter(col("source") === "src7")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(t => allowed(t._1)))
    // Lucene filter semantics: scores equal the UNFILTERED scores of the
    // same docs — the predicate must not perturb idf/avgdl/n
    val unfiltered = RetrievalOps.bm25TopKIndexedOn(spark, db, name, query,
        k = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .filter(t => allowed(t._1)).take(20).toSeq
    assert(got === unfiltered)
    // the metadata side scan is column-pruned and pushes the predicate
    val plan = RetrievalOps.bm25TopKIndexedFiltered(
        spark, db, name, docs, query, col("source") === "src7", 20)
      .queryExecution.executedPlan.toString
    assert("ReadSchema: [^\\n]*struct<doc_id:bigint,source:string>".r
      .findFirstIn(plan).isDefined,
      s"metadata scan must read only (doc_id, source), never text:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(source,src7\\)".r
      .findFirstIn(plan).isDefined, s"predicate must reach the scan:\n$plan")
  }

  test("conjunctive BM25: all terms required, scores unchanged") {
    val (db, name) = RetrievalOps.ensureLexicalIndex(spark, sf)
    val got = RetrievalOps.bm25TopKIndexedConj(spark, db, name, query, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.nonEmpty, "fixture must contain all-terms docs")
    val tokens = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    got.foreach { case (id, _) =>
      assert(terms.forall(tokens(id).contains), s"doc $id must contain every term")
    }
    // scores are the corpus-statistics scores, untouched by the AND mode
    got.foreach { case (id, s) => assert(s === referenceBm25(id)) }
    // and the ranking equals the unfiltered ranking restricted to AND docs
    val conjIds = tokens.filter { case (_, tk) => terms.forall(tk.contains) }.keySet
    val expected = referenceBm25.toSeq.filter(t => conjIds(t._1))
      .sortBy { case (id, s) => (-s, id) }.take(20)
    assert(got === expected)
  }

  test("composed deletion: corpus deleteByIds + lexical removes keep serving consistent") {
    import graft.sources.CatalogOps
    val db = "graft_lexdel"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, sf)
    val doomed = docs.filter(col("doc_id") % 7 === 0)
    CatalogOps.createCollection(spark, db, "corpus", docs)
    CatalogOps.createBm25Stats(spark, db, "corpus", docs)
    CatalogOps.createPostings(spark, db, "corpus", docs)
    // the composed lifecycle: corpus rows + all three lexical logs
    CatalogOps.deleteByIds(spark, db, "corpus", doomed.select("doc_id"), idCol = "doc_id")
    CatalogOps.removeBm25Stats(spark, db, "corpus", doomed)
    CatalogOps.removePostings(spark, db, "corpus", doomed)
    assert(spark.table(s"`$db`.`corpus`")
      .filter(col("doc_id") % 7 === 0).count() === 0, "corpus rows must be gone")
    val hits = RetrievalOps.bm25TopKIndexedOn(spark, db, "corpus", query, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(hits.nonEmpty)
    assert(hits.forall(_._1 % 7 != 0), "serving must never return a deleted id")
    // and the surviving index equals a build that never saw the deleted docs
    CatalogOps.createBm25Stats(spark, db, "fresh", docs.filter(col("doc_id") % 7 =!= 0))
    CatalogOps.createPostings(spark, db, "fresh", docs.filter(col("doc_id") % 7 =!= 0))
    val fresh = RetrievalOps.bm25TopKIndexedOn(spark, db, "fresh", query, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(hits === fresh)
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("batched indexed BM25 equals the batched stored path bit-for-bit") {
    val (db, name) = RetrievalOps.ensureLexicalIndex(spark, sf)
    val docs = Tables.documents(spark, sf)
    val queriesDf = spark.createDataFrame(Seq(
      (0L, query), (1L, "hash join merge"), (2L, "stream window agg"),
      (3L, "zzzznotinvocab scan")))
      .toDF("query_id", "qtext")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val stored = rows(RetrievalOps.bm25ForQueriesStored(
      spark, docs, db, name, queriesDf, k = 10))
    val indexed = rows(RetrievalOps.bm25ForQueriesIndexed(
      spark, db, name, queriesDf, k = 10))
    assert(stored.nonEmpty)
    assert(indexed === stored)
  }

  test("batched indexed plan: one postings scan, broadcast terms, no corpus") {
    val (db, name) = RetrievalOps.ensureLexicalIndex(spark, sf)
    val plan = RetrievalOps.bm25ForQueriesIndexed(spark, db, name,
        spark.createDataFrame(Seq((0L, query))).toDF("query_id", "qtext"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.split("FileScan").length - 1 === 1,
      s"the batch is served from the postings table alone:\n$plan")
    assert(!plan.contains("documents.parquet"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 4,
      s"agg stages must reuse the explicit doc_id repartition:\n$plan")
  }

  test("indexed tf-idf equals the live path bit-for-bit; plan never touches the corpus") {
    val (db, name) = RetrievalOps.ensureLexicalIndex(spark, sf)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSeq
    val live = rows(RetrievalOps.tfidfTopTerms(spark, sf))
    val indexed = rows(RetrievalOps.tfidfTopTermsIndexed(spark, db, name))
    assert(live.nonEmpty)
    assert(indexed === live)
    val plan = RetrievalOps.tfidfTopTermsIndexed(spark, db, name)
      .queryExecution.executedPlan.toString
    assert(plan.split("FileScan").length - 1 === 2,
      s"postings + vocabulary-sized df log, nothing else:\n$plan")
    assert(!plan.contains("documents.parquet"), plan)
    assert(!plan.contains("Generate"), s"no explode — the log IS (doc, term):\n$plan")
  }

  test("postings bucket: driver-side bucketOf equals the xxhash64 column form") {
    import graft.sources.CatalogOps
    val rows = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "").distinct().limit(300)
      .select(col("term"),
        pmod(xxhash64(col("term")), lit(CatalogOps.PostingsBuckets.toLong)).as("b"))
      .collect()
    assert(rows.length >= 20, "fixture vocabulary sample too small")
    rows.foreach { r =>
      assert(CatalogOps.postingsBucketOf(r.getString(0)) === r.getLong(1),
        s"bucket mismatch for term '${r.getString(0)}'")
    }
  }

  test("indexed BM25 equals the stored path bit-for-bit, incl. out-of-vocab terms") {
    val (db, name) = RetrievalOps.ensureLexicalIndex(spark, sf)
    Seq(query, "hash join merge", "stream window zzzznotinvocab").foreach { q =>
      val stored = RetrievalOps
        .bm25TopKStoredOn(spark, Tables.documents(spark, sf), db, name, q, 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val indexed = RetrievalOps.bm25TopKIndexedOn(spark, db, name, q, 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(stored.nonEmpty, s"query '$q' must hit the fixture corpus")
      assert(indexed === stored, s"query '$q'")
    }
  }

  test("postings lifecycle: remove(X) equals a build that never saw X; compaction invisible") {
    import graft.sources.CatalogOps
    val db = "graft_postings_rm"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, sf)
    val keep = docs.filter(col("doc_id") < 250)
    val removed = docs.filter(col("doc_id") >= 250)
    Seq(("full", docs), ("fresh", keep)).foreach { case (n, d) =>
      CatalogOps.createBm25Stats(spark, db, n, d)
      CatalogOps.createPostings(spark, db, n, d)
    }
    CatalogOps.removeBm25Stats(spark, db, "full", removed)
    CatalogOps.removePostings(spark, db, "full", removed)
    def probe(name: String) =
      RetrievalOps.bm25TopKIndexedOn(spark, db, name, query, 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe("full") === probe("fresh"),
      "index after remove must be bit-identical to a build without the removed docs")
    CatalogOps.compactPostings(spark, db, "full")
    val post = spark.table(s"`$db`.`full__postings`")
    assert(post.filter(col("tf") <= 0).count() === 0, "cancelled postings must drop")
    assert(post.groupBy(col("term"), col("doc_id")).count()
      .filter(col("count") > 1).count() === 0, "compaction folds to one row per (term, doc)")
    assert(probe("full") === probe("fresh"))
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("indexed bm25 plan: ONE bucket-pruned postings scan, no corpus, one exchange") {
    val (db, name) = RetrievalOps.ensureLexicalIndex(spark, sf)
    val plan = RetrievalOps.bm25TopKIndexedOn(spark, db, name, query, 20)
      .queryExecution.executedPlan.toString
    assert(plan.split("FileScan").length - 1 === 1,
      s"the scoring plan's only input is the postings table:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"zero corpus scans is the whole point:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"the bucket predicate must prune partitions at the directory level:\n$plan")
    assert("PushedFilters: \\[[^\\]]*In\\(term".r.findFirstIn(plan).isDefined,
      s"the term IN filter must reach the row groups:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"both aggregations must reuse the one explicit repartition:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"bounded top-k must not global-sort:\n$plan")
  }

  test("bm25 plan: stats side is broadcast, top-k is TakeOrderedAndProject") {
    val plan = RetrievalOps.bm25TopK(spark, sf, query, k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"1-row stats must broadcast, not shuffle:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"bounded top-k must not global-sort:\n$plan")
  }

  test("batched BM25 is replay-proof: duplicated query rows do not change scores") {
    // at-least-once delivery can hand foreachBatch the same query row
    // twice — the broadcast term table must dedup by query_id or tf
    // double-counts and scores silently corrupt
    val (db, name) = RetrievalOps.ensureBm25Store(spark, sf)
    val docs = Tables.documents(spark, sf)
    val once = spark.createDataFrame(Seq((0L, query), (1L, "hash join merge")))
      .toDF("query_id", "qtext")
    val doubled = spark.createDataFrame(Seq(
      (0L, query), (1L, "hash join merge"), (0L, query), (1L, "hash join merge")))
      .toDF("query_id", "qtext")
    def rows(q: org.apache.spark.sql.DataFrame) =
      RetrievalOps.bm25ForQueriesStored(spark, docs, db, name, q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(doubled) === rows(once))
    val (ldb, lname) = RetrievalOps.ensureLexicalIndex(spark, sf)
    def irows(q: org.apache.spark.sql.DataFrame) =
      RetrievalOps.bm25ForQueriesIndexed(spark, ldb, lname, q, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(irows(doubled) === irows(once))
  }

  test("phrase search: adjacency, order, and overlapping matches count exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x table table table y"),       // overlapping repeated-term hits
      (2L, "stream table hash stream table hash"),
      (3L, "stream table x hash"),         // gap breaks the phrase
      (4L, "hash table stream"))           // order matters
      .toDF("doc_id", "text")
    val rep = RetrievalOps.phraseSearchOn(docs, "table table")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rep.toSeq === Seq((1L, 2L, 1L)),
      "overlapping occurrences must all count, 0-based first position")
    val tri = RetrievalOps.phraseSearchOn(docs, "stream table hash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tri.toSeq === Seq((2L, 2L, 0L)))
  }

  test("positions lifecycle: indexed equals live; remove(X) equals a build without X") {
    import graft.sources.CatalogOps
    val db = "graft_positions_rm"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    CatalogOps.createDatabase(spark, db)
    try {
      val docs = Tables.documents(spark, sf)
      val keep = docs.filter(col("doc_id") % 2 === 0)
      val removed = docs.filter(col("doc_id") % 2 =!= 0)
      CatalogOps.createPositions(spark, db, "full", docs)
      CatalogOps.createPositions(spark, db, "fresh", keep)
      def probe(name: String) =
        RetrievalOps.phraseSearchIndexed(spark, db, name, RetrievalOps.PhraseQuery)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      // indexed == live on the same corpus
      val live = RetrievalOps.phraseSearchOn(docs, RetrievalOps.PhraseQuery)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(live.nonEmpty, "fixture must contain the contract phrase")
      assert(probe("full") === live)
      // remove(X) == never-ingested-X
      CatalogOps.removePositions(spark, db, "full", removed)
      assert(probe("full") === probe("fresh"),
        "sign-cancelled occurrences must be invisible to the probe")
    } finally spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("proximity search: slop widens in order only; chains counted; indexed equals live") {
    import spark.implicits._
    val docs = Seq(
      (1L, "stream x table y hash"),   // gaps of 1 → needs slop ≥ 1
      (2L, "stream table hash"),       // exact phrase: any slop
      (3L, "hash table stream"),       // wrong order: never
      (4L, "stream table hash hash"))  // two chains at slop ≥ 0? second hash continues
      .toDF("doc_id", "text")
    def run(slop: Int) = RetrievalOps.proximitySearchOn(docs, "stream table hash", slop)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(0) === Seq((2L, 1L, 0L), (4L, 1L, 0L)))
    // slop 1 admits doc 1's gapped form AND doc 4's second-hash chain
    assert(run(1) === Seq((1L, 1L, 0L), (2L, 1L, 0L), (4L, 2L, 0L)))
    // indexed twin equals the live scan on the fixture at the default slop
    val (db, name) = RetrievalOps.ensurePositionalIndex(spark, sf)
    val live = RetrievalOps.proximitySearch(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ix = RetrievalOps.proximitySearchIndexed(spark, db, name)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(live.nonEmpty && ix === live)
    // slop result set contains the exact-phrase result set
    val exact = RetrievalOps.phraseSearchOn(Tables.documents(spark, sf),
      RetrievalOps.PhraseQuery).collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(live.map(_._1).toSet))
  }

  test("batched phrase probe equals the single-phrase probe per query") {
    val (db, name) = RetrievalOps.ensurePositionalIndex(spark, sf)
    val phrases = RetrievalOps.PhraseBatch
    val qs = spark.createDataFrame(
      phrases.zipWithIndex.map { case (p, i) => (i.toLong, p) })
      .toDF("query_id", "phrase")
    val batched = RetrievalOps.phraseForQueriesIndexed(spark, db, name, qs)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val singles = phrases.zipWithIndex.map { case (p, i) =>
      val single = RetrievalOps.phraseSearchIndexed(spark, db, name, p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(batched.getOrElse(i.toLong, Seq.empty) === single,
        s"batched result for '$p' must equal the single-phrase probe")
      single
    }
    // at sf0.001 not every contract phrase has hits; the probe must still
    // answer a mixed hit/miss batch correctly, with at least one hit
    assert(singles.exists(_.nonEmpty), "every phrase empty — fixture drifted")
    // replay-proof: duplicated query rows must not change any result
    val doubled = RetrievalOps.phraseForQueriesIndexed(spark, db, name,
        qs.unionAll(qs))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(doubled === batched)
  }

  test("indexed phrase plan: bucket-pruned positions scan, no corpus, pushed term filter") {
    val (db, name) = RetrievalOps.ensurePositionalIndex(spark, sf)
    val plan = RetrievalOps.phraseSearchIndexed(spark, db, name)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"the probe must never scan the corpus:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"the bucket predicate must prune partitions at the directory level:\n$plan")
    assert("PushedFilters: \\[[^\\]]*In\\(term".r.findFirstIn(plan).isDefined,
      s"the term IN filter must reach the row groups:\n$plan")
  }

  test("empty or fully-removed stats store serves empty results, not NaN/NPE") {
    import graft.sources.CatalogOps
    val db = "bm25_empty_db"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    try {
      val docs = Tables.documents(spark, sf).limit(50)
      // store built then fully removed: Σn = 0
      CatalogOps.createBm25Stats(spark, db, "gone", docs)
      CatalogOps.removeBm25Stats(spark, db, "gone", docs)
      val served = RetrievalOps.bm25TopKStoredOn(
        spark, Tables.documents(spark, sf), db, "gone", query, 10).collect()
      assert(served.isEmpty)
      // empty-frame build: one (0, 0) partial row, still a valid store
      CatalogOps.createBm25Stats(spark, db, "void", docs.filter(col("doc_id") < 0))
      assert(RetrievalOps.bm25TopKStoredOn(
        spark, Tables.documents(spark, sf), db, "void", query, 10).collect().isEmpty)
      val queriesDf = spark.createDataFrame(Seq((0L, query))).toDF("query_id", "qtext")
      assert(RetrievalOps.bm25ForQueriesStored(
        spark, Tables.documents(spark, sf), db, "gone", queriesDf, 10).collect().isEmpty)
    } finally CatalogOps.dropDatabase(spark, db)
  }
}
