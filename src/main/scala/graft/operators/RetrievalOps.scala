package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Lexical + hybrid retrieval — the ranking half of a RAG serving stack.
  *
  * The reference retrieves by vector similarity only
  * (`searchByText(embeddingItems=[txt], limit=3)`, ref `main_server.py:41`,
  * `TencentVDB.py:46`); production RAG over a crawled corpus pairs that with
  * a lexical ranker and fuses the two lists. This module adds the standard
  * trio, Spark-first:
  *
  *  - [[bm25TopK]] — Okapi BM25 (Robertson/Sparck Jones; the Lucene
  *    `(1 + ln((N - df + 0.5)/(df + 0.5)))`-family idf, here the BM25+
  *    smoothed `ln(1 + …)` form so idf is never negative).
  *  - [[hybridRrf]] — reciprocal-rank fusion (Cormack et al., SIGIR'09)
  *    of the BM25 list with the exact-cosine vector list.
  *  - [[tfidfTopTerms]] — per-document characteristic terms by tf·idf,
  *    the corpus-exploration companion.
  *  - [[mmrRerank]] — maximal-marginal-relevance diversity re-rank
  *    (Carbonell & Goldstein, SIGIR'98) over a bounded candidate pool.
  *
  * Scale shape: BM25 needs exactly two corpus statistics — N/avgdl and one
  * document-frequency counter per query term. Query terms are FEW (a user
  * query), so per-term tf is a map-side `size(filter(tokens, _ = t))`
  * projection — no explode, no (doc, term) shuffle. The stats collapse to a
  * ONE-ROW aggregate (partial-agg'd map-side) broadcast back over the
  * corpus; scoring is then a pure projection and `orderBy + limit` compiles
  * to `TakeOrderedAndProject` (bounded per-partition top-k, no global
  * sort). Two scans of the corpus total — at 100 TB the stats pass is the
  * unavoidable first pass of any BM25 engine (Lucene pays it at index
  * time); a serving deployment would persist the 1-row stats table and
  * skip it.
  *
  * Determinism (FIXTURES.md rules): every emitted score is `round(_, 6)`;
  * every ordering is on the ROUNDED value with an integer-id tie-break, so
  * the DuckDB oracle ranks identically even when `ln` differs by an ulp.
  * Floating-point sums are written as fixed-order `+` chains (term 0 … term
  * m-1) in both the Column expression and the oracle SQL, so the arithmetic
  * associates identically on both engines.
  */
object RetrievalOps {

  /** Okapi BM25 parameters — the textbook defaults. */
  val K1 = 1.2
  val B  = 0.75

  /** k1 + 1 as a decimal LITERAL, not `K1 + 1.0`: the oracle SQL writes
    * `2.2`, and the double nearest the decimal string "2.2" is not
    * guaranteed to equal the fp SUM 1.2 + 1.0 (the sum lands exactly
    * halfway between two doubles). Both engines must parse the same
    * numeral so the scores agree bit-for-bit before rounding.
    */
  private val K1Plus1 = 2.2

  /** RRF smoothing constant (Cormack et al. use 60). */
  val RrfK = 60.0

  private def toks(c: Column): Column = split(c, " ")

  /** Distinct query terms in first-appearance order — the fixed term order
    * every fp sum below uses.
    */
  private[graft] def queryTerms(query: String): Seq[String] =
    query.split(" ").filter(_.nonEmpty).distinct.toSeq

  /** Merged (n, avgdl) of a stats log, or None when the store is empty or
    * every ingested doc has been removed (Σn ≤ 0). Serving paths return an
    * EMPTY result then — without the guard an empty store is an NPE on the
    * null sum and a fully-removed one scores every doc NaN (0/0 avgdl).
    */
  private def statsOf(spark: SparkSession, db: String, name: String)
      : Option[(Double, Double)] = {
    val r = spark.table(s"`$db`.`${name}__bm25stats`")
      .agg(sum(col("n")).as("n"), sum(col("sum_dl")).as("sum_dl")).head()
    if (r.isNullAt(0) || r.getDouble(0) <= 0.0 || r.isNullAt(1)) None
    else Some((r.getDouble(0), r.getDouble(1) / r.getDouble(0)))
  }

  private def emptyDf(spark: SparkSession,
      fields: (String, org.apache.spark.sql.types.DataType)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(fields.map { case (nm, dt) =>
        org.apache.spark.sql.types.StructField(nm, dt) }))

  private def emptyTopK(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    emptyDf(spark, "doc_id" -> LongType, "bm25" -> DoubleType)
  }

  private def emptyBatchedTopK(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    emptyDf(spark, "query_id" -> LongType, "rank" -> LongType,
      "doc_id" -> LongType, "bm25" -> DoubleType)
  }

  /** Driver-side (query_id → terms) for the batched serving paths,
    * DEDUPED by query_id (max-wins on qtext, the same convention as every
    * batched knn path): foreachBatch is at-least-once, and a duplicated
    * query row would otherwise put its (qid, term, idf) rows into the
    * broadcast twice — doubling tf in the stored path's join-count and
    * double-summing partials in the indexed fold, silently corrupting
    * scores rather than duplicating output.
    */
  private def collectQueryTerms(queries: DataFrame): Array[(Long, Seq[String])] =
    queries.select(col("query_id"), col("qtext"))
      .groupBy(col("query_id")).agg(max(col("qtext")).as("qtext"))
      .collect()
      .map(r => (r.getLong(0), queryTerms(r.getString(1))))
      .filter(_._2.nonEmpty)
      .sortBy(_._1)

  /** The broadcast (query_id, term, tidx, idf) fan-out table both batched
    * paths join against — idf precomputed per term with the same Math.log
    * the single-query literal fold uses.
    */
  private def termIdfTable(spark: SparkSession,
      qTerms: Array[(Long, Seq[String])], n: Double,
      dfMap: Map[String, Double]): DataFrame = {
    val termRows = qTerms.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, i) =>
        val dfi = dfMap.getOrElse(t, 0.0)
        (qid, t, i, math.log((n - dfi + 0.5) / (dfi + 0.5) + 1.0))
      }
    }.toIndexedSeq
    broadcast(spark.createDataFrame(termRows)
      .toDF("query_id", "term", "tidx", "idf"))
  }

  /** The shared batched tail: per-(doc, query) fixed-tidx-order score fold
    * (bit-identical to the single-query literal chain) + bounded-heap
    * per-query top-k. Input needs (doc_id, query_id, tidx, p).
    */
  private def scoreFoldTopK(partial: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val scored = partial
      .groupBy(col("doc_id"), col("query_id"))
      .agg(sort_array(collect_list(struct(col("tidx"), col("p")))).as("ps"))
      .select(col("query_id"), col("doc_id"),
        round(aggregate(col("ps"), lit(0.0),
          (acc, x) => acc + x.getField("p")), 6).as("bm25"))
    val topk = toCol(graft.plans.TopKScoreId(
      toExpr(col("bm25")), toExpr(col("doc_id")), k).toAggregateExpression())
    scored.groupBy(col("query_id"))
      .agg(topk.as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("hit.vec_id").as("doc_id"), col("hit.score").as("bm25"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** Reciprocal-rank fusion of a lexical pool (doc_id, …, lrank) and a
    * vector pool (vec_id, …, vrank): full-outer on id; a side absent from
    * the other pool contributes no RRF term (rank reported as 0). Shared
    * by [[hybridRrf]] and [[hybridRrfServed]] so the absent-rank
    * convention lives in one place.
    */
  private def fuseRrf(lex: DataFrame, vec: DataFrame, k: Int): DataFrame =
    lex.join(vec, col("doc_id") === col("vec_id"), "full_outer")
      .select(
        coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
        coalesce(col("lrank"), lit(0)).cast("long").as("lex_rank"),
        coalesce(col("vrank"), lit(0)).cast("long").as("vec_rank"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("lrank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("vrank")), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)

  /** BM25 score of every matching document against `query`.
    *
    * Plan: one map-side projection computes per-term tf and doc length;
    * a 1-row aggregate (n, avgdl, df per term) joins back via broadcast
    * cross-join; the score is a fixed-order sum over the (few) query
    * terms. No explode anywhere — tf for a known term is
    * `size(filter(tokens, _ = t))` inside whole-stage codegen.
    */
  def bm25Scored(spark: SparkSession, dir: String,
                 query: String = graft.SparkEntry.KnnTextQuery): DataFrame = {
    val terms = queryTerms(query)
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val docs = Tables.documents(spark, dir)
    val w = toks(col("text"))
    val base = docs.select(
      col("doc_id") +:
        size(w).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(w, x => x === lit(t))).cast("double").as(s"tf$i")
        }: _*)

    val statAggs =
      count(lit(1)).cast("double").as("n") +:
        avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double").as(s"df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)

    // Per-term partial score, in the exact literal shape the oracle SQL
    // writes: ln((n - df + 0.5)/(df + 0.5) + 1) * (tf * (k1+1)) / (tf + k1*((1-b) + b*dl/avgdl))
    def termScore(i: Int): Column = {
      val tf = col(s"tf$i")
      val idf = log((col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5) + 1.0)
      idf * (tf * lit(K1Plus1)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    }
    val anyHit = terms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0

    base.crossJoin(broadcast(stats))
      .filter(anyHit)
      .select(col("doc_id"),
        round(terms.indices.map(termScore).reduce(_ + _), 6).as("bm25"))
  }

  /** `q_text_bm25`: top-k BM25 hits — TakeOrderedAndProject on the rounded
    * score with doc_id tie-break.
    */
  def bm25TopK(spark: SparkSession, dir: String,
               query: String = graft.SparkEntry.KnnTextQuery, k: Int = 20): DataFrame =
    bm25Scored(spark, dir, query)
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)

  /** Pseudo-relevance-feedback query expansion (`q_text_prf`, the
    * RM3-lite two-pass): BM25 retrieves a small seed pool, the pool's
    * top terms by total tf (minus the original query's) join the query,
    * and a second BM25 pass scores the expanded term set — the classic
    * vocabulary-mismatch fix (Lavrenko & Croft 2001 relevance models,
    * in the deterministic tf-count form).
    *
    * Scale shape: pass 1 is the bounded [[bm25TopK]]; term mining runs
    * over k0 docs only (broadcast semi join — corpus never moves); the
    * m expansion strings reach the driver (query-bounded, the documented
    * collect class) and parameterize pass 2's map-side per-term
    * projections exactly like any other query. Because pass 2's term
    * set is DYNAMIC, its score sums per-term partials ROUNDED TO
    * INTEGER MICROS first (the money discipline) — an order-independent
    * integer sum both engines reproduce regardless of how their
    * dynamic-term plans associate the additions.
    */
  def prfTopK(spark: SparkSession, dir: String,
              query: String = graft.SparkEntry.KnnTextQuery,
              k0: Int = 5, m: Int = 3, k: Int = 20): DataFrame = {
    val q = queryTerms(query)
    val docs = Tables.documents(spark, dir)
    val seed = bm25TopK(spark, dir, query, k0).select(col("doc_id"))
    val expTerms = docs.join(broadcast(seed), Seq("doc_id"), "left_semi")
      .select(explode(toks(col("text"))).as("term"))
      .filter(!col("term").isin(q: _*) && length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("term").asc).limit(m)
      .collect().map(_.getString(0)).toSeq
    val terms = q ++ expTerms
    val w = toks(col("text"))
    // localCheckpoint (r19 optimization): the stats aggregate AND the
    // final scoring pass both read this frame — without the cut each
    // re-runs the |terms| per-row HOF term-frequency scans; the
    // materialized rows are skinny (id + |terms|+1 doubles)
    val base = docs.select(
      col("doc_id") +:
        size(w).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(w, x => x === lit(t))).cast("double").as(s"tf$i")
        }: _*)
      .localCheckpoint(false)
    val statAggs =
      count(lit(1)).cast("double").as("n") +:
        avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double").as(s"df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    def termMicros(i: Int): Column = {
      val tf = col(s"tf$i")
      val idf = log((col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5) + 1.0)
      round(idf * (tf * lit(K1Plus1)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
        * lit(1000000.0)).cast("long")
    }
    val anyHit = terms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0
    base.crossJoin(broadcast(stats))
      .filter(anyHit)
      .select(col("doc_id"),
        (terms.indices.map(termMicros).reduce(_ + _).cast("double")
          / lit(1000000.0)).as("prf_score"))
      .orderBy(col("prf_score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** `q_hybrid_rrf`: hybrid retrieval — BM25 lexical pool ∪ exact-cosine
    * vector pool, fused by reciprocal-rank fusion
    * `score(d) = Σ_lists 1/(60 + rank_list(d))`.
    *
    * The two pools are bounded (`pool` rows each) via
    * TakeOrderedAndProject, so the rank windows and the full-outer fusion
    * join run on 2·pool rows — constant-bounded driver/executor work no
    * matter the corpus size; the corpus-scale work is the two scans
    * underneath. Ranks are assigned over the ROUNDED scores (ties broken
    * by id) so both engines agree; absent ranks surface as 0 with RRF
    * contribution 0.
    *
    * The query vector is the same pure-JVM feature-hash embedding of the
    * query string the `q_knn_text` path uses ([[graft.plans.FeatureHash]]),
    * so the lexical and vector sides serve the SAME query.
    */
  def hybridRrf(spark: SparkSession, dir: String,
                query: String = graft.SparkEntry.KnnTextQuery,
                pool: Int = 20, k: Int = 10): DataFrame = {
    import graft.functions.VectorFunctions.cosineFast
    val qvec = graft.plans.FeatureHash.embed(
      org.apache.spark.unsafe.types.UTF8String.fromString(query),
      KnnOps.DefaultEmbedDim).toDoubleArray

    val lex = bm25TopK(spark, dir, query, pool)
      .withColumn("lrank",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id").asc)))

    val qcol = array(qvec.map(lit).toIndexedSeq: _*)
    val vec = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        round(cosineFast(col("embedding"), qcol), 6).as("vscore"))
      .orderBy(col("vscore").desc, col("vec_id").asc)
      .limit(pool)
      .withColumn("vrank",
        row_number().over(Window.orderBy(col("vscore").desc, col("vec_id").asc)))

    fuseRrf(lex, vec, k)
  }

  /** `q_tfidf_topterms`: the `perDoc` most characteristic terms of each
    * document by tf·idf (idf = ln(N/df)).
    *
    * Unlike BM25 (few known query terms), this ranks the WHOLE vocabulary,
    * so it takes the classic explode → (doc, term) count → df-per-term
    * shape: two key-partitioned shuffles, both partial-aggregated map-side.
    * The tf⋈df join is a plain shuffle join — at corpus scale the
    * vocabulary is NOT broadcastable, and AQE is free to downgrade it when
    * it is. The per-doc top-k is a `row_number` window partitioned by
    * doc_id (shuffle by doc_id, bounded state per key).
    */
  def tfidfTopTerms(spark: SparkSession, dir: String, perDoc: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tf = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))

    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n") / col("df")), 6).as("tfidf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perDoc)
      .select(col("doc_id"), col("rk"), col("term"), col("tfidf"))
      .orderBy(col("doc_id").asc, col("rk").asc)
  }

  /** `q_tfidf_indexed`: [[tfidfTopTerms]] served from the POSTINGS index —
    * the "persist tf/df as a corpus artifact" promise that query's perf
    * note makes, kept. The live path tokenizes + explodes the corpus into
    * a (doc, term) shuffle and then SELF-JOINS the tf subtree to derive
    * df (two evaluations of the explode unless exchange reuse saves it);
    * here tf IS the postings log (merged), df comes from the df LOG
    * (vocabulary-sized, exact by the store invariant the lifecycle specs
    * pin — never recomputed from the corpus), and n from the stats log —
    * ONE postings scan, zero corpus scans, no explode, no self-join.
    * Values are bit-identical to the live path (exact integer tf/df/n
    * through the same `Math.log` and round), so it faces the SAME oracle.
    *
    * Scale shape: the postings side shuffles once on (term, doc_id) to
    * merge the log; the df side is a vocabulary-granularity aggregate
    * joined in (AQE broadcasts it when small, sort-merges when the
    * vocabulary is itself huge — either way it avoids re-shuffling the
    * corpus-granularity rows by term, which is where a stopword's skew
    * would land); the only other shuffle is the per-doc window. That is
    * one fewer full-data exchange than deriving df positionally.
    */
  def tfidfTopTermsIndexed(spark: SparkSession, db: String, name: String,
      perDoc: Int = 3): DataFrame = {
    val n = statsOf(spark, db, name) match {
      case None =>
        import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
        return emptyDf(spark, "doc_id" -> LongType, "rk" -> LongType,
          "term" -> StringType, "tfidf" -> DoubleType)
      case Some((cnt, _)) => cnt
    }
    val tf = spark.table(s"`$db`.`${name}__postings`")
      .groupBy(col("term"), col("doc_id"))
      .agg(sum(col("tf")).as("tf"))
      .filter(col("tf") > 0.0)
    val df = spark.table(s"`$db`.`${name}__bm25df`")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .filter(col("df") > 0.0)
    val scored = tf.join(df, "term")
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(lit(n) / col("df")), 6).as("tfidf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perDoc)
      .select(col("doc_id"), col("rk"), col("term"), col("tfidf"))
      .orderBy(col("doc_id").asc, col("rk").asc)
  }

  /** Default phrase for the phrase-query contract entries — three distinct
    * adjacent terms with a non-trivial hit set in the fixture corpus.
    */
  val PhraseQuery = "stream table hash"

  /** Phrase table for the batched contract entry — includes a
    * repeated-term phrase (the offset-coverage edge case).
    */
  val PhraseBatch: Seq[String] =
    Seq("stream table hash", "table table", "slow hash batch")

  /** Exact phrase search, LIVE form: documents containing the query terms
    * ADJACENT and IN ORDER (`"stream table hash"` matches only that token
    * sequence). The positional-index probe every search engine offers next
    * to bag-of-words BM25 (Lucene's PhraseQuery); the reference's
    * SDK exposes only bag-of-words + vector search — this closes the gap.
    *
    * Plan: a map-side `contains` pre-gate drops documents missing any term
    * BEFORE tokenization (substring containment is implied by phrase
    * containment, and the gate is a pushable string predicate); survivors
    * posexplode into (doc_id, pos, term) rows restricted to the phrase's
    * terms, and adjacency is n−1 self-equi-joins on `(doc_id, pos + i)` —
    * each join side is only the phrase terms' occurrence lists, never the
    * corpus token stream. Still one full corpus scan per call by
    * construction; [[phraseSearchIndexed]] is the serving twin that
    * replaces the scan with a positional-postings probe.
    *
    * Output: (doc_id, n_hits, first_pos), 0-based positions, ordered by
    * doc_id — overlapping occurrences all count, matching the oracle.
    */
  def phraseSearch(spark: SparkSession, dir: String,
      phrase: String = PhraseQuery): DataFrame =
    phraseSearchOn(Tables.documents(spark, dir), phrase)

  /** [[phraseSearch]] over an arbitrary (doc_id, text) corpus. */
  def phraseSearchOn(docs: DataFrame, phrase: String): DataFrame = {
    val terms = phrase.split(" ").filter(_.nonEmpty).toSeq
    require(terms.length >= 2, "phrase search needs at least two terms")
    val gated = terms.distinct.foldLeft(docs)(
      (df, t) => df.filter(col("text").contains(t)))
    val postings = gated
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "term")))
      .filter(col("term").isin(terms.distinct: _*))
    phraseAdjacency(postings, terms)
  }

  /** Phrase search, INDEXED form: the adjacency join of [[phraseSearch]]
    * served from a positional-postings collection
    * ([[graft.sources.CatalogOps.createPositions]]) — probe cost is the
    * phrase terms' position lists (bucket-pruned directories, pushed
    * `term IN` row-group filter), never a corpus scan. Bit-identical
    * output to the live form → faces the SAME DuckDB oracle.
    */
  def phraseSearchIndexed(spark: SparkSession, db: String, name: String,
      phrase: String = PhraseQuery): DataFrame = {
    val terms = phrase.split(" ").filter(_.nonEmpty).toSeq
    require(terms.length >= 2, "phrase search needs at least two terms")
    val buckets = terms.distinct.map(graft.sources.CatalogOps.postingsBucketOf)
    // read-time fold of the append/remove log: a position is live while
    // its signed multiplicity is positive (same log-structured contract
    // as the tf postings, with row-identity cancellation instead of sums)
    val postings = spark.table(s"`$db`.`${name}__positions`")
      .filter(col("bucket").isin(buckets.distinct: _*) &&
        col("term").isin(terms.distinct: _*))
      .groupBy(col("doc_id"), col("term"), col("pos"))
      .agg(sum(col("sign")).as("mult"))
      .filter(col("mult") > 0L)
      .select(col("doc_id"), col("pos"), col("term"))
    phraseAdjacency(postings, terms)
  }

  /** FILTER-index composition on the phrase path — the metadata
    * predicate restricts CANDIDATES only (Lucene filter semantics, the
    * same contract as [[bm25TopKIndexedFiltered]]): the allowed-id set
    * semi-joins the position lists BEFORE the adjacency chain, so the
    * n−1 joins only ever see filtered occurrences. Bit-identical to
    * filtering the live scan's corpus → oracled as the phrase SQL with
    * an id-subquery predicate.
    */
  def phraseSearchIndexedFiltered(spark: SparkSession, db: String,
      name: String, docs: DataFrame, phrase: String,
      predicate: Column): DataFrame = {
    val terms = phrase.split(" ").filter(_.nonEmpty).toSeq
    require(terms.length >= 2, "phrase search needs at least two terms")
    val buckets = terms.distinct.map(graft.sources.CatalogOps.postingsBucketOf)
    val allowed = docs.filter(predicate).select(col("doc_id"))
    val postings = spark.table(s"`$db`.`${name}__positions`")
      .filter(col("bucket").isin(buckets.distinct: _*) &&
        col("term").isin(terms.distinct: _*))
      .join(broadcast(allowed), Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id"), col("term"), col("pos"))
      .agg(sum(col("sign")).as("mult"))
      .filter(col("mult") > 0L)
      .select(col("doc_id"), col("pos"), col("term"))
    phraseAdjacency(postings, terms)
  }

  /** Batched phrase serving: ONE positional-index probe answers a whole
    * (query_id, phrase) table — the phrase twin of [[bm25ForQueriesIndexed]].
    * Phrase terms are driver-bounded (they are queries) and broadcast as a
    * (query_id, term, tidx, qlen) fan-out table; the store is read once,
    * pruned to the union of the phrases' buckets and terms. A phrase
    * occurrence is a `(query_id, doc_id, start)` group covering ALL tidx
    * offsets (`pos − tidx = start`), so matching is one aggregation —
    * repeated-term phrases need no special case because each offset
    * demands its own distinct position row. Per-query output is
    * bit-identical to [[phraseSearchIndexed]] (pinned in tests).
    */
  def phraseForQueriesIndexed(spark: SparkSession, db: String, name: String,
      queries: DataFrame): DataFrame = {
    // an at-least-once feed can replay a query row; duplicates resolve
    // deterministically (max phrase per id — the topKForQueries rule)
    val qs: Array[(Long, Seq[String])] = queries
      .select(col("query_id"), col("phrase")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (id, rows) => (id, rows.map(_._2).max) }
      .toArray.sortBy(_._1)
      .map { case (id, p) => (id, p.split(" ").filter(_.nonEmpty).toSeq) }
    require(qs.forall(_._2.length >= 2), "phrase search needs at least two terms")
    val allTerms = qs.flatMap(_._2).distinct.toSeq
    val buckets = allTerms.map(graft.sources.CatalogOps.postingsBucketOf).distinct
    val fanout = qs.flatMap { case (qid, terms) =>
      terms.zipWithIndex.map { case (t, i) => (qid, t, i, terms.length) }
    }.toSeq
    val qterms = spark.createDataFrame(fanout)
      .toDF("query_id", "term", "tidx", "qlen")
    val live = spark.table(s"`$db`.`${name}__positions`")
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(allTerms: _*))
      .groupBy(col("doc_id"), col("term"), col("pos"))
      .agg(sum(col("sign")).as("mult"))
      .filter(col("mult") > 0L)
      .select(col("doc_id"), col("pos"), col("term"))
    val starts = live.join(broadcast(qterms), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("qlen"),
        (col("pos") - col("tidx")).as("start"), col("tidx"))
      .groupBy(col("query_id"), col("doc_id"), col("qlen"), col("start"))
      .agg(countDistinct(col("tidx")).as("covered"))
      .filter(col("covered") === col("qlen"))
    starts.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("n_hits"),
        min(col("start")).cast("bigint").as("first_pos"))
      .orderBy(col("query_id").asc, col("doc_id").asc)
  }

  /** Shared adjacency tail: from (doc_id, pos, term) occurrence rows of
    * the phrase's terms, chain n−1 joins — each successive term must
    * follow the PREVIOUS matched term within `1 + slop` positions
    * (slop = 0 is the exact adjacent phrase; slop > 0 is Lucene's
    * ordered sloppy phrase: in-order with up to `slop` interleaved
    * tokens per gap). `n_hits` counts ordered chains (a slop window
    * admitting two continuations counts both — the same combinatorics
    * the oracle's join computes), `first_pos` the earliest chain start.
    */
  private def phraseAdjacency(postings: DataFrame, terms: Seq[String],
      slop: Int = 0): DataFrame = {
    val p0 = postings.filter(col("term") === terms.head)
      .select(col("doc_id"), col("pos"), col("pos").as("cur"))
    val matched = terms.zipWithIndex.tail.foldLeft(p0) { case (acc, (t, i)) =>
      val pi = postings.filter(col("term") === t)
        .select(col("doc_id").as(s"d$i"), col("pos").as(s"p$i"))
      acc.join(pi, col("doc_id") === col(s"d$i") &&
          col(s"p$i") > col("cur") &&
          col(s"p$i") <= col("cur") + 1 + slop)
        .select(col("doc_id"), col("pos"), col(s"p$i").as("cur"))
    }
    matched.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("n_hits"),
        min(col("pos")).cast("bigint").as("first_pos"))
      .orderBy(col("doc_id").asc)
  }

  /** Ordered PROXIMITY search, live form: the phrase terms in order with
    * up to `slop` interleaved tokens between consecutive terms — the
    * sloppy-phrase relaxation every positional engine offers next to the
    * exact form. Same scan shape as [[phraseSearch]] (the `contains`
    * pre-gate still applies: proximity containment implies substring
    * containment per term).
    */
  def proximitySearch(spark: SparkSession, dir: String,
      phrase: String = PhraseQuery, slop: Int = 2): DataFrame =
    proximitySearchOn(Tables.documents(spark, dir), phrase, slop)

  def proximitySearchOn(docs: DataFrame, phrase: String, slop: Int): DataFrame = {
    val terms = phrase.split(" ").filter(_.nonEmpty).toSeq
    require(terms.length >= 2, "proximity search needs at least two terms")
    require(slop >= 0, s"slop must be non-negative, got $slop")
    val gated = terms.distinct.foldLeft(docs)(
      (df, t) => df.filter(col("text").contains(t)))
    val postings = gated
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "term")))
      .filter(col("term").isin(terms.distinct: _*))
    phraseAdjacency(postings, terms, slop)
  }

  /** [[proximitySearch]] served from the positional index — same probe
    * shape as [[phraseSearchIndexed]], bit-identical to the live scan.
    */
  def proximitySearchIndexed(spark: SparkSession, db: String, name: String,
      phrase: String = PhraseQuery, slop: Int = 2): DataFrame = {
    val terms = phrase.split(" ").filter(_.nonEmpty).toSeq
    require(terms.length >= 2, "proximity search needs at least two terms")
    val buckets = terms.distinct.map(graft.sources.CatalogOps.postingsBucketOf)
    val postings = spark.table(s"`$db`.`${name}__positions`")
      .filter(col("bucket").isin(buckets.distinct: _*) &&
        col("term").isin(terms.distinct: _*))
      .groupBy(col("doc_id"), col("term"), col("pos"))
      .agg(sum(col("sign")).as("mult"))
      .filter(col("mult") > 0L)
      .select(col("doc_id"), col("pos"), col("term"))
    phraseAdjacency(postings, terms, slop)
  }

  /** Build-if-absent positional index for the indexed phrase contract
    * entry — create-half + upsert-half so every contract run exercises
    * the incremental append path, mirroring [[ensureLexicalIndex]].
    */
  private[graft] def ensurePositionalIndex(spark: SparkSession, dir: String): (String, String) = {
    import graft.sources.CatalogOps
    val (db, name) = ensureBm25Store(spark, dir)
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.${name}__positions")) {
        KnnOps.dropTableAndDir(spark, db, s"${name}__positions")
        val docs = Tables.documents(spark, dir)
        CatalogOps.createPositions(spark, db, name,
          docs.filter(col("doc_id") % 2 === 0))
        CatalogOps.upsertPositions(spark, db, name,
          docs.filter(col("doc_id") % 2 =!= 0))
      }
    }
    (db, name)
  }

  // private[graft], not private: the Dataset encoder's generated
  // deserializer must see a PUBLIC bytecode constructor (plain `private`
  // fails janino codegen with "Private member cannot be accessed")
  private[graft] case class MmrCand(vec_id: Long, embedding: Seq[Double], rel: Double)

  /** `q_knn_mmr`: maximal-marginal-relevance re-rank — greedily pick
    * `k` of the top-`pool` cosine candidates maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)`.
    *
    * MMR is inherently sequential in `k`, so it runs where every serving
    * engine runs it: on the BOUNDED pool, after the distributed top-pool
    * scan. The pool (`TakeOrderedAndProject`) is coalesced to one task and
    * the greedy loop runs there via `mapPartitions` — pool² = O(400) dot
    * products, never on the driver, never corpus-scale. Every compared
    * quantity is micro-rounded (pairwise sims at 6 dp, the score as its
    * integer micro value) with ties breaking toward pool order (lowest
    * id among highest rel) — exactly the argmax a k-round chained-CTE
    * mirrors, so as of r16 the greedy is FULLY DuckDB-oracled (the
    * q_link_communities flip applied to the serving stack); the spec
    * additionally cross-checks the shared greedy core.
    */
  def mmrRerank(spark: SparkSession, dir: String,
                query: String = graft.SparkEntry.KnnTextQuery,
                pool: Int = 20, k: Int = 10, lambda: Double = 0.7): DataFrame = {
    import graft.functions.VectorFunctions.cosineFast
    import spark.implicits._
    val qvec = graft.plans.FeatureHash.embed(
      org.apache.spark.unsafe.types.UTF8String.fromString(query),
      KnnOps.DefaultEmbedDim).toDoubleArray
    val qcol = array(qvec.map(lit).toIndexedSeq: _*)

    val cand = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        round(cosineFast(col("embedding"), qcol), 6).as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc)
      .limit(pool)
      .as[MmrCand]

    val picks = cand.coalesce(1).mapPartitions { it =>
      val cs = it.toArray.sortBy(c => (-c.rel, c.vec_id))
      mmrSelect(cs.map(c => (c.vec_id, c.embedding.toArray, c.rel)), k, lambda)
        .iterator
    }.toDF("rank", "vec_id", "rel", "mmr")
    picks.orderBy(col("rank").asc)
  }

  /** Greedy MMR core on an in-memory pool (shared by the operator and its
    * spec's reference cross-check): returns (rank, id, rel, mmrScore).
    */
  private[graft] def mmrSelect(pool: Array[(Long, Array[Double], Double)],
                               k: Int, lambda: Double): Seq[(Long, Long, Double, Double)] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double)]
    val n = pool.length
    while (out.length < math.min(k, n)) {
      var bestIdx = -1
      var bestSm = Long.MinValue
      var i = 0
      while (i < n) {
        if (!selected.contains(i)) {
          // pairwise sims pre-rounded at 6 dp (floor-half-up on the
          // shared double — the cross-engine convention), the score
          // compared as its INTEGER micro value: ties at output
          // precision break toward pool order (lowest id among highest
          // rel), which is exactly (sm DESC, pool position ASC) — the
          // chained-CTE oracle's argmax, so the greedy faces DuckDB
          val maxSim =
            if (selected.isEmpty) 0.0
            else selected.map(j =>
              math.floor(cos(pool(i)._2, pool(j)._2) * 1e6 + 0.5) / 1e6).max
          val score = lambda * pool(i)._3 - (1.0 - lambda) * maxSim
          val sm = math.floor(score * 1e6 + 0.5).toLong
          if (sm > bestSm) {
            bestIdx = i; bestSm = sm
          }
        }
        i += 1
      }
      selected += bestIdx
      out += ((out.length + 1L, pool(bestIdx)._1,
        pool(bestIdx)._3, bestSm / 1e6))
    }
    out.toSeq
  }

  /** `q_text_bm25_stored`: BM25 top-k served from a PERSISTED statistics
    * store ([[graft.sources.CatalogOps.createBm25Stats]]) — the serving
    * shape [[bm25Scored]]'s scaladoc promises at 100 TB: the stats pass is
    * paid once at ingest, so a query costs
    *
    *  1. a sum over the (tiny) stats-partials log — bounded driver read,
    *  2. a `term IN (...)` pushed-filter probe of the df log — reads only
    *     the FEW query terms' rows, never the vocabulary,
    *  3. ONE corpus scan scoring with the merged values as fold-time
    *     literals — no join, no broadcast, no shuffle; the top-k is
    *     `TakeOrderedAndProject` (plan-pinned: zero Exchange operators).
    *
    * Results are bit-identical to [[bm25TopK]] (same oracle SQL): every
    * stored partial is an exact integer count, so merge order cannot
    * perturb n / df / sum_dl, and `avgdl = sum_dl / n` is the same double
    * `avg(dl)` computes. Pinned by RetrievalSpec, including across a
    * create + upsert split of the corpus and after compaction.
    */
  def bm25TopKStored(spark: SparkSession, dir: String,
      query: String = graft.SparkEntry.KnnTextQuery, k: Int = 20): DataFrame = {
    val (db, name) = ensureBm25Store(spark, dir)
    bm25TopKStoredOn(spark, Tables.documents(spark, dir), db, name, query, k)
  }

  /** Score an explicit corpus frame against a stored stats artifact (the
    * store is corpus-agnostic — ingest and serving frames are the
    * caller's contract, exactly as with the vector collections).
    */
  def bm25TopKStoredOn(spark: SparkSession, corpus: DataFrame,
      db: String, name: String, query: String, k: Int): DataFrame = {
    val terms = queryTerms(query)
    require(terms.nonEmpty, "BM25 needs at least one query term")
    statsOf(spark, db, name) match {
      case None => emptyTopK(spark)
      case Some((n, avgdl)) =>
        val dfMap = dfProbe(spark, db, name, terms)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        bm25ScoreWithLiterals(corpus, terms, n, avgdl, dfMap, k)
    }
  }

  /** Build-if-absent for the stored-BM25 contract entry — deliberately
    * built as create-on-half + upsert-the-rest so every contract run
    * exercises the INCREMENTAL maintenance path against the SQL oracle,
    * not just the fresh build. Same JVM-scoped guard semantics as
    * [[KnnOps.ensureIvfProbeCollection]].
    */
  private[graft] def ensureBm25Store(spark: SparkSession, dir: String): (String, String) = {
    import graft.sources.CatalogOps
    val db = "graft_bm25"
    val name = "docs"
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.${name}__bm25stats") ||
          !spark.catalog.tableExists(s"$db.${name}__bm25df")) {
        CatalogOps.createDatabase(spark, db)
        Seq(s"${name}__bm25stats", s"${name}__bm25df").foreach(KnnOps.dropTableAndDir(spark, db, _))
        val docs = Tables.documents(spark, dir)
        CatalogOps.createBm25Stats(spark, db, name,
          docs.filter(col("doc_id") % 2 === 0))
        CatalogOps.upsertBm25Stats(spark, db, name,
          docs.filter(col("doc_id") % 2 =!= 0))
      }
    }
    (db, name)
  }

  /** `q_hybrid_rrf_served`: the full SERVING-PATH hybrid — both pools come
    * from persisted artifacts and NEITHER touches the corpus: the lexical
    * pool from the inverted postings index ([[bm25TopKIndexedOn]],
    * bucket-pruned posting lists, zero corpus scans) and the vector pool
    * from the routed NSW graph index ([[graft.operators.GraphAnnOps
    * .searchStoredRouted]], nprobe pruned cell graphs, no exact scan),
    * fused by the same reciprocal-rank arithmetic as [[hybridRrf]]. This
    * is the complete production query of the engine's two retrieval
    * stacks composed — what a deployment actually runs per request at
    * 100 TB, where per-query cost must scale with the QUERY (its terms'
    * posting lists, its probe cells), never the corpus. Approximate on
    * the vector side by construction → rows-only in the contract;
    * RetrievalSpec pins equality to the exact [[hybridRrf]] at
    * exhaustive probe settings (efSearch ≥ corpus, nprobe = kCells) and
    * fusion validity below them.
    */
  def hybridRrfServed(spark: SparkSession, dir: String,
      query: String = graft.SparkEntry.KnnTextQuery,
      pool: Int = 20, k: Int = 10,
      efSearch: Int = 100, nprobe: Int = 2,
      kCells: Int = 8): DataFrame = {
    val (ldb, lname) = ensureLexicalIndex(spark, dir)
    val lex = bm25TopKIndexedOn(spark, ldb, lname, query, pool)
      .withColumn("lrank",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id").asc)))

    val (gdb, gname) = GraphAnnOps.ensureNswRoutedCollection(
      spark, dir, kCells, m = 16, efConstruction = 200)
    val qvec = graft.plans.FeatureHash.embed(
      org.apache.spark.unsafe.types.UTF8String.fromString(query),
      KnnOps.DefaultEmbedDim).toDoubleArray
    val vec = GraphAnnOps.searchStoredRouted(spark, gdb, gname, qvec,
        pool, efSearch, nprobe)
      .select(col("vec_id"), round(col("score"), 6).as("vscore"))
      .orderBy(col("vscore").desc, col("vec_id").asc)
      .limit(pool)
      .withColumn("vrank",
        row_number().over(Window.orderBy(col("vscore").desc, col("vec_id").asc)))

    fuseRrf(lex, vec, k)
  }

  /** `q_text_bm25_batch`: batched BM25 serving from the stored statistics —
    * ONE corpus scan answers a whole query table (query_id, qtext), the
    * lexical twin of [[KnnOps.topKForQueries]]'s batched knn.
    *
    * Shape: the query batch's term lists collect driver-side (the batch is
    * the bounded small side by contract, exactly like the broadcast query
    * vectors of batched knn); their merged df values come from one pushed
    * `term IN` probe of the df log. A broadcast (query_id, term, tidx, idf)
    * table joins the token-exploded corpus — only tokens matching SOME
    * query term survive the join — then ONE explicit repartition on
    * (doc_id, query_id) feeds both aggregations exchange-free: tf per
    * (doc, query, term), then the per-query score. The final per-query
    * top-k is the bounded-heap [[graft.plans.TopKScoreId]] aggregate —
    * map-side k-entry heaps, so the last shuffle carries k·partitions rows
    * per query, never the scored corpus.
    *
    * Determinism: the per-query sum folds `sort_array(collect_list(struct
    * (tidx, partial)))` in fixed tidx order, and a term with tf = 0
    * contributes an exact fp `+0.0` in the single-query chain — so batched
    * scores are BIT-IDENTICAL to [[bm25TopKStoredOn]] per query
    * (RetrievalSpec pins it); rows-only in the contract because the
    * batched SQL oracle would need a per-query fp chain DuckDB cannot
    * share across a join.
    */
  def bm25ForQueriesStored(spark: SparkSession, corpus: DataFrame,
      db: String, name: String, queries: DataFrame, k: Int = 10): DataFrame = {
    val qTerms = collectQueryTerms(queries)
    require(qTerms.nonEmpty, "batched BM25 needs at least one non-empty query")
    val allTerms = qTerms.flatMap(_._2).distinct.toSeq
    statsOf(spark, db, name) match {
      case None => emptyBatchedTopK(spark)
      case Some((n, avgdl)) =>
        val dfMap = dfProbe(spark, db, name, allTerms)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val termsDf = termIdfTable(spark, qTerms, n, dfMap)
        val matched = corpus
          .select(col("doc_id"),
            size(toks(col("text"))).cast("double").as("dl"),
            explode(toks(col("text"))).as("term"))
          .join(termsDf, "term")
          .repartition(col("doc_id"), col("query_id")) // both aggs reuse this
        val partial = matched
          .groupBy(col("doc_id"), col("query_id"), col("tidx"), col("idf"), col("dl"))
          .agg(count(lit(1)).cast("double").as("tf"))
          .withColumn("p",
            col("idf") * (col("tf") * lit(K1Plus1)) /
              (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgdl))))
        scoreFoldTopK(partial, k)
    }
  }

  /** `q_text_bm25_indexed`: BM25 top-k served from the INVERTED POSTINGS
    * index ([[graft.sources.CatalogOps.createPostings]]) — ZERO corpus
    * scans. The statistics store ([[bm25TopKStored]]) moved the stats
    * pass to ingest but still re-tokenizes the whole corpus per query;
    * this is the Lucene end-state where that scan is an ingest cost too:
    * a query costs
    *
    *  1. the (tiny) stats-log sum — n, avgdl,
    *  2. the pushed `term IN` df-log probe — idf per query term,
    *  3. ONE read of the postings table pruned to the query terms'
    *     hash-bucket PARTITIONS (directory-level, [[graft.sources
    *     .CatalogOps.PostingsBuckets]]) then their rows (row-group-level
    *     pushed filter) — cost ∝ the query terms' posting lists, NEVER
    *     the corpus. One explicit `repartition(doc_id)` feeds both
    *     aggregations (log-merge, then score fold) exchange-free; the
    *     top-k is `TakeOrderedAndProject`.
    *
    * Bit-identical to [[bm25TopKStoredOn]] (and so to [[bm25TopK]], same
    * oracle SQL): merged tf/dl are exact integer counts, idf folds the
    * same literals through the same `Math.log`, and the per-doc score
    * folds `sort_array(collect_list(struct(tidx, partial)))` in fixed
    * tidx order — a term the doc lacks contributes an exact `+0.0` in the
    * literal chain, so skipping it cannot change the bits (the
    * [[bm25ForQueriesStored]] determinism argument). RetrievalSpec pins
    * equality incl. across create/upsert/remove/compact lifecycles, and
    * pins the pruned plan.
    */
  def bm25TopKIndexed(spark: SparkSession, dir: String,
      query: String = graft.SparkEntry.KnnTextQuery, k: Int = 20): DataFrame = {
    val (db, name) = ensureLexicalIndex(spark, dir)
    bm25TopKIndexedOn(spark, db, name, query, k)
  }

  /** Serve BM25 from the postings + statistics artifacts alone (no corpus
    * frame at all — the serving signature of an index-complete store).
    */
  def bm25TopKIndexedOn(spark: SparkSession, db: String, name: String,
      query: String, k: Int): DataFrame =
    bm25IndexedCore(spark, db, name, query, k, identity)

  /** `q_text_bm25_filtered`: the FILTER-index composition on the LEXICAL
    * path — the twin of the vector stack's filtered probes (exact
    * [[KnnOps.topKFiltered]], IVF cell∘predicate, NSW post-filter): score
    * from the postings index, restrict candidates to the documents
    * matching a metadata predicate. The predicate side is a COLUMN-PRUNED
    * pushed-filter scan of the metadata frame (doc_id + predicate columns
    * only — never text), left-semi-joined into the per-(term, doc)
    * postings rows BEFORE the score fold and top-k; the postings side is
    * already hash-partitioned on doc_id, so only the (small, filtered) id
    * side shuffles or broadcasts.
    *
    * Statistics semantics are Lucene's: the filter restricts CANDIDATES,
    * not the corpus statistics — idf/avgdl/n stay corpus-wide, so a
    * document's score is identical filtered or not (the spec pins
    * filtered == post-filtered-unfiltered on every score). Oracle-green:
    * the SQL adds one `doc_id IN (SELECT ...)` to the shared BM25 query.
    */
  def bm25TopKIndexedFiltered(spark: SparkSession, db: String, name: String,
      meta: DataFrame, query: String, predicate: Column, k: Int): DataFrame =
    bm25IndexedCore(spark, db, name, query, k,
      merged => merged.join(
        meta.filter(predicate).select(col("doc_id")), Seq("doc_id"), "left_semi"))

  /** `q_text_bm25_conj`: conjunctive (all-terms-required) lexical search —
    * the classic AND mode every lexical engine offers next to BM25's OR
    * default. Candidates must contain EVERY query term; scores and
    * ranking are unchanged (corpus-wide statistics, same fp chain). On
    * the postings path the merged rows are unique per (term, doc), so
    * "has all terms" is a `count over (partition by doc_id)` — and the
    * frame is already hash-partitioned on doc_id, so the window adds a
    * local sort, not an exchange. Oracle-green: the SQL conjunction is
    * `tf_i > 0` for every i.
    */
  def bm25TopKIndexedConj(spark: SparkSession, db: String, name: String,
      query: String, k: Int): DataFrame = {
    val nTerms = queryTerms(query).length
    bm25IndexedCore(spark, db, name, query, k, merged =>
      merged
        .withColumn("nt",
          count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        .filter(col("nt") === nTerms)
        .drop("nt"))
  }

  private def bm25IndexedCore(spark: SparkSession, db: String, name: String,
      query: String, k: Int, restrict: DataFrame => DataFrame): DataFrame = {
    val terms = queryTerms(query)
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val (n, avgdl) = statsOf(spark, db, name) match {
      case None => return emptyTopK(spark)
      case Some(s) => s
    }
    val dfMap = dfProbe(spark, db, name, terms)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // term → (tidx, idf) as literal CASE chains: no join, the scoring
    // plan's only input is the pruned postings scan
    val tidxCol = terms.zipWithIndex.foldLeft(lit(-1)) { case (acc, (t, i)) =>
      when(col("term") === lit(t), lit(i)).otherwise(acc)
    }
    val idfCol = terms.foldLeft(lit(0.0)) { case (acc, t) =>
      val dfi = dfMap.getOrElse(t, 0.0)
      when(col("term") === lit(t),
        lit(math.log((n - dfi + 0.5) / (dfi + 0.5) + 1.0))).otherwise(acc)
    }
    restrict(mergedPostings(spark, db, name, terms))
      .withColumn("tidx", tidxCol)
      .withColumn("idf", idfCol)
      .withColumn("p",
        col("idf") * (col("tf") * lit(K1Plus1)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgdl))))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("tidx"), col("p")))).as("ps"))
      .select(col("doc_id"),
        round(aggregate(col("ps"), lit(0.0),
          (acc, x) => acc + x.getField("p")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }

  /** `q_text_bm25_batch_indexed`: batched BM25 serving from the POSTINGS
    * index — ONE bucket-pruned postings read answers a whole (query_id,
    * qtext) table, zero corpus scans. [[bm25ForQueriesStored]] with its
    * one remaining corpus scan replaced by the posting lists of the
    * batch's term UNION: the pruned read merges the signed log once
    * (repartitioned on doc_id, which both aggregations AND the broadcast
    * join downstream reuse — HashPartitioning(doc_id) satisfies every
    * ClusteredDistribution here by the subset rule), a broadcast
    * (query_id, term, tidx, idf) table fans each posting out to the
    * queries that want its term, and the per-query score + bounded-heap
    * top-k are identical to the stored batched path — so results are
    * BIT-IDENTICAL to it per query (RetrievalSpec pins it; rows-only in
    * the contract for the same fp-chain reason).
    */
  def bm25ForQueriesIndexed(spark: SparkSession, db: String, name: String,
      queries: DataFrame, k: Int = 10): DataFrame = {
    val qTerms = collectQueryTerms(queries)
    require(qTerms.nonEmpty, "batched BM25 needs at least one non-empty query")
    val allTerms = qTerms.flatMap(_._2).distinct.toSeq
    statsOf(spark, db, name) match {
      case None => emptyBatchedTopK(spark)
      case Some((n, avgdl)) =>
        val dfMap = dfProbe(spark, db, name, allTerms)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val termsDf = termIdfTable(spark, qTerms, n, dfMap)
        val partial = mergedPostings(spark, db, name, allTerms)
          .join(termsDf, "term")
          .withColumn("p",
            col("idf") * (col("tf") * lit(K1Plus1)) /
              (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgdl))))
        scoreFoldTopK(partial, k)
    }
  }

  /** The bucket-pruned, log-merged postings read shared by the indexed
    * probes: prune to the query terms' bucket partitions + pushed term
    * filter, repartition ONCE on doc_id (both downstream aggregations
    * reuse it), merge the signed log to live (term, doc_id, tf, dl)
    * rows. Package-visible so RetrievalSpec can pin the plan.
    */
  private[graft] def mergedPostings(spark: SparkSession, db: String,
      name: String, terms: Seq[String]): DataFrame = {
    val buckets = terms.map(graft.sources.CatalogOps.postingsBucketOf).distinct
    spark.table(s"`$db`.`${name}__postings`")
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .repartition(col("doc_id"))
      .groupBy(col("term"), col("doc_id"))
      .agg(sum(col("tf")).as("tf"), sum(col("dl")).as("dl"))
      .filter(col("tf") > 0.0)
  }

  /** Build-if-absent for the indexed contract entries: the BM25
    * statistics store PLUS the postings index, both deliberately built
    * create-half + upsert-half so every contract run exercises the
    * incremental maintenance path. One artifact set, three logs —
    * stats (n, sum_dl), df, postings — maintained by the same
    * create/upsert/remove calls.
    */
  private[graft] def ensureLexicalIndex(spark: SparkSession, dir: String): (String, String) = {
    import graft.sources.CatalogOps
    val (db, name) = ensureBm25Store(spark, dir)
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.${name}__postings")) {
        // a fresh test catalog can meet a stale warehouse dir from a
        // previous JVM — same wipe ensureBm25Store does for its tables
        KnnOps.dropTableAndDir(spark, db, s"${name}__postings")
        val docs = Tables.documents(spark, dir)
        CatalogOps.createPostings(spark, db, name,
          docs.filter(col("doc_id") % 2 === 0))
        CatalogOps.upsertPostings(spark, db, name,
          docs.filter(col("doc_id") % 2 =!= 0))
      }
    }
    (db, name)
  }

  /** The df-log probe — package-visible so RetrievalSpec can pin the
    * pushed `term IN (...)` scan filter.
    */
  private[graft] def dfProbe(spark: SparkSession, db: String, name: String,
      terms: Seq[String]): DataFrame =
    spark.table(s"`$db`.`${name}__bm25df`")
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))

  /** One-scan BM25 scoring with the corpus statistics as literals: the
    * same expression shape as [[bm25Scored]]'s termScore with the stats
    * columns constant-folded — Catalyst folds `log(<literals>)` at
    * optimization time through the same `Math.log`, so scores match the
    * live path bit-for-bit.
    */
  private def bm25ScoreWithLiterals(corpus: DataFrame, terms: Seq[String],
      n: Double, avgdl: Double, dfMap: Map[String, Double], k: Int): DataFrame = {
    val w = toks(col("text"))
    def tf(i: Int): Column =
      size(filter(w, x => x === lit(terms(i)))).cast("double")
    def termScore(i: Int): Column = {
      val dfi = dfMap.getOrElse(terms(i), 0.0)
      val idf = log((lit(n) - lit(dfi) + 0.5) / (lit(dfi) + 0.5) + 1.0)
      idf * (tf(i) * lit(K1Plus1)) /
        (tf(i) + lit(K1) * (lit(1.0 - B) + lit(B) *
          size(w).cast("double") / lit(avgdl)))
    }
    val anyHit = terms.indices.map(tf).reduce(_ + _) > 0
    corpus
      .filter(anyHit)
      .select(col("doc_id"),
        round(terms.indices.map(termScore).reduce(_ + _), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }

  /** The `q_text_fuzzy` query set: misspellings of fixture-vocabulary
    * words at Levenshtein distance exactly 1 (insertion `joinn`,
    * deletion `filtr`, substitutions `hask`/`scam`/`vektor`), one exact
    * word (`spark`, distance 0), and two that must NOT match — `tabel`
    * (a transposition: distance 2 in plain Levenshtein) and `qqq`
    * (nothing within distance 1). Exercises every edit class.
    */
  private[graft] val FuzzyQueryTerms: Seq[String] =
    Seq("joinn", "hask", "filtr", "scam", "spark", "vektor", "tabel", "qqq")

  /** Fuzzy vocabulary lookup (`q_text_fuzzy`) — "did you mean"-class
    * query correction against the corpus vocabulary, the missing-half of
    * a lexical retriever over noisy user queries. Returns every corpus
    * term within Levenshtein distance ≤ 1 of each query term, with its
    * corpus occurrence count (the rank signal for picking a correction).
    *
    * Plan: the SymSpell deletion-neighborhood join (Garbe's public
    * symmetric-delete algorithm). For maxEdit = 1, lev(q, t) ≤ 1 implies
    * ({q} ∪ deletes₁(q)) ∩ ({t} ∪ deletes₁(t)) ≠ ∅ — equality covers
    * distance 0, deletes₁(q) ∋ t covers insertion, q ∈ deletes₁(t)
    * covers deletion, and a substitution at position i puts the common
    * i-deleted string in both sets. So an equi-join on the variant
    * string finds EVERY true match (completeness pinned by ScalaCheck
    * in FuzzyProperties); the built-in codegen `levenshtein` then
    * discards the few distance-2 coincidences (two different deletions
    * colliding). vs the naive form — a |V| × |Q| nested-loop of dynamic
    * programming — this is a hash join keyed on ~(len+1) variants per
    * side: the corpus side scales linearly in vocabulary size and the
    * query side broadcasts, which is the 100 TB shape (vocabulary is
    * corpus-bounded; queries are user-bounded).
    */
  def fuzzyVocabMatch(spark: SparkSession, dir: String,
      queryTerms: Seq[String] = FuzzyQueryTerms): DataFrame =
    fuzzyVocabMatchOn(spark,
      Tables.documents(spark, dir).select(col("text")), queryTerms)

  private[graft] def fuzzyVocabMatchOn(spark: SparkSession, docs: DataFrame,
      queryTerms: Seq[String]): DataFrame = {
    // {x} ∪ deletes₁(x), as one codegen'd higher-order expression
    def variants(c: Column): Column =
      array_union(array(c),
        transform(sequence(lit(1), length(c)), i =>
          concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c)))))
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("n_occur"))
    val vv = vocab.select(col("term"), col("n_occur"),
      explode(variants(col("term"))).as("v"))
    val qv = spark.createDataFrame(queryTerms.map(Tuple1(_)))
      .toDF("q_term")
      .select(col("q_term"), explode(variants(col("q_term"))).as("v"))
    vv.join(broadcast(qv), "v")
      .filter(levenshtein(col("q_term"), col("term")) <= 1)
      .select(col("q_term"), col("term"), col("n_occur")).distinct()
      .orderBy(col("q_term").asc, col("term").asc)
  }
}
