package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Retrieval-evaluation and training-pair-mining operators — the feedback
  * loop of the reference's retrieval domain (the reference serves cosine
  * top-3 as RAG context, `main_server.py:40-44`; a production deployment of
  * that loop needs to MEASURE retrieval quality and to mine training pairs
  * for the embedding model that powers it).
  *
  *  - [[hardNegatives]] — contrastive-pair mining: per query, the top-k
  *    most-similar candidates whose label DIFFERS from the query's (the
  *    "hard negatives" an embedding trainer wants; Karpukhin et al. 2020,
  *    DPR, mine exactly this from BM25/ANN neighbors).
  *  - [[rankEval]] — Recall@k / MRR / nDCG@k of the exact cosine ranking
  *    against same-label relevance (the standard IR metric triple,
  *    Järvelin & Kekäläinen 2002 for nDCG).
  *
  * Both reuse the bounded-heap batch scorer [[KnnOps.topKForQueries]]
  * (broadcast query side, k-per-map-task partial aggregation), so the
  * corpus-side plan is the one that survives 100 TB: no full shuffle of
  * scored candidates, no rank window over the corpus.
  *
  * Determinism (FIXTURES.md rules): scores are `round(_, 6)` with vec_id
  * tie-breaks; nDCG's per-rank discount weights are PRECOMPUTED integer
  * micro-units ([[dcgWeightsMicro]]) injected as literals into BOTH the
  * Spark plan and the DuckDB oracle, so no `log2` evaluation can diverge
  * between engines, and the DCG sum is an order-independent integer sum.
  */
object EvalOps {

  /** Macro (per-query-averaged) form of [[rankEval]] — the single row an
    * eval report quotes. The per-query metrics are already rounded to 6
    * decimals, so summing their exact 1e6-microunit integers keeps the
    * average order-independent (the bigram-oracle trick), matching the
    * DuckDB mirror bit-for-bit.
    */
  def rankEvalMacro(spark: SparkSession, dir: String,
      nQueries: Int = 8, k: Int = 10): DataFrame = {
    def microAvg(c: String) =
      round(sum(floor(col(c) * lit(1e6) + lit(0.5)).cast("bigint"))
        .cast("double") / count(lit(1)) / lit(1e6), 6).as(c)
    rankEval(spark, dir, nQueries, k).agg(
      count(lit(1)).cast("bigint").as("n_queries"),
      microAvg("recall_at_k"), microAvg("mrr"), microAvg("ndcg"))
  }

  /** [[rankEval]] over the ranking the IVF INDEX actually serves — the
    * number a deployment monitors (the exact-scan eval scores a ranking
    * nobody runs in production). Queries probe `nprobe` of the
    * cell-partitioned collection ([[KnnOps.topKForQueriesIvf]]); the
    * metric layer is the shared [[rankEvalOn]]. Approximate by
    * construction (rows-only); at exhaustive probes it equals
    * [[rankEval]] bit-for-bit (test-pinned), and the gap between the two
    * IS the serving-quality cost of the pruning.
    */
  def rankEvalIndexed(spark: SparkSession, dir: String,
      nQueries: Int = 8, k: Int = 10, nprobe: Int = 2,
      kCells: Int = 8, iters: Int = 3): DataFrame = {
    val (db, name) = KnnOps.ensureIvfProbeCollection(spark, dir, kCells, iters)
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"), col("label").as("q_label"))
    val cand = emb.filter(col("vec_id") >= nQueries)
    // the served ranking may surface query rows themselves (the IVF
    // collection holds the whole corpus) — drop them to keep the
    // candidate universe identical to the exact eval's
    val ranked = KnnOps.topKForQueriesIvf(spark, db, name,
        queries.select(col("query_id"), col("q_embedding")),
        k + nQueries, nprobe)
      .filter(col("vec_id") >= nQueries)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
    val qrels = cand.select(col("vec_id"), col("label"))
      .join(broadcast(queries.select(col("query_id"), col("q_label"))),
        col("label") === col("q_label"))
      .select(col("query_id"), col("vec_id"))
    rankEvalOn(ranked, qrels, queries.select(col("query_id")), k)
  }

  /** 1e6-scaled DCG discount weights: `w(rank) = round(1e6 / log2(rank+1))`
    * for rank = 1..k. Integer micro-units so the grouped DCG sum is exact
    * and order-independent (same trick as the bigram-LM oracle). Shared by
    * [[rankEval]] and [[graft.SparkEntry]]'s oracle-SQL builder — one
    * definition, two engines.
    */
  def dcgWeightsMicro(k: Int): Seq[Long] =
    Seq.tabulate(k) { i =>
      math.floor(1e6 / (math.log(i + 2) / math.log(2.0)) + 0.5).toLong
    }

  /** Prefix sums of [[dcgWeightsMicro]]: `idcg(n) = Σ_{i=1..n} w(i)` — the
    * ideal DCG for n relevant items within a depth-k cutoff.
    */
  def idcgPrefixMicro(k: Int): Seq[Long] =
    dcgWeightsMicro(k).scanLeft(0L)(_ + _).tail

  /** Hard-negative mining: for each query vector (`vec_id < nQueries`),
    * the k most-cosine-similar candidates (`vec_id >= nQueries`) with a
    * DIFFERENT label. The label predicate lands BELOW the bounded-heap
    * aggregation — each map task scores and heap-keeps only label-mismatched
    * rows, so the shuffle still carries k rows per (query, map task) and
    * the corpus never moves. Output: (query_id, vec_id, score, rank).
    */
  def hardNegatives(spark: SparkSession, dir: String,
                    nQueries: Int = 5, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"), col("label").as("q_label"))
    val cand = emb.filter(col("vec_id") >= nQueries)
    // join the tiny broadcast query side first, then drop same-label rows
    // map-side; the remaining plan is exactly the topKForQueries shape
    val mismatched = cand.crossJoin(broadcast(queries))
      .filter(col("label") =!= col("q_label"))
      .select(col("query_id"), col("q_embedding"),
        col("vec_id"), col("embedding"))
    KnnOps.topKForQueriesPrescored(mismatched, k)
  }

  /** Contrastive TRAINING RECORDS — the assembled DPR-style triple per
    * query: the single best SAME-label candidate (the positive) plus the
    * [[hardNegatives]] top-k (the hard negatives), as rows
    * (query_id, role, rank, vec_id, score). This is the record an
    * embedding trainer consumes; both halves ride the bounded-heap
    * scorer, so assembling a 10k-query training set stays one
    * broadcast-join pass over the corpus.
    */
  def trainingPairs(spark: SparkSession, dir: String,
      nQueries: Int = 5, kNeg: Int = 3): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"), col("label").as("q_label"))
    val cand = emb.filter(col("vec_id") >= nQueries)
    val paired = cand.crossJoin(broadcast(queries))
    def side(cond: Column, role: String, k: Int) =
      KnnOps.topKForQueriesPrescoredUnsorted(
        paired.filter(cond)
          .select(col("query_id"), col("q_embedding"),
            col("vec_id"), col("embedding")), k)
        .withColumn("role", lit(role))
    side(col("label") === col("q_label"), "pos", 1)
      .unionByName(side(col("label") =!= col("q_label"), "neg", kNeg))
      .select(col("query_id"), col("role"), col("rank"),
        col("vec_id"), col("score"))
      .orderBy(col("query_id").asc, col("role").asc, col("rank").asc)
  }

  /** Hard-negative mining on the INDEX path: the same label-mismatch
    * mining as [[hardNegatives]], served from the IVF cell-partitioned
    * collection — per query only the `nprobe` nearest cells are scanned
    * (partition-pruned once for the whole batch), so mining a 10k-query
    * panel against a 100 TB corpus touches nprobe/kCells of it instead of
    * all of it. Approximate by construction (a hard negative hiding in an
    * unprobed cell is missed — the standard ANN-mining trade, DPR mines
    * from BM25/ANN pools the same way); equality to the exact path at
    * exhaustive probes is test-pinned. The label predicate sits between
    * the cell join and the bounded heap, exactly like the exact form.
    */
  def hardNegativesIndexed(spark: SparkSession, dir: String,
      nQueries: Int = 5, k: Int = 5, nprobe: Int = 2,
      kCells: Int = 8, iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    import graft.functions.VectorFunctions.cosineFast
    val (db, name) = KnnOps.ensureIvfProbeCollection(spark, dir, kCells, iters)
    val (cents, nCells) = KnnOps.readCoarseModel(spark, db, name)
    val qRows = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
    val probeRows = qRows.flatMap { r =>
      val qv = r.getSeq[Double](1).toArray
      KnnOps.nearestCells(qv, cents, nCells, nprobe)
        .map(c => (r.getLong(0), c, qv.toSeq, r.getInt(2)))
    }
    val qprobe = spark.createDataFrame(probeRows.toIndexedSeq)
      .toDF("query_id", "cell", "q_embedding", "q_label")
    val allCells = probeRows.map(_._2).distinct.map(Int.box)
    val scored = spark.table(s"`$db`.`$name`")
      .filter(col("cell").isin(allCells.toIndexedSeq: _*))
      .join(broadcast(qprobe), "cell")
      .filter(col("label") =!= col("q_label") && col("vec_id") >= nQueries)
      .select(col("query_id"), col("vec_id"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
    val topk = toCol(graft.plans.TopKScoreId(
      toExpr(col("score")), toExpr(col("vec_id")), k).toAggregateExpression())
    scored.groupBy(col("query_id"))
      .agg(topk.as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.vec_id").as("vec_id"),
        col("hit.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** Rank-quality evaluation of the exact cosine top-k ranking against
    * same-label relevance. Queries = `vec_id < nQueries`, candidates = the
    * rest; a candidate is RELEVANT to a query iff labels match. Per query:
    *
    *  - `n_rel`   — number of relevant candidates in the corpus
    *  - `hits`    — relevant candidates inside the top-k
    *  - `recall_at_k` — hits / n_rel
    *  - `mrr`     — 1 / rank of the first relevant hit (0 when none)
    *  - `ndcg`    — Σ w(rank_of_hit) / Σ_{i<=min(n_rel,k)} w(i), binary
    *                gains, weights from [[dcgWeightsMicro]]
    *
    * The ranking pass is [[KnnOps.topKForQueries]] (bounded-heap, corpus
    * never shuffles); everything after it touches only k rows per query
    * plus one broadcast-sized label-count table, so the metric layer adds
    * no corpus-scale work — the shape that lets a 100 TB deployment score
    * a 10k-query eval set as one cheap job.
    */
  def rankEval(spark: SparkSession, dir: String,
               nQueries: Int = 8, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"), col("label").as("q_label"))
    val cand = emb.filter(col("vec_id") >= nQueries)

    // (query_id, vec_id, score, rank) — k rows per query
    val ranked = KnnOps.topKForQueries(
      queries.select(col("query_id"), col("q_embedding")), cand, k)

    // qrels from label equality: relevant = same-label candidate
    val qrels = cand.select(col("vec_id"), col("label"))
      .join(broadcast(queries.select(col("query_id"), col("q_label"))),
        col("label") === col("q_label"))
      .select(col("query_id"), col("vec_id"))
    rankEvalOn(ranked, qrels, queries.select(col("query_id")), k)
  }

  /** The metric layer on ARBITRARY tables — evaluate ANY run (cosine,
    * BM25, hybrid, an external system's) against ANY relevance judgments:
    * `run` = (query_id, vec_id, rank) with rank 1-based and ≤ k per
    * query; `qrels` = (query_id, vec_id) relevant pairs; `queryIds` =
    * one row per evaluated query (queries with no run rows or no
    * relevant docs still score, as zeros). Scale shape: the run is
    * k·queries rows and qrels joins it per (query_id, vec_id); the only
    * per-query state is the handful of aggregated counters — a 10k-query
    * eval panel is a trivially small job whatever the corpus behind the
    * run was.
    */
  def rankEvalOn(run: DataFrame, qrels: DataFrame, queryIds: DataFrame,
      k: Int): DataFrame = {
    // depth cut enforces the @k contract (a deeper run contributes
    // nothing — and un-cut, a rank > k would index past the weight
    // array, an ANSI-mode error); duplicate qrels pairs must not
    // double-count a hit, so judgments are set-semantics
    val cut = run.filter(col("rank") <= k)
    val rels = qrels.select(col("query_id"), col("vec_id")).distinct()
    val judged = cut
      .join(rels.withColumn("rel", lit(1)),
        Seq("query_id", "vec_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))

    val relCounts = rels.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))

    val w = dcgWeightsMicro(k)
    val wByRank = array(w.map(lit): _*) // element_at is 1-based = rank
    val idcg = idcgPrefixMicro(k)
    val idcgByN = array(idcg.map(lit): _*)

    val perQuery = judged.groupBy(col("query_id"))
      .agg(
        sum(col("rel")).cast("bigint").as("hits"),
        sum(when(col("rel") === 1, element_at(wByRank, col("rank")))
          .otherwise(lit(0L))).cast("bigint").as("dcg_micro"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel"))

    queryIds.select(col("query_id"))
      .join(relCounts, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("n_rel"), lit(0L)).as("n_rel"))
      .join(perQuery, Seq("query_id"), "left")
      .select(
        col("query_id"),
        col("n_rel").cast("bigint").as("n_rel"),
        coalesce(col("hits"), lit(0L)).cast("bigint").as("hits"),
        round(when(col("n_rel") > 0,
          coalesce(col("hits"), lit(0L)).cast("double") / col("n_rel"))
          .otherwise(lit(0.0)), 6).as("recall_at_k"),
        round(when(col("first_rel").isNotNull,
          lit(1.0) / col("first_rel")).otherwise(lit(0.0)), 6).as("mrr"),
        round(when(col("n_rel") > 0 && col("dcg_micro").isNotNull,
          col("dcg_micro").cast("double") /
            element_at(idcgByN, least(col("n_rel"), lit(k)).cast("int")))
          .otherwise(lit(0.0)), 6).as("ndcg"))
      .orderBy(col("query_id").asc)
  }
}
