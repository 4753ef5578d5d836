package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** k-nearest-neighbor retrieval — the reference's core query:
  * `coll.searchByText(embeddingItems=[txt], limit=3, params=SearchParams(ef=100))`
  * over an HNSW/cosine index (reference `main_server.py:41`,
  * `TencentVDB.py:46`). Re-planned Spark-first:
  *
  *  - v1 is EXACT brute-force scoring — the scan IS the index. `orderBy +
  *    limit` compiles to `TakeOrderedAndProject`, which computes a bounded
  *    top-k per partition and merges k·numPartitions rows on the driver:
  *    already the scale-correct plan (no global sort, no full shuffle).
  *  - Batched queries (`embeddingItems` is a list, ref `main_server.py:40-44`)
  *    broadcast the small query side across the corpus and take top-k per
  *    query with a rank window — one shuffle, partitioned by query id.
  *  - Filtered ANN (the declared FilterIndex surface, ref
  *    `TencentVDB.py:31-32,48`) applies the predicate BELOW scoring, so
  *    Catalyst pushes it into the parquet scan.
  *
  * All scores are rounded to 6 decimals with integer-id tie-breaks
  * (FIXTURES.md determinism rules).
  */
object KnnOps {

  /** The fixture corpus's embedding width. ONE constant shared by the
    * text-query entry ([[topKByText]]) and the oracle-SQL builder
    * ([[graft.SparkEntry.knnTextQueryVec]]), so the engine's in-plan
    * embedding and the DuckDB literal can never desync on dimension.
    */
  val DefaultEmbedDim = 64

  /** Corpus with vectors cast to double. */
  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)

  /** Single-query exact knn: query vector = row `vec_id = queryId`,
    * scored against every other row. Ref `main_server.py:41` (limit=3).
    * The 1-row query side is broadcast — zero shuffle on the corpus side;
    * TakeOrderedAndProject keeps only k rows per partition.
    */
  def topK(spark: SparkSession, dir: String, queryId: Long = 0L, k: Int = 3): DataFrame = {
    val emb = corpus(spark, dir)
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Single-query knn over a MATERIALIZED unit-vector collection
    * ([[graft.sources.CatalogOps.createVectorCollection]]): scoring is one
    * dot product per row — the normalization was paid at ingest, which is
    * where a 100 TB corpus wants it (same plan shape as [[topK]]:
    * broadcast 1-row query, TakeOrderedAndProject bounded top-k). Scores
    * can differ from the fused cosine in the last ulp (different float
    * operation order), so this variant is validated by equality-within-
    * tolerance against [[topK]] in tests rather than by the SQL oracle.
    */
  def topKPrenormed(unitized: DataFrame, queryId: Long = 0L, k: Int = 3): DataFrame = {
    val q = unitized.filter(col("vec_id") === queryId)
      .select(col("unit").as("q_unit"))
    unitized.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dotFast(col("unit"), col("q_unit")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Batched knn, bounded-heap formulation: ref `embeddingItems` list →
    * list-of-lists result (`main_server.py:40-44`). Queries = vec_id <
    * nQueries, corpus = the rest. The [[graft.plans.TopKScoreId]]
    * aggregate keeps k entries per query PER MAP TASK (partial aggregation),
    * so the shuffle carries k·partitions rows per query instead of the whole
    * scored corpus — the plan that survives a 100 TB corpus. (The rank-
    * window formulation this replaced — shuffle EVERY scored candidate,
    * then row_number — lives on only as PlanSpec's negative example, which
    * also pins its output equal to this one.) This is the implementation
    * behind `q_knn_batch`.
    */
  def topKBatchAgg(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 3): DataFrame = {
    val emb = corpus(spark, dir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    topKForQueries(queries, emb.filter(col("vec_id") >= nQueries), k)
  }

  /** Bounded-heap top-k for an ARBITRARY query table (query_id,
    * q_embedding) against an arbitrary candidate corpus (vec_id,
    * embedding) — the core behind [[topKBatchAgg]] and the per-micro-batch
    * scorer of [[graft.streaming.StreamingOps.streamingKnn]]. The query
    * side broadcasts (small by definition: one batch of queries; the
    * corpus may be 100 TB and never moves), and the
    * [[graft.plans.TopKScoreId]] partial aggregation bounds the shuffle
    * at k rows per (query, map task).
    */
  def topKForQueries(queries: DataFrame, cand: DataFrame, k: Int = 3): DataFrame = {
    // an at-least-once source can replay a query row; a duplicated
    // query_id would double-score every candidate and fill the k-slot
    // heap with duplicates — resolve deterministically first
    val uniq = queries.groupBy(col("query_id"))
      .agg(max(struct(col("q_embedding"))).as("__w"))
      .select(col("query_id"), col("__w.q_embedding").as("q_embedding"))
    topKForQueriesPrescored(cand.crossJoin(broadcast(uniq)), k)
  }

  /** The scoring + bounded-heap tail of [[topKForQueries]], taking rows
    * ALREADY paired as (query_id, q_embedding, vec_id, embedding) — for
    * callers that interpose a predicate between the broadcast pairing and
    * the heap (e.g. [[EvalOps.hardNegatives]]' label-mismatch gate). The
    * caller owns query-side dedup; the corpus-side plan is unchanged
    * (k rows per query per map task reach the shuffle).
    */
  def topKForQueriesPrescored(paired: DataFrame, k: Int): DataFrame =
    topKForQueriesPrescoredUnsorted(paired, k)
      .orderBy(col("query_id").asc, col("rank").asc)

  /** [[topKForQueriesPrescored]] without the presentation sort — for
    * callers that union or re-sort downstream (a branch-local sort under
    * a later global orderBy is a wasted range exchange the optimizer
    * does not remove; [[EvalOps.trainingPairs]] measured three).
    */
  private[graft] def topKForQueriesPrescoredUnsorted(paired: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val scored = paired
      .select(col("query_id"), col("vec_id"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
    val topk = toCol(graft.plans.TopKScoreId(
      toExpr(col("score")), toExpr(col("vec_id")), k).toAggregateExpression())
    scored.groupBy(col("query_id"))
      .agg(topk.as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.vec_id").as("vec_id"),
        col("hit.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Filtered ANN — predicate + knn composed, the declared FilterIndex
    * use-case (ref `TencentVDB.py:48`). The label filter lands in the
    * parquet scan (PushedFilters), replacing the reference's FILTER index.
    */
  def topKFiltered(spark: SparkSession, dir: String, queryId: Long = 0L,
      labelEq: Int = 3, k: Int = 5): DataFrame = {
    val emb = corpus(spark, dir)
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    emb.filter(col("vec_id") =!= queryId && col("label") === labelEq)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Query-by-TEXT retrieval — the reference's actual first call: the
    * client sends a STRING and the server embeds it before searching
    * (`searchByText(embeddingItems=[prompt_text], limit=3)`, ref
    * `main_server.py:40-41`; embedding decl `TencentVDB.py:49`). Composed
    * Spark-first: [[graft.plans.FeatureHashEmbed]] embeds the literal
    * inside the plan (a 1-row projection), the vector broadcasts, and the
    * corpus-side scoring/top-k is the same TakeOrderedAndProject shape as
    * [[topK]] — at 100 TB the text→vector step adds nothing to the scan-
    * dominated cost.
    *
    * The RAW hash vector (signed token counts — exact small integers) is
    * used unnormalized: cosine is scale-invariant, and integer components
    * round-trip exactly into the SQL oracle's literal, which is what makes
    * this entry oracle-checkable while `q_embed_batch` itself is not.
    */
  def topKByText(spark: SparkSession, dir: String, queryText: String, k: Int = 3,
      dim: Int = DefaultEmbedDim): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val emb = corpus(spark, dir)
    // the embedder width is a property of the corpus SCHEMA, not its rows —
    // callers pass it (or the shared default below); probing it with a
    // head() job would launch one scan per call just to learn a constant
    // (PlanSpec pins the zero-job construction)
    val q = spark.range(1).select(
      toCol(graft.plans.FeatureHashEmbed(toExpr(lit(queryText)), dim)).as("q_embedding"))
    emb.crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Similarity θ-join: all pairs with cosine > threshold (north-star
    * "similarity search/join"). Self-join deduped by `a.vec_id < b.vec_id`.
    * Scoring is the fused codegen [[graft.plans.CosineSimilarity]] — the
    * same accumulation path as every other query (one expression, one pass,
    * no interpreted normalize step). The exact all-pairs form is the
    * oracle-checkable baseline; [[simJoinLsh]] is the bucketed scale path,
    * and [[DedupOps.minHashLsh]] the set-similarity analog.
    */
  def simJoin(spark: SparkSession, dir: String, threshold: Double = 0.35): DataFrame = {
    val emb = corpus(spark, dir)
    // The non-equi self-join is a broadcast nested loop whose parallelism is
    // the STREAM side's partition count. A small fixture is one parquet file
    // = one partition = one thread doing all O(n²) scoring; spread it to the
    // core count (at real scale the file count already provides this).
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      .repartition(spark.sparkContext.defaultParallelism)
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosineFast(col("a_emb"), col("b_emb")), 6).as("score"))
      .filter(col("score") > threshold)
      .orderBy(col("a_id").asc, col("b_id").asc)
  }

  /** Collision-model banding auto-tuner: given the join threshold, pick
    * (rowsPerBand, bands) so a pair AT the threshold is missed with
    * probability ≤ `targetMiss`. p = 1 - θ/π is the per-hyperplane
    * agreement probability; r is sized so a band matches a threshold pair
    * with probability ≈ 0.2 (sharp enough to thin random buckets, shallow
    * enough that the band count stays small), then b follows from
    * (1-pʳ)ᵇ ≤ targetMiss. Pairs above the threshold miss exponentially
    * less. This is how the operator adapts from the oracle's permissive
    * τ=0.35 (r=3, b=53) to a real near-dup τ=0.8 (r=7, b=62) without the
    * caller thinking about banding at all.
    */
  private[graft] def lshParams(threshold: Double, targetMiss: Double = 1e-6): (Int, Int) = {
    val p = 1.0 - math.acos(math.min(1.0, math.max(-1.0, threshold))) / math.Pi
    require(p > 0.0 && p < 1.0, s"threshold $threshold gives degenerate agreement p=$p")
    val r = math.max(1, math.min(24, math.floor(math.log(0.2) / math.log(p)).toInt))
    val b = math.max(1, math.ceil(math.log(targetMiss) / math.log1p(-math.pow(p, r))).toInt)
    (r, b)
  }

  /** LSH-bucketed similarity join — the cross-join replacement at scale.
    *
    * Random-hyperplane signatures (sign of the projection, the SimHash-for-
    * cosine family): `bandsCount` bands × `rowsPerBand` bits each; candidate
    * pairs come from an EQUI-join on (band, signature) — a shuffle on band
    * keys whose cost is Σ bucket², not n² — then exact [[cosineFast]]
    * rescoring keeps only true matches. Hyperplanes are seeded-deterministic
    * and read their dimension from the data (dim-agnostic engine rule).
    *
    * Band tuning is AUTOMATIC ([[lshParams]]): P(candidate) = 1-(1-pʳ)ᵇ
    * with p = 1-θ/π, sized so a pair at the threshold is missed with
    * probability ≤ 1e-6 (τ=0.35 → r=3, b=53; τ=0.8 → r=7, b=62). On the
    * fixtures the query REPRODUCES the exact [[simJoin]] result
    * (validated against the brute-force oracle at both scales); explicit
    * overrides remain for experiments ([[graft.LshCrossover]]).
    *
    * Measured tradeoff (fixture sf0.1, n=2000, τ=0.35): exact all-pairs is
    * FASTER — at a low threshold over near-random vectors the bands barely
    * prune (p(random)=0.5 vs p(τ)=0.61), so bucket-pair enumeration ≈ n².
    * The crossover is real and measured ([[graft.LshCrossover]], planted
    * near-dup corpus at τ=0.8): n=20k → exact 13.1 s vs LSH(r=12,b=64)
    * 5.2 s at 99.9% recall; n=50k → exact 80.2 s vs LSH(r=16,b=96) 9.4 s
    * at 99.6% recall, the gap widening with n. The exact join is the right
    * plan below the crossover; this is the plan that still exists above it
    * (and [[simJoinAuto]] picks the side for you).
    *
    * Degenerate buckets (boilerplate clusters) are dropped from candidate
    * generation above `maxBucket` rows — see [[LshGuard]] for the recall
    * contract and the measured fixture headroom.
    */
  def simJoinLsh(spark: SparkSession, dir: String, threshold: Double = 0.35,
      rowsPerBandOverride: Int = 0, bandsCountOverride: Int = 0,
      maxBucket: Int = LshGuard.DefaultMaxBucket): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val (autoR, autoB) = lshParams(threshold)
    val rowsPerBand = if (rowsPerBandOverride > 0) rowsPerBandOverride else autoR
    val bandsCount = if (bandsCountOverride > 0) bandsCountOverride else autoB
    val emb = corpus(spark, dir)
    val dimRow = emb.select(size(col("embedding")).as("d")).limit(1).collect()
    if (dimRow.isEmpty) { // empty corpus: no pairs, keep the output schema
      return emb.select(col("vec_id").as("a_id"), col("vec_id").as("b_id"),
        lit(0.0).as("score")).limit(0)
    }
    val dim = dimRow(0).getInt(0)
    val rnd = new scala.util.Random(8123401L)
    val planes = Array.fill(bandsCount * rowsPerBand * dim)(rnd.nextGaussian())

    // All band keys in one fused matrix-vector expression (see
    // [[graft.plans.HyperplaneBandKeys]] — the per-band expression-forest
    // formulation overflowed codegen and doubled the signature cost).
    val bandKeys = toCol(graft.plans.HyperplaneBandKeys(
      toExpr(col("embedding")), planes.toSeq, bandsCount, rowsPerBand))

    // Banded rows stay SKINNY (16 bytes): the bucket join enumerates and
    // dedups candidate pairs without array payloads (carrying the 512-byte
    // embedding through the many-to-many join would memcpy it once per
    // enumerated pair — measured 2.5× slower); embeddings join back onto the
    // deduped pair set only, then the codegen cosine rescores.
    // NOT cached: at scale the banded frame is b× the corpus. The fused
    // signature projection re-runs per consumer (both join sides + the
    // guard's lazy build side), which costs cheap codegen passes instead
    // of materializing b×n rows. Footer row count (metadata, no job) lets
    // the guard elide itself when no bucket can possibly exceed the cap.
    val banded = LshGuard.dropHotBuckets(
      emb.select(col("vec_id"), posexplode(bandKeys).as(Seq("band", "bkey"))),
      maxBucket, parquetRowCount(spark, s"$dir/embeddings.parquet"))
    // Stream-side spread (the [[simJoin]] rule applied to the banded
    // plan, r19 optimization round): the candidate enumeration is the
    // probe side of a broadcast join whose parallelism is the stream
    // side's partition count — a one-file fixture scan is ONE task doing
    // every bucket-pair probe. The exchange moves 16-byte rows (b× the
    // corpus ids, no payload); the count is explicit so AQE cannot
    // coalesce the few-MB frame back to one partition.
    val l = banded.select(col("band"), col("bkey"), col("vec_id").as("a_id"))
      .repartition(spark.sparkContext.defaultParallelism)
    val r = banded.select(col("band").as("band_r"), col("bkey").as("bkey_r"),
      col("vec_id").as("b_id"))
    // Dedup the skinny pair rows BEFORE fetching embeddings: measured both
    // orders — rescoring duplicated candidates and deduping after the
    // threshold filter is ~2× slower even locally (the extra cosine passes
    // and embedding probes cost more than the pair-distinct shuffle), and
    // at scale it would shuffle dim-wide rows once per duplicate.
    val candidates = l.join(r,
        col("band") === col("band_r") && col("bkey") === col("bkey_r") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()

    candidates
      .join(emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb")), "a_id")
      .join(emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(cosineFast(col("a_emb"), col("b_emb")), 6).as("score"))
      .filter(col("score") > threshold)
      .orderBy(col("a_id").asc, col("b_id").asc)
  }

  /** Corpus row count from parquet FOOTER metadata — the dispatcher's
    * statistic, read driver-side like catalog stats: a `count()` launches
    * a distributed job over every split just to answer a number the
    * footers already hold. Handles a single file or a directory of
    * part-files; None on anything unreadable (caller falls back to the
    * scan).
    */
  private[graft] def parquetRowCount(spark: SparkSession, path: String): Option[Long] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    try {
      val conf = spark.sessionState.newHadoopConf()
      val root = new Path(path)
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) return None
      val files =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).toSeq.filter(s => s.isFile &&
            s.getPath.getName.endsWith(".parquet"))
        else Seq(fs.getFileStatus(root))
      // a dir with no direct part-files (e.g. a partitioned layout's
      // nested cell=N/ dirs) is NOT an empty dataset — fall back to the
      // scan count rather than mis-reporting zero rows
      if (files.isEmpty) return None
      var total = 0L
      files.foreach { st =>
        val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
        try total += r.getRecordCount finally r.close()
      }
      Some(total)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Crossover row count for [[simJoinAuto]], derived from the banding
    * collision model calibrated on the measured [[graft.LshCrossover]]
    * curve instead of a hardcoded constant. The banded plan's per-pair
    * work relative to the exact nested loop is ρ = b·p_randʳ — the
    * expected band collisions of a RANDOM (orthogonal, p_rand = ½) pair,
    * each costing a candidate enumeration + rescore where the exact join
    * scores the pair once. ρ ≥ 1 means banding cannot prune even
    * orthogonal data (the τ=0.35 fixture regime: r=3, b=53 → ρ=6.6) and
    * the exact join wins at every n. Below 1, the banded plan must also
    * amortize its linear signature/shuffle overhead ∝ b·r per row;
    * equating overhead against the (1−ρ) pair-work savings gives
    * n* = K·b·r/(1−ρ), with K ≈ 12 calibrated at the measured τ=0.8
    * crossover (`LshCrossover`: exact/LSH invert around n ≈ 10⁴ —
    * 13.1 s vs 5.2 s at n=20k, 80.2 s vs 9.4 s at n=50k).
    */
  private[graft] def derivedCrossover(threshold: Double): Long = {
    val (r, b) = lshParams(threshold)
    val rho = b * math.pow(0.5, r)
    if (rho >= 1.0) Long.MaxValue
    else math.max(1L, math.round(12.0 * b * r / (1.0 - rho)))
  }

  /** Cost-based similarity-join dispatch — the same statistics-driven
    * physical choice Catalyst makes for broadcast-vs-shuffle joins,
    * applied to the similarity join: below the crossover the all-pairs
    * nested loop is faster (banding cannot prune thin data and its
    * enumeration overhead dominates); above it the banded plan wins
    * asymptotically. Both inputs are statistics, not jobs: the row count
    * comes from parquet footers ([[parquetRowCount]]) and the threshold
    * maps to a crossover through the calibrated collision model
    * ([[derivedCrossover]]); pass `crossoverRows ≥ 0` to override.
    * Results are identical either way (LSH recall margin ≤ 1e-6 per pair
    * by [[lshParams]]), so the oracle is shared with [[simJoin]].
    */
  def simJoinAuto(spark: SparkSession, dir: String, threshold: Double = 0.35,
      crossoverRows: Long = -1L): DataFrame = {
    val crossover =
      if (crossoverRows >= 0L) crossoverRows else derivedCrossover(threshold)
    val n = parquetRowCount(spark, s"$dir/embeddings.parquet")
      .getOrElse(corpus(spark, dir).count())
    if (n <= crossover) simJoin(spark, dir, threshold)
    else simJoinLsh(spark, dir, threshold)
  }

  /** IVF-style ANN retrieval — the reference's latent index surface
    * (`IVFFLATParams` imported but unused, ref `TencentVDB.py:7`; HNSW is
    * the exercised one, `TencentVDB.py:46`).
    *
    * Build: coarse centroids = per-label element-wise means (labels play
    * the k-means cell role); inverted lists = the label partitions.
    * Search: score the query against the tiny centroid table, probe the
    * `nprobe` nearest cells, and scan ONLY those lists for the exact top-k.
    * At 100 TB the corpus is partitioned by cell at ingest, so the probe
    * becomes partition pruning — the scan reads nprobe/K of the data.
    * Approximate by construction (recall < 1 when the true neighbor lives
    * in an unprobed cell) → no SQL oracle; recall vs exact knn is pinned in
    * the test suite.
    */
  def topKIvf(spark: SparkSession, dir: String, queryId: Long = 0L, k: Int = 3,
      nprobe: Int = 3): DataFrame = {
    val emb = corpus(spark, dir)
    val centroids = centroidVectors(emb)
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    val probes = centroids.crossJoin(broadcast(q))
      .select(col("label"), cosineFast(col("centroid"), col("q_embedding")).as("cscore"))
      .orderBy(col("cscore").desc, col("label").asc)
      .limit(nprobe)
      .select(col("label"))
    emb.filter(col("vec_id") =!= queryId)
      .join(broadcast(probes), "label")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Per-label centroid vectors via the [[graft.plans.VecSumCount]]
    * aggregate: each map task folds its rows into one dim-length sum array
    * per label, so the shuffle carries one row per (task, label) — dim×
    * less volume than the posexplode → positional-avg formulation (×1024 at
    * the reference's dimension). Mean = sums[i]/n, one IEEE division.
    */
  private def centroidVectors(emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val sumCount = toCol(graft.plans.VecSumCount(
      toExpr(col("embedding"))).toAggregateExpression())
    emb.groupBy(col("label"))
      .agg(sumCount.as("sc"))
      .select(col("label"),
        transform(col("sc.sums"), x => x / col("sc.n")).as("centroid"))
  }

  /** Embedding-space OUTLIER report (`q_vec_outliers`) — the k vectors
    * least central to their own label's centroid, by cosine. The standard
    * curation pass before contrastive training: mislabeled rows, encoder
    * failures, and off-distribution content all surface as low
    * self-centrality (the same signal SemDeDup's authors use to pick
    * cluster keepers, inverted).
    *
    * Cross-engine determinism: the per-label centroid is micro-ROUNDED
    * (6 dp) BEFORE the cosine in both engines — the unrounded mean is a
    * row-order-dependent double sum, the rounded one a shared exact
    * input; the cosine then folds dims in array order identically (the
    * q_cosine_pair precedent). Scale: centroids via [[centroidVectors]]
    * (one VecSumCount shuffle, |labels| rows broadcast back), centrality
    * map-side per row, the k-row tail via TakeOrderedAndProject.
    */
  def outliers(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val emb = corpus(spark, dir)
    val cents = centroidVectors(emb)
      .select(col("label"),
        transform(col("centroid"), x => round(x, 6)).as("centroid"))
    val cos = toCol(graft.plans.CosineSimilarity(
      toExpr(col("embedding")), toExpr(col("centroid"))))
    emb.join(broadcast(cents), "label")
      .select(col("vec_id"), col("label"), round(cos, 6).as("centrality"))
      .orderBy(col("centrality").asc, col("vec_id").asc)
      .limit(k)
  }

  /** Lloyd's k-means coarse quantizer over the embedding column — the
    * trained-cell IVF build (the reference's latent IVFFLAT surface, ref
    * `TencentVDB.py:7`). Each iteration is one distributed pass: fused
    * [[graft.plans.NearestCentroid]] assignment (projection, no shuffle)
    * then a [[graft.plans.VecSumCount]] aggregation — the shuffle carries
    * one (cell, sums, n) row per map task. Only the k×dim MODEL ever
    * reaches the driver (like any broadcast ML model); rows never do.
    * Deterministic: init = first k vectors by vec_id, cosine ties to the
    * lowest cell, empty cells keep their previous centroid. At 100 TB the
    * trainer runs on a sample; assignment stays a full-corpus projection.
    */
  private[graft] def kmeansCentroids(emb: DataFrame, kCells: Int, iters: Int): Array[Double] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)
    var cents = emb.orderBy(col("vec_id").asc).limit(kCells)
      .select(col("embedding")).collect()
      .flatMap(_.getSeq[Double](0)).toArray
    require(cents.length == kCells * dim, s"need ≥ $kCells vectors to seed k-means")
    (1 to iters).foreach { _ =>
      val assign = toCol(graft.plans.NearestCentroid(
        toExpr(col("embedding")), cents.toSeq, kCells))
      val sumCount = toCol(graft.plans.VecSumCount(
        toExpr(col("embedding"))).toAggregateExpression())
      val next = cents.clone()
      emb.select(assign.as("cell"), col("embedding"))
        .groupBy(col("cell")).agg(sumCount.as("sc"))
        .select(col("cell"), col("sc.sums"), col("sc.n"))
        .collect()
        .foreach { r =>
          val cell = r.getInt(0); val s = r.getSeq[Double](1); val n = r.getLong(2)
          var i = 0
          while (i < dim) { next(cell * dim + i) = s(i) / n; i += 1 }
        }
      cents = next
    }
    cents
  }

  /** IVF retrieval over TRAINED cells: [[kmeansCentroids]] builds the
    * coarse quantizer, the query probes its `nprobe` nearest cells
    * (driver-side over the k×dim model), and only those cells are scanned
    * for the exact top-k — at ingest the corpus would be partitioned by
    * cell, turning the probe into partition pruning. Approximate by
    * construction → rows-only (recall vs exact pinned in tests).
    */
  def topKIvfKmeans(spark: SparkSession, dir: String, queryId: Long = 0L, k: Int = 3,
      kCells: Int = 8, nprobe: Int = 2, iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val emb = corpus(spark, dir)
    // Cache ONLY for the duration of training, then release: a persistent
    // cache on the raw table plan would make every other query on the same
    // plan read the InMemoryRelation instead of the parquet scan — silently
    // discarding predicate pushdown session-wide (caught by PlanSpec).
    emb.cache()
    val cents = try kmeansCentroids(emb, kCells, iters) finally emb.unpersist()
    val qVec = emb.filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Double](0).toArray
    val probes = nearestCells(qVec, cents, kCells, nprobe)

    val assign = toCol(graft.plans.NearestCentroid(
      toExpr(col("embedding")), cents.toSeq, kCells))
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    emb.filter(col("vec_id") =!= queryId)
      .withColumn("cell", assign)
      .filter(col("cell").isin(probes: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Driver-side probe selection: the `nprobe` cells whose centroids score
    * highest against the query, cosine with lowest-cell tie-break — runs
    * over the k×dim MODEL only (the broadcast-ML-model pattern; rows never
    * reach the driver). Shared by [[topKIvfKmeans]] (in-query training) and
    * [[topKIvfPartitioned]] (persisted model).
    */
  /** Persisted coarse-quantizer read: (flat row-major centroids, kCells)
    * from `name__model` — the one loader for every consumer (IVF probes,
    * IVF/IVF-PQ upserts, routed-NSW search and maintenance), so the
    * routing tie-break and model shape cannot silently diverge between a
    * path that writes cells and a path that probes them.
    */
  private[graft] def readCoarseModel(spark: SparkSession, db: String,
      name: String): (Array[Double], Int) = {
    val model = spark.table(s"`$db`.`${name}__model`")
      .orderBy(col("cell").asc).collect()
    (model.flatMap(_.getSeq[Double](1)), model.length)
  }

  private[graft] def nearestCells(qVec: Array[Double], cents: Array[Double],
      kCells: Int, nprobe: Int): Seq[Int] = {
    val dim = qVec.length
    def cosLocal(c: Int): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < dim) {
        val x = qVec(i); val y = cents(c * dim + i)
        ab += x * y; aa += x * x; bb += y * y; i += 1
      }
      val d = math.sqrt(aa) * math.sqrt(bb)
      if (d == 0.0) 0.0 else ab / d
    }
    (0 until kCells).sortBy(c => (-cosLocal(c), c)).take(nprobe)
  }

  /** IVF probe over a cell-PARTITIONED collection
    * ([[graft.sources.CatalogOps.createIvfCollection]]) — the plan
    * [[topKIvfKmeans]]'s scaladoc promises, materialized: cells were
    * assigned at ingest and the corpus written `partitionBy("cell")`, so
    * the `cell IN (probes)` predicate here is a PARTITION filter — the
    * scan opens nprobe/kCells of the directories and reads nothing else
    * (vs. computing the cell per row over a full scan and discarding
    * (kCells−nprobe)/kCells of the bytes AFTER reading them). Probe cells
    * come from the persisted k×dim model table; only that model is
    * collected. Same output as [[topKIvfKmeans]] given the same training
    * data (pinned in tests, plus the PlanSpec pruning guard).
    */
  def topKIvfPartitioned(spark: SparkSession, db: String, name: String,
      queryId: Long = 0L, k: Int = 3, nprobe: Int = 2): DataFrame = {
    // the one id-lookup read this path pays (in production the query
    // vector arrives from outside, see the vector overload below); it
    // scans the collection because the cell of an id is unknown a priori
    val qVec = spark.table(s"`$db`.`$name`")
      .filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Double](0).toArray
    topKIvfPartitionedVec(spark, db, name, qVec, queryId, k, nprobe)
  }

  /** Vector-query core of [[topKIvfPartitioned]] — the production shape:
    * the query vector arrives from outside (a text embedding, a stored
    * lookup, a stream row), so the probe pays ONLY the model read and the
    * partition-pruned scan; `excludeId < 0` disables the self-exclusion.
    *
    * `predicate` is the FILTERED-ANN composition on the index path — the
    * reference's FILTER index exists precisely to constrain an HNSW search
    * (ref `TencentVDB.py:31-32,48`). The predicate lands BELOW the scoring
    * projection, so Catalyst pushes it into the cell-pruned scan
    * (PartitionFilters for the probe, PushedFilters for the predicate —
    * both plan-pinned): the scan reads only matching rows of the probed
    * cells. Recall composes multiplicatively — a filtered true neighbor in
    * an unprobed cell is still missed — so callers that filter hard should
    * raise `nprobe` headroom (the recall/nprobe curve is test-pinned).
    */
  def topKIvfPartitionedVec(spark: SparkSession, db: String, name: String,
      qVec: Array[Double], excludeId: Long = -1L, k: Int = 3,
      nprobe: Int = 2, predicate: Column = lit(true)): DataFrame = {
    val (cents, kCells) = readCoarseModel(spark, db, name)
    val probes = nearestCells(qVec, cents, kCells, nprobe)
    val q = spark.range(1).select(typedLit(qVec.toSeq).as("q_embedding"))
    spark.table(s"`$db`.`$name`")
      .filter(col("cell").isin(probes.map(Int.box): _*) &&
        col("vec_id") =!= excludeId && predicate)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Batched IVF probe over a cell-partitioned collection: every query in
    * the (small) batch picks its `nprobe` cells from the persisted model
    * driver-side, the scan prunes to the UNION of probed cells
    * (PartitionFilters — one pruned read serves the whole batch), and a
    * broadcast (query, cell) table restricts scoring to each query's own
    * cells before the bounded-heap top-k. The per-micro-batch scorer of
    * [[graft.streaming.StreamingOps.streamingKnnIvf]] — the streaming ANN
    * shape where neither the corpus nor most of its partitions are read.
    */
  def topKForQueriesIvf(spark: SparkSession, db: String, name: String,
      queries: DataFrame, k: Int = 3, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val (cents, kCells) = readCoarseModel(spark, db, name)
    // the query batch is micro-batch-sized by contract; probes computed on
    // the driver against the k×dim model, like any broadcast ML model.
    // Replayed query_ids resolve deterministically (see topKForQueries).
    val qRows = queries.groupBy(col("query_id"))
      .agg(max(struct(col("q_embedding"))).as("__w"))
      .select(col("query_id"), col("__w.q_embedding").as("q_embedding"))
      .collect()
    val probeRows = qRows.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      nearestCells(qv, cents, kCells, nprobe).map(c => (qid, c, qv.toSeq))
    }
    val qprobe = spark.createDataFrame(probeRows.toSeq)
      .toDF("query_id", "cell", "q_embedding")
    val allCells = probeRows.map(_._2).distinct.map(Int.box)
    val scored = spark.table(s"`$db`.`$name`")
      .filter(col("cell").isin(allCells: _*)) // partition-pruned once for the batch
      .join(broadcast(qprobe), "cell")        // each row meets only its probers
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

  /** Drop a table AND its orphaned warehouse directory: a fresh session's
    * in-memory catalog forgets tables, but a previous JVM's physical dirs
    * survive in the warehouse — saveAsTable refuses the orphaned location.
    * Shared by every build-if-absent probe entry.
    */
  private[graft] def dropTableAndDir(spark: SparkSession, db: String, t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$t`")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath +
        s"/$db.db/$t"))
  }

  /** Build-then-probe composite for the driver contract (`q_knn_ivf_part`):
    * ingest the embeddings fixture as an IVF-partitioned collection, then
    * answer the standard fixture query through the partition-pruned probe.
    * The build cost is the index build ([[topKIvfKmeans]] pays the same
    * training per call); at 100 TB the build runs once per ingest and every
    * query pays only the pruned read. Approximate by construction →
    * rows-only, same as the other IVF entries.
    */
  def topKIvfPartitionedE2E(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 3, kCells: Int = 8, nprobe: Int = 2, iters: Int = 3): DataFrame = {
    import graft.sources.CatalogOps
    val db = "graft_ivf"
    CatalogOps.createDatabase(spark, db)
    Seq("emb_ivf", "emb_ivf__model").foreach(dropTableAndDir(spark, db, _))
    CatalogOps.createIvfCollection(spark, db, "emb_ivf",
      corpus(spark, dir), "embedding", kCells, iters)
    topKIvfPartitioned(spark, db, "emb_ivf", queryId, k, nprobe)
  }

  /** Probe-ONLY IVF entry (`q_knn_ivf_probe`) — the query-path cost of the
    * partitioned index, which is the number that matters at 100×: an index
    * is built once per ingest and probed millions of times, but
    * [[topKIvfPartitionedE2E]] (`q_knn_ivf_part`) measures build+probe
    * fused, hiding the probe under the training cost. Here the collection
    * is built only if ABSENT in this session (the bench warmup pass or the
    * first Verify call pays it); every subsequent call is the pure probe —
    * model read, driver-side cell choice, partition-pruned scan.
    */
  def topKIvfProbe(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 3, kCells: Int = 8, nprobe: Int = 2, iters: Int = 3): DataFrame = {
    val (db, name) = ensureIvfProbeCollection(spark, dir, kCells, iters)
    // query vector from the small SOURCE file (pushed id filter), not a
    // full scan of the partitioned collection — the probe below then
    // touches only the nprobe pruned cells
    val qVec = corpus(spark, dir).filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Double](0).toArray
    topKIvfPartitionedVec(spark, db, name, qVec, queryId, k, nprobe)
  }

  /** Build-if-absent for the probe-only IVF entries — guards THIS JVM's
    * build (the local driver contract runs single-JVM); concurrent builds
    * from separate sessions would still race on the shared warehouse dir —
    * production would take a catalog lock or build under a staging name
    * and swap.
    */
  private[graft] def ensureIvfProbeCollection(spark: SparkSession, dir: String,
      kCells: Int, iters: Int): (String, String) = {
    import graft.sources.CatalogOps
    val db = "graft_ivf_probe"
    val name = "emb_ivf"
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.$name") ||
          !spark.catalog.tableExists(s"$db.${name}__model")) {
        CatalogOps.createDatabase(spark, db)
        Seq(name, s"${name}__model").foreach(dropTableAndDir(spark, db, _))
        CatalogOps.createIvfCollection(spark, db, name,
          corpus(spark, dir), "embedding", kCells, iters)
      }
    }
    (db, name)
  }

  /** FILTERED ANN on the IVF index path (`q_knn_ivf_filtered`) — the
    * production retrieval shape the reference's FILTER index declares
    * ("top-k about X where label = Y, served from the index", ref
    * `TencentVDB.py:31-32,48`): metadata predicate composed with the
    * partition-pruned probe, not with a full exact scan
    * ([[topKFiltered]] is that oracle-checkable baseline). The label
    * filter pushes into the pruned scan; `nprobe` defaults higher than
    * the unfiltered probe because the predicate thins each probed cell
    * (recall vs the exact filtered scan is test-pinned, exact at
    * nprobe = kCells). Approximate below that → rows-only in the
    * contract.
    */
  def topKIvfFiltered(spark: SparkSession, dir: String, queryId: Long = 0L,
      labelEq: Int = 3, k: Int = 5, kCells: Int = 8, nprobe: Int = 4,
      iters: Int = 3): DataFrame = {
    val (db, name) = ensureIvfProbeCollection(spark, dir, kCells, iters)
    val qVec = corpus(spark, dir).filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Double](0).toArray
    topKIvfPartitionedVec(spark, db, name, qVec, queryId, k, nprobe,
        predicate = col("label") === labelEq)
      .select(col("vec_id"), col("score"))
  }

  /** Two-phase knn over a QUANTIZED collection
    * ([[graft.sources.CatalogOps.createQuantizedCollection]]) — the scan
    * that makes the "¼ of the bytes" claim real: phase 1 scores the int8
    * codes with the fused [[graft.plans.Int8QueryCosine]] byte loop
    * (TakeOrderedAndProject keeps `rescoreK` candidates per partition; the
    * scan reads codes + vec_id only — no float arrays move), phase 2
    * re-scores ONLY those candidates at full precision. The phases compose
    * as ONE plan: the bounded candidate set (rescoreK rows by construction)
    * BROADCASTS into a hash join with the full-precision side — no driver
    * collect between phases, so a caller can batch, compose, or stream
    * this without a per-query driver round-trip. (The full side is pruned
    * to (vec_id, embedding) columns; a layout that wants row-group skipping
    * for the rescore sorts the full table by vec_id at ingest — the join
    * itself stays map-side either way.) Quantization can reorder near-ties,
    * so phase 1 over-fetches rescoreK ≥ k and phase 2 restores exact order;
    * recall vs the exact scan is pinned in tests.
    *
    * `predicate` composes a metadata filter on the index path (the FILTER
    * index surface, ref `TencentVDB.py:31-32,48`): it lands in the PHASE-1
    * codes scan (pushed to parquet), so every candidate already satisfies
    * it and the rescore needs no re-check.
    */
  def topKQuantized(spark: SparkSession, db: String, name: String,
      full: DataFrame, qVec: Array[Double], excludeId: Long = -1L,
      k: Int = 3, rescoreK: Int = 12, predicate: Column = lit(true)): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val approx = toCol(graft.plans.Int8QueryCosine(toExpr(col("codes")), qVec.toSeq))
    val candidates = spark.table(s"`$db`.`$name`")
      .filter(col("vec_id") =!= excludeId && predicate)
      .select(col("vec_id"), approx.as("ascore"))
      .orderBy(col("ascore").desc, col("vec_id").asc)
      .limit(math.max(k, rescoreK))
      .select(col("vec_id"))
    val q = spark.range(1).select(typedLit(qVec.toSeq).as("q_embedding"))
    full.select(col("vec_id"), col("embedding"))
      .join(broadcast(candidates), "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Batched two-phase quantized knn — [[topKQuantized]] for a query TABLE
    * (query_id, q_embedding), one job for the whole batch: phase 1 scores
    * every (code, query) pair via the broadcast query side and the fused
    * [[graft.plans.Int8ColCosine]] byte loop, the bounded-heap
    * [[graft.plans.TopKScoreId]] keeps `rescoreK` candidates per query
    * (k·partitions shuffle rows, same contract as [[topKForQueries]]),
    * and phase 2 re-scores the exploded candidate set — batch·rescoreK
    * rows, broadcast into the full-precision join. The per-micro-batch
    * scorer of [[graft.streaming.StreamingOps.streamingKnnQuantized]].
    * Output ≡ running [[topKQuantized]] per query (test-pinned).
    */
  def topKForQueriesQuantized(spark: SparkSession, db: String, name: String,
      full: DataFrame, queries: DataFrame, k: Int = 3,
      rescoreK: Int = 12): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    // replayed query_ids resolve deterministically (see topKForQueries)
    val uniq = queries.groupBy(col("query_id"))
      .agg(max(struct(col("q_embedding"))).as("__w"))
      .select(col("query_id"), col("__w.q_embedding").as("q_embedding"))
    val approx = toCol(graft.plans.Int8ColCosine(
      toExpr(col("codes")), toExpr(col("q_embedding"))))
    val scored = spark.table(s"`$db`.`$name`")
      .crossJoin(broadcast(uniq))
      .select(col("query_id"), col("vec_id"), approx.as("ascore"))
    val candK = toCol(graft.plans.TopKScoreId(
      toExpr(col("ascore")), toExpr(col("vec_id")), math.max(k, rescoreK))
      .toAggregateExpression())
    val candidates = scored.groupBy(col("query_id"))
      .agg(candK.as("cand"))
      .select(col("query_id"), explode(col("cand")).as("hit"))
      .select(col("query_id"), col("hit.vec_id").as("vec_id"))
      .join(broadcast(uniq), "query_id") // rescore needs each candidate's query vector
    val rescored = full.select(col("vec_id"), col("embedding"))
      .join(broadcast(candidates), "vec_id")
      .select(col("query_id"), col("vec_id"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
    val topk = toCol(graft.plans.TopKScoreId(
      toExpr(col("score")), toExpr(col("vec_id")), k).toAggregateExpression())
    rescored.groupBy(col("query_id"))
      .agg(topk.as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.vec_id").as("vec_id"),
        col("hit.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** Probe-only quantized entry (`q_knn_quantized`): build the int8
    * collection once per session if absent, then answer the standard
    * fixture query through the two-phase scan. Rows-only (quantized
    * candidate generation is engine-native); recall and storage ratio are
    * pinned in tests.
    */
  def topKQuantizedProbe(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 3, rescoreK: Int = 12): DataFrame = {
    import graft.sources.CatalogOps
    val db = "graft_q8_probe"
    val name = "emb_q8"
    // single-JVM guard only — see the cross-session note in [[topKIvfProbe]]
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.$name")) {
        CatalogOps.createDatabase(spark, db)
        dropTableAndDir(spark, db, name)
        CatalogOps.createQuantizedCollection(spark, db, name, corpus(spark, dir))
      }
    }
    val qVec = corpus(spark, dir).filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Double](0).toArray
    topKQuantized(spark, db, name, corpus(spark, dir), qVec, queryId, k, rescoreK)
  }

  /** Int8 scalar quantization of the embedding column — the storage-side
    * counterpart of the ANN index (the reference's server quantizes
    * similarly behind its HNSW configuration; for us it is what makes a
    * 100 TB vector scan read 25% of the bytes: 1024-d float32 → 1024 B/row).
    * Per-vector symmetric scheme: scale = 127/max|xᵢ|, qᵢ = round(xᵢ·scale).
    * Pure per-row projection (no shuffle); emits scalar summaries — scale,
    * quantized range, and the L2 reconstruction error — which keep the
    * query oracle-checkable (the int8 payload itself is engine-native).
    */
  def quantize(spark: SparkSession, dir: String): DataFrame = {
    val emb = corpus(spark, dir)
    val scale = lit(127.0) / greatest(
      array_max(transform(col("embedding"), x => abs(x))), lit(1e-12))
    emb.select(col("vec_id"), col("embedding"), scale.as("scale"))
      .select(col("vec_id"),
        round(col("scale"), 6).as("scale_r"),
        array_min(transform(col("embedding"), x => round(x * col("scale"))))
          .cast("long").as("qmin"),
        array_max(transform(col("embedding"), x => round(x * col("scale"))))
          .cast("long").as("qmax"),
        round(sqrt(aggregate(
          transform(col("embedding"),
            x => (x - round(x * col("scale")) / col("scale")) *
                 (x - round(x * col("scale")) / col("scale"))),
          lit(0.0), (acc, e) => acc + e)), 6).as("recon_err"))
      .orderBy(col("vec_id").asc)
  }

  /** Per-label centroid (element-wise mean) — north-star extension; the
    * coarse-quantizer build step for IVF-style ANN ([[centroidVectors]] is
    * the plan; see its scale note). Output exploded (label, pos, val) for
    * oracle hash-stability — the explode runs AFTER the aggregation, on
    * labels×dim rows, not on the corpus.
    */
  def centroids(spark: SparkSession, dir: String): DataFrame = {
    centroidVectors(corpus(spark, dir))
      .select(col("label"),
        posexplode(transform(col("centroid"), x => round(x, 6)))
          .as(Seq("pos", "centroid_v")))
      .orderBy(col("label").asc, col("pos").asc)
  }

  /** PQ codebook training — per-subspace Lloyd iterations, ALL subspaces in
    * one distributed pass per iteration: [[graft.plans.PqSubAssign]]
    * assigns every subspace's cell in a single fused projection, the
    * explode emits (sub, cell, subvector) rows (same total bytes as the
    * corpus — each vector splits, nothing duplicates), and one
    * (sub, cell) aggregation computes every Lloyd update at once. The
    * alternative — M independent k-means jobs — would re-scan the corpus
    * M·iters times; this scans it iters times regardless of M. Only the
    * m·k·subDim model (= dim·k doubles, the [[kmeansCentroids]] precedent)
    * is ever collected. Returns the flat sub-major codebook
    * (`[(s·k + c)·subDim + i]`). Seeding: subvectors of the first k
    * vectors by id — deterministic, like [[kmeansCentroids]].
    */
  private[graft] def pqCodebooks(emb: DataFrame, m: Int, kCent: Int,
      iters: Int): Array[Double] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into m=$m subspaces")
    val subDim = dim / m
    val seed = emb.orderBy(col("vec_id").asc).limit(kCent)
      .select(col("embedding")).collect().map(_.getSeq[Double](0))
    require(seed.length == kCent, s"need ≥ $kCent vectors to seed PQ")
    var cb = new Array[Double](m * kCent * subDim)
    for (s <- 0 until m; c <- 0 until kCent; i <- 0 until subDim)
      cb((s * kCent + c) * subDim + i) = seed(c)(s * subDim + i)
    val subStructs = (0 until m).map { s =>
      struct(lit(s).as("sub"),
        element_at(col("cells"), s + 1).as("cell"),
        slice(col("embedding"), s * subDim + 1, subDim).as("sv"))
    }
    (1 to iters).foreach { _ =>
      val assign = toCol(graft.plans.PqSubAssign(
        toExpr(col("embedding")), cb.toSeq, m, kCent))
      val sumCount = toCol(graft.plans.VecSumCount(
        toExpr(col("sv"))).toAggregateExpression())
      val next = cb.clone()
      emb.select(col("embedding"), assign.as("cells"))
        .select(explode(array(subStructs: _*)).as("e"))
        .select(col("e.sub").as("sub"), col("e.cell").as("cell"), col("e.sv").as("sv"))
        .groupBy(col("sub"), col("cell")).agg(sumCount.as("sc"))
        .select(col("sub"), col("cell"), col("sc.sums"), col("sc.n"))
        .collect()
        .foreach { r =>
          val sub = r.getInt(0); val cell = r.getInt(1)
          val sums = r.getSeq[Double](2); val n = r.getLong(3)
          var i = 0
          while (i < subDim) {
            next((sub * kCent + cell) * subDim + i) = sums(i) / n; i += 1
          }
        }
      cb = next
    }
    cb
  }

  /** PQ-ADC knn over a PQ collection
    * ([[graft.sources.CatalogOps.createPqCollection]]): phase 1 scans ONLY
    * the M-byte code column — each row costs M table lookups
    * ([[graft.plans.PqAdcDot]]), independent of dim — normalized by the
    * stored exact row norm to an approximate cosine; phase 2 re-scores the
    * top `rescoreK` codes at full precision through the same bounded
    * candidate-broadcast subplan as [[topKQuantized]] (ONE plan, no
    * driver collect between phases). At 1024-d float32 the code scan reads
    * 1/128th of the exact scan's bytes (M=8 codes + 8-byte norm vs 4 KiB).
    */
  def topKPq(spark: SparkSession, db: String, name: String,
      full: DataFrame, qVec: Array[Double], excludeId: Long = -1L,
      k: Int = 3, rescoreK: Int = 12): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val (lut, m, kCent) = pqQueryLut(spark, db, name, qVec)
    val qNorm = math.sqrt(qVec.map(x => x * x).sum)
    val adc = toCol(graft.plans.PqAdcDot(toExpr(col("codes")), lut.toSeq, m, kCent))
    // the norm filter EXCLUDES zero-norm stored vectors (cosine undefined;
    // their ADC dot against nonzero centroids is nonzero, so a mere
    // denominator guard would hand them a huge finite score and a stolen
    // rescoreK slot — NaN-sorting would too); pushed into the scan
    val candidates = spark.table(s"`$db`.`$name`")
      .filter(col("vec_id") =!= excludeId && col("norm") > 1e-12)
      .select(col("vec_id"),
        (adc / (col("norm") * lit(math.max(qNorm, 1e-12)))).as("ascore"))
      .orderBy(col("ascore").desc, col("vec_id").asc)
      .limit(math.max(k, rescoreK))
      .select(col("vec_id"))
    val q = spark.range(1).select(typedLit(qVec.toSeq).as("q_embedding"))
    full.select(col("vec_id"), col("embedding"))
      .join(broadcast(candidates), "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Query LUT for a PQ collection: reads the persisted codebooks (the
    * m·k·subDim model — k×dim doubles, the bounded broadcast-model pattern
    * shared with [[nearestCells]]) and precomputes every ⟨query subvector,
    * centroid⟩ dot product. The per-row scan cost downstream is M lookups
    * into this table regardless of dim.
    */
  /** The ADC LUT of one query against a codebook: lut[s·k + c] =
    * ⟨q_sub(s), centroid(s, c)⟩. THE indexing scheme — single-query,
    * batched-PQ, and batched-IVF-PQ paths all build through here, so a
    * codebook-layout change cannot make them score differently.
    */
  private def pqBuildLut(qv: Array[Double], cb: Array[Double],
      m: Int, kCent: Int, subDim: Int): Array[Double] = {
    require(qv.length == m * subDim,
      s"query dim ${qv.length} != collection dim ${m * subDim}")
    val lut = new Array[Double](m * kCent)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < kCent) {
        var d = 0.0; var i = 0
        while (i < subDim) { d += qv(s * subDim + i) * cb((s * kCent + c) * subDim + i); i += 1 }
        lut(s * kCent + c) = d
        c += 1
      }
      s += 1
    }
    lut
  }

  private def pqQueryLut(spark: SparkSession, db: String, name: String,
      qVec: Array[Double]): (Array[Double], Int, Int) = {
    val (cb, m, kCent, subDim) = readPqModel(spark, db, name)
    (pqBuildLut(qVec, cb, m, kCent, subDim), m, kCent)
  }

  /** Batched PQ knn — [[topKPq]] for a query TABLE (query_id, q_embedding),
    * one job for the whole batch: the (micro-batch-sized, like
    * [[topKForQueriesIvf]]) query set collects once, each query's ADC LUT
    * is built driver-side against the persisted model (m·k doubles per
    * query — the LUT is itself a tiny model), and the broadcast
    * (query_id, lut, …) table scores every code row via
    * [[graft.plans.PqAdcDotCol]] into a bounded heap per query; phase 2
    * re-scores the exploded candidates at full precision. Output ≡ running
    * [[topKPq]] per query (test-pinned); the per-micro-batch scorer of
    * [[graft.streaming.StreamingOps.streamingKnnPq]].
    */
  def topKForQueriesPq(spark: SparkSession, db: String, name: String,
      full: DataFrame, queries: DataFrame, k: Int = 3,
      rescoreK: Int = 12): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val (cb, m, kCent, subDim) = readPqModel(spark, db, name)
    // replayed query_ids resolve deterministically (see topKForQueries)
    val qRows = queries.groupBy(col("query_id"))
      .agg(max(struct(col("q_embedding"))).as("__w"))
      .select(col("query_id"), col("__w.q_embedding").as("q_embedding"))
      .collect()
    val lutRows = qRows.map { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      val lut = pqBuildLut(qv, cb, m, kCent, subDim)
      (qid, lut.toSeq, math.sqrt(qv.map(x => x * x).sum), qv.toSeq)
    }
    val qlut = spark.createDataFrame(lutRows.toSeq)
      .toDF("query_id", "lut", "q_norm", "q_embedding")
    val adc = toCol(graft.plans.PqAdcDotCol(
      toExpr(col("codes")), toExpr(col("lut")), m, kCent))
    val scored = spark.table(s"`$db`.`$name`")
      .filter(col("norm") > 1e-12) // zero-norm rows excluded: see topKPq
      .crossJoin(broadcast(qlut.select(col("query_id"), col("lut"), col("q_norm"))))
      .select(col("query_id"), col("vec_id"),
        (adc / (col("norm") * greatest(col("q_norm"), lit(1e-12)))).as("ascore"))
    val candK = toCol(graft.plans.TopKScoreId(
      toExpr(col("ascore")), toExpr(col("vec_id")), math.max(k, rescoreK))
      .toAggregateExpression())
    val candidates = scored.groupBy(col("query_id"))
      .agg(candK.as("cand"))
      .select(col("query_id"), explode(col("cand")).as("hit"))
      .select(col("query_id"), col("hit.vec_id").as("vec_id"))
      .join(broadcast(qlut.select(col("query_id"), col("q_embedding"))), "query_id")
    val rescored = full.select(col("vec_id"), col("embedding"))
      .join(broadcast(candidates), "vec_id")
      .select(col("query_id"), col("vec_id"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
    val topk = toCol(graft.plans.TopKScoreId(
      toExpr(col("score")), toExpr(col("vec_id")), k).toAggregateExpression())
    rescored.groupBy(col("query_id"))
      .agg(topk.as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.vec_id").as("vec_id"),
        col("hit.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** Persisted PQ model read: (flat codebooks, m, k, subDim) — shared by
    * the query LUT and the incremental upsert's batch encoder
    * ([[graft.sources.CatalogOps.upsertIvfPq]]).
    */
  private[graft] def readPqModel(spark: SparkSession, db: String,
      name: String): (Array[Double], Int, Int, Int) = {
    val meta = spark.table(s"`$db`.`${name}__pqmeta`").head()
    val (m, kCent, subDim) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    val cb = new Array[Double](m * kCent * subDim)
    spark.table(s"`$db`.`${name}__pqmodel`").collect().foreach { r =>
      val sub = r.getInt(0); val cell = r.getInt(1)
      val c = r.getSeq[Double](2)
      var i = 0
      while (i < subDim) { cb((sub * kCent + cell) * subDim + i) = c(i); i += 1 }
    }
    (cb, m, kCent, subDim)
  }

  /** IVF-PQ knn — the composed 100 TB index
    * ([[graft.sources.CatalogOps.createIvfPqCollection]]): the coarse
    * quantizer prunes the scan to `nprobe` cell PARTITIONS (directories
    * never opened, like [[topKIvfPartitionedVec]]), the PQ codes make the
    * surviving rows cost M byte-lookups each ([[PqAdcDot]]), and the
    * bounded full-precision rescore rides the same single-plan candidate
    * broadcast as [[topKPq]]. Composes with a metadata `predicate`
    * (pushed into the same pruned scan — the filtered-ANN rule).
    *
    * Codes quantize RESIDUALS (x − centroid(cell), the classic IVF-PQ
    * formulation): the estimate is ⟨q, x⟩ ≈ ⟨q, centroid⟩ + ⟨q, residual̂⟩,
    * where the first term is one double per PROBED CELL (a broadcast join
    * on the partition column — the codebooks are shared across cells, so
    * the ADC LUT itself is still a single reference object) and the second
    * is the M-lookup ADC sum.
    */
  def topKIvfPq(spark: SparkSession, db: String, name: String,
      full: DataFrame, qVec: Array[Double], excludeId: Long = -1L,
      k: Int = 3, rescoreK: Int = 12, nprobe: Int = 2,
      predicate: Column = lit(true)): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val (cents, kCells) = readCoarseModel(spark, db, name)
    val probes = nearestCells(qVec, cents, kCells, nprobe)
    val (lut, m, kCent) = pqQueryLut(spark, db, name, qVec)
    val qNorm = math.sqrt(qVec.map(x => x * x).sum)
    val dim = qVec.length
    val centDots = probes.map { c =>
      var d = 0.0; var i = 0
      while (i < dim) { d += qVec(i) * cents(c * dim + i); i += 1 }
      (c, d)
    }
    val centTable = spark.createDataFrame(centDots).toDF("cell", "__cdot")
    val adc = toCol(graft.plans.PqAdcDot(toExpr(col("codes")), lut.toSeq, m, kCent))
    val candidates = spark.table(s"`$db`.`$name`")
      .filter(col("cell").isin(probes.map(Int.box): _*) &&
        col("vec_id") =!= excludeId && col("norm") > 1e-12 && predicate)
      .join(broadcast(centTable), "cell")
      .select(col("vec_id"),
        // zero-norm rows excluded by the pushed filter: see topKPq
        ((adc + col("__cdot")) /
          (col("norm") * lit(math.max(qNorm, 1e-12)))).as("ascore"))
      .orderBy(col("ascore").desc, col("vec_id").asc)
      .limit(math.max(k, rescoreK))
      .select(col("vec_id"))
    val q = spark.range(1).select(typedLit(qVec.toSeq).as("q_embedding"))
    full.select(col("vec_id"), col("embedding"))
      .join(broadcast(candidates), "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Batched IVF-PQ knn — [[topKIvfPq]] for a query TABLE
    * (query_id, q_embedding), one job for the whole batch, composing BOTH
    * batch prunings: the scan reads only the UNION of every query's
    * probed cell partitions (PartitionFilters, like
    * [[topKForQueriesIvf]]), and each surviving row is ADC-scored only
    * against the queries that probed ITS cell (broadcast (query, cell,
    * ⟨q,centroid⟩) routing table restores the residual's coarse term per
    * pair). Per-query LUTs build driver-side against the persisted
    * codebooks; the bounded-heap candidates rescore at full precision in
    * the same plan. Output ≡ running [[topKIvfPq]] per query
    * (test-pinned); the per-micro-batch scorer of
    * [[graft.streaming.StreamingOps.streamingKnnIvfPq]].
    */
  def topKForQueriesIvfPq(spark: SparkSession, db: String, name: String,
      full: DataFrame, queries: DataFrame, k: Int = 3, rescoreK: Int = 12,
      nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val (cents, kCells) = readCoarseModel(spark, db, name)
    val (cb, m, kCent, subDim) = readPqModel(spark, db, name)
    // replayed query_ids resolve deterministically (see topKForQueries)
    val qRows = queries.groupBy(col("query_id"))
      .agg(max(struct(col("q_embedding"))).as("__w"))
      .select(col("query_id"), col("__w.q_embedding").as("q_embedding"))
      .collect()
    val dim = m * subDim
    val lutRows = qRows.map { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      require(qv.length == dim, s"query dim ${qv.length} != collection dim $dim")
      val lut = pqBuildLut(qv, cb, m, kCent, subDim)
      (qid, lut.toSeq, math.sqrt(qv.map(x => x * x).sum), qv.toSeq)
    }
    val qlut = spark.createDataFrame(lutRows.toSeq)
      .toDF("query_id", "lut", "q_norm", "q_embedding")
    // per-query probed cells + the coarse term ⟨q, centroid⟩ per pair
    val probeRows = qRows.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      nearestCells(qv, cents, kCells, nprobe).map { c =>
        var d = 0.0; var i = 0
        while (i < dim) { d += qv(i) * cents(c * dim + i); i += 1 }
        (qid, c, d)
      }
    }
    val qprobe = spark.createDataFrame(probeRows.toSeq)
      .toDF("query_id", "cell", "__cdot")
    val allCells = probeRows.map(_._2).distinct.map(Int.box)
    val adc = toCol(graft.plans.PqAdcDotCol(
      toExpr(col("codes")), toExpr(col("lut")), m, kCent))
    val scored = spark.table(s"`$db`.`$name`")
      .filter(col("cell").isin(allCells: _*) && // partition-pruned once for the batch
        col("norm") > 1e-12)                    // zero-norm rows excluded: see topKPq
      .join(broadcast(qprobe), "cell")          // each row meets only its probers
      .join(broadcast(qlut.select(col("query_id"), col("lut"), col("q_norm"))), "query_id")
      .select(col("query_id"), col("vec_id"),
        ((adc + col("__cdot")) /
          (col("norm") * greatest(col("q_norm"), lit(1e-12)))).as("ascore"))
    val candK = toCol(graft.plans.TopKScoreId(
      toExpr(col("ascore")), toExpr(col("vec_id")), math.max(k, rescoreK))
      .toAggregateExpression())
    val candidates = scored.groupBy(col("query_id"))
      .agg(candK.as("cand"))
      .select(col("query_id"), explode(col("cand")).as("hit"))
      .select(col("query_id"), col("hit.vec_id").as("vec_id"))
      .join(broadcast(qlut.select(col("query_id"), col("q_embedding"))), "query_id")
    val rescored = full.select(col("vec_id"), col("embedding"))
      .join(broadcast(candidates), "vec_id")
      .select(col("query_id"), col("vec_id"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
    val topk = toCol(graft.plans.TopKScoreId(
      toExpr(col("score")), toExpr(col("vec_id")), k).toAggregateExpression())
    rescored.groupBy(col("query_id"))
      .agg(topk.as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.vec_id").as("vec_id"),
        col("hit.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** Contract probe for [[topKIvfPq]] — build-once over the fixture
    * corpus, then a pruned+coded answer. Near-random fixture vectors →
    * generous nprobe/rescoreK like [[topKPqProbe]]; rows-only.
    */
  def topKIvfPqProbe(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 3, rescoreK: Int = 64, nprobe: Int = 4): DataFrame = {
    import graft.sources.CatalogOps
    val db = "graft_ivfpq_probe"
    val name = "emb_ivfpq"
    // single-JVM guard only — see the cross-session note in [[topKIvfProbe]]
    this.synchronized {
      val tables = Seq(name, s"${name}__model", s"${name}__pqmodel", s"${name}__pqmeta")
      if (tables.exists(t => !spark.catalog.tableExists(s"$db.$t"))) {
        CatalogOps.createDatabase(spark, db)
        tables.foreach(dropTableAndDir(spark, db, _))
        CatalogOps.createIvfPqCollection(spark, db, name, corpus(spark, dir))
      }
    }
    val qVec = corpus(spark, dir).filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Double](0).toArray
    topKIvfPq(spark, db, name, corpus(spark, dir), qVec, queryId, k, rescoreK, nprobe)
  }

  /** Contract probe for [[topKPq]]: builds the PQ collection once per
    * session over the fixture corpus (same build-once guard as
    * [[topKQuantizedProbe]]), then answers from the codes. Fixture vectors
    * are near-random (no cluster structure for the codebooks to exploit),
    * so the probe over-fetches rescoreK=64; approximate by construction →
    * rows-only, plumbing equality and planted-structure recall pinned in
    * tests.
    */
  def topKPqProbe(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 3, rescoreK: Int = 64): DataFrame = {
    import graft.sources.CatalogOps
    val db = "graft_pq_probe"
    val name = "emb_pq"
    // single-JVM guard only — see the cross-session note in [[topKIvfProbe]]
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.$name") ||
          !spark.catalog.tableExists(s"$db.${name}__pqmodel") ||
          !spark.catalog.tableExists(s"$db.${name}__pqmeta")) {
        CatalogOps.createDatabase(spark, db)
        Seq(name, s"${name}__pqmodel", s"${name}__pqmeta")
          .foreach(dropTableAndDir(spark, db, _))
        CatalogOps.createPqCollection(spark, db, name, corpus(spark, dir))
      }
    }
    val qVec = corpus(spark, dir).filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Double](0).toArray
    topKPq(spark, db, name, corpus(spark, dir), qVec, queryId, k, rescoreK)
  }

  /** SEMANTIC decontamination (`q_decontaminate_sem`) — per corpus vector
    * the maximum cosine against a held-out eval set, flagged at `tau`:
    * the embedding-space complement of
    * [[graft.operators.TextAnalysisOps.decontaminate]]'s n-gram overlap
    * (frontier-lab data reports run BOTH: n-grams catch verbatim
    * inclusion, embeddings catch paraphrase/translation leakage that
    * shares no surface n-gram). The eval set here is one held-out label
    * of the embeddings fixture — the stand-in for an embedded benchmark
    * suite.
    *
    * Scale: the [[graft.plans.SortedProbeCount]] shape transplanted to
    * vectors — an eval suite is benchmark-sized (thousands), so it
    * collapses to ONE broadcast row holding the vector list, and every
    * corpus row folds its max cosine map-side through one higher-order
    * `aggregate` over that list: one corpus pass, ZERO shuffles, no hash
    * exchange near the corpus, |corpus|·|eval|·dim multiplies
    * embarrassingly parallel. No frame grows with contamination. The
    * max is order-free, so the (canonically vec_id-sorted) eval array
    * order cannot matter; round-6 applies AFTER the max (the FIXTURES.md
    * determinism convention, shared operand order with the DuckDB
    * `list_cosine_similarity` oracle). An empty eval set yields
    * max_eval_cos = -1 and nothing flagged.
    */
  def semanticDecontaminate(spark: SparkSession, dir: String,
      evalLabel: Int = 0, tau: Double = 0.45): DataFrame =
    semanticDecontaminateOn(Tables.embeddings(spark, dir), evalLabel, tau)

  /** Parametric core: (vec_id, label, embedding array<double>) in. */
  private[graft] def semanticDecontaminateOn(emb: DataFrame,
      evalLabel: Int, tau: Double): DataFrame =
    emb.filter(col("label") =!= evalLabel)
      .crossJoin(broadcast(evalVecsOf(emb.filter(col("label") === evalLabel))))
      .select(col("vec_id"), maxEvalCos.as("max_eval_cos"))
      .select(col("vec_id"), col("max_eval_cos"),
        (col("max_eval_cos") >= tau).cast("long").as("contaminated"))
      .orderBy(col("vec_id").asc)

  /** One-row broadcast eval-suite frame: the eval vectors as a single
    * canonically vec_id-sorted list column `evecs` — build once, cache,
    * probe per batch (the n-gram `ngramSet` analogue for vectors).
    */
  private[graft] def evalVecsOf(evalEmb: DataFrame): DataFrame =
    evalEmb
      .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding"))))
        .as("es"))
      .select(transform(col("es"), e => e("embedding")).as("evecs"))

  /** round-6 max cosine of this row's `embedding` over the broadcast
    * `evecs` list — the shared scoring expression of the report and
    * ingest-filter forms (they cannot diverge).
    */
  private def maxEvalCos: Column =
    round(aggregate(col("evecs"), lit(-1.0),
      (acc, v) => greatest(acc, cosineFast(col("embedding"), v))), 6)

  /** Ingest-filter form of [[semanticDecontaminate]]: the clean survivors
    * of one embedded-document batch against a prebuilt eval-vector row —
    * what a streaming pipeline applies per micro-batch (cf.
    * [[graft.operators.TextAnalysisOps.decontaminateBatch]] for the
    * n-gram stage). Returns batch rows with max eval cosine < `tau`,
    * original columns preserved; stateless, the batch never shuffles.
    */
  def semanticDecontaminateBatch(batch: DataFrame, evalVecs: DataFrame,
      tau: Double = 0.45): DataFrame =
    batch.crossJoin(broadcast(evalVecs))
      .filter(maxEvalCos < tau)
      .drop("evecs")

  /** Johnson–Lindenstrauss random projection (`q_vec_project`; Johnson &
    * Lindenstrauss 1984; Achlioptas 2003 for the ±1 database-friendly
    * form) — embeddings down-projected to `outDim` via a Rademacher
    * matrix, the standard cheapening step before a coarse ANN pass or a
    * sketch: pairwise geometry survives within the JL distortion bound
    * while per-vector cost drops dim/outDim-fold.
    *
    * The matrix is never materialized: sign(k, j) is a DETERMINISTIC
    * integer cell — parity of ((k·65537 + j + 1) · 2654435761 mod
    * 2147483647), the engine's Knuth multiplicative hash over the
    * flattened index (a LINEAR form in (k, j) would be parity-degenerate
    * wherever the mod never fires: the first drafted lattice gave rows
    * k = 0, 1 perfectly alternating signs — caught by the geometry pin
    * below, not by inspection) — so both engines recompute the same ±1
    * entry from integers, exactly. The projected value
    * folds v[j]·sign in ascending j — one shared summation order — and
    * scales by 1/√outDim AFTER the fold, one rounding site at 6 dp.
    * Output at (vec_id, k, v) grain so the oracle compares scalars.
    *
    * Scale: pure map-side projection — zero shuffles before the
    * presentation sort, outDim·dim multiply-adds per row, no state, no
    * model. The JL geometry claim is test-pinned empirically (pairwise
    * L2 rank agreement on planted geometry), not just cited.
    */
  def vecProject(spark: SparkSession, dir: String,
      outDim: Int = 16): DataFrame =
    vecProjectOn(Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")), outDim)

  private[graft] def vecProjectOn(emb: DataFrame, outDim: Int): DataFrame =
    emb.select(col("vec_id"),
        posexplode(projectArray(col("embedding"), outDim)))
      .select(col("vec_id"), col("pos").cast("long").as("k"),
        col("col").as("v"))
      .orderBy(col("vec_id").asc, col("k").asc)

  /** The rounded outDim-length JL projection of `vec` as one array
    * column — the shared builder of the report form ([[vecProjectOn]])
    * and the stored collection
    * ([[graft.sources.CatalogOps.createProjectedCollection]]). Fused
    * codegen kernel ([[graft.plans.JlProject]]); the HOF formulation it
    * replaced is retained below as the spec for the equality pin.
    */
  private[graft] def projectArray(vec: Column, outDim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    toCol(graft.plans.JlProject(toExpr(vec), outDim))
  }

  /** The original nested-HOF formulation of [[projectArray]] — kept as
    * the executable SPEC of the fused kernel (ScalaCheck-pinned equal),
    * not used in any production path: the inner `aggregate` lambda
    * evaluates interpreted, which dominates the arithmetic at ingest.
    */
  private[graft] def projectArrayHof(vec: Column, outDim: Int): Column = {
    def sign(k: Column, j: Column): Column = {
      val cell = pmod((k * lit(65537L) + j + lit(1L)) * lit(2654435761L),
        lit(2147483647L))
      when(pmod(cell, lit(2L)) === 0L, lit(1.0)).otherwise(lit(-1.0))
    }
    transform(sequence(lit(0), lit(outDim - 1)), k =>
      round(
        aggregate(sequence(lit(0), size(vec) - 1), lit(0.0),
          (acc, j) => acc +
            element_at(vec, j + 1) * sign(k.cast("long"), j.cast("long")))
          / sqrt(lit(outDim.toDouble)), 6))
  }

  /** Driver-side twin of [[projectArray]] for a single query vector —
    * the same integer sign cells, the same ascending-j fold, the same
    * scale-then-round. Query projection is outDim·dim multiply-adds
    * once per ask; only the projected k doubles enter the plan.
    */
  private[graft] def projectVecDriver(v: Array[Double], outDim: Int): Array[Double] =
    Array.tabulate(outDim) { k =>
      var s = 0.0
      var j = 0
      while (j < v.length) {
        val cell = ((k.toLong * 65537L + j + 1L) * 2654435761L) % 2147483647L
        s += v(j) * (if (cell % 2L == 0L) 1.0 else -1.0)
        j += 1
      }
      BigDecimal(s / math.sqrt(outDim.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

  /** Two-phase PROJECTED knn (`q_knn_projected`) — phase 1 scans the
    * stored JL-projected collection (outDim doubles per row instead of
    * dim: the byte/flop cut is the point of storing the projection) and
    * keeps `rescoreK` candidates by projected cosine through the
    * bounded `orderBy.limit`; phase 2 re-scores ONLY those at full
    * precision via a broadcast semi-join into the full table. One plan,
    * no driver collect between phases (the [[topKQuantized]] shape with
    * the JL space as the coarse metric). Approximate by construction —
    * rows-only, with exhaustive-rescoreK equality to the exact scan and
    * planted-cluster recall test-pinned (the candidate-generation
    * contract every coarse phase in this engine carries).
    */
  def topKProjected(spark: SparkSession, db: String, name: String,
      full: DataFrame, qVec: Array[Double], excludeId: Long = -1L,
      k: Int = 3, rescoreK: Int = 12, outDim: Int = 16): DataFrame = {
    val qp = projectVecDriver(qVec, outDim)
    val pq = spark.range(1).select(typedLit(qp.toSeq).as("pq"))
    val candidates = spark.table(s"`$db`.`$name`")
      .filter(col("vec_id") =!= excludeId)
      .crossJoin(broadcast(pq))
      .select(col("vec_id"), cosineFast(col("pvec"), col("pq")).as("ascore"))
      .orderBy(col("ascore").desc, col("vec_id").asc)
      .limit(math.max(k, rescoreK))
      .select(col("vec_id"))
    val q = spark.range(1).select(typedLit(qVec.toSeq).as("q_embedding"))
    full.select(col("vec_id"), col("embedding"))
      .join(broadcast(candidates), "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Batched two-phase projected knn — [[topKProjected]] for a query
    * TABLE (query_id, q_embedding), one job for the whole batch: the
    * query side projects IN-PLAN through [[projectArray]] (outDim·dim
    * once per query — queries are few, rows are many: the asymmetry the
    * stored collection exists for), phase 1 scores every (pvec, query)
    * pair via the broadcast query side, the bounded-heap
    * [[graft.plans.TopKScoreId]] keeps `rescoreK` candidates per query,
    * phase 2 re-scores the exploded candidate set at full precision.
    * The per-micro-batch scorer of
    * [[graft.streaming.StreamingOps.streamingKnnProjected]].
    * Output ≡ running [[topKProjected]] per query (test-pinned).
    */
  def topKForQueriesProjected(spark: SparkSession, db: String, name: String,
      full: DataFrame, queries: DataFrame, k: Int = 3,
      rescoreK: Int = 12, outDim: Int = 16): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    // replayed query_ids resolve deterministically (see topKForQueries)
    val uniq = queries.groupBy(col("query_id"))
      .agg(max(struct(col("q_embedding"))).as("__w"))
      .select(col("query_id"), col("__w.q_embedding").as("q_embedding"))
      .withColumn("pq", projectArray(col("q_embedding"), outDim))
    val scored = spark.table(s"`$db`.`$name`")
      .crossJoin(broadcast(uniq.select(col("query_id"), col("pq"))))
      .select(col("query_id"), col("vec_id"),
        cosineFast(col("pvec"), col("pq")).as("ascore"))
    val candK = toCol(graft.plans.TopKScoreId(
      toExpr(col("ascore")), toExpr(col("vec_id")), math.max(k, rescoreK))
      .toAggregateExpression())
    val candidates = scored.groupBy(col("query_id"))
      .agg(candK.as("cand"))
      .select(col("query_id"), explode(col("cand")).as("hit"))
      .select(col("query_id"), col("hit.vec_id").as("vec_id"))
      .join(broadcast(uniq.select(col("query_id"), col("q_embedding"))),
        "query_id")
    val rescored = full.select(col("vec_id"), col("embedding"))
      .join(broadcast(candidates), "vec_id")
      .select(col("query_id"), col("vec_id"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
    val topk = toCol(graft.plans.TopKScoreId(
      toExpr(col("score")), toExpr(col("vec_id")), k).toAggregateExpression())
    rescored.groupBy(col("query_id"))
      .agg(topk.as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.vec_id").as("vec_id"),
        col("hit.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** Probe entry: create-once projected collection over the fixture,
    * then one ask (vec 0's neighbors, itself excluded).
    */
  def topKProjectedProbe(spark: SparkSession, dir: String,
      queryId: Long = 0L, k: Int = 3, rescoreK: Int = 12): DataFrame = {
    import graft.sources.CatalogOps
    val db = "graft_proj_probe"
    val name = "emb_proj"
    // single-JVM guard only — see the cross-session note in [[topKIvfProbe]]
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.$name")) {
        CatalogOps.createDatabase(spark, db)
        dropTableAndDir(spark, db, name)
        CatalogOps.createProjectedCollection(spark, db, name, corpus(spark, dir))
      }
    }
    val qVec = corpus(spark, dir).filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Double](0).toArray
    topKProjected(spark, db, name, corpus(spark, dir), qVec, queryId, k, rescoreK)
  }
}
