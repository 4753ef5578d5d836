package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Batched knn: ref `embeddingItems` list → list-of-lists result
    * (`main_server.py:40-44`). Queries = vec_id < nQueries, corpus = the
    * rest. Broadcast the query side; rank window partitioned by query.
    */
  def topKBatch(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 3): DataFrame = {
    val emb = corpus(spark, dir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val cand = emb.filter(col("vec_id") >= nQueries)
      .crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        round(cosineFast(col("embedding"), col("q_embedding")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id").asc, col("rank").asc)
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

  /** Similarity θ-join: all pairs with cosine > threshold (north-star
    * "similarity search/join"). Self-join deduped by `a.vec_id < b.vec_id`.
    * Scale path: at 100 TB this becomes LSH-bucketed ([[DedupOps.minHashLsh]]
    * pattern) — the exact form here is the oracle-checkable baseline.
    */
  def simJoin(spark: SparkSession, dir: String, threshold: Double = 0.35): DataFrame = {
    val emb = corpus(spark, dir)
    // Pre-normalize ONCE per side (O(n·dim)) so the O(n²) pair loop does a
    // single dot instead of three — cosine(a,b) = â·b̂. At 100 TB the unit
    // vectors would be materialized at ingest; LSH bucketing replaces the
    // full cross-product (see DedupOps).
    val unit = emb.select(col("vec_id"), l2Normalize(col("embedding")).as("u"))
    val a = unit.select(col("vec_id").as("a_id"), col("u").as("a_u"))
    val b = unit.select(col("vec_id").as("b_id"), col("u").as("b_u"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(dotFast(col("a_u"), col("b_u")), 6).as("score"))
      .filter(col("score") > threshold)
      .orderBy(col("a_id").asc, col("b_id").asc)
  }

  /** Per-label centroid (element-wise mean) — north-star extension; the
    * coarse-quantizer build step for IVF-style ANN. posexplode → positional
    * avg: one shuffle on (label, pos), map-side partial agg for free.
    * Output exploded (label, pos, val) for oracle hash-stability.
    */
  def centroids(spark: SparkSession, dir: String): DataFrame = {
    corpus(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("v")), 6).as("centroid_v"))
      .orderBy(col("label").asc, col("pos").asc)
  }
}
