package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

/** Driver contract — one entry per implemented operator from SURVEY.md §2,
  * each paired with a DuckDB-runnable oracle SQL over the same parquet
  * tables (driver registers them by file stem: region, nation, customer,
  * supplier, part, orders, lineitem, events, documents, embeddings).
  */
object SparkEntry {

  /** Flagship on sf0.001 — the reference's core query end-to-end:
    * `searchByText(limit=3)` (ref `main_server.py:41`) = embed-side knn over
    * the corpus, joined back to the document payload (title/text analog),
    * reference `main_server.py:164-175` citation shape.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val hits = KnnOps.topK(spark, dir, queryId = 0L, k = 3)
    val docs = Tables.documents(spark, dir)
    hits.join(docs, hits("vec_id") === docs("doc_id"), "left")
      .select(hits("vec_id"), hits("score"), docs("lang"), docs("source"),
        substring(docs("text"), 1, 80).as("snippet"))
      .orderBy(col("score").desc, col("vec_id").asc)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.D vector / knn core ----
    "q_knn_topk"     -> ((s, d) => KnnOps.topK(s, d)),
    "q_knn_batch"    -> ((s, d) => KnnOps.topKBatch(s, d)),
    "q_knn_filtered" -> ((s, d) => KnnOps.topKFiltered(s, d)),
    "q_sim_join"     -> ((s, d) => KnnOps.simJoin(s, d)),
    "q_vec_centroids" -> ((s, d) => KnnOps.centroids(s, d)),
    "q_cosine_pair"  -> ((s, d) => cosinePair(s, d)),
  )

  /** Adjacent-pair cosine — the bare metric surface (ref `TencentVDB.py:46`)
    * as a row-level function, vec_id i vs i+1.
    */
  private def cosinePair(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.cosineFast
    val emb = Tables.embeddings(spark, dir)
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.join(b, col("b_id") === col("a_id") + 1)
      .select(col("a_id"), col("b_id"),
        round(cosineFast(col("a_emb"), col("b_emb")), 6).as("score"))
      .orderBy(col("a_id").asc)
  }

  def oracleSql: Map[String, String] = Map(
    "q_knn_topk" ->
      """SELECT e.vec_id,
        |       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS score
        |FROM embeddings e
        |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY score DESC, e.vec_id ASC
        |LIMIT 3""".stripMargin,
    "q_knn_batch" ->
      """WITH cand AS (
        |  SELECT q.vec_id AS query_id, e.vec_id,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS score
        |  FROM embeddings e
        |  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
        |  WHERE e.vec_id >= 5
        |), ranked AS (
        |  SELECT query_id, vec_id, score,
        |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
        |  FROM cand
        |)
        |SELECT query_id, vec_id, score, rank FROM ranked
        |WHERE rank <= 3
        |ORDER BY query_id ASC, rank ASC""".stripMargin,
    "q_knn_filtered" ->
      """SELECT e.vec_id, e.label,
        |       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS score
        |FROM embeddings e
        |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0 AND e.label = 3
        |ORDER BY score DESC, e.vec_id ASC
        |LIMIT 5""".stripMargin,
    "q_sim_join" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS score
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) > 0.35
        |ORDER BY a_id ASC, b_id ASC""".stripMargin,
    "q_vec_centroids" ->
      """SELECT label, pos, round(avg(v), 6) AS centroid_v
        |FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
        |             unnest(range(len(embedding))) AS pos
        |      FROM embeddings)
        |GROUP BY label, pos
        |ORDER BY label ASC, pos ASC""".stripMargin,
    "q_cosine_pair" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS score
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY a_id ASC""".stripMargin,
  )
}
