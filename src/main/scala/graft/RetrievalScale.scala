package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: postings-index serving on a ZIPFIAN corpus —
  * `runMain graft.RetrievalScale [nDocs] [vocab]`.
  *
  * The driver fixtures have a 31-term vocabulary in which every query
  * term appears in ~77% of documents, so the union of any query's
  * posting lists covers ~99.7% of the corpus — the theoretical WORST
  * case for an inverted index, where bucket pruning cannot shed data and
  * the only saving is skipping serve-time tokenization (PERF_NOTES
  * records the resulting near-parity datum honestly). Real corpora are
  * Zipfian: most query terms are rare, their posting lists are orders of
  * magnitude smaller than the corpus, and probe cost scales with THOSE
  * lists. This harness generates that distribution deterministically and
  * measures the gap the fixture cannot show:
  *
  *  - corpus: nDocs documents of 60 tokens drawn from a `vocab`-word
  *    Zipf(s=1.07) vocabulary (the classic text exponent) — head terms in
  *    most documents, tail terms in a handful.
  *  - stored path ([[graft.operators.RetrievalOps.bm25TopKStoredOn]]):
  *    constant-folded statistics, but every query re-tokenizes the CORPUS.
  *  - indexed path ([[graft.operators.RetrievalOps.bm25TopKIndexedOn]]):
  *    zero corpus scans; the probe reads the query terms' bucket
  *    partitions and posting lists only.
  *
  * Queries probe three regimes — head terms (dense lists, the fixture's
  * regime), torso, and tail (rare terms, the production regime) — and the
  * two paths are cross-checked equal on every query before timing.
  */
object RetrievalScale {
  private def benchSession(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir", "/tmp/graft-retrievalscale-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  private def timed(tag: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[retrievalscale] $tag: $s%.2f s")
    s
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 50000
    val vocabN = if (args.length > 1) args(1).toInt else 10000
    val spark = benchSession()
    import spark.implicits._
    import graft.operators.RetrievalOps
    import graft.sources.CatalogOps

    // Zipf(s) sampling via the inverse-CDF over precomputed cumulative
    // weights — deterministic in (doc_id, position), generated on the
    // CLUSTER (nDocs tasks of pure arithmetic, no driver materialization)
    val s = 1.07
    val weights = Array.tabulate(vocabN)(i => 1.0 / math.pow(i + 1.0, s))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val bcCum = spark.sparkContext.broadcast(cum)
    val docs = spark.range(nDocs).select(col("id").as("doc_id"))
      .as[Long].mapPartitions { it =>
        val c = bcCum.value
        it.map { id =>
          val rnd = new scala.util.Random(id * 2654435761L + 17)
          val toks = Array.fill(60) {
            val u = rnd.nextDouble() * total
            val i = java.util.Arrays.binarySearch(c, u) match {
              case neg if neg < 0 => -neg - 1
              case pos => pos
            }
            s"w${math.min(i, c.length - 1)}"
          }
          (id, toks.mkString(" "))
        }
      }.toDF("doc_id", "text")

    val db = "retrievalscale"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    docs.write.mode("overwrite").saveAsTable(s"`$db`.`corpus`")
    val corpus = spark.table(s"`$db`.`corpus`")

    timed(s"build stats store ($nDocs docs, vocab $vocabN)") {
      CatalogOps.createBm25Stats(spark, db, "c", corpus)
    }
    timed("build postings index") {
      CatalogOps.createPostings(spark, db, "c", corpus)
    }

    // head / torso / tail regimes by Zipf rank
    val queries = Seq(
      "head"  -> "w0 w1 w2 w3",
      "torso" -> "w200 w350 w500 w800",
      // all four drawn from ranks near vocabN — a mid-vocab term (rank
      // ~vocabN/2) is torso-regime and would pollute the tail measurement
      "tail"  -> s"w${vocabN - 10} w${vocabN - 555} w${vocabN - 333} w${vocabN - 77}")

    // correctness first: both paths must agree on every query
    queries.foreach { case (tag, q) =>
      val stored = RetrievalOps.bm25TopKStoredOn(spark, corpus, db, "c", q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val indexed = RetrievalOps.bm25TopKIndexedOn(spark, db, "c", q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      require(stored == indexed, s"path divergence on $tag query: $q")
      println(s"[retrievalscale] $tag paths agree (${stored.length} rows)")
    }

    // warm both paths once, then time
    queries.foreach { case (tag, q) =>
      val st = timed(s"$tag stored (corpus scan)") {
        RetrievalOps.bm25TopKStoredOn(spark, corpus, db, "c", q, 10).collect()
      }
      val ix = timed(s"$tag indexed (postings)") {
        RetrievalOps.bm25TopKIndexedOn(spark, db, "c", q, 10).collect()
      }
      println(f"[retrievalscale] $tag speedup: ${st / ix}%.1fx")
    }

    // the structural datum: posting-list rows actually read per regime
    queries.foreach { case (tag, q) =>
      val terms = RetrievalOps.queryTerms(q)
      val rows = spark.table(s"`$db`.`c__postings`")
        .filter(col("term").isin(terms: _*)).count()
      println(s"[retrievalscale] $tag posting rows: $rows of ${nDocs}-doc corpus")
    }
    CatalogOps.dropDatabase(spark, db)
    spark.stop()
  }
}
