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
  *
  * `runMain graft.RetrievalScale maintenance [nDocs] [nBatches]` measures
  * the MAINTENANCE side the serving numbers assume away: the postings log
  * is append-only ([[graft.sources.CatalogOps.postingsIncrementalBatch]]),
  * so every uncompacted micro-batch adds one `batch_id` sub-partition per
  * touched bucket and the probe's pruned read opens more, smaller files as
  * the log grows. This mode ingests micro-batches, times the SAME torso
  * probe at log depths 0/1/2/4/.../nBatches, then times
  * [[graft.sources.CatalogOps.compactPostings]] and the post-compaction
  * probe — the datum that tells an operator how often to fold the log
  * (probe results are cross-checked unchanged by compaction).
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

  /** Zipf(s=1.07) corpus of 60-token docs with ids [offset, offset+n) —
    * deterministic in (doc_id, position), generated on the CLUSTER
    * (n tasks of pure arithmetic, no driver materialization).
    */
  private def zipfDocs(spark: SparkSession, n: Int, vocabN: Int,
      offset: Long = 0L): DataFrame = {
    import spark.implicits._
    val s = 1.07
    val weights = Array.tabulate(vocabN)(i => 1.0 / math.pow(i + 1.0, s))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val bcCum = spark.sparkContext.broadcast(cum)
    spark.range(offset, offset + n).select(col("id").as("doc_id"))
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
  }

  def main(args: Array[String]): Unit =
    if (args.headOption.contains("posmaint")) posMaintenance(args.drop(1))
    else if (args.headOption.contains("maintenance")) maintenance(args.drop(1))
    else serving(args)

  private def serving(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 50000
    val vocabN = if (args.length > 1) args(1).toInt else 10000
    val spark = benchSession()
    import graft.operators.RetrievalOps
    import graft.sources.CatalogOps

    val docs = zipfDocs(spark, nDocs, vocabN)

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

  /** Probe cost vs uncompacted log depth — see the object doc. */
  /** Positions-index maintenance cadence — the phrase-probe analog of
    * [[maintenance]]: the positional log appends one `batch_id`
    * sub-partition per touched bucket per micro-batch
    * ([[graft.sources.CatalogOps.positionsIncrementalBatch]]); this mode
    * times a planted-phrase probe at growing log depths, then
    * [[graft.sources.CatalogOps.compactPositions]] and the post-fold
    * probe. Phrase results are exact integers, so compaction invariance
    * here is EXACT equality (no fp tolerance needed, unlike BM25).
    */
  private def posMaintenance(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 20000
    val nBatches = if (args.length > 1) args(1).toInt else 64
    val vocabN = 10000
    val batchSize = 200
    val spark = benchSession()
    import graft.operators.RetrievalOps
    import graft.sources.CatalogOps

    val db = "posmaint"
    CatalogOps.dropDatabase(spark, db)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      s"/tmp/graft-retrievalscale-warehouse/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val phrase = "w200 w350 w500"
    // plant the phrase in every 100th doc so the probe scores real hits
    def plant(docs: DataFrame): DataFrame =
      docs.withColumn("text",
        when(col("doc_id") % 100 === 0, concat(col("text"), lit(" " + phrase)))
          .otherwise(col("text")))
    timed(s"build base positions ($nDocs docs)") {
      CatalogOps.createPositions(spark, db, "c", plant(zipfDocs(spark, nDocs, vocabN)))
    }
    def probeRows() = RetrievalOps.phraseSearchIndexed(spark, db, "c", phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def probeSec(): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); probeRows(); (System.nanoTime() - t0) / 1e9
      }.min
    def logFiles(): Long =
      spark.table(s"`$db`.`c__positions`").inputFiles.length.toLong

    require(probeRows().nonEmpty, "planted phrase must have hits")
    println(f"[retrievalscale] posmaint depth=0 files=${logFiles()} probe=${probeSec()}%.2f s")
    val checkpoints = Iterator.iterate(1)(_ * 2).takeWhile(_ < nBatches).toSeq :+ nBatches
    var done = 0
    checkpoints.foreach { target =>
      while (done < target) {
        val b = plant(zipfDocs(spark, batchSize, vocabN,
          offset = nDocs.toLong + done.toLong * batchSize))
        CatalogOps.positionsIncrementalBatch(b, db, "c", batchId = done + 1L)
        done += 1
      }
      println(f"[retrievalscale] posmaint depth=$done files=${logFiles()} probe=${probeSec()}%.2f s")
    }
    val before = probeRows()
    val cSec = timed(s"compact positions log ($nBatches batches folded)") {
      CatalogOps.compactPositions(spark, db, "c")
    }
    spark.catalog.refreshTable(s"`$db`.`c__positions`")
    require(probeRows() == before,
      "compaction changed the phrase probe (exact-integer results)")
    println(f"[retrievalscale] posmaint compacted files=${logFiles()} probe=${probeSec()}%.2f s (compact cost $cSec%.2f s, probe results unchanged)")
    CatalogOps.dropDatabase(spark, db)
    spark.stop()
  }

  private def maintenance(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 20000
    val nBatches = if (args.length > 1) args(1).toInt else 64
    val vocabN = 10000
    val batchSize = 200
    val spark = benchSession()
    import graft.operators.RetrievalOps
    import graft.sources.CatalogOps

    val db = "retrievalmaint"
    CatalogOps.dropDatabase(spark, db)
    // a crashed prior run can leave the directory behind a fresh metastore
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      s"/tmp/graft-retrievalscale-warehouse/$db.db"))
    CatalogOps.createDatabase(spark, db)
    timed(s"build base stats + postings ($nDocs docs)") {
      val base = zipfDocs(spark, nDocs, vocabN)
      CatalogOps.createBm25Stats(spark, db, "c", base)
      CatalogOps.createPostings(spark, db, "c", base)
    }

    // the serving mode's torso query: sparse enough that pruning works,
    // dense enough that the probe does real scoring work
    val q = "w200 w350 w500 w800"
    def probeRows() = RetrievalOps.bm25TopKIndexedOn(spark, db, "c", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // min of 3 reps: the datum is the plan's cost, not a GC draw
    def probeSec(): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); probeRows(); (System.nanoTime() - t0) / 1e9
      }.min
    def logFiles(): Long = {
      val u = spark.table(s"`$db`.`c__postings`").inputFiles.length.toLong
      u
    }

    probeRows() // warm the probe path once: depth=0 must not be a JIT draw
    println(f"[retrievalscale] depth=0 files=${logFiles()} probe=${probeSec()}%.2f s")
    val checkpoints = Iterator.iterate(1)(_ * 2).takeWhile(_ < nBatches).toSeq :+ nBatches
    var done = 0
    checkpoints.foreach { target =>
      while (done < target) {
        // both serving artifacts take the batch — the probe reads stats
        // AND postings, so the measured depth is the whole stack's
        val b = zipfDocs(spark, batchSize, vocabN,
          offset = nDocs.toLong + done.toLong * batchSize)
        CatalogOps.bm25StatsIncrementalBatch(b, db, "c", batchId = done + 1L)
        CatalogOps.postingsIncrementalBatch(b, db, "c", batchId = done + 1L)
        done += 1
      }
      println(f"[retrievalscale] depth=$done files=${logFiles()} probe=${probeSec()}%.2f s")
    }

    val before = probeRows()
    val cSec = timed(s"compact stats + postings logs ($nBatches batches folded)") {
      CatalogOps.compactBm25Stats(spark, db, "c")
      CatalogOps.compactPostings(spark, db, "c")
    }
    // catalog caches the partition listing of the pre-swap table
    spark.catalog.refreshTable(s"`$db`.`c__postings`")
    val after = probeRows()
    // ranked ids exactly; scores to a tolerance — BM25 scores are floating
    // point sums whose accumulation order legitimately changes when
    // compaction rewrites the file/partition layout
    require(before.map(_._1) == after.map(_._1),
      "compaction changed the probe's ranked documents")
    require(before.zip(after).forall { case ((_, s1), (_, s2)) =>
      math.abs(s1 - s2) < 1e-9 },
      "compaction moved a probe score by more than 1e-9")
    println(f"[retrievalscale] compacted files=${logFiles()} probe=${probeSec()}%.2f s (compact cost $cSec%.2f s, probe results unchanged)")
    CatalogOps.dropDatabase(spark, db)
    spark.stop()
  }
}
