package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Ev, StreamingOps}

/** Structured Streaming micro-batch tests via MemoryStream (SURVEY §5.4 —
  * no DuckDB oracle exists for streaming; correctness = expected windows /
  * sessions emitted once the watermark closes them).
  */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(id: Long, user: Long, t: String, typ: String = "click"): Ev =
    Ev(user, id, ts(t), typ, 1.0)

  test("tumbling day windows emit closed counts once the watermark passes") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingOps.tumblingCounts(in.toDS.toDF)
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append").start()
    try {
      in.addData(
        ev(1, 1, "2024-01-01 01:00:00"), ev(2, 1, "2024-01-01 02:00:00"),
        ev(3, 2, "2024-01-01 03:00:00", "view"))
      q.processAllAvailable()
      // advance watermark past day 1 (+1h slack)
      in.addData(ev(9, 9, "2024-01-02 02:30:00"))
      q.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows === Set(
        ("2024-01-01 00:00:00.0", "click", 2L),
        ("2024-01-01 00:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("session_window groups by 30-minute gaps per user") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingOps.sessionWindows(in.toDS.toDF)
      .writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()
    try {
      in.addData(
        ev(1, 1, "2024-01-01 10:00:00"), ev(2, 1, "2024-01-01 10:10:00"),
        ev(3, 1, "2024-01-01 11:30:00")) // >30min gap → second session
      q.processAllAvailable()
      in.addData(ev(9, 9, "2024-01-01 14:00:00")) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("session_out")
        .filter($"user_id" === 1L)
        .collect().map(r => (r.getTimestamp(1).toString, r.getLong(3))).toSet
      assert(rows === Set(
        ("2024-01-01 10:00:00.0", 2L),
        ("2024-01-01 11:30:00.0", 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with preceding clicks") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingOps.clickToPurchaseJoin(in.toDS.toDF)
      .writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    try {
      in.addData(
        ev(1, 1, "2024-01-01 10:00:00"),                 // click in window
        ev(2, 1, "2024-01-01 08:00:00"),                 // click too old
        ev(3, 1, "2024-01-01 10:30:00", "purchase"),
        ev(4, 2, "2024-01-01 10:15:00", "purchase"))     // user 2: no click
      q.processAllAvailable()
      in.addData(ev(9, 9, "2024-01-01 14:00:00"))        // advance watermark
      q.processAllAvailable()
      val rows = spark.table("ssjoin_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      assert(rows.toSeq === Seq((1L, 3L, 1L))) // purchase 3 ← click 1 only
    } finally q.stop()
  }

  test("streaming dedup keeps the first arrival per event_id") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingOps.streamingDedup(in.toDS.toDF)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData(
        ev(1, 1, "2024-01-01 10:00:00"),
        ev(1, 1, "2024-01-01 10:00:00", "view"), // duplicate id, same batch
        ev(2, 2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      in.addData(ev(1, 1, "2024-01-01 10:02:00", "view")) // duplicate, later batch
      q.processAllAvailable()
      val rows = spark.table("dedup_out")
        .collect().map(r => (r.getLong(1), r.getString(3)))
      assert(rows.length === 2)
      assert(rows.toMap === Map(1L -> "click", 2L -> "click"))
    } finally q.stop()
  }

  test("windowed top-k keeps the k best events per closed window") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingOps.windowedTopK(in.toDS.toDF, k = 2)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1, 10, ts("2024-01-01 01:00:00"), "click", 5.0),
        Ev(1, 11, ts("2024-01-01 02:00:00"), "click", 9.0),
        Ev(2, 12, ts("2024-01-01 03:00:00"), "view", 7.0),
        Ev(2, 13, ts("2024-01-01 04:00:00"), "view", 1.0))
      q.processAllAvailable()
      in.addData(Ev(9, 99, ts("2024-01-02 02:30:00"), "click", 0.0)) // close day 1
      q.processAllAvailable()
      val rows = spark.table("topk_out")
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq.sorted
      assert(rows === Seq((1, 11L, 9.0), (2, 12L, 7.0))) // top-2 by value
    } finally q.stop()
  }

  test("streaming upsert merges each micro-batch into the collection by id") {
    import graft.sources.CatalogOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "streamdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/streamdb.db"))
    CatalogOps.createDatabase(spark, "streamdb")
    val seed = Seq(ev(1, 1, "2024-01-01 10:00:00")).toDF
    CatalogOps.createCollection(spark, "streamdb", "evts", seed, shards = 1)
    val in = MemoryStream[Ev]
    val q = StreamingOps.streamingUpsert(in.toDS.toDF, "streamdb", "evts", "event_id")
    try {
      in.addData(
        ev(1, 1, "2024-01-01 11:00:00", "view"), // overwrites seed row id 1
        ev(2, 2, "2024-01-01 11:01:00"))
      q.processAllAvailable()
      in.addData(ev(3, 3, "2024-01-01 11:02:00"))
      q.processAllAvailable()
      val rows = spark.table("`streamdb`.`evts`")
        .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("event_type")).toMap
      assert(rows.keySet === Set(1L, 2L, 3L))
      assert(rows(1L) === "view") // last writer won
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "streamdb")
    }
  }

  test("stream-static enrichment joins the broadcast dimension per batch") {
    implicit val ctx = spark.sqlContext
    val dim = Seq(("click", 1), ("view", 2), ("purchase", 9))
      .toDF("event_type", "severity")
    val in = MemoryStream[Ev]
    val q = StreamingOps.enrichWithDim(in.toDS.toDF, dim, "event_type")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      in.addData(
        ev(1, 1, "2024-01-01 10:00:00"),
        ev(2, 1, "2024-01-01 10:01:00", "purchase"),
        ev(3, 2, "2024-01-01 10:02:00", "signup")) // no dim row → dropped (inner)
      q.processAllAvailable()
      val rows = spark.table("enrich_out")
        .collect().map(r => (r.getLong(2), r.getInt(5))).toSet
      assert(rows === Set((1L, 1), (2L, 9)))
    } finally q.stop()
  }

  test("streaming knn answers each query micro-batch like the batch top-k") {
    implicit val ctx = spark.sqlContext
    val sf = TestSpark.Sf
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val corpus = emb.filter($"vec_id" >= 5)
    val queries = emb.filter($"vec_id" < 5)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](2)))
    val in = MemoryStream[(Long, Seq[Double])]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val q = StreamingOps.streamingKnn(
      in.toDS.toDF("query_id", "q_embedding"), corpus, k = 3) { (out, _) =>
      results.synchronized {
        results ++= out.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      }
    }
    try {
      in.addData(queries.take(3).toSeq: _*)
      q.processAllAvailable()
      in.addData(queries.drop(3).toSeq: _*)
      q.processAllAvailable()
      val expected = graft.operators.KnnOps.topKBatchAgg(spark, sf, nQueries = 5, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(results.toSet === expected)
      assert(results.size === 15) // 5 queries x k=3, each exactly once
    } finally q.stop()
  }

  test("streaming IVF knn prunes per micro-batch and matches the batch probe") {
    import graft.sources.{CatalogOps, Tables}
    import graft.operators.KnnOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "sivfdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/sivfdb.db"))
    CatalogOps.createDatabase(spark, "sivfdb")
    val emb = Tables.embeddings(spark, TestSpark.Sf)
    CatalogOps.createIvfCollection(spark, "sivfdb", "emb_ivf", emb)
    val queries = emb.filter($"vec_id" < 2).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](2)))
    val in = MemoryStream[(Long, Seq[Double])]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val q = StreamingOps.streamingKnnIvf(
      in.toDS.toDF("query_id", "q_embedding"), "sivfdb", "emb_ivf", k = 4) { (out, _) =>
      results.synchronized {
        results ++= out.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      }
    }
    try {
      in.addData(queries(0)); q.processAllAvailable()
      in.addData(queries(1)); q.processAllAvailable()
      queries.foreach { case (qid, _) =>
        val got = results.filter(_._1 == qid).sortBy(_._4)
        // the stored query vector is its own best probe hit...
        assert(got.head._2 === qid && got.head._3 === 1.0)
        // ...and the rest reproduce the single-query partition-pruned probe
        val expected = KnnOps.topKIvfPartitioned(spark, "sivfdb", "emb_ivf", qid, k = 3)
          .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
        assert(got.drop(1).map(t => (t._2, t._3)).toSeq === expected)
      }
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "sivfdb")
    }
  }

  test("streaming quantized knn runs the single-plan probe per micro-batch") {
    import graft.sources.{CatalogOps, Tables}
    import graft.operators.KnnOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "sq8db")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/sq8db.db"))
    CatalogOps.createDatabase(spark, "sq8db")
    val emb = Tables.embeddings(spark, TestSpark.Sf)
    CatalogOps.createQuantizedCollection(spark, "sq8db", "emb_q8", emb)
    val queries = emb.filter($"vec_id" < 4).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](2)))
    val in = MemoryStream[(Long, Seq[Double])]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val q = StreamingOps.streamingKnnQuantized(
      in.toDS.toDF("query_id", "q_embedding"), "sq8db", "emb_q8", emb, k = 3) { (out, _) =>
      results.synchronized {
        results ++= out.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      }
    }
    try {
      in.addData(queries.take(2).toSeq: _*); q.processAllAvailable()
      in.addData(queries.drop(2).toSeq: _*); q.processAllAvailable()
      // stream output ≡ the batch single-plan probe over the same queries
      val expected = KnnOps.topKForQueriesQuantized(spark, "sq8db", "emb_q8",
          emb, emb.filter($"vec_id" < 4)
            .select($"vec_id".as("query_id"), $"embedding".as("q_embedding")), k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(results.toSet === expected)
      assert(results.size === 12) // 4 queries × k=3, each exactly once
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "sq8db")
    }
  }

  test("streaming projected knn runs the single-plan probe per micro-batch") {
    import graft.sources.{CatalogOps, Tables}
    import graft.operators.KnnOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "sprojdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/sprojdb.db"))
    CatalogOps.createDatabase(spark, "sprojdb")
    val emb = Tables.embeddings(spark, TestSpark.Sf)
    CatalogOps.createProjectedCollection(spark, "sprojdb", "emb_proj", emb)
    val queries = emb.filter($"vec_id" < 4).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](2)))
    val in = MemoryStream[(Long, Seq[Double])]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val q = StreamingOps.streamingKnnProjected(
      in.toDS.toDF("query_id", "q_embedding"), "sprojdb", "emb_proj", emb, k = 3) { (out, _) =>
      results.synchronized {
        results ++= out.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      }
    }
    try {
      in.addData(queries.take(2).toSeq: _*); q.processAllAvailable()
      in.addData(queries.drop(2).toSeq: _*); q.processAllAvailable()
      // stream output ≡ the batch single-plan probe over the same queries
      val expected = KnnOps.topKForQueriesProjected(spark, "sprojdb", "emb_proj",
          emb, emb.filter($"vec_id" < 4)
            .select($"vec_id".as("query_id"), $"embedding".as("q_embedding")), k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(results.toSet === expected)
      assert(results.size === 12) // 4 queries × k=3, each exactly once
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "sprojdb")
    }
  }

  test("streaming PQ knn answers each micro-batch like the batched ADC probe") {
    import graft.sources.{CatalogOps, Tables}
    import graft.operators.KnnOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "spqdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/spqdb.db"))
    CatalogOps.createDatabase(spark, "spqdb")
    val emb = Tables.embeddings(spark, TestSpark.Sf)
    CatalogOps.createPqCollection(spark, "spqdb", "emb_pq", emb)
    val queries = emb.filter($"vec_id" < 4).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](2)))
    val in = MemoryStream[(Long, Seq[Double])]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val q = StreamingOps.streamingKnnPq(
      in.toDS.toDF("query_id", "q_embedding"), "spqdb", "emb_pq", emb,
      k = 3, rescoreK = 64) { (out, _) =>
      results.synchronized {
        results ++= out.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      }
    }
    try {
      in.addData(queries.take(2).toSeq: _*); q.processAllAvailable()
      in.addData(queries.drop(2).toSeq: _*); q.processAllAvailable()
      val expected = KnnOps.topKForQueriesPq(spark, "spqdb", "emb_pq",
          emb, emb.filter($"vec_id" < 4)
            .select($"vec_id".as("query_id"), $"embedding".as("q_embedding")),
          k = 3, rescoreK = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(results.toSet === expected)
      assert(results.size === 12) // 4 queries × k=3, each exactly once
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "spqdb")
    }
  }

  test("streaming IVF-PQ knn answers each micro-batch like the batched probe") {
    import graft.sources.{CatalogOps, Tables}
    import graft.operators.KnnOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "sivfpqdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/sivfpqdb.db"))
    CatalogOps.createDatabase(spark, "sivfpqdb")
    val emb = Tables.embeddings(spark, TestSpark.Sf)
    CatalogOps.createIvfPqCollection(spark, "sivfpqdb", "emb_ivfpq", emb)
    val queries = emb.filter($"vec_id" < 4).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](2)))
    val in = MemoryStream[(Long, Seq[Double])]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val q = StreamingOps.streamingKnnIvfPq(
      in.toDS.toDF("query_id", "q_embedding"), "sivfpqdb", "emb_ivfpq", emb,
      k = 3, rescoreK = 64, nprobe = 4) { (out, _) =>
      results.synchronized {
        results ++= out.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      }
    }
    try {
      in.addData(queries.take(2).toSeq: _*); q.processAllAvailable()
      in.addData(queries.drop(2).toSeq: _*); q.processAllAvailable()
      val expected = KnnOps.topKForQueriesIvfPq(spark, "sivfpqdb", "emb_ivfpq",
          emb, emb.filter($"vec_id" < 4)
            .select($"vec_id".as("query_id"), $"embedding".as("q_embedding")),
          k = 3, rescoreK = 64, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(results.toSet === expected)
      assert(results.size === 12) // 4 queries × k=3, each exactly once
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "sivfpqdb")
    }
  }

  test("streaming routed graph knn answers each micro-batch like the batched probe") {
    import graft.sources.{CatalogOps, Tables}
    import graft.operators.GraphAnnOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "snswrdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/snswrdb.db"))
    CatalogOps.createDatabase(spark, "snswrdb")
    val emb = Tables.embeddings(spark, TestSpark.Sf)
    CatalogOps.createNswRoutedCollection(spark, "snswrdb", "emb_nswr", emb)
    val queries = emb.filter($"vec_id" < 4).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](2)))
    val in = MemoryStream[(Long, Seq[Double])]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val q = StreamingOps.streamingKnnNswRouted(
      in.toDS.toDF("query_id", "q_embedding"), "snswrdb", "emb_nswr",
      k = 3, efSearch = 100, nprobe = 2) { (out, _) =>
      results.synchronized {
        results ++= out.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      }
    }
    try {
      in.addData(queries.take(2).toSeq: _*); q.processAllAvailable()
      in.addData(queries.drop(2).toSeq: _*); q.processAllAvailable()
      val expected = GraphAnnOps.searchStoredRoutedBatch(spark, "snswrdb", "emb_nswr",
          emb.filter($"vec_id" < 4)
            .select($"vec_id".as("query_id"), $"embedding".as("q_embedding")),
          k = 3, efSearch = 100, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(results.toSet === expected)
      assert(results.size === 12) // 4 queries × k=3, each exactly once
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "snswrdb")
    }
  }

  test("streaming near-dup dedup equals the batch LSH survivors (ascending ids)") {
    import graft.sources.CatalogOps
    import graft.operators.DedupOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "sdedupdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/sdedupdb.db"))
    CatalogOps.createDatabase(spark, "sdedupdb")
    // 10 groups of 4: one base + three near-variants (j ≥ 0.9 one-token
    // swaps) — dups occur within AND across the two micro-batches
    val rnd = new scala.util.Random(17L)
    val vocab = (0 until 120).map(i => f"tok$i%03d")
    val docs: Seq[(Long, String)] = (0 until 10).flatMap { g =>
      val base = rnd.shuffle(vocab).take(30)
      (0 until 4).map { v =>
        val toks = if (v == 0) base
          else base.updated(rnd.nextInt(30), vocab(rnd.nextInt(120)))
        ((g * 4 + v).toLong, toks.mkString(" "))
      }
    }.sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingDedupMinhash(
      in.toDS.toDF("doc_id", "text"), "sdedupdb", "corpus", tau = 0.9)
    try {
      in.addData(docs.take(20): _*); q.processAllAvailable()
      in.addData(docs.drop(20): _*); q.processAllAvailable()
      val streamed = spark.table("`sdedupdb`.`corpus`")
        .collect().map(_.getLong(0)).toSet
      val batchSurvivors = DedupOps.minHashLshOn(docs.toDF("doc_id", "text"), 0.9)
        .collect().map(_.getLong(0)).toSet
      assert(streamed === batchSurvivors)
      // the signature store carries exactly the survivors' band rows
      val sigIds = spark.table("`sdedupdb`.`corpus__sigs`")
        .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(sigIds === batchSurvivors)
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "sdedupdb")
    }
  }

  test("streaming substring dedup drops span-covered docs, keeps owners and fresh docs") {
    import graft.sources.CatalogOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "ssubdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/ssubdb.db"))
    CatalogOps.createDatabase(spark, "ssubdb")
    def uniq(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val d0 = uniq("a", 40); val d1 = uniq("b", 40); val d2 = uniq("c", 40)
    val batch1 = Seq((0L, d0), (1L, d1), (2L, d2), (3L, uniq("d", 40)))
    val batch2 = Seq(
      (10L, d0),                                           // full copy of stored 0 → dropped
      (11L, uniq("e", 40)),                                // fresh → kept
      (12L, uniq("f", 40)), (13L, uniq("f", 40)),          // in-batch pair: 12 owns, 13 drops
      (14L, d1.split(" ").take(20).mkString(" ") + " " + uniq("g", 21)), // 1/22 windows dup → kept
      (15L, d2.split(" ").take(30).mkString(" ") + " " + uniq("h", 5)),  // 11/16 dup → dropped
      (16L, (uniq("i", 20) + " ") * 2 + uniq("i", 20)))  // self-boilerplate: 21/41 dup → dropped
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingDedupSubstring(
      in.toDS.toDF("doc_id", "text"), "ssubdb", "corpus")
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
      val kept = spark.table("`ssubdb`.`corpus`").collect().map(_.getLong(0)).toSet
      assert(kept === Set(0L, 1L, 2L, 3L, 11L, 12L, 14L))
      // first writer owns a hash: the in-batch pair's windows belong to 12
      val owners = spark.table("`ssubdb`.`corpus__winhashes`")
        .select($"owner_id").distinct().collect().map(_.getLong(0)).toSet
      assert(owners === Set(0L, 1L, 2L, 3L, 11L, 12L, 14L))
      // dropped docs left no hashes behind; doc 14's dup window stays owned by 1
      val whCount = spark.table("`ssubdb`.`corpus__winhashes`").count()
      // 40-token docs: 21 windows each (6 docs); doc 14: 22 windows, 1 already
      // owned by doc 1 → 21 new
      assert(whCount === 6L * 21 + 21)
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "ssubdb")
    }
  }

  test("streaming substring trim excises stored and in-batch spans, keeps every doc") {
    import graft.sources.CatalogOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "strimdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/strimdb.db"))
    CatalogOps.createDatabase(spark, "strimdb")
    def uniq(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val d0 = uniq("a", 40); val d1 = uniq("b", 40)
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingTrimSubstring(
      in.toDS.toDF("doc_id", "text"), "strimdb", "corpus")
    try {
      in.addData((0L, d0), (1L, d1)); q.processAllAvailable()
      in.addData(
        (10L, d0),                                            // full copy → lands empty
        (11L, d1.split(" ").take(20).mkString(" ") + " " + uniq("g", 21)), // stored span excised
        (12L, uniq("f", 40)), (13L, uniq("f", 40)),           // in-batch pair: 12 intact, 13 empty
        (14L, (uniq("j", 20) + " ") * 2 + uniq("j", 20)))     // self-repeat ×3: first copy kept
      q.processAllAvailable()
      val got = spark.table("`strimdb`.`corpus`")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got.keySet === Set(0L, 1L, 10L, 11L, 12L, 13L, 14L)) // every doc lands
      assert(got(0L) === d0 && got(1L) === d1 && got(12L) === uniq("f", 40))
      assert(got(10L) === "" && got(13L) === "")
      assert(got(11L) === uniq("g", 21)) // the 20 stored-span tokens excised
      assert(got(14L) === uniq("j", 20)) // repeats beyond the doc's first copy excised
      // store carries the ORIGINAL windows, first-writer-owned
      val owners = spark.table("`strimdb`.`corpus__winhashes`")
        .select($"owner_id").distinct().collect().map(_.getLong(0)).toSet
      assert(owners === Set(0L, 1L, 11L, 12L, 14L))
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "strimdb")
    }
  }

  test("substring trim replays converge: committed, post-hashes, and post-docs crash windows") {
    import graft.sources.CatalogOps
    import graft.operators.DedupOps
    CatalogOps.dropDatabase(spark, "rtrimdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/rtrimdb.db"))
    CatalogOps.createDatabase(spark, "rtrimdb")
    def uniq(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val texts: Map[Long, String] = Map(
      0L -> uniq("a", 40), 1L -> uniq("b", 40),
      2L -> uniq("a", 40), // copy of 0 → lands trimmed empty
      3L -> uniq("e", 40))
    def run(ids: Seq[Long], batchId: Long): Unit =
      DedupOps.substringTrimIncrementalBatch(
        ids.map(i => (i, texts(i))).toDF("doc_id", "text"),
        "rtrimdb", "corpus", batchId = Some(batchId))
    def state(): (Map[Long, String], Map[Long, Long], Set[Long]) = (
      spark.table("`rtrimdb`.`corpus`").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap,
      spark.table("`rtrimdb`.`corpus__winhashes`").groupBy($"owner_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      spark.table("`rtrimdb`.`corpus__commits`").collect().map(_.getLong(0)).toSet)
    run(Seq(0L, 1L), 1L)
    val s1 = state()
    assert(s1._1 === Map(0L -> texts(0L), 1L -> texts(1L)) && s1._3 === Set(1L))
    // COMMITTED replay short-circuits
    run(Seq(0L, 1L), 1L)
    assert(state() === s1)
    // POST-DOCS crash (marker lost): ownership reproduces the same trims,
    // appends no-op, marker restored
    run(Seq(2L, 3L), 2L)
    val s2 = state()
    assert(s2._1(2L) === "" && s2._1(3L) === texts(3L) && !s2._2.contains(2L))
    CatalogOps.deleteByIds(spark, "rtrimdb", "corpus__commits",
      Seq(2L).toDF("batch_id"), idCol = "batch_id")
    run(Seq(2L, 3L), 2L)
    assert(state() === s2)
    // POST-HASHES crash (hash rows landed, docs lost): the replayed docs
    // own their crashed-in hashes, reproduce their original text, and the
    // doc append restores them exactly once
    CatalogOps.deleteByIds(spark, "rtrimdb", "corpus",
      Seq(3L).toDF("doc_id"), idCol = "doc_id")
    CatalogOps.deleteByIds(spark, "rtrimdb", "corpus__commits",
      Seq(2L).toDF("batch_id"), idCol = "batch_id")
    run(Seq(2L, 3L), 2L)
    assert(state() === s2)
    CatalogOps.dropDatabase(spark, "rtrimdb")
  }

  test("substring ingest replays converge: committed, post-hashes, and post-docs crash windows") {
    import graft.sources.CatalogOps
    import graft.operators.DedupOps
    CatalogOps.dropDatabase(spark, "rsubdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/rsubdb.db"))
    CatalogOps.createDatabase(spark, "rsubdb")
    def uniq(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val texts: Map[Long, String] = Map(
      0L -> uniq("a", 40), 1L -> uniq("b", 40), 2L -> uniq("c", 40),
      3L -> uniq("d", 40),
      4L -> uniq("a", 40), // full copy of 0 → dropped
      5L -> uniq("e", 40))
    def run(ids: Seq[Long], batchId: Long): Unit =
      DedupOps.substringIncrementalBatch(
        ids.map(i => (i, texts(i))).toDF("doc_id", "text"),
        "rsubdb", "corpus", batchId = Some(batchId))
    def state(): (Set[Long], Map[Long, Long], Set[Long]) = (
      spark.table("`rsubdb`.`corpus`").collect().map(_.getLong(0)).toSet,
      spark.table("`rsubdb`.`corpus__winhashes`").groupBy($"owner_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      spark.table("`rsubdb`.`corpus__commits`").collect().map(_.getLong(0)).toSet)
    run(Seq(0L, 1L, 2L), 1L)
    val s1 = state()
    assert(s1._1 === Set(0L, 1L, 2L) && s1._3 === Set(1L))
    // COMMITTED replay: the marker short-circuits — byte-identical state
    run(Seq(0L, 1L, 2L), 1L)
    assert(state() === s1)
    // POST-DOCS crash (both appends landed, marker lost): ownership makes
    // every replayed doc see only its OWN hashes — same decisions, appends
    // no-op, only the marker is restored
    run(Seq(3L, 4L), 2L)
    val s2 = state()
    assert(s2._1 === Set(0L, 1L, 2L, 3L) && !s2._2.contains(4L))
    CatalogOps.deleteByIds(spark, "rsubdb", "corpus__commits",
      Seq(2L).toDF("batch_id"), idCol = "batch_id")
    run(Seq(3L, 4L), 2L)
    assert(state() === s2)
    // POST-HASHES crash (hash rows landed, doc lost): the replayed doc
    // owns its stored hashes, so it is NOT counted duplicated — the doc
    // append is restored exactly once, hash rows never duplicate
    run(Seq(5L), 3L)
    val s3 = state()
    CatalogOps.deleteByIds(spark, "rsubdb", "corpus",
      Seq(5L).toDF("doc_id"), idCol = "doc_id")
    CatalogOps.deleteByIds(spark, "rsubdb", "corpus__commits",
      Seq(3L).toDF("batch_id"), idCol = "batch_id")
    run(Seq(5L), 3L)
    assert(state() === s3)
    CatalogOps.dropDatabase(spark, "rsubdb")
  }

  test("streaming sequence packing equals the batch twin for in-order arrival; offsets persist across batches") {
    import graft.sources.{CatalogOps, Tables}
    import graft.operators.TextAnalysisOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "spackdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/spackdb.db"))
    CatalogOps.createDatabase(spark, "spackdb")
    // the fixture corpus fed ascending across THREE micro-batches must
    // reproduce the batch operator row-for-row
    val docs = Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingPackSequences(
      in.toDS.toDF("doc_id", "text"), "spackdb", "packed")
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { g =>
        in.addData(g: _*); q.processAllAvailable()
      }
      // foreachBatch writes through a CLONED session: refresh before any
      // outer-session read between micro-batches, or its relation cache
      // serves the listing it cached at the first read
      def refresh(): Unit = Seq("packed", "packed__packlog", "packed__commits")
        .foreach(t => spark.catalog.refreshTable(s"`spackdb`.`$t`"))
      refresh()
      val got = spark.table("`spackdb`.`packed`")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1)
      val want = TextAnalysisOps.packSequences(spark, TestSpark.Sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1)
      assert(got.toSeq === want.toSeq)
      // compaction folds the committed log without changing future state:
      // content-equal assignments for a subsequent batch vs no compaction
      val before = spark.table("`spackdb`.`packed__packlog`").count()
      CatalogOps.compactPacklog(spark, "spackdb", "packed")
      assert(spark.table("`spackdb`.`packed__packlog`").count() < before)
      in.addData((900000L, "extra words arriving after the fold " + ("x " * 600).trim))
      q.processAllAvailable()
      refresh()
      val late = spark.table("`spackdb`.`packed`")
        .filter($"doc_id" === 900000L).head()
      assert(late.getLong(3) === 0L) // fresh shard starts at offset 0
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "spackdb")
    }
  }

  test("sequence packing replays converge: committed, post-deltas, and post-docs crash windows") {
    import graft.sources.CatalogOps
    import graft.operators.TextAnalysisOps
    CatalogOps.dropDatabase(spark, "rpackdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/rpackdb.db"))
    CatalogOps.createDatabase(spark, "rpackdb")
    def doc(id: Long, words: Int) = (id, (s"w$id " * words).trim)
    def run(rows: Seq[(Long, String)], batchId: Long): Unit =
      TextAnalysisOps.packingIncrementalBatch(
        rows.toDF("doc_id", "text"), "rpackdb", "packed", batchId = Some(batchId))
    def state(): (Map[Long, (Long, Long)], Long, Set[Long]) = (
      spark.table("`rpackdb`.`packed`").collect()
        .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap,
      spark.table("`rpackdb`.`packed__packlog`").count(),
      spark.table("`rpackdb`.`packed__commits`").collect().map(_.getLong(0)).toSet)
    // shard 0 (ids < 128): 300 + 300 tokens spill into the second sequence
    run(Seq(doc(1L, 300), doc(2L, 300)), 1L)
    val s1 = state()
    assert(s1._1(1L) === ((0L, 0L)) && s1._1(2L) === ((300L, 0L)))
    // COMMITTED replay short-circuits
    run(Seq(doc(1L, 300), doc(2L, 300)), 1L)
    assert(state() === s1)
    // next batch continues the shard stream: 600 cum → sequence 1
    run(Seq(doc(3L, 100)), 2L)
    val s2 = state()
    assert(s2._1(3L) === ((600L, 1L)))
    // POST-DOCS crash (marker lost): identical recompute, appends no-op
    CatalogOps.deleteByIds(spark, "rpackdb", "packed__commits",
      Seq(2L).toDF("batch_id"), idCol = "batch_id")
    run(Seq(doc(3L, 100)), 2L)
    assert(state() === s2)
    // POST-DELTAS crash (delta rows landed, docs lost): the replay's reads
    // exclude its own batch_id, so assignments recompute identically and
    // the doc append restores them exactly once
    run(Seq(doc(4L, 50)), 3L)
    val s3 = state()
    CatalogOps.deleteByIds(spark, "rpackdb", "packed",
      Seq(4L).toDF("doc_id"), idCol = "doc_id")
    CatalogOps.deleteByIds(spark, "rpackdb", "packed__commits",
      Seq(3L).toDF("batch_id"), idCol = "batch_id")
    run(Seq(doc(4L, 50)), 3L)
    assert(state() === s3)
    CatalogOps.dropDatabase(spark, "rpackdb")
  }

  test("streaming curation with the language gate: non-target languages drop before the gates") {
    import graft.sources.CatalogOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "slangdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/slangdb.db"))
    CatalogOps.createDatabase(spark, "slangdb")
    def uniq(tag: String, k: Int) = (0 until k).map(i => s"$tag$i").mkString(" ")
    // ENGLISH-scoring marker words (en trigram profile hits) + neutral
    // unique filler (letter+digit tokens hit no language's profile)
    def enText(tag: String) = "window batch hash row merge " + uniq(tag, 20)
    // FRENCH-rendered dictionary words: the classifier must call it fr
    // and the gate must drop it BEFORE any quality gate sees it
    val frText = "donnees rapide requete fusion etincelle " + uniq("f", 20)
    val evalDocs = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val in = MemoryStream[(Long, String, String, String)]
    val q = StreamingOps.streamingCurateLang(
      in.toDS.toDF("doc_id", "source", "lang", "text"),
      evalDocs, "slangdb", "corpus")
    try {
      in.addData(
        (1L, "src3", "en", enText("a")),  // en, survives everything
        (2L, "src3", "fr", frText),       // classified fr → language gate
        (3L, "src3", "en", uniq("b", 25))) // all-neutral text: argmax falls
                                           // to 'de' (tie-break) → dropped
      q.processAllAvailable()
      in.addData(
        (10L, "src3", "en", enText("a")), // near-dup of stored 1 → dropped
        (11L, "src3", "en", enText("e"))) // fresh en → kept
      q.processAllAvailable()
      val kept = spark.table("`slangdb`.`corpus`").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 11L))
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "slangdb")
    }
  }

  test("streaming curation chain: gates, decontamination, and dedup compose per micro-batch") {
    import graft.sources.CatalogOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "scurdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/scurdb.db"))
    CatalogOps.createDatabase(spark, "scurdb")
    def uniq(tag: String, k: Int) = (0 until k).map(i => s"$tag$i").mkString(" ")
    val evalDocs = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    // src4 has mix weight 0.25 → a doc whose Knuth bucket lands >= 250 is
    // dropped map-side; pick such an id away from the other fixtures
    val dropMix = (20L to 80L)
      .find(i => java.lang.Math.floorMod(i * 2654435761L, 1000L) >= 250).get
    val in = MemoryStream[(Long, String, String)]
    val q = StreamingOps.streamingCurate(
      in.toDS.toDF("doc_id", "source", "text"), evalDocs, "scurdb", "corpus")
    try {
      in.addData(
        (1L, "src3", uniq("a", 25)),                          // survives everything
        (2L, "src3", uniq("b", 5)),                           // token floor → dropped
        (dropMix, "src4", uniq("c", 25)),                     // mix bucket → dropped
        (3L, "src3", "alpha beta gamma delta " + uniq("d", 21))) // eval 4-gram → dropped
      q.processAllAvailable()
      in.addData(
        (10L, "src3", uniq("a", 25)),                         // duplicate of stored 1 → dropped
        (11L, "src3", uniq("e", 25)))                         // fresh → kept
      q.processAllAvailable()
      val kept = spark.table("`scurdb`.`corpus`").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 11L))
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "scurdb")
    }
  }

  test("streaming curation with C4 first: line cleaning and page drops precede the gates") {
    import graft.sources.CatalogOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "sc4db")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/sc4db.db"))
    CatalogOps.createDatabase(spark, "sc4db")
    // six-word terminal-punctuated sentences: each is C4-retained
    def sent(tag: String, i: Int) =
      (0 until 6).map(j => s"$tag$i$j").mkString(" ") + "."
    def page(tag: String, n: Int) = (0 until n).map(sent(tag, _)).mkString("\n")
    val evalDocs = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val in = MemoryStream[(Long, String, String)]
    val q = StreamingOps.streamingCurateC4(
      in.toDS.toDF("doc_id", "source", "text"), evalDocs, "sc4db", "corpus")
    try {
      in.addData(
        (1L, "src3", page("a", 4)),                     // 4 kept lines, 24 tokens: survives
        (2L, "src3", page("b", 2) + "\nshort line."),   // 2 kept sentences → C4 page floor
        (3L, "src3", page("c", 4) + "\ncode { x }"),    // brace → C4 page drop
        (4L, "src3", page("d", 3)),                     // 3 kept lines = 18 tokens → token floor
        (5L, "src3", "alpha beta gamma delta epsilon zeta.\n" + page("g", 3))) // eval 4-gram → decontaminated
      q.processAllAvailable()
      in.addData(
        (10L, "src3", page("a", 4)),                    // duplicate of stored 1 → dropped
        (11L, "src3", page("f", 4)))                    // fresh → kept
      q.processAllAvailable()
      val kept = spark.table("`sc4db`.`corpus`").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 11L))
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "sc4db")
    }
  }

  test("streaming image near-dup drops re-encoded and resized copies, keeps fresh and unjudgeable payloads") {
    import graft.sources.CatalogOps
    import graft.operators.{MediaRecord, MultimodalOps}
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "simgdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/simgdb.db"))
    CatalogOps.createDatabase(spark, "simgdb")
    val rnd = new scala.util.Random(99L)
    def mosaic(): Array[Byte] =
      MultimodalOps.renderPpm(Array.fill(192)(rnd.nextInt(256).toByte))
    val a = mosaic(); val b = mosaic()
    // resized copy of a (perceptually identical) via the real resize path
    import spark.implicits._
    val aResized = MultimodalOps.resizePpm(
      Seq(MediaRecord(0L, a, "image/x-portable-pixmap")).toDS, 48, 48)
      .collect()(0).payload
    val in = MemoryStream[(Long, Array[Byte])]
    val q = StreamingOps.streamingDedupImage(
      in.toDS.toDF("doc_id", "payload"), "simgdb", "imgs")
    try {
      in.addData((0L, a), (1L, b)); q.processAllAvailable()
      in.addData(
        (10L, aResized),                    // resized copy of stored 0 → dropped
        (11L, mosaic()),                    // fresh → kept
        (12L, "not an image".getBytes("UTF-8")), // unjudgeable → kept, no fp rows
        (13L, b), (14L, b))                 // copy of stored 1 + in-batch dup → both dropped
      q.processAllAvailable()
      val kept = spark.table("`simgdb`.`imgs`").collect().map(_.getLong(0)).toSet
      assert(kept === Set(0L, 1L, 11L, 12L))
      val fpIds = spark.table("`simgdb`.`imgs__imghash`")
        .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(fpIds === Set(0L, 1L, 11L)) // the unjudgeable payload left no fingerprints
      // one chunk row per pigeonhole chunk (maxHamming 8 → 9) per image
      assert(spark.table("`simgdb`.`imgs__imghash`").count() === 3L * 9)
      // the serving probe: a resized copy finds its stored original
      // best-first; fresh and unjudgeable payloads find nothing
      import graft.operators.DedupOps
      val hit = DedupOps.probeImage(spark, "simgdb", "imgs", aResized)
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(hit.headOption.exists(h => h._1 === 0L && h._2 === 0))
      assert(DedupOps.probeImage(spark, "simgdb", "imgs", mosaic()).isEmpty)
      assert(DedupOps.probeImage(spark, "simgdb", "imgs",
        "still not an image".getBytes("UTF-8")).isEmpty)
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "simgdb")
    }
  }

  test("streaming URL dedup: canonical first-arrival-wins; replays and crash windows converge") {
    import graft.sources.CatalogOps
    import graft.operators.DedupOps
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val db = "surldb"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val batch1 = Seq(
      (10L, "HTTP://WWW.EXAMPLE.COM/d/1?a=1&b=2", "t10"), // case variant of stored 0 → dropped
      (11L, "http://www.example.com:80/d/2", "t11"),      // port variant of stored 1 → dropped
      (12L, "http://www.example.com/d/3?utm_source=x", "t12"), // fresh → kept
      (13L, "http://www.example.com/d/4?b=2&a=1", "t13"), // fresh → kept (lowest in batch)
      (14L, "http://www.example.com/d/4?a=1&b=2#f", "t14")) // in-batch dup of 13 → dropped
    val in = MemoryStream[(Long, String, String)]
    val q = StreamingOps.streamingDedupUrl(
      in.toDF.toDF("doc_id", "url", "text"), db, "docs")
    try {
      in.addData((0L, "http://www.example.com/d/1?a=1&b=2", "t0"),
        (1L, "http://www.example.com/d/2", "t1"))
      q.processAllAvailable()
      in.addData(batch1: _*)
      q.processAllAvailable()
    } finally q.stop()
    def docs() = spark.table(s"`$db`.`docs`").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    def seen() = spark.table(s"`$db`.`docs__urlseen`").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val kept0 = docs()
    assert(kept0.map(_._1) === Set(0L, 1L, 12L, 13L))
    assert(seen().map(_._2) === Set(0L, 1L, 12L, 13L)) // one store row per retained doc
    // canonical forms stored, not raw urls
    assert(seen().map(_._1).contains("http://www.example.com/d/3"))
    // COMMITTED replay: the watermark short-circuits, nothing moves
    DedupOps.urlIncrementalBatch(batch1.toDF("doc_id", "url", "text"),
      db, "docs", batchId = Some(1L))
    assert(docs() === kept0 && seen().size === 4)
    // CRASH WINDOW: seen rows landed, doc rows and watermark lost — the
    // replay must re-reach the same decisions (ownership: a doc probing
    // its own crashed-in seen row never counts) and refill the doc rows
    CatalogOps.deleteByIds(spark, db, "docs", Seq(12L, 13L).toDF("doc_id"),
      idCol = "doc_id")
    spark.sql(s"DROP TABLE `$db`.`docs__commits`")
    DedupOps.urlIncrementalBatch(batch1.toDF("doc_id", "url", "text"),
      db, "docs", batchId = Some(1L))
    assert(docs() === kept0, "crash-window replay must converge to the committed state")
    assert(seen().size === 4, "replayed seen rows must not duplicate")
    // serving probe: any noise variant of a retained url finds its keeper;
    // a fresh url probes to empty
    val hit = DedupOps.probeUrl(spark, db, "docs",
      "HTTP://WWW.EXAMPLE.COM:80/d/1?utm_medium=m&b=2&a=1#x")
      .collect().map(_.getLong(0)).toSeq
    assert(hit === Seq(0L))
    assert(DedupOps.probeUrl(spark, db, "docs",
      "http://www.example.com/d/999").isEmpty)
    // the probe's canonical equality reaches the store scan as a pushed filter
    val probePlan = DedupOps.probeUrl(spark, db, "docs",
      "http://www.example.com/d/1?a=1&b=2").queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(probePlan.contains("PushedFilters: [IsNotNull(cu), EqualTo(cu,"), probePlan)
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("fingerprint store compaction: fewer files, probe and ingest decisions unchanged") {
    import graft.sources.CatalogOps
    import graft.operators.{DedupOps, MultimodalOps}
    import spark.implicits._
    val db = "imgcompactdb"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val rnd = new scala.util.Random(41L)
    def mosaic(): Array[Byte] =
      MultimodalOps.renderPpm(Array.fill(192)(rnd.nextInt(256).toByte))
    val originals = (0 until 8).map(i => (i.toLong, mosaic()))
    // 4 appended micro-batches -> a multi-file-set store
    originals.grouped(2).zipWithIndex.foreach { case (g, i) =>
      DedupOps.imageIncrementalBatch(g.toDF("doc_id", "payload"),
        db, "imgs", batchId = Some(i.toLong))
    }
    val store = s"imgs__imghash"
    def files() = spark.table(s"`$db`.`$store`").inputFiles.length
    val before = files()
    val probePayload = MultimodalOps.resizePpm(
      Seq(graft.operators.MediaRecord(99L, originals(3)._2, "image/x-portable-pixmap")).toDS,
      48, 48).collect()(0).payload
    def probe() = DedupOps.probeImage(spark, db, "imgs", probePayload)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val hitBefore = probe()
    assert(hitBefore.headOption.exists(_._1 == 3L))
    CatalogOps.compactCollection(spark, db, store)
    spark.catalog.refreshTable(s"`$db`.`$store`")
    assert(files() < before, s"compaction must shrink the file count ($before)")
    assert(probe() === hitBefore, "serving probe must be compaction-invariant")
    // the ingest filter still drops a copy of a stored image afterwards
    DedupOps.imageIncrementalBatch(
      Seq((100L, originals(5)._2), (101L, mosaic())).toDF("doc_id", "payload"),
      db, "imgs", batchId = Some(9L))
    val kept = spark.table(s"`$db`.`imgs`").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(100L) && kept.contains(101L),
      "post-compaction ingest decisions must match the uncompacted store")
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("streaming audio near-dup drops volume-scaled copies, keeps fresh and unjudgeable payloads") {
    import graft.sources.CatalogOps
    import graft.operators.MultimodalOps
    implicit val ctx = spark.sqlContext
    CatalogOps.dropDatabase(spark, "saudiodb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/saudiodb.db"))
    CatalogOps.createDatabase(spark, "saudiodb")
    def clip(seed: String): Array[Byte] =
      MultimodalOps.renderWav(seed.getBytes("UTF-8"))
    val a = clip("first recording"); val b = clip("second recording")
    val aQuiet = MultimodalOps.scaleWav(a, 0.4).get
    val in = MemoryStream[(Long, Array[Byte])]
    val q = StreamingOps.streamingDedupAudio(
      in.toDS.toDF("doc_id", "payload"), "saudiodb", "clips")
    try {
      in.addData((0L, a), (1L, b)); q.processAllAvailable()
      in.addData(
        (10L, aQuiet),                       // volume copy of stored 0 → dropped
        (11L, clip("third recording")),      // fresh → kept
        (12L, "not audio".getBytes("UTF-8")), // unjudgeable → kept, no fp rows
        (13L, b), (14L, b))                  // copy of stored 1 + in-batch dup → dropped
      q.processAllAvailable()
      val kept = spark.table("`saudiodb`.`clips`").collect().map(_.getLong(0)).toSet
      assert(kept === Set(0L, 1L, 11L, 12L))
      val fpIds = spark.table("`saudiodb`.`clips__audiohash`")
        .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(fpIds === Set(0L, 1L, 11L))
      // one chunk row per pigeonhole chunk (maxHamming 6 → 7) per clip
      assert(spark.table("`saudiodb`.`clips__audiohash`").count() === 3L * 7)
      // the serving probe: a quiet copy finds its stored original
      // best-first; fresh and unjudgeable payloads find nothing
      import graft.operators.DedupOps
      val hit = DedupOps.probeAudio(spark, "saudiodb", "clips", aQuiet)
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(hit.headOption.exists(h => h._1 === 0L && h._2 <= 2))
      assert(DedupOps.probeAudio(spark, "saudiodb", "clips",
        clip("unseen recording")).isEmpty)
      assert(DedupOps.probeAudio(spark, "saudiodb", "clips",
        "still not audio".getBytes("UTF-8")).isEmpty)
    } finally {
      q.stop()
      CatalogOps.dropDatabase(spark, "saudiodb")
    }
  }

  test("image ingest replays converge: committed, post-hashes, and post-docs crash windows") {
    import graft.sources.CatalogOps
    import graft.operators.{DedupOps, MultimodalOps}
    CatalogOps.dropDatabase(spark, "rimgdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/rimgdb.db"))
    CatalogOps.createDatabase(spark, "rimgdb")
    val rnd = new scala.util.Random(123L)
    def mosaic(): Array[Byte] =
      MultimodalOps.renderPpm(Array.fill(192)(rnd.nextInt(256).toByte))
    val m0 = mosaic()
    val payloads: Map[Long, Array[Byte]] = Map(
      0L -> m0, 1L -> mosaic(),
      2L -> m0,        // copy of 0 → dropped
      3L -> mosaic())
    def run(ids: Seq[Long], batchId: Long): Unit =
      DedupOps.imageIncrementalBatch(
        ids.map(i => (i, payloads(i))).toDF("doc_id", "payload"),
        "rimgdb", "imgs", batchId = Some(batchId))
    def state(): (Set[Long], Map[Long, Long], Set[Long]) = (
      spark.table("`rimgdb`.`imgs`").collect().map(_.getLong(0)).toSet,
      spark.table("`rimgdb`.`imgs__imghash`").groupBy($"doc_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      spark.table("`rimgdb`.`imgs__commits`").collect().map(_.getLong(0)).toSet)
    run(Seq(0L, 1L), 1L)
    val s1 = state()
    assert(s1._1 === Set(0L, 1L) && s1._3 === Set(1L))
    // COMMITTED replay short-circuits
    run(Seq(0L, 1L), 1L)
    assert(state() === s1)
    // POST-DOCS crash (marker lost): same decisions, appends no-op
    run(Seq(2L, 3L), 2L)
    val s2 = state()
    assert(s2._1 === Set(0L, 1L, 3L) && !s2._2.contains(2L))
    CatalogOps.deleteByIds(spark, "rimgdb", "imgs__commits",
      Seq(2L).toDF("batch_id"), idCol = "batch_id")
    run(Seq(2L, 3L), 2L)
    assert(state() === s2)
    // POST-HASHES crash (fp rows landed, doc lost): the replayed image owns
    // its stored fingerprints — store_id == doc_id never counts — so the
    // doc append restores it exactly once and fp rows never duplicate
    CatalogOps.deleteByIds(spark, "rimgdb", "imgs",
      Seq(3L).toDF("doc_id"), idCol = "doc_id")
    CatalogOps.deleteByIds(spark, "rimgdb", "imgs__commits",
      Seq(2L).toDF("batch_id"), idCol = "batch_id")
    run(Seq(2L, 3L), 2L)
    assert(state() === s2)
    CatalogOps.dropDatabase(spark, "rimgdb")
  }

  test("winhash compaction: content identical, fewer files, downstream decisions unchanged") {
    import graft.sources.CatalogOps
    import graft.operators.DedupOps
    def uniq(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    Seq("cwdb1", "cwdb2", "cwtrim").foreach { db =>
      CatalogOps.dropDatabase(spark, db)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
      CatalogOps.createDatabase(spark, db)
    }
    val a = uniq("a", 40)
    val texts: Map[Long, String] = Map(
      0L -> a, 1L -> uniq("b", 40), 2L -> uniq("c", 40), 3L -> uniq("d", 40),
      4L -> uniq("e", 40), 5L -> uniq("f", 40),
      10L -> a,                                                        // copy of 0 → dropped
      11L -> (a.split(" ").take(20).mkString(" ") + " " + uniq("g", 21)), // 1/22 dup → kept
      12L -> uniq("h", 40))                                            // fresh → kept
    def run(db: String, ids: Seq[Long], batchId: Long): Unit =
      DedupOps.substringIncrementalBatch(
        ids.map(i => (i, texts(i))).toDF("doc_id", "text"),
        db, "corpus", batchId = Some(batchId))
    def storeSet(db: String): Set[(Long, Long)] =
      spark.table(s"`$db`.`corpus__winhashes`")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def files(db: String): Int =
      spark.table(s"`$db`.`corpus__winhashes`").inputFiles.length
    // twin stores, identical batches: cwdb1 compacts, cwdb2 is the control
    Seq(Seq(0L, 1L), Seq(2L, 3L), Seq(4L, 5L)).zipWithIndex.foreach { case (ids, i) =>
      Seq("cwdb1", "cwdb2").foreach(db => run(db, ids, i + 1L))
    }
    val filesBefore = files("cwdb1")
    val before = storeSet("cwdb1")
    assert(before === storeSet("cwdb2"))
    CatalogOps.compactWinhashes(spark, "cwdb1", "corpus")
    assert(storeSet("cwdb1") === before, "fold must not change store content")
    assert(files("cwdb1") === 1 && filesBefore > 1)
    // the stream continues over the compacted store: decisions equal the
    // uncompacted control's, and both stores stay content-equal
    Seq("cwdb1", "cwdb2").foreach(db => run(db, Seq(10L, 11L, 12L), 4L))
    def kept(db: String): Set[Long] =
      spark.table(s"`$db`.`corpus`").collect().map(_.getLong(0)).toSet
    assert(kept("cwdb1") === kept("cwdb2"))
    assert(kept("cwdb1") === Set(0L, 1L, 2L, 3L, 4L, 5L, 11L, 12L))
    assert(storeSet("cwdb1") === storeSet("cwdb2"))
    // the trim stream shares the store schema: fold, then trim against it
    DedupOps.substringTrimIncrementalBatch(
      Seq((0L, a)).toDF("doc_id", "text"), "cwtrim", "corpus", batchId = Some(1L))
    val tBefore = storeSet("cwtrim")
    CatalogOps.compactWinhashes(spark, "cwtrim", "corpus")
    assert(storeSet("cwtrim") === tBefore)
    DedupOps.substringTrimIncrementalBatch(
      Seq((10L, a)).toDF("doc_id", "text"), "cwtrim", "corpus", batchId = Some(2L))
    val trimmed = spark.table("`cwtrim`.`corpus`")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(trimmed(0L) === a && trimmed(10L) === "")
    Seq("cwdb1", "cwdb2", "cwtrim").foreach(db => CatalogOps.dropDatabase(spark, db))
  }

  test("near-dup ingest replays converge: committed, post-sigs, and post-docs crash windows") {
    import graft.sources.CatalogOps
    import graft.operators.DedupOps
    CatalogOps.dropDatabase(spark, "rdedupdb")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/rdedupdb.db"))
    CatalogOps.createDatabase(spark, "rdedupdb")
    val rnd = new scala.util.Random(23L)
    val vocab = (0 until 120).map(i => f"tok$i%03d")
    def doc(): String = rnd.shuffle(vocab).take(30).mkString(" ")
    val base = rnd.shuffle(vocab).take(30)
    val texts: Map[Long, String] = Map(
      0L -> base.mkString(" "), 1L -> doc(), 2L -> doc(), 3L -> doc(),
      4L -> doc(),
      5L -> base.updated(3, "zzz").mkString(" "), // near-dup of doc 0
      6L -> doc())
    def run(ids: Seq[Long], batchId: Long): Unit =
      DedupOps.dedupIncrementalBatch(
        ids.map(i => (i, texts(i))).toDF("doc_id", "text"),
        "rdedupdb", "corpus", tau = 0.9, batchId = Some(batchId))
    def state(): (Set[Long], Map[Long, Long], Set[Long]) = (
      spark.table("`rdedupdb`.`corpus`").collect().map(_.getLong(0)).toSet,
      spark.table("`rdedupdb`.`corpus__sigs`").groupBy($"doc_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      spark.table("`rdedupdb`.`corpus__commits`").collect().map(_.getLong(0)).toSet)
    run(Seq(0L, 1L, 2L, 3L), 1L)
    val s1 = state()
    assert(s1._1 === Set(0L, 1L, 2L, 3L) && s1._3 === Set(1L))
    // COMMITTED replay: the marker short-circuits — byte-identical state
    run(Seq(0L, 1L, 2L, 3L), 1L)
    assert(state() === s1)
    // POST-DOCS crash (both appends landed, marker lost): replay flags
    // every row as its own stored duplicate and only restores the marker
    run(Seq(4L, 5L), 2L) // 5 near-dups stored doc 0 → dropped
    val s2 = state()
    assert(s2._1 === Set(0L, 1L, 2L, 3L, 4L) && !s2._2.contains(5L))
    CatalogOps.deleteByIds(spark, "rdedupdb", "corpus__commits",
      Seq(2L).toDF("batch_id"), idCol = "batch_id")
    run(Seq(4L, 5L), 2L)
    assert(state() === s2)
    // POST-SIGS crash (sig rows landed, docs lost): replay re-appends the
    // doc exactly once and never duplicates its sig rows
    run(Seq(6L), 3L)
    val s3 = state()
    CatalogOps.deleteByIds(spark, "rdedupdb", "corpus",
      Seq(6L).toDF("doc_id"), idCol = "doc_id")
    CatalogOps.deleteByIds(spark, "rdedupdb", "corpus__commits",
      Seq(3L).toDF("batch_id"), idCol = "batch_id")
    run(Seq(6L), 3L)
    assert(state() === s3)
    CatalogOps.dropDatabase(spark, "rdedupdb")
  }

  test("streaming BM25 answers each query micro-batch like the batched serving path") {
    import graft.operators.RetrievalOps
    implicit val ctx = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
    val (db, name) = RetrievalOps.ensureBm25Store(spark, TestSpark.Sf)
    val qs = Seq((0L, SparkEntry.KnnTextQuery), (1L, "hash join merge"),
      (2L, "stream window agg"))
    val in = MemoryStream[(Long, String)]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val q = StreamingOps.streamingBm25(
      in.toDF.toDF("query_id", "qtext"), db, name, docs, k = 5) { (out, _) =>
      results.synchronized {
        results ++= out.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      }
    }
    try {
      in.addData(qs.take(1))
      q.processAllAvailable()
      in.addData(qs.drop(1))
      q.processAllAvailable()
    } finally q.stop()
    val batch = RetrievalOps.bm25ForQueriesStored(spark, docs, db, name,
        qs.toDF("query_id", "qtext"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(results.sortBy(t => (t._1, t._2)).toSeq ===
      batch.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("streaming postings: stream equals batch; every replay window converges") {
    import graft.sources.{CatalogOps, Tables}
    import graft.operators.RetrievalOps
    implicit val ctx = spark.sqlContext
    val db = "rpostdb"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, TestSpark.Sf)
    // stats + df logs built batch-side; the stream maintains the postings
    CatalogOps.createBm25Stats(spark, db, "corpus", docs)
    val rows = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingPostings(
      in.toDF.toDF("doc_id", "text"), db, "corpus")
    try {
      in.addData(rows.filter(_._1 < 250).toIndexedSeq)
      q.processAllAvailable()
      in.addData(rows.filter(_._1 >= 250).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val query = SparkEntry.KnnTextQuery
    def probe() = RetrievalOps.bm25TopKIndexedOn(spark, db, "corpus", query, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val live = RetrievalOps.bm25TopK(spark, TestSpark.Sf, query, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val streamed = probe()
    assert(streamed === live, "streamed postings must serve the batch-exact index")
    def state() = (
      spark.table(s"`$db`.`corpus__postings`").count(),
      spark.table(s"`$db`.`corpus__postcommits`").head().getLong(0))
    val s0 = state()
    val batch1 = rows.filter(_._1 >= 250).toIndexedSeq.toDF("doc_id", "text")
    // COMMITTED replay: watermark short-circuits, nothing appends
    CatalogOps.postingsIncrementalBatch(batch1, db, "corpus", 1L)
    assert(state() === s0)
    // POST-APPEND crash (postings landed, watermark lost): the batch-id
    // partition tag makes the append a no-op; only the watermark restores
    spark.sql(s"DROP TABLE `$db`.`corpus__postcommits`")
    CatalogOps.postingsIncrementalBatch(batch1, db, "corpus", 1L)
    assert(state() === s0 && probe() === live)
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("streaming term sketch equals the batch aggregate when vocab fits; replays no-op") {
    import graft.sources.{CatalogOps, Tables}
    import graft.operators.TextAnalysisOps
    implicit val ctx = spark.sqlContext
    val db = "rsketchdb"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, TestSpark.Sf)
    val rows = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    CatalogOps.createTermSketch(spark, db, "corpus",
      rows.filter(_._1 < 200).toIndexedSeq.toDF("doc_id", "text"))
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingTermSketch(
      in.toDF.toDF("doc_id", "text"), db, "corpus")
    try {
      in.addData(rows.filter(r => r._1 >= 200 && r._1 < 350).toIndexedSeq)
      q.processAllAvailable()
      in.addData(rows.filter(_._1 >= 350).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    def stored() = CatalogOps.heavyHittersStored(spark, db, "corpus", 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // fixture vocabulary (31) fits in m: the maintained sketch is EXACT,
    // so it must equal the one-shot batch aggregate over all docs
    val batch = TextAnalysisOps.heavyHitterTermsOn(docs, m = 256, topK = 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val streamed = stored()
    assert(streamed === batch,
      "maintained sketch must equal the batch aggregate below saturation")
    assert(streamed.forall(_._3 == 0L), "no eviction → zero error bounds")
    // replay: at-or-below-watermark folds must not move the summary
    CatalogOps.upsertTermSketch(spark, db, "corpus",
      rows.filter(_._1 >= 350).toIndexedSeq.toDF("doc_id", "text"), 1L)
    assert(stored() === batch)
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("streaming agg report equals the batch build; first-batch bootstrap is replay-safe") {
    import graft.sources.{CatalogOps, Tables}
    import org.apache.spark.sql.functions.{count, date_trunc, lit, round, sum}
    implicit val ctx = spark.sqlContext
    val db = "raggrepdb"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val rows = Tables.events(spark, TestSpark.Sf).select($"event_id",
      date_trunc("day", $"ts").as("day"), $"event_type", $"value")
    val data = rows.as[(Long, java.sql.Timestamp, String, Double)].collect()
    // no create call: the first micro-batch bootstraps the store with its
    // own id as the watermark
    val in = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val q = StreamingOps.streamingAggReport(
      in.toDF.toDF("event_id", "day", "event_type", "value"), db, "ev",
      keys = Seq("day", "event_type"), valueCol = "value")
    try {
      in.addData(data.filter(_._1 < 700).toIndexedSeq)
      q.processAllAvailable()
      in.addData(data.filter(_._1 >= 700).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    def served() = CatalogOps.serveAggReport(spark, db, "ev")
      .orderBy($"day", $"event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    val direct = rows.groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n"),
        (sum(round($"value" * lit(1000000.0)).cast("long")).cast("double")
          / lit(1000000.0)).as("sum_value"))
      .orderBy($"day", $"event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(served() === direct,
      "maintained report must equal the direct aggregate")
    // replaying EITHER micro-batch (incl. the bootstrap one) is a no-op
    CatalogOps.upsertAggReport(spark, db, "ev",
      rows.filter($"event_id" < 700), batchId = 0L)
    CatalogOps.upsertAggReport(spark, db, "ev",
      rows.filter($"event_id" >= 700), batchId = 1L)
    assert(served() === direct)
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("streaming-maintained transition matrix: served counts equal the batch lag pairs") {
    import graft.sources.CatalogOps
    implicit val ctx = spark.sqlContext
    val db = "rtransdb"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    // out-of-order WITHIN batches; a user straddling both batches
    val b0 = Seq(Ev(7L, 3L, ts(30), "view", 1.0), Ev(7L, 1L, ts(10), "view", 1.0),
      Ev(7L, 2L, ts(20), "click", 1.0), Ev(8L, 4L, ts(15), "view", 1.0))
    val b1 = Seq(Ev(8L, 5L, ts(45), "purchase", 1.0), Ev(7L, 6L, ts(50), "click", 1.0))
    val in = MemoryStream[Ev]
    val q = StreamingOps.streamingTransitionMatrix(in.toDS, db, "ev")
    try {
      in.addData(b0); q.processAllAvailable()
      in.addData(b1); q.processAllAvailable()
      // advance the watermark far past everything, twice, so the state
      // op's event-time timeouts flush the pending tails into the store
      in.addData(Ev(999L, 901L, ts(100000), "view", 1.0)); q.processAllAvailable()
      in.addData(Ev(999L, 902L, ts(200000), "view", 1.0)); q.processAllAvailable()
    } finally q.stop()
    val served = CatalogOps.serveAggReport(spark, db, "ev")
      .filter($"from_type" =!= "view" || $"to_type" =!= "view" ||
        $"n" =!= 1L) // drop the flush user's lone view->view row
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val all = (b0 ++ b1).map(e => (e.user_id, e.event_id, e.ts, e.event_type))
      .toDF("user_id", "event_id", "ts", "event_type")
    val want = graft.operators.EventOps.transitionsOn(all).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(served === want,
      s"served matrix must equal the batch lag pairs: $served vs $want")
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("streaming q-digest equals the batch digests below saturation; replays no-op") {
    import graft.sources.{CatalogOps, Tables}
    implicit val ctx = spark.sqlContext
    val db = "rqdigestdb"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, TestSpark.Sf)
    val rows = docs.select($"doc_id", $"source", $"n_chars")
      .as[(Long, String, Long)].collect()
    // no create call: the first micro-batch bootstraps the store
    val in = MemoryStream[(Long, String, Long)]
    val q = StreamingOps.streamingQdigest(
      in.toDF.toDF("doc_id", "source", "n_chars"), db, "corpus")
    try {
      in.addData(rows.filter(_._1 < 150).toIndexedSeq)
      q.processAllAvailable()
      in.addData(rows.filter(_._1 >= 150).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    def state() = spark.table(s"`$db`.`corpus__qdigest`")
      .select($"source", $"node", $"cnt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // below saturation the maintained digests equal the one-shot batch
    // build over all docs — write a reference store and compare node rows
    CatalogOps.createQdigestStore(spark, db, "ref", docs)
    val ref = spark.table(s"`$db`.`ref__qdigest`")
      .select($"source", $"node", $"cnt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val streamed = state()
    assert(streamed === ref,
      "maintained digests must equal the batch build below saturation")
    // replay: an at-or-below-watermark fold must not move the store
    CatalogOps.upsertQdigest(spark, db, "corpus",
      rows.filter(_._1 >= 150).toIndexedSeq.toDF("doc_id", "source", "n_chars"),
      batchId = 1L)
    assert(state() === ref)
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("state stores: missing sketch bootstraps; empty states keep their watermark through replays") {
    import graft.sources.{CatalogOps, Tables}
    val db = "rstatewmdb"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text", $"source")
    val none = docs.limit(0)
    val some = docs.filter($"doc_id" < 100)

    // (1) upsertTermSketch on a MISSING store bootstraps instead of failing
    // (the streamingTermSketch first-micro-batch path, no create call)
    CatalogOps.upsertTermSketch(spark, db, "boot", some, batchId = 0L)
    val booted = CatalogOps.heavyHittersStored(spark, db, "boot", 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(booted.nonEmpty, "bootstrap from first batch must hold entries")
    // and the bootstrap carried the watermark: a replay of batch 0 no-ops
    CatalogOps.upsertTermSketch(spark, db, "boot", some, batchId = 0L)
    assert(CatalogOps.heavyHittersStored(spark, db, "boot", 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq === booted)

    // (2) an EMPTY-created source-count store still carries its watermark:
    // a batch applied once then replayed must count exactly once
    CatalogOps.createSourceCounts(spark, db, "mix", none)
    CatalogOps.upsertSourceCounts(spark, db, "mix", some, batchId = 1L)
    val (counts1, wm1) = CatalogOps.readSourceCounts(spark, db, "mix")
    assert(counts1.values.sum === some.count(), "first fold counts the batch once")
    assert(wm1 === 1L)
    CatalogOps.upsertSourceCounts(spark, db, "mix", some, batchId = 1L) // replay
    val (counts2, _) = CatalogOps.readSourceCounts(spark, db, "mix")
    assert(counts2 === counts1, "replayed batch after empty-create must not double-count")

    // (3) same discipline for the sketch: empty create, fold, replay
    CatalogOps.createTermSketch(spark, db, "empt", none)
    CatalogOps.upsertTermSketch(spark, db, "empt", some, batchId = 2L)
    val folded = CatalogOps.heavyHittersStored(spark, db, "empt", 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    CatalogOps.upsertTermSketch(spark, db, "empt", some, batchId = 2L) // replay
    assert(CatalogOps.heavyHittersStored(spark, db, "empt", 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq === folded,
      "replayed sketch fold after empty-create must not double-count")
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("streaming temperature mix: counts converge to corpus; one-batch equals batch; replays no-op") {
    import graft.sources.{CatalogOps, Tables}
    import graft.operators.TextAnalysisOps
    implicit val ctx = spark.sqlContext
    val db = "rtempmixdb"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, TestSpark.Sf)
    val rows = docs.select($"doc_id", $"source").as[(Long, String)].collect()
    // ALL data in one micro-batch: streaming rates == batch rates exactly
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingTempMix(
      in.toDF.toDF("doc_id", "source"), db, "mix") { (out, _) =>
      results.synchronized {
        results ++= out.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getDouble(2)))
      }
    }
    try {
      in.addData(rows.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val batch = TextAnalysisOps.domainMixTemperature(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(results.sortBy(_._1).toSeq === batch.sortBy(_._1),
      "one-batch streaming mix must equal the batch operator exactly")
    // counts store holds the corpus counts
    val (counts, wm) = CatalogOps.readSourceCounts(spark, db, "mix")
    val want = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === want && wm === 0L)
    // replay: the fold no-ops and the same rates re-derive
    val replay = TextAnalysisOps.tempMixIncrementalBatch(
      rows.toIndexedSeq.toDF("doc_id", "source"), db, "mix", 0L, 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(replay.sortBy(_._1) === batch.sortBy(_._1))
    assert(CatalogOps.readSourceCounts(spark, db, "mix")._1 === want,
      "replayed fold must not double-count")
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("streaming kmeans maintenance equals manual mini-batch upserts") {
    import graft.sources.{CatalogOps, Tables}
    implicit val ctx = spark.sqlContext
    val db = "rkmeansdb"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val emb = Tables.embeddings(spark, TestSpark.Sf)
      .select($"vec_id", $"embedding")
    val seed = emb.filter($"vec_id" < 250)
    val restRows = emb.filter($"vec_id" >= 250)
      .as[(Long, Seq[Double])].collect()
    // twin A: streamed micro-batches; twin B: the same splits by hand
    Seq("s", "m").foreach(n =>
      CatalogOps.createKmeansModel(spark, db, n, seed, kCells = 8, iters = 2))
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamingOps.streamingKmeans(
      in.toDF.toDF("vec_id", "embedding"), db, "s")
    try {
      in.addData(restRows.filter(_._1 < 380).toIndexedSeq)
      q.processAllAvailable()
      in.addData(restRows.filter(_._1 >= 380).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    CatalogOps.upsertKmeansModel(spark, db, "m",
      restRows.filter(_._1 < 380).toIndexedSeq.toDF("vec_id", "embedding"), 0L)
    CatalogOps.upsertKmeansModel(spark, db, "m",
      restRows.filter(_._1 >= 380).toIndexedSeq.toDF("vec_id", "embedding"), 1L)
    val (cs, ns, k, _, wm) = CatalogOps.readKmeansModel(spark, db, "s")
    val (cm, nm, _, _, _) = CatalogOps.readKmeansModel(spark, db, "m")
    assert(k === 8 && wm === 1L && ns.sum === 500L)
    assert(ns.toSeq === nm.toSeq)
    assert(cs.toSeq === cm.toSeq, "streamed model must equal the manual fold")
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("streaming positions: stream equals live phrase scan; replays converge; compaction invisible") {
    import graft.sources.{CatalogOps, Tables}
    import graft.operators.RetrievalOps
    implicit val ctx = spark.sqlContext
    val db = "rposidb"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, TestSpark.Sf)
    val rows = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingPositions(
      in.toDF.toDF("doc_id", "text"), db, "corpus")
    try {
      in.addData(rows.filter(_._1 < 250).toIndexedSeq)
      q.processAllAvailable()
      in.addData(rows.filter(_._1 >= 250).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val phrase = RetrievalOps.PhraseQuery
    def probe() = RetrievalOps.phraseSearchIndexed(spark, db, "corpus", phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val live = RetrievalOps.phraseSearchOn(docs, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(live.nonEmpty && probe() === live,
      "streamed positions must serve the batch-exact phrase result")
    def state() = (
      spark.table(s"`$db`.`corpus__positions`").count(),
      spark.table(s"`$db`.`corpus__poscommits`").head().getLong(0))
    val s0 = state()
    val batch1 = rows.filter(_._1 >= 250).toIndexedSeq.toDF("doc_id", "text")
    // COMMITTED replay: watermark short-circuits, nothing appends
    CatalogOps.positionsIncrementalBatch(batch1, db, "corpus", 1L)
    assert(state() === s0)
    // POST-APPEND crash (positions landed, watermark lost): the batch-id
    // partition tag makes the append a no-op; only the watermark restores
    spark.sql(s"DROP TABLE `$db`.`corpus__poscommits`")
    CatalogOps.positionsIncrementalBatch(batch1, db, "corpus", 1L)
    assert(state() === s0 && probe() === live)
    // remove + compact: cancelled occurrences fold away, probe unchanged
    CatalogOps.removePositions(spark, db, "corpus",
      docs.filter($"doc_id" % 2 =!= 0))
    val afterRemove = probe()
    CatalogOps.compactPositions(spark, db, "corpus")
    val pos = spark.table(s"`$db`.`corpus__positions`")
    assert(pos.filter($"sign" =!= 1L).count() === 0, "only live rows survive the fold")
    assert(pos.groupBy($"term", $"doc_id", $"pos").count()
      .filter($"count" > 1).count() === 0, "one row per live occurrence")
    assert(probe() === afterRemove, "compaction must be probe-invisible")
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("streaming phrase serving answers each micro-batch like the batched index probe") {
    import graft.operators.RetrievalOps
    implicit val ctx = spark.sqlContext
    val (db, name) = RetrievalOps.ensurePositionalIndex(spark, TestSpark.Sf)
    val qs = RetrievalOps.PhraseBatch.zipWithIndex.map { case (p, i) => (i.toLong, p) }
    val in = MemoryStream[(Long, String)]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q = StreamingOps.streamingPhraseIndexed(
      in.toDF.toDF("query_id", "phrase"), db, name) { (out, _) =>
      results.synchronized {
        results ++= out.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }
    }
    try {
      in.addData(qs.take(1))
      q.processAllAvailable()
      in.addData(qs.drop(1))
      q.processAllAvailable()
    } finally q.stop()
    val batch = RetrievalOps.phraseForQueriesIndexed(spark, db, name,
        qs.toDF("query_id", "phrase"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(results.sortBy(t => (t._1, t._2)).toSeq ===
      batch.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("streaming indexed BM25 answers each micro-batch like the batched indexed path") {
    import graft.operators.RetrievalOps
    implicit val ctx = spark.sqlContext
    val (db, name) = RetrievalOps.ensureLexicalIndex(spark, TestSpark.Sf)
    val qs = Seq((0L, SparkEntry.KnnTextQuery), (1L, "hash join merge"),
      (2L, "stream window agg"))
    val in = MemoryStream[(Long, String)]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val q = StreamingOps.streamingBm25Indexed(
      in.toDF.toDF("query_id", "qtext"), db, name, k = 5) { (out, _) =>
      results.synchronized {
        results ++= out.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      }
    }
    try {
      in.addData(qs.take(1))
      q.processAllAvailable()
      in.addData(qs.drop(1))
      q.processAllAvailable()
    } finally q.stop()
    val batch = RetrievalOps.bm25ForQueriesIndexed(spark, db, name,
        qs.toDF("query_id", "qtext"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(results.sortBy(t => (t._1, t._2)).toSeq ===
      batch.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("streaming BM25 stats: stream equals batch; every replay window converges") {
    import graft.sources.{CatalogOps, Tables}
    import graft.operators.RetrievalOps
    implicit val ctx = spark.sqlContext
    val db = "rbm25db"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, TestSpark.Sf)
    val rows = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingBm25Stats(
      in.toDF.toDF("doc_id", "text"), db, "corpus")
    try {
      in.addData(rows.filter(_._1 < 250).toIndexedSeq)
      q.processAllAvailable()
      in.addData(rows.filter(_._1 >= 250).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val query = SparkEntry.KnnTextQuery
    def probe() = RetrievalOps.bm25TopKStoredOn(spark, docs, db, "corpus", query, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val live = RetrievalOps.bm25TopK(spark, TestSpark.Sf, query, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val streamed = probe()
    assert(streamed === live, "streamed store must serve the batch-exact statistics")
    def state() = (
      spark.table(s"`$db`.`corpus__bm25stats`").count(),
      spark.table(s"`$db`.`corpus__bm25df`").count(),
      spark.table(s"`$db`.`corpus__bm25commits`").head().getLong(0))
    val s0 = state()
    val batch1 = rows.filter(_._1 >= 250).toIndexedSeq.toDF("doc_id", "text")
    // COMMITTED replay: watermark short-circuits, nothing appends
    CatalogOps.bm25StatsIncrementalBatch(batch1, db, "corpus", 1L)
    assert(state() === s0)
    // POST-APPENDS crash (both logs landed, watermark lost): partition
    // tags make both appends no-ops; only the watermark is restored
    spark.sql(s"DROP TABLE `$db`.`corpus__bm25commits`")
    CatalogOps.bm25StatsIncrementalBatch(batch1, db, "corpus", 1L)
    assert(state() === s0 && probe() === live)
    // MID-APPENDS crash (stats landed, df lost): replay restores exactly
    // the missing df partition — stats must not double-count
    spark.sql(s"DROP TABLE `$db`.`corpus__bm25commits`")
    spark.sql(s"ALTER TABLE `$db`.`corpus__bm25df` DROP PARTITION (batch_id=1)")
    CatalogOps.bm25StatsIncrementalBatch(batch1, db, "corpus", 1L)
    assert(state() === s0 && probe() === live)
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("flatMapGroupsWithState closes sessions on event-time timeout") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingOps.statefulSessions(in.toDS)
      .writeStream.format("memory").queryName("stateful_out")
      .outputMode("append").start()
    try {
      in.addData(
        ev(1, 1, "2024-01-01 10:00:00"), ev(2, 1, "2024-01-01 10:05:00"))
      q.processAllAvailable()
      // event far past the session end + gap + watermark → timeout fires
      in.addData(ev(9, 9, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      in.addData(ev(10, 9, "2024-01-01 16:00:00"))
      q.processAllAvailable()
      val rows = spark.table("stateful_out").filter($"user_id" === 1L)
        .collect().map(r => (r.getLong(1), r.getTimestamp(2).toString, r.getTimestamp(3).toString))
      assert(rows.toSeq === Seq((2L, "2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0")))
    } finally q.stop()
  }

  test("stateful sessions merge too-old late events into one session, not per-event singletons") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingOps.statefulSessions(in.toDS)
      .writeStream.format("memory").queryName("stateful_late_out")
      .outputMode("append").start()
    try {
      // open session 12:00-12:10; watermark after this batch = 11:10
      in.addData(
        ev(1, 1, "2024-01-01 12:00:00"), ev(2, 1, "2024-01-01 12:10:00"))
      q.processAllAvailable()
      // two watermark-ACCEPTED events (>= 11:10) older than the session's
      // reach (12:00 - 30 min = 11:30), 13 min apart: the batch twin
      // sessionizes them as ONE 2-event session, so must the stream
      in.addData(
        ev(3, 1, "2024-01-01 11:12:00"), ev(4, 1, "2024-01-01 11:25:00"))
      q.processAllAvailable()
      // advance the watermark far past end + gap so the open session times out
      in.addData(ev(9, 9, "2024-01-01 16:00:00"))
      q.processAllAvailable()
      in.addData(ev(10, 9, "2024-01-01 19:00:00"))
      q.processAllAvailable()
      val rows = spark.table("stateful_late_out").filter($"user_id" === 1L)
        .collect().map(r => (r.getLong(1), r.getTimestamp(2).toString, r.getTimestamp(3).toString))
        .sortBy(_._2)
      assert(rows.toSeq === Seq(
        (2L, "2024-01-01 11:12:00.0", "2024-01-01 11:25:00.0"),
        (2L, "2024-01-01 12:00:00.0", "2024-01-01 12:10:00.0")))
    } finally q.stop()
  }

  test("streaming decontamination equals the batch pass on the same docs") {
    import graft.operators.TextAnalysisOps
    implicit val ctx = spark.sqlContext
    // eval suite: two fixed phrases; corpus: clean docs + two docs that
    // embed a full eval 4-gram, split so hits land in BOTH micro-batches
    val evalDocs = Seq(
      (900L, "alpha beta gamma delta epsilon"),
      (901L, "one two three four five six")).toDF("doc_id", "text")
    val docs: Seq[(Long, String)] = Seq(
      (1L, "clean words only nothing shared here at all"),
      (2L, "prefix alpha beta gamma delta suffix"), // contaminated
      (3L, "totally unrelated content stream row"),
      (4L, "two three four five embedded middle"), // contaminated
      (5L, "another clean row with its own words"))
    val received = scala.collection.mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingDecontaminate(
      in.toDS.toDF("doc_id", "text"), evalDocs) { (out, _) =>
      received ++= out.collect().map(_.getLong(0))
    }
    try {
      in.addData(docs.take(3): _*); q.processAllAvailable()
      in.addData(docs.drop(3): _*); q.processAllAvailable()
      val batchClean = TextAnalysisOps
        .decontaminateBatch(docs.toDF("doc_id", "text"),
          TextAnalysisOps.ngramSet(evalDocs))
        .collect().map(_.getLong(0)).toSet
      assert(batchClean === Set(1L, 3L, 5L)) // both planted hits dropped
      assert(received.toSet === batchClean)
    } finally q.stop()
  }

  test("streaming semantic decontamination equals the batch pass on the same vectors") {
    import graft.operators.KnnOps
    implicit val ctx = spark.sqlContext
    // eval suite on axes e1/e2; corpus split so a contaminated vector
    // lands in EACH micro-batch (a near-copy of e1, a near-copy of e2)
    val evalEmb = Seq(
      (900L, Seq(1.0, 0.0, 0.0)),
      (901L, Seq(0.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    val vecs: Seq[(Long, Seq[Double])] = Seq(
      (1L, Seq(0.0, 0.0, 4.0)), // orthogonal — clean
      (2L, Seq(5.0, 0.1, 0.0)), // ~e1 — contaminated
      (3L, Seq(0.1, 0.1, 1.0)), // mostly e3 — clean at tau=.45
      (4L, Seq(0.0, 2.0, 0.2)), // ~e2 — contaminated
      (5L, Seq(-1.0, 0.0, 1.0))) // negative cosine — clean
    val received = scala.collection.mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamingOps.streamingDecontaminateSem(
      in.toDS.toDF("vec_id", "embedding"), evalEmb) { (out, _) =>
      received ++= out.collect().map(_.getLong(0))
    }
    try {
      in.addData(vecs.take(3): _*); q.processAllAvailable()
      in.addData(vecs.drop(3): _*); q.processAllAvailable()
      val batchClean = KnnOps.semanticDecontaminateBatch(
        vecs.toDF("vec_id", "embedding"), KnnOps.evalVecsOf(evalEmb))
        .collect().map(_.getLong(0)).toSet
      assert(batchClean === Set(1L, 3L, 5L)) // both planted hits dropped
      assert(received.toSet === batchClean)
      // the ingest filter agrees row-for-row with the report form's flag
      val all = vecs.map { case (id, v) => (id, 1, v) } ++
        Seq((900L, 0, Seq(1.0, 0.0, 0.0)), (901L, 0, Seq(0.0, 1.0, 0.0)))
      val report = KnnOps.semanticDecontaminateOn(
        all.toDF("vec_id", "label", "embedding"), evalLabel = 0, tau = 0.45)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(report.filter(_._2 === 0L).keySet === batchClean)
    } finally q.stop()
  }

  test("streaming bloom store folds to the batch-built filter across micro-batches") {
    import graft.sources.CatalogOps
    import graft.functions.BloomFunctions
    implicit val ctx = spark.sqlContext
    val db = "sbloomdb"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    // seed the store empty-capable: create with the first slice
    val allKeys = (0L until 3000L).map(_ * 2654435761L)
    CatalogOps.createBloomStore(spark, db, "s",
      allKeys.take(1000).toDF("k"), "k", expectedKeys = 8192L)
    val in = MemoryStream[Long]
    val q = StreamingOps.streamingBloomStore(
      in.toDS.toDF("k"), db, "s", "k")
    try {
      in.addData(allKeys.slice(1000, 2000): _*)
      q.processAllAvailable()
      in.addData(allKeys.slice(2000, 3000): _*)
      in.addData(allKeys.slice(1000, 2000): _*) // redelivery of an old batch
      q.processAllAvailable()
      val (folded, m) = CatalogOps.foldedBloomWords(spark, db, "s")
      val oneShot = BloomFunctions.buildBloomWords(allKeys.toDF("k"), "k", m)
      assert(folded.sameElements(oneShot),
        "stream-fed store must equal the batch-built filter bit-for-bit")
    } finally q.stop()
    CatalogOps.dropDatabase(spark, db)
  }

  test("streaming zonemap ingest indexes each batch's files; served scan stays exact") {
    import graft.sources.CatalogOps
    import org.apache.spark.sql.functions.col
    implicit val ctx = spark.sqlContext
    val db = "szmdb"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    def mk(ids: Seq[Long]) = ids.map(i => (i, (i * 31 % 1000).toDouble)).toDF("doc_id", "x")
    mk(0L until 500L).write.saveAsTable(s"`$db`.`t`")
    CatalogOps.createZonemap(spark, db, "t", Seq("x"))
    val in = MemoryStream[Long]
    val q = StreamingOps.streamingZonemapIngest(
      in.toDS.toDF("doc_id").select(col("doc_id"),
        (col("doc_id") * 31 % 1000).cast("double").as("x")), db, "t", Seq("x"))
    try {
      in.addData(500L until 800L: _*)
      q.processAllAvailable()
      in.addData(800L until 1000L: _*)
      q.processAllAvailable()
      // index covers every file of the grown table; the served scan is exact
      spark.sql(s"REFRESH TABLE `$db`.`t`") // the appends came from the stream's plans
      val indexedFiles = spark.table(s"$db.t__zonemap").select("file").distinct()
        .collect().map(_.getString(0)).toSet
      assert(indexedFiles === spark.table(s"$db.t").inputFiles.toSet)
      val got = CatalogOps.scanZonemapped(spark, db, "t", Seq(("x", 100.0, 200.0))).count()
      val want = spark.table(s"$db.t").where(col("x").between(100.0, 200.0)).count()
      assert(got === want && want > 0)
    } finally q.stop()
    CatalogOps.dropDatabase(spark, db)
  }

  test("streaming HLL store matches the batch-built registers across replayed batches") {
    import graft.sources.CatalogOps
    implicit val ctx = spark.sqlContext
    val db = "shlldb"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    val keys = (0L until 20000L).map(i => i % 7000L) // duplicates on purpose
    CatalogOps.createHllStore(spark, db, "s", keys.take(5000).toDF("k"), "k")
    val in = MemoryStream[Long]
    val q = StreamingOps.streamingHllStore(in.toDS.toDF("k"), db, "s", "k")
    try {
      in.addData(keys.slice(5000, 15000): _*)
      q.processAllAvailable()
      in.addData(keys.slice(15000, 20000): _*)
      in.addData(keys.slice(5000, 15000): _*) // redelivery
      q.processAllAvailable()
      val streamEst = CatalogOps.hllEstimate(spark, db, "s")
      CatalogOps.createHllStore(spark, db, "b", keys.toDF("k"), "k")
      assert(streamEst === CatalogOps.hllEstimate(spark, db, "b"),
        "stream-fed registers must serve the batch-built estimate exactly")
      assert(math.abs(streamEst - 7000L) < 500L, s"estimate $streamEst")
    } finally q.stop()
    CatalogOps.dropDatabase(spark, db)
  }

  test("streaming dsir: model converges to batch; scores use counts so far; replays no-op") {
    import graft.sources.{CatalogOps, Tables}
    import graft.operators.MlOps
    import org.apache.spark.sql.functions.{col, lit}
    implicit val ctx = spark.sqlContext
    val db = "rdsirdb"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"lang", $"source", $"text")
    val rows = docs.as[(Long, String, String, String)].collect()
    val (b0, b1) = rows.partition(_._1 < 250)
    val scores = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val in = MemoryStream[(Long, String, String, String)]
    val q = StreamingOps.streamingDsir(
      in.toDF.toDF("doc_id", "lang", "source", "text"), db, "docs") {
      (out, id) => scores.synchronized {
        scores(id) = out.collect().map(r => (r.getLong(0), r.getLong(4))).toSet
      }
    }
    try {
      in.addData(b0.toIndexedSeq); q.processAllAvailable()
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    def modelSet() = CatalogOps.readDsirModel(spark, db, "docs").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // final model equals the one-shot batch model over all docs
    val want = MlOps.dsirModelOf(
      MlOps.dsirPairsOf(docs, col("lang") === lit("en"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(modelSet() === want,
      "integer count folds must converge to the one-shot model")
    // the second batch was weighed against the by-then-complete model
    val lnr = MlOps.dsirLnrOf(CatalogOps.readDsirModel(spark, db, "docs"))
    val wantB1 = MlOps.dsirWeigh(
      MlOps.dsirPairsOf(docs.filter($"doc_id" >= 250),
        col("lang") === lit("en")), lnr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(scores(1L) === wantB1)
    // a replayed committed batch no-ops the model and re-derives weights
    val replayed = MlOps.dsirIncrementalBatch(
      b1.toIndexedSeq.toDF("doc_id", "lang", "source", "text"),
      db, "docs", 1L, "en")
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    assert(replayed === wantB1 && modelSet() === want,
      "replayed fold must not double-count")
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("streaming crawl maintain ≡ one-shot batch apply ≡ frozen-model content; replay no-ops") {
    import graft.sources.CatalogOps
    import graft.operators.{FrontierOps, KnnOps}
    import graft.functions.VectorFunctions.l2Normalize
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    import org.apache.spark.sql.functions.col
    implicit val ctx = spark.sqlContext
    val db = "scrawldb"
    CatalogOps.dropDatabase(spark, db)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    def embed(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id").as("vec_id"),
      l2Normalize(toCol(graft.plans.FeatureHashEmbed(toExpr(col("text")), 64)))
        .as("embedding"))
    val words = Seq("crawl", "vector", "index", "page", "nav", "query")
    val oldDocs = (0L until 12L).map(i =>
      (i, s"${words(i.toInt % 6)} body ${words((i.toInt + 2) % 6)} page $i"))
    // two identical collections: one streamed into, one batch-applied
    CatalogOps.createIvfCollection(spark, db, "kb", embed(oldDocs.toDF("doc_id", "text")))
    CatalogOps.createIvfCollection(spark, db, "kb2", embed(oldDocs.toDF("doc_id", "text")))
    val delta = Seq(
      (3L, "changed", "revised vector body three"),
      (7L, "changed", "revised index body seven"),
      (20L, "added", "brand new crawl page twenty"),
      (21L, "added", "brand new nav page twentyone"),
      (5L, "removed", null: String),
      (9L, "removed", null: String))
    val in = MemoryStream[(Long, String, String)]
    val q = StreamingOps.streamingCrawlMaintain(
      in.toDS.toDF("doc_id", "change", "text"), db, "kb")
    try {
      in.addData(delta(0), delta(4)); q.processAllAvailable()
      in.addData(delta(1), delta(2)); q.processAllAvailable()
      in.addData(delta(3), delta(5)); q.processAllAvailable()
    } finally q.stop()
    FrontierOps.applyCrawlDelta(spark, db, "kb2",
      delta.toDF("doc_id", "change", "text"))
    def state(t: String): Map[Long, (Long, Seq[Double])] =
      spark.table(s"`$db`.`$t`")
        .select(col("vec_id"), col("cell").cast("long"), col("embedding"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Double](2))).toMap
    val streamed = state("kb")
    assert(streamed === state("kb2"),
      "streamed micro-batches must land exactly where the one-shot apply lands")
    // frozen-model content: the post-delta corpus, embedded, cells from
    // the PERSISTED quantizer (maintenance never retrains)
    val post = oldDocs.filterNot(d => Set(3L, 5L, 7L, 9L).contains(d._1)) ++
      Seq((3L, "revised vector body three"), (7L, "revised index body seven"),
        (20L, "brand new crawl page twenty"), (21L, "brand new nav page twentyone"))
    val (cents, kCells) = KnnOps.readCoarseModel(spark, db, "kb")
    val assign = toCol(graft.plans.NearestCentroid(
      toExpr(col("embedding")), cents.toSeq, kCells))
    val expected = embed(post.toDF("doc_id", "text"))
      .select(col("vec_id"), assign.cast("long").as("cell"), col("embedding"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Double](2))).toMap
    assert(streamed === expected)
    // at-least-once redelivery: re-applying an already-applied batch is a
    // content no-op (idempotence is the replay guarantee — no watermark)
    FrontierOps.applyCrawlDelta(spark, db, "kb",
      Seq(delta(1), delta(2)).toDF("doc_id", "change", "text"))
    assert(state("kb") === streamed, "replayed batch must not change content")
    CatalogOps.dropDatabase(spark, db)
  }

  test("streaming paragraph dedup: first-arrival over the bloom store ≡ exact reference; state replay-idempotent") {
    import graft.sources.CatalogOps
    import graft.operators.DedupOps
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val db = "sparadb"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    CatalogOps.createBloomStore(spark, db, "docs",
      Seq.empty[String].toDF("h").limit(0), "h", expectedKeys = 4096L)
    // boilerplate "sub" recurs across batches; doc 3 repeats its own para
    val b0 = Seq(
      (0L, "alpha beta\n\nsub"),
      (1L, "gamma delta"))
    val b1 = Seq(
      (2L, "epsilon zeta\n\nsub"),          // sub seen in b0 → dup
      (3L, "own para\n\nown para"),          // within-batch dup (2nd flagged)
      (4L, "gamma delta"))                   // whole text = b0 doc 1's para → dup
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingDedupParagraph(
      in.toDF.toDF("doc_id", "text"), db, "docs")
    try {
      in.addData(b0: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(s"`$db`.`docs__results`")
      .select(col("doc_id"), col("n_paras"), col("n_dup_paras"), col("keep"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // exact first-arrival reference over the arrival order
    val expected = Set(
      (0L, 2L, 0L, 1L),  // first arrivals all clean
      (1L, 1L, 0L, 1L),
      (2L, 2L, 1L, 1L),  // "sub" (4 chars) dup but under 20% of 16 chars? 5*3<=15? -> computed below
      (3L, 2L, 1L, 0L),  // second "own para" dup: 5*8 > 17 -> dropped
      (4L, 1L, 1L, 0L))  // whole doc is a seen paragraph -> dropped
    // recompute doc 2's gate honestly: dup_chars=3 ("sub"), total=15 -> keep
    assert(got === expected, s"got=$got")
    // saturation budget: fill tiny, implied fpp ~ 0 at this capacity
    val (fill, fpp) = CatalogOps.bloomStoreFill(spark, db, "docs")
    assert(fill < 0.01 && fpp < 1e-6, s"fill=$fill fpp=$fpp")
    // STATE replay idempotence by algebra: re-folding the same batch's
    // hashes leaves the served words bit-identical
    val before = CatalogOps.foldedBloomWords(spark, db, "docs")._1.toSeq
    CatalogOps.upsertBloomStore(spark, db, "docs",
      b1.toDF("doc_id", "text")
        .select(explode(split(col("text"), "\n\n")).as("para"))
        .select(md5(col("para")).as("h")).distinct(), "h")
    val after = CatalogOps.foldedBloomWords(spark, db, "docs")._1.toSeq
    assert(after === before)
    CatalogOps.dropDatabase(spark, db)
  }

  test("paragraphStreamFixture: streamed halves ≡ exact first-arrival over the planted corpus") {
    import graft.operators.DedupOps
    import graft.sources.Tables
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = DedupOps.paragraphStreamFixture(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // exact first-arrival reference: arrival order = (doc_id % 2, doc_id,
    // pos) — the fixture feeds the even half first
    val planted = Tables.documents(spark, TestSpark.Sf).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 4 === 0,
          lit("\n\nsubscribe to the newsletter today")).otherwise(lit("")),
        when(col("doc_id") % 10 === 0,
          lit("\n\nall rights reserved legal notice")).otherwise(lit("")))
        .as("text"))
    val paras = planted.select(col("doc_id"),
        posexplode(split(col("text"), "\n\n")).as(Seq("pos", "para")))
      .withColumn("h", md5(col("para")))
    val w = Window.partitionBy(col("h"))
      .orderBy((col("doc_id") % 2).asc, col("doc_id").asc, col("pos").asc)
    val ref = paras.withColumn("dup", row_number().over(w) > 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_paras"),
        sum(when(col("dup"), length(col("para")).cast("long"))
          .otherwise(0L)).as("dup_chars"),
        sum(length(col("para")).cast("long")).as("total_chars"))
      .withColumn("keep",
        (lit(5L) * col("dup_chars") <= col("total_chars")).cast("long"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === ref, "streamed result diverged from the exact first-arrival reference (bloom below saturation)")
    // relation to the BATCH form: batch flags every occurrence of a
    // duplicated paragraph (corpus count > 1), first-arrival flags all
    // but the first — so streamed dup counts are bounded by batch's
    val batch = DedupOps.dedupParagraph(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.forall { case (id, (_, nd, _, _, _)) => nd <= batch(id) })
  }
}
