package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: recall@k of every ANN index path against the exact scan on
  * a PLANTED-CLUSTER corpus — `runMain graft.AnnRecall [n] [dim] [clusters]`.
  *
  * The driver fixtures are near-random vectors (max pairwise cosine ≈ 0.5),
  * the regime where NO index can beat over-fetching; this corpus has the
  * structure production embeddings have (tight clusters around separated
  * centers), which is the regime IVF/NSW/PQ exist for. Prints one table:
  * index path × setting → recall@10 vs the exact top-10, averaged over 20
  * held-in queries. Evidence for the nprobe/rescoreK defaults the contract
  * probes use.
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    // "insertcost": measure upsertNsw's in-place insert path against the
    // forced whole-graph rebuild on a hot cell — the cadence datum for
    // steady small-batch graph ingest.
    if (args.headOption.contains("insertcost")) { insertCost(args.drop(1)); return }
    // "hardneg": overlap@k of ANN-served hard-negative mining vs the
    // exact label-filtered scan on the fixture, across the nprobe grid —
    // the mining analog of the filtered-ANN recall grid.
    if (args.headOption.contains("hardneg")) { hardnegRecall(args.drop(1)); return }
    val n = if (args.length > 0) args(0).toInt else 4000
    val dim = if (args.length > 1) args(1).toInt else 64
    val nClusters = if (args.length > 2) args(2).toInt else 32
    val k = 10
    val nQueries = 20
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-annrecall-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.VectorFunctions.cosineFast
    import graft.operators.{GraphAnnOps, KnnOps}
    import graft.sources.CatalogOps

    val rnd = new scala.util.Random(2024L)
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
    val vecs: Seq[(Long, Int, Seq[Double])] = (0 until n).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, i % 5, (0 until dim).map(d => c(d) + 0.15 * rnd.nextGaussian()))
    }
    val df = vecs.toDF("vec_id", "label", "embedding").repartition(32).cache()
    df.count()
    val queries = (0 until nQueries).map(q => vecs(q * (n / nQueries)))

    def exactTopK(qVec: Seq[Double], qid: Long): Seq[Long] =
      df.filter(col("vec_id") =!= qid)
        .crossJoin(broadcast(Seq(Tuple1(qVec)).toDF("q")))
        .select(col("vec_id"), cosineFast(col("embedding"), col("q")).as("s"))
        .orderBy(col("s").desc, col("vec_id").asc)
        .limit(k).collect().map(_.getLong(0)).toSeq

    val truth: Map[Long, Seq[Long]] =
      queries.map { case (qid, _, qv) => qid -> exactTopK(qv, qid) }.toMap

    def recall(name: String)(hit: (Long, Seq[Double]) => Seq[Long]): Unit = {
      val r = queries.map { case (qid, _, qv) =>
        hit(qid, qv).count(truth(qid).contains).toDouble / k
      }.sum / nQueries
      println(f"[annrecall] n=$n dim=$dim clusters=$nClusters  $name%-38s recall@$k = $r%.3f")
    }

    val db = "annrecall"
    CatalogOps.dropDatabase(spark, db)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft-annrecall-warehouse/annrecall.db"))
    CatalogOps.createDatabase(spark, db)
    CatalogOps.createIvfCollection(spark, db, "ivf", df, kCells = nClusters)
    CatalogOps.createNswCollection(spark, db, "nsw", df.select(col("vec_id"), col("embedding")))
    CatalogOps.createNswRoutedCollection(spark, db, "nswr",
      df.select(col("vec_id"), col("embedding")), kCells = nClusters)
    CatalogOps.createQuantizedCollection(spark, db, "q8", df)
    CatalogOps.createPqCollection(spark, db, "pq", df, m = 8, kCent = 16)
    CatalogOps.createIvfPqCollection(spark, db, "ivfpq", df, kCells = nClusters, m = 8, kCent = 16)

    for (nprobe <- Seq(1, 2, 4))
      recall(s"IVF partition-pruned (nprobe=$nprobe)") { (qid, qv) =>
        KnnOps.topKIvfPartitionedVec(spark, db, "ivf", qv.toArray, qid, k, nprobe)
          .collect().map(_.getLong(0)).toSeq
      }
    for (ef <- Seq(32, 64))
      recall(s"NSW stored graphs (efSearch=$ef)") { (qid, qv) =>
        GraphAnnOps.searchStored(spark, db, "nsw", qv.toArray, k + 1, ef)
          .collect().map(_.getLong(0)).filter(_ != qid).take(k).toSeq
      }
    // routed: nprobe of nClusters graph partitions searched instead of all
    for (nprobe <- Seq(1, 2, 4))
      recall(s"NSW routed (nprobe=$nprobe/$nClusters, ef=32)") { (qid, qv) =>
        GraphAnnOps.searchStoredRouted(spark, db, "nswr", qv.toArray,
            k + 1, 32, nprobe)
          .collect().map(_.getLong(0)).filter(_ != qid).take(k).toSeq
      }
    // routed + filtered: recall composes on BOTH axes — an unprobed cell
    // and a filtered-out neighborhood each cost — so the claim that hard
    // filters want nprobe AND overFetch headroom is MEASURED here as a
    // (nprobe, overFetch) grid against the exact FILTERED scan (predicate
    // label = 3, 1-in-5 selective on the planted corpus).
    val attrs = df.select(col("vec_id"), col("label"))
    val fPred = col("label") === 3
    def exactTopKFiltered(qVec: Seq[Double], qid: Long): Seq[Long] =
      df.filter(fPred && col("vec_id") =!= qid)
        .crossJoin(broadcast(Seq(Tuple1(qVec)).toDF("q")))
        .select(col("vec_id"), cosineFast(col("embedding"), col("q")).as("s"))
        .orderBy(col("s").desc, col("vec_id").asc)
        .limit(k).collect().map(_.getLong(0)).toSeq
    val fTruth: Map[Long, Seq[Long]] =
      queries.map { case (qid, _, qv) => qid -> exactTopKFiltered(qv, qid) }.toMap
    def recallFiltered(name: String)(hit: (Long, Seq[Double]) => Seq[Long]): Unit = {
      val r = queries.map { case (qid, _, qv) =>
        hit(qid, qv).count(fTruth(qid).contains).toDouble / k
      }.sum / nQueries
      println(f"[annrecall] n=$n dim=$dim clusters=$nClusters  $name%-38s recall@$k = $r%.3f")
    }
    for (nprobe <- Seq(1, 2, 4); of <- Seq(1, 2, 4, 8))
      recallFiltered(s"NSW routed+filtered (np=$nprobe, of=$of)") { (qid, qv) =>
        GraphAnnOps.searchStoredRoutedFiltered(spark, db, "nswr", qv.toArray,
            attrs, fPred, k + 1, 32, nprobe, of)
          .collect().map(_.getLong(0)).filter(_ != qid).take(k).toSeq
      }
    for (rk <- Seq(k, 2 * k, 4 * k))
      recall(s"int8 two-phase (rescoreK=$rk)") { (qid, qv) =>
        KnnOps.topKQuantized(spark, db, "q8", df, qv.toArray, qid, k, rk)
          .collect().map(_.getLong(0)).toSeq
      }
    // Tight clusters make every member share its cluster's codes: ADC
    // nails the CLUSTER but cannot rank within it, so recall@k tracks
    // rescoreK/clusterSize until rescoreK covers the cluster (= the
    // production pairing: PQ generates candidates, the rescore ranks).
    val clusterSize = n / nClusters
    for (rk <- Seq(k, 4 * k, clusterSize + k))
      recall(s"PQ ADC (rescoreK=$rk)") { (qid, qv) =>
        KnnOps.topKPq(spark, db, "pq", df, qv.toArray, qid, k, rk)
          .collect().map(_.getLong(0)).toSeq
      }
    for ((nprobe, rk) <- Seq((2, 2 * k), (4, 4 * k), (4, clusterSize + k)))
      recall(s"IVF-PQ residual (nprobe=$nprobe, rescoreK=$rk)") { (qid, qv) =>
        KnnOps.topKIvfPq(spark, db, "ivfpq", df, qv.toArray, qid, k, rk, nprobe)
          .collect().map(_.getLong(0)).toSeq
      }
    CatalogOps.dropDatabase(spark, db)
    spark.stop()
  }

  /** In-place insert vs forced rebuild on a HOT CELL —
    * `runMain graft.AnnRecall insertcost [n] [dim] [batches]`. A routed
    * NSW collection (kCells = 4) takes steady small batches that all land
    * in ONE cell (the production pathology: a trending topic keeps hitting
    * the same cluster). Twin collections run the same batch sequence —
    * one on [[graft.sources.CatalogOps.upsertNsw]]'s default dispatch
    * (in-place [[graft.operators.GraphAnnOps.insertLocal]]), one with
    * `insertFrac = 0` (every batch rebuilds the touched graph). Reports
    * per-batch wall time for both and recall@10 vs the exact scan for
    * both final collections — the numbers behind the insert path's
    * existence: the rebuild pays O(cell) per batch and grows with the
    * cell, the insert pays O(batch).
    */
  private def hardnegRecall(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val nQueries = 20; val k = 10; val kCells = 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.EvalOps
    val exact = EvalOps.hardNegatives(spark, dir, nQueries, k).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    println(s"[annrecall] hardneg overlap@$k vs exact, $nQueries queries, kCells=$kCells ($dir)")
    Seq(1, 2, 4, kCells).foreach { nprobe =>
      val got = EvalOps.hardNegativesIndexed(spark, dir, nQueries, k,
        nprobe = nprobe, kCells = kCells).collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val overlap = exact.map { case (q, ids) =>
        got.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size
      }.sum / exact.size
      println(f"[annrecall] nprobe=$nprobe%-2d overlap=${overlap}%.3f")
    }
    spark.stop()
  }

  private def insertCost(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val dim = if (args.length > 1) args(1).toInt else 64
    val nBatches = if (args.length > 2) args(2).toInt else 8
    val batchSize = 32
    val kCells = 4
    val k = 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-annrecall-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.VectorFunctions.cosineFast
    import graft.operators.GraphAnnOps
    import graft.sources.CatalogOps

    val rnd = new scala.util.Random(2024L)
    val centers = Array.fill(kCells, dim)(rnd.nextGaussian())
    def vecNear(c: Int): Seq[Double] =
      (0 until dim).map(d => centers(c)(d) + 0.15 * rnd.nextGaussian())
    val base = (0 until n).map(i => (i.toLong, vecNear(i % kCells)))
    // the hot stream: every batch row lands in cluster 0's cell
    val batches = (0 until nBatches).map { b =>
      (0 until batchSize).map(i => (1000000L + b * batchSize + i, vecNear(0)))
    }

    val db = "anninsert"
    CatalogOps.dropDatabase(spark, db)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"/tmp/graft-annrecall-warehouse/$db.db"))
    CatalogOps.createDatabase(spark, db)
    val df = base.toDF("vec_id", "embedding").repartition(32).cache()
    df.count()
    // efConstruction kept modest so the BASE builds stay affordable at the
    // cell sizes that make the rebuild cost visible (recorded in __meta —
    // both maintenance modes replay the same constants)
    Seq("nswi", "nswrb").foreach { name =>
      CatalogOps.createNswRoutedCollection(spark, db, name, df,
        kCells = kCells, m = 16, efConstruction = 64)
    }
    df.unpersist()

    def runMode(name: String, frac: Double): Double = {
      var total = 0.0
      batches.zipWithIndex.foreach { case (b, i) =>
        val t0 = System.nanoTime()
        CatalogOps.upsertNsw(spark, db, name, b.toDF("vec_id", "embedding"), frac)
        val s = (System.nanoTime() - t0) / 1e9
        total += s
        println(f"[annrecall] insertcost $name batch=$i rows=$batchSize $s%.2f s")
      }
      total
    }
    val insertTotal = runMode("nswi", 0.2)
    val rebuildTotal = runMode("nswrb", 0.0)

    // recall@10 of both final collections vs the exact scan (exhaustive
    // routing: nprobe = kCells) — the insert path must not cost recall
    val all = (base ++ batches.flatten).toDF("vec_id", "embedding").cache()
    all.count()
    val queries = (0 until 10).map(q => batches.flatten.toIndexedSeq(q * 3))
    def exactTopK(qv: Seq[Double], qid: Long): Seq[Long] =
      all.filter(col("vec_id") =!= qid)
        .crossJoin(broadcast(Seq(Tuple1(qv)).toDF("q")))
        .select(col("vec_id"), cosineFast(col("embedding"), col("q")).as("s"))
        .orderBy(col("s").desc, col("vec_id").asc)
        .limit(k).collect().map(_.getLong(0)).toSeq
    Seq("nswi" -> "insert-path", "nswrb" -> "rebuild-path").foreach { case (name, tag) =>
      val r = queries.map { case (qid, qv) =>
        GraphAnnOps.searchStoredRouted(spark, db, name, qv.toArray,
            k + 1, efSearch = 200, nprobe = kCells)
          .collect().map(_.getLong(0)).filter(_ != qid).take(k)
          .count(exactTopK(qv, qid).contains).toDouble / k
      }.sum / queries.length
      println(f"[annrecall] insertcost $tag recall@$k = $r%.3f")
    }
    println(f"[annrecall] insertcost n=$n cell=${n / kCells + nBatches * batchSize} " +
      f"batches=$nBatches×$batchSize insert_total=$insertTotal%.2f s " +
      f"rebuild_total=$rebuildTotal%.2f s speedup=${rebuildTotal / insertTotal}%.1fx " +
      "(end-to-end: fixed per-batch staging/overwrite overhead included)")

    // the PURE graph-op cost the dispatch trades — one hot cell, no Spark
    // overhead: rebuild is O(cell · efC · m · dim) per batch and grows
    // with the cell; insert is O(batch · efC · m · dim), flat
    val cell0 = (base.filter(_._1 % kCells == 0) ++ batches.flatten).sortBy(_._1)
    val ids0 = cell0.map(_._1).toArray
    val vecs0 = cell0.flatMap(_._2).toArray
    val nStored = cell0.length - batchSize
    def timeMs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    val g0 = GraphAnnOps.buildLocal(0, ids0.take(nStored),
      vecs0.take(nStored * dim), dim, 16, 64)
    val tRebuild = timeMs {
      GraphAnnOps.buildLocal(0, ids0, vecs0, dim, 16, 64)
    }
    val tInsert = timeMs {
      GraphAnnOps.insertLocal(g0, ids0.drop(nStored),
        vecs0.drop(nStored * dim), 16, 64)
    }
    println(f"[annrecall] insertcost pure-op cell=${cell0.length} batch=$batchSize " +
      f"rebuild=$tRebuild%.0f ms insert=$tInsert%.0f ms op_speedup=${tRebuild / tInsert}%.0fx")
    CatalogOps.dropDatabase(spark, db)
    spark.stop()
  }
}
