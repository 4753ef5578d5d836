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
}
