package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, KnnOps}
import graft.sources.Tables

/** Dev harness: band-bucket size distribution for the two LSH band joins
  * (minhash dedup, hyperplane similarity join) at a fixture scale — the
  * evidence behind the hot-bucket cap default: candidate-join cost is
  * Σ bucket², so the largest bucket bounds the worst reducer. Run:
  * `sbt "runMain graft.BucketStats [sfDir]"`.
  */
object BucketStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def report(tag: String, banded: org.apache.spark.sql.DataFrame): Unit = {
      val sizes = banded.groupBy(col("band"), col("bkey"))
        .agg(count(lit(1)).as("sz"))
        .agg(max(col("sz")).as("max_sz"),
          expr("percentile(sz, 0.99)").as("p99"),
          sum(col("sz") * col("sz")).as("sum_sq"),
          count(lit(1)).as("buckets"))
        .head()
      println(s"$tag max=${sizes.get(0)} p99=${sizes.get(1)} " +
        s"sum_sq=${sizes.get(2)} buckets=${sizes.get(3)}")
    }

    // minhash banding, post identical-set collapse (the minHashLsh input)
    val allDocs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val collapsed = allDocs
      .withColumn("setkey", md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))))
      .groupBy(col("setkey"))
      .agg(min(struct(col("doc_id"), col("text"))).as("rep"))
      .select(col("rep.doc_id").as("doc_id"), col("rep.text").as("text"))
    for ((tag, docs) <- Seq("minhash(collapsed)" -> collapsed, "minhash(raw)" -> allDocs)) {
      val sig = DedupOps.minhashSigMeta(docs, DedupOps.probeVocab(docs))
      val bandStructs = (0 until 8).map { bnd =>
        struct(lit(bnd).as("band"),
          xxhash64(col(s"h${2 * bnd}"), col(s"h${2 * bnd + 1}")).as("bkey"))
      }
      report(tag, sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
        .select(col("bb.band").as("band"), col("bb.bkey").as("bkey")))
    }

    // hyperplane banding at the sim-join default threshold
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val emb = Tables.embeddings(spark, sfDir)
    val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)
    for (tau <- Seq(0.35, 0.8)) {
      val (r, b) = KnnOps.lshParams(tau)
      val rnd = new scala.util.Random(8123401L)
      val planes = Array.fill(b * r * dim)(rnd.nextGaussian())
      val bandKeys = toCol(graft.plans.HyperplaneBandKeys(
        toExpr(col("embedding")), planes.toSeq, b, r))
      report(s"hyperplane(tau=$tau,r=$r,b=$b)",
        emb.select(posexplode(bandKeys).as(Seq("band", "bkey"))))
    }
    spark.stop()
  }
}
