package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev harness: the maintained component store's incremental economics at
  * 10×+ fixture scale — `runMain graft.CompStoreScale [n] [deltaPct]`.
  * Generates the DedupScale corpus shape (10k-word vocabulary, 20%
  * planted near-dups at j ≈ 0.951), then measures:
  *
  *   cold(n)                 — the full closure, paid per call without a store
  *   create(n − d)           — the store build (paid once)
  *   refresh(d)              — the incremental merge fold (paid per increment)
  *   remove(k)               — the touched-component re-resolution
  *
  * and pins refresh-landed components EXACTLY equal to the cold closure
  * over the same corpus. The claim under test: refresh cost tracks the
  * DELTA (band probe + quotient star rounds), not the corpus — the
  * economics that justify serving q_dedup_cc/q_dedup_keepbest from the
  * store instead of re-paying ~4 s of closure per query.
  */
object CompStoreScale {
  private def timed[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val out = f
    println(f"[compstorescale] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    out
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 30000
    val deltaPct = if (args.length > 1) args(1).toInt else 10
    val tau = 0.9
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(4242L)
    val vocab = (0 until 10000).map(i => f"w$i%05d")
    def randomDoc(): Array[String] = {
      val seen = collection.mutable.LinkedHashSet.empty[String]
      while (seen.size < 40) seen += vocab(rnd.nextInt(vocab.length))
      seen.toArray
    }
    val base = Array.fill(n * 4 / 5)(randomDoc())
    val dups = Array.fill(n / 5) {
      val b = base(rnd.nextInt(base.length)).clone()
      b(rnd.nextInt(b.length)) = vocab(rnd.nextInt(vocab.length))
      b
    }
    // interleave dups among base ids so the tail delta carries BOTH fresh
    // uniques and near-dups of stored docs (the cross-link fold path)
    val all = rnd.shuffle((base ++ dups).toIndexedSeq).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
    val nDelta = n * deltaPct / 100
    val docs = all.toDF("doc_id", "text").repartition(32).cache()
    docs.count()
    val initial = docs.filter(col("doc_id") < (n - nDelta).toLong)
    val delta = docs.filter(col("doc_id") >= (n - nDelta).toLong)

    val db = "compscaledb"
    import graft.sources.CatalogOps
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    import graft.operators.DedupOps

    timed(s"cold(n=$n) full closure + store write") {
      DedupOps.createComponentStore(spark, db, "cold", docs, tau)
    }
    timed(s"create(n-d=${n - nDelta}) store build") {
      DedupOps.createComponentStore(spark, db, "inc", initial, tau)
    }
    timed(s"refresh(d=$nDelta) incremental merge fold") {
      DedupOps.refreshComponents(spark, db, "inc", delta, tau)
    }
    val eq = timed("equality check (refresh-landed == cold closure)") {
      val a = DedupOps.servedComponents(spark, db, "inc")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = DedupOps.servedComponents(spark, db, "cold")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      a == b
    }
    require(eq, "incremental fold diverged from the cold closure")
    val doomed = (0 until 200).map(i => (i * 37 % n).toLong).distinct
    timed(s"remove(k=${doomed.length}) touched-component re-resolution") {
      DedupOps.removeFromComponents(spark, db, "inc",
        doomed.toDF("doc_id"), tau)
    }
    timed("serve (one bucketed read)") {
      DedupOps.servedComponents(spark, db, "inc").count()
    }
    println(s"[compstorescale] n=$n delta=$nDelta equality=OK")
    CatalogOps.dropDatabase(spark, db)
    spark.stop()
  }
}
