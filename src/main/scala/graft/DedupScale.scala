package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: MinHash-LSH dedup at 10× fixture scale on a REALISTIC
  * vocabulary — `runMain graft.DedupScale [n]`. The fixtures' 31-word
  * vocabulary always takes the dictionary-bitset path; this generates
  * n docs of 40 tokens from a 10k-word vocabulary (general path: hashed
  * bitmap prefilter + sorted-merge verify) with 20% planted near-dups
  * (one token replaced → Jaccard 39/41 ≈ 0.951), then checks the banded
  * plan returns EXACTLY the survivors of the blocked all-pairs join at
  * τ=0.9 — and at what cost.
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 30000
    // "noblocked": skip the O(n²) baseline (668.7 s at n=30k, measured
    // round 4) and cross-check the candidate paths against each other —
    // both are exact, so equality still validates.
    val skipBlocked = args.length > 1 && args(1) == "noblocked"
    val tau = 0.9
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(9090L)
    val vocab = (0 until 10000).map(i => f"w$i%05d")
    def sample40(): Array[String] = {
      val seen = collection.mutable.LinkedHashSet.empty[String]
      while (seen.size < 40) seen += vocab(rnd.nextInt(vocab.length))
      seen.toArray
    }
    val base = Array.fill(n * 4 / 5)(sample40())
    val dups = Array.fill(n / 5) {
      val b = base(rnd.nextInt(base.length)).clone()
      b(rnd.nextInt(b.length)) = vocab(rnd.nextInt(vocab.length))
      b
    }
    val docs = (base ++ dups).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
      .repartition(32).cache()
    docs.count()

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[dedupscale] n=$n tau=$tau $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }
    val prefixPairs = time("prefix-filter jaccard") {
      graft.operators.DedupOps.jaccardPairsPrefixOn(docs, tau)
        .select("b_id").distinct().collect().map(_.getLong(0)).toSet
    }
    val exactPairs = if (skipBlocked) prefixPairs else time("blocked all-pairs jaccard") {
      graft.operators.DedupOps.jaccardPairsBlockedOn(docs, tau)
        .select("b_id").distinct().collect().map(_.getLong(0)).toSet
    }
    val lshSurvivors = time("minhash banded LSH survivors") {
      graft.operators.DedupOps.minHashLshOn(docs, tau)
        .collect().map(_.getLong(0)).toSet
    }
    val allIds = (0L until (base.length + dups.length).toLong).toSet
    val exactSurvivors = allIds -- exactPairs
    println(s"[dedupscale] exact survivors=${exactSurvivors.size} lsh survivors=${lshSurvivors.size} " +
      s"equal=${exactSurvivors == lshSurvivors} prefix_pairs_equal=${prefixPairs == exactPairs}")
    spark.stop()
  }
}
