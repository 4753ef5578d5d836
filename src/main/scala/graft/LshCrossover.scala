package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: demonstrate the exact-vs-LSH similarity-join crossover —
  * `runMain graft.LshCrossover [n] [tau]`. Generates a corpus WITH planted
  * near-duplicate structure (the workload banded LSH exists for: 20% of
  * rows are perturbed copies at cosine ≈ τ+margin) under /tmp, then times
  * the all-pairs exact join against the banded plan at a realistic
  * near-dup threshold. The fixture corpora cannot show this — their
  * near-random vectors at τ=0.35 leave LSH nothing to prune (see
  * [[graft.operators.KnnOps.simJoinLsh]] scaladoc).
  */
object LshCrossover {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val tau = if (args.length > 1) args(1).toDouble else 0.8
    val dim = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(4242L)
    def unit(v: Array[Double]): Array[Double] = {
      val nn = math.sqrt(v.map(x => x * x).sum); v.map(_ / nn)
    }
    val base = Array.fill(n * 4 / 5)(unit(Array.fill(dim)(rnd.nextGaussian())))
    // planted near-dups: perturbed copies of random base rows; σ=0.06/dim
    // puts cosine ≈ 1/√(1+64σ²) ≈ 0.9, comfortably above τ=0.8
    val dups = Array.fill(n / 5) {
      val b = base(rnd.nextInt(base.length))
      unit(b.zip(Array.fill(dim)(rnd.nextGaussian() * 0.06)).map { case (x, e) => x + e })
    }
    val rows = (base ++ dups).zipWithIndex.map { case (v, i) =>
      (i.toLong, i % 10, v.map(_.toFloat).toSeq)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_xover").toString
    rows.toSeq.toDF("vec_id", "label", "embedding")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val cnt = f
      println(f"[xover] n=$n tau=$tau $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($cnt pairs)")
    }
    // warm both plans on a slice? sizes differ; accept cold JIT (shared).
    time("exact all-pairs")(graft.operators.KnnOps.simJoin(spark, dir, tau).count())
    // sharp bands for a high threshold: r=16 (65536 buckets/band), b=96 —
    // random pairs collide at 96·0.5¹⁶ ≈ 0.15%, planted pairs (cos ≈ 0.9,
    // p ≈ 0.91) essentially always; borderline cos=0.8 misses a few %.
    // Measured on this box: n=20k → exact 13.1s / LSH(r=12,b=64) 5.2s at
    // 99.9% recall; n=50k → exact 80.2s / LSH(r=16,b=96) 9.4s at 99.6%.
    time("banded LSH r=16 b=96")(
      graft.operators.KnnOps.simJoinLsh(spark, dir, tau, rowsPerBandOverride = 16, bandsCountOverride = 96).count())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
