package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: parquet codec trade for the catalog's write paths —
  * `runMain graft.CodecScale [sfDir]`. Writes the documents corpus (text:
  * the compressible case) and the embeddings corpus (random doubles: the
  * incompressible case) under snappy / zstd / lz4 / none, reporting bytes
  * on disk, write wall, and a full-scan aggregate wall per layout. The
  * catalog defaults stay snappy unless these numbers argue otherwise on
  * the deployment's actual storage/CPU balance.
  */
object CodecScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.{CatalogOps, Tables}

    val db = "codecscale"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    // The sf0.1 fixtures are sub-MB — pure job latency. Synthesize ~1 GB
    // uncompressed per shape: prose-like text (Zipfian token stream —
    // the compressible case) and random doubles (the incompressible one).
    val words = typedlit((0 until 4096).map(i => s"w$i"))
    val text = spark.range(1000000L).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 120).map(j =>
        element_at(words,
          (pmod(xxhash64(col("id"), lit(j)), lit(4096L)) *
            pmod(xxhash64(col("id"), lit(j)), lit(4096L)) / 4096L).cast("int") + 1)): _*)
        .as("text"))
    val vecs = spark.range(400000L).select(col("id").as("vec_id"),
      array((0 until 128).map(j =>
        (pmod(xxhash64(col("id"), lit(j)), lit(1000000L)).cast("double") / 1e6)): _*)
        .as("embedding"))
    val corpora = Seq("text" -> text, "vecs" -> vecs)
    for ((tag, gen) <- corpora) {
      // materialize the generator ONCE so write timings measure the
      // encoder, not the synthesis; first write warms JIT off the books
      gen.write.mode("overwrite").option("compression", "uncompressed")
        .saveAsTable(s"`$db`.`${tag}_src`")
      val df = spark.table(s"`$db`.`${tag}_src`")
      for (codec <- Seq("snappy", "zstd", "lz4", "uncompressed")) {
        val name = s"${tag}_$codec"
        def write(): Double = {
          val t0 = System.nanoTime()
          df.write.mode("overwrite").option("compression", codec)
            .saveAsTable(s"`$db`.`$name`")
          (System.nanoTime() - t0) / 1e9
        }
        val wWall = math.min(write(), write())
        val bytes = CatalogOps.describeCollection(spark, db, name)
          .collect()(0).getLong(4)
        val cols = df.columns.map(c => length(col(c).cast("string")))
          .reduce(_ + _).as("w")
        def scan(): Double = {
          val t0 = System.nanoTime()
          spark.table(s"`$db`.`$name`")
            .select(cols).agg(sum(col("w"))).collect()(0).getLong(0)
          (System.nanoTime() - t0) / 1e9
        }
        scan()
        val sWall = math.min(scan(), scan())
        println(f"$tag $codec%-13s bytes=${bytes / 1e6}%7.1f MB  write=$wWall%5.2f s  scan=$sWall%5.2f s")
      }
    }
    spark.stop()
  }
}
