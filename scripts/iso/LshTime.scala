object LshTime {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    import graft.ops.Dedup
    def time(tag: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); val n = f
      println(f"$tag run$i: ${(System.nanoTime()-t0)/1e9}%.2f s, $n rows")
    }
    val sigs = Dedup.minhashSignatures(docs, bands = 8, shingleK = 8)
    time("signatures") { sigs.count() }
    time("capped") { Dedup.lshCandidatePairs(sigs, maxBucket = 50).count() }
    time("uncapped") { Dedup.lshCandidatePairs(sigs).count() }
    spark.stop()
  }
}
