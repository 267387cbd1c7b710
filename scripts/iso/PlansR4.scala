object PlansR4 {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_media_meta", "q_reading_order", "q_phash_dedup")) {
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(s, dir)
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    println("===== minhash xxhash64 pairs =====")
    val df = graft.ops.Dedup.lshCandidatePairs(
      graft.ops.Dedup.minhashSignatures(
        s.read.parquet(s"$dir/documents.parquet"), bands = 8, shingleK = 8,
        hashFamily = "xxhash64"), maxBucket = 50)
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    s.stop()
  }
}
