object UdfPlan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val sp = graft.ops.Dedup.simhashPairs(docs, maxDist = 16)
    val plan1 = sp.queryExecution.executedPlan.toString
    println("SIMHASH_ROWS=" + sp.count())
    println("SIMHASH_HAS_UDF=" + plan1.contains("UDF"))
    println("SIMHASH_HAS_CODEGEN_EXPR=" + plan1.contains("simhash64"))
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val ivf = graft.ops.Similarity.ivfTopK(emb, emb.where(org.apache.spark.sql.functions.col("vec_id") < 10), k = 5)
    val plan2 = ivf.queryExecution.executedPlan.toString
    println("IVF_ROWS=" + ivf.count())
    // the only UDF left is the |Q|-sized query-probe side
    val udfCount = plan2.sliding(3).count(_ == "UDF")
    println("IVF_UDF_MENTIONS=" + udfCount)
    println("IVF_HAS_MAPPARTITIONS=" + plan2.contains("MapPartitions"))
    spark.stop()
  }
}
